#!/bin/bash
# UEA sweep — 30 datasets x 5 seeds, InterpGN+FCN defaults
# (reference run_uea.sh:14-70: NUM_SHAPELET=10, LAMBDA_DIV=0.1, LAMBDA_REG=0.1,
#  EPS=1, GATING_VALUE=1, 500 epochs, bs 32, lr 5e-3).
# Usage: ./run_uea.sh [data_root] [extra run.py flags...]

DATA_ROOT=${1:-./data/UEA_multivariate}
shift 2>/dev/null

DATASETS=(
  ArticularyWordRecognition AtrialFibrillation BasicMotions
  CharacterTrajectories Cricket DuckDuckGeese EigenWorms Epilepsy ERing
  EthanolConcentration FaceDetection FingerMovements HandMovementDirection
  Handwriting Heartbeat InsectWingbeat JapaneseVowels Libras LSST
  MotorImagery NATOPS PEMS-SF PenDigits PhonemeSpectra RacketSports
  SelfRegulationSCP1 SelfRegulationSCP2 SpokenArabicDigits StandWalkJump
  UWaveGestureLibrary
)

NUM_SHAPELET=10
LAMBDA_DIV=0.1
LAMBDA_REG=0.1
EPS=1
GATING_VALUE=1

for DATASET in "${DATASETS[@]}"; do
  case "$DATASET" in
    PEMS-SF|DuckDuckGeese|MotorImagery|EigenWorms)
      echo ">>> $DATASET is memory-heavy; consider --batch_size 8" ;;
  esac
  # --no-amp: the reference sweep passes --amp which, through its inverted
  # store_false flag (run.py:100), ran the UEA suite in fp32 — keep the same
  # numerics for accuracy comparison (append --amp after the data root to
  # choose bf16 instead).
  python run.py \
    --data UEA --data_root "$DATA_ROOT" --dataset "$DATASET" \
    --model InterpGN --dnn_type FCN \
    --num_shapelet $NUM_SHAPELET --lambda_div $LAMBDA_DIV \
    --lambda_reg $LAMBDA_REG --epsilon $EPS --gating_value $GATING_VALUE \
    --train_epochs 500 --batch_size 32 --lr 5e-3 --patience 50 \
    --no-amp \
    "$@"
done
