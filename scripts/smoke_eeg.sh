#!/bin/bash
# EEG3 smoke launcher (reference test2.py:1-100 / test.py:1-43 — bash scripts
# misnamed .py): small-budget EEG3 run with environment preflight.
set -e
DATA_ROOT=${1:-./data/preprocessed_fif}
JSON_PATH=${2:-./data/textmaps.json}

python scripts/check_env.py --data_root "$DATA_ROOT" --json_path "$JSON_PATH"

python run.py \
  --data EEG3 --data_root "$DATA_ROOT" --json_path "$JSON_PATH" \
  --model EEGCNN --batch_size 8 --max_files 5 --train_epochs 10 \
  --subject_ids sub-01,sub-02,sub-03 --seed 42 --log_interval 1 "$@"
