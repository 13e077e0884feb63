"""Typed configuration for sie_tpu.

Field names mirror the reference CLI flags (reference `run.py:14-144`) so that the
`run.py` shipped with this repo stays drop-in flag-compatible, but the config is a
frozen dataclass threaded explicitly instead of a mutable argparse.Namespace.

Data-derived fields (`seq_len`, `enc_in`, `num_class`, ...) are injected by the
experiment once the dataset is loaded (reference
`exp/experiment_classification.py:166-249`), here via `dataclasses.replace`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple


@dataclass(frozen=True)
class Config:
    # ===== data selection =====
    data: str = "EEG3"                # 'EEG' (39-class) | 'EEG3' | 'UEA' | 'Monash'
    data_root: str = "./data"
    json_path: str = "./data/textmaps.json"
    dataset: str = "BasicMotions"     # UEA/Monash dataset name
    task_name: str = "classification"  # 'classification' | 'regression'

    # ===== EEG data params (reference run.py:24-40) =====
    target_channels: int = 122
    target_timepoints: int = 1651
    max_files: int = 1000
    max_subjects: int = 5
    subject_id: str = "sub-01"
    subject_ids: Tuple[str, ...] = ("sub-01", "sub-02", "sub-03")
    task_type: str = "imagine"        # 'imagine' | 'read' | 'both'
    # synthetic-EEG fallback scale (39-class cert, VERDICT r4): 0 keeps the
    # legacy min(max_files*10, 240); >0 generates exactly this many trials
    # over max_subjects subjects with an imbalanced (Zipf) class mix
    synthetic_trials: int = 0
    test_size: float = 0.2
    val_size: float = 0.1
    normalizer: str = "standardization"  # reference uea.py:85-109 Normalizer
    # modes: 'standardization' | 'minmax' | 'per_sample_std' | 'per_sample_minmax'

    # ===== model selection =====
    model: str = "InterpGN"           # 'SBM' | 'LTS' | 'InterpGN' | 'DNN' | 'EEGCNN'
    dnn_type: str = "Transformer"     # 'FCN' | 'Transformer' | 'TimesNet' | 'PatchTST' | 'ResNet'

    # ===== SBM / InterpGN hyperparams (reference run.py:75-84) =====
    lambda_reg: float = 0.1
    lambda_div: float = 0.1
    epsilon: float = 1.0
    num_shapelet: int = 10
    gating_value: Optional[float] = None
    pos_weight: bool = False
    sbm_cls: str = "linear"           # 'linear' | 'bilinear' | 'attention'
    distance_func: str = "euclidean"  # 'euclidean' (mean-|diff|) | 'sqeuclidean' | 'cosine' | 'pearson'
    beta_schedule: str = "constant"   # 'cosine' | 'linear' | 'constant'
    memory_efficient: bool = False    # parity flag; our kernel is always memory-efficient
    shapelet_lengths: Tuple[float, ...] = (0.05, 0.1, 0.2, 0.3, 0.5, 0.8)
    # (reference exp/experiment_classification.py:253)

    # ===== EEGCNN params (reference run.py:42-66) =====
    eegcnn_layers: int = 2
    eegcnn_pooling: Optional[str] = "mean"  # None | 'mean' | 'sum' | 'top'
    eegcnn_cnn_f1: int = 8
    eegcnn_cnn_f2: int = 8
    eegcnn_kernel1: int = 125
    eegcnn_kernel2: int = 25
    eegcnn_pool1: int = 2
    eegcnn_pool2: int = 5
    eegcnn_dropout1: float = 0.1
    eegcnn_dropout2: float = 0.1
    eegcnn_n_heads: int = 8
    eegcnn_d_ff: int = 256

    # ===== trainer (reference run.py:87-100) =====
    lr: float = 5e-3
    lr_decay: bool = False
    # TPU-side extension (no reference counterpart): linear lr warmup over
    # the first N epochs, composable with lr_decay. 0 = off (reference
    # behavior). Motivated by the r4 39-class cert where the reference
    # default lr 5e-3 diverges for the Transformer expert (BENCH_NOTES).
    lr_warmup_epochs: float = 0.0
    gradient_accumulation_steps: int = 1
    gradient_clip: float = 0.0
    batch_size: int = 64
    log_interval: int = 20
    min_epochs: int = 0
    train_epochs: int = 500
    num_workers: int = 0
    patience: int = 50
    multi_gpu: bool = False           # parity flag; mesh data-parallel replaces it
    test_only: bool = False
    seed: int = -1
    amp: bool = True                  # bf16 compute policy (reference exp:319)

    # ===== DNN backbone configs (reference run.py:112-135) =====
    top_k: int = 5
    num_kernels: int = 6
    # PatchTST channel-independent encoder: rows per lax.scan chunk
    # (0 = default 2048; >= B*C disables chunking AND remat) and whether the
    # multi-chunk path remats inside each chunk. NOTE: patch_remat=False
    # under a multi-chunk scan does NOT reduce peak memory — scan stacks
    # every chunk's saved residuals, totalling the unchunked footprint
    # (~30 GB at EEG width; OOM on v5e). It exists for A/B measurement on
    # bigger-HBM parts. Perf knobs — scripts/patchtst_lab.py, BENCH_NOTES.
    patch_chunk_rows: int = 0
    patch_remat: bool = True
    enc_in: int = 7
    dec_in: int = 7
    c_out: int = 7
    d_model: int = 512
    n_heads: int = 8
    e_layers: int = 2
    d_layers: int = 1
    d_ff: int = 2048
    moving_avg: int = 25
    factor: int = 1
    distil: bool = True
    dropout: float = 0.0
    activation: str = "gelu"
    output_attention: bool = False
    embed: str = "timeF"
    freq: str = "h"
    label_len: int = 48
    pred_len: int = 96
    seasonal_patterns: str = "Monthly"  # M4 subset (reference run.py:134)
    inverse: bool = False               # forecast inverse transform (run.py:135)

    # ===== task-branch params (TSlib-lineage library surface; the reference
    # CLI never exposes these because task_name is restricted, run.py:103) ====
    features: str = "M"               # forecast mode: M (multi->multi) |
    # S (uni->uni) | MS (multi->target)
    target: str = "OT"                # target column for features S/MS
    mask_rate: float = 0.25           # imputation: fraction of points hidden
    anomaly_ratio: float = 1.0        # anomaly: expected % anomalous points

    # ===== data-derived (injected by the experiment) =====
    seq_len: int = 845
    num_class: int = 3
    original_fs: int = 500
    target_fs: int = 256

    # ===== TPU-specific (new; no reference counterpart) =====
    mesh_shape: Tuple[int, ...] = ()   # () -> single device; e.g. (8,) dp / (4, 2) dp x mp
    mesh_axes: Tuple[str, ...] = ("data", "model")
    use_pallas: bool = True            # use the Pallas shapelet kernel on TPU
    use_flash_attention: bool = False  # Pallas flash attention (opt-in: wins
    # only for long sequences / memory-bound regimes; at CHISCO length 845 the
    # XLA fused naive attention measured 3x faster — docs/BENCH_NOTES.md)
    attention_variant: str = "full"    # full | ds | prob | lsh — encoder
    # attention mechanism (sie_tpu/models/extra/attention_variants.py).
    # Beyond-reference wiring: the reference defines DSAttention /
    # ProbAttention / ReformerLayer but never reaches them from any model.
    use_fused_attention: bool = True   # fused attention kernel
    # (ops/pallas/attention_pallas.py): full-row variant; exact softmax +
    # in-kernel dropout; interpret-mode off-TPU
    fused_attention_max_len: int = 4096  # T above this uses XLA attention.
    # 0 = unlimited: T>4096 then streams through the kernel's kv-blocked
    # online-softmax variant (interpret-certified; compiled-path on-chip
    # certification pending — NEXT_STEPS r3)
    fused_attention_min_len: int = 256  # T below this uses XLA attention:
    # short-T / huge-BH shapes (PatchTST channel-independent rows) degenerate
    # into tiny per-(b,h) kernel launches — measured crossover in
    # docs/BENCH_NOTES.md "PatchTST step closure". 0 = always use the kernel.
    augment: Tuple[str, ...] = ()      # train-time on-device augmentations
    # (data/augment.py; off by default so parity configs are bit-identical):
    # any of 'noise', 'scale', 'chdrop', 'tshift'
    augment_noise_std: float = 0.1     # x per-sample std
    augment_scale_std: float = 0.1
    augment_chdrop_prob: float = 0.1
    augment_tshift_max: int = 16       # time steps
    moe_experts: int = 0               # >0: replace the Transformer encoder
    # FFN with a Switch-style mixture of this many expert FFNs
    # (models/moe.py). Beyond-reference: stacked expert params shard over an
    # 'expert' mesh axis (expert parallelism) — e.g. --mesh 2x4
    # --mesh_axes data,expert.
    moe_capacity_factor: float = 1.25  # per-group expert buffer headroom
    moe_top_k: int = 1                 # experts activated per token
    moe_aux_weight: float = 0.01       # load-balance loss weight
    fuse_short_banks: bool = False     # fuse stride-1 shapelet banks into one
    # grouped Pallas launch (opt-in: measured SLOWER at CHISCO shapes — 11.6
    # vs 10.1 ms for banks {43,85}; register pressure scales with total n,
    # shrinking the window subtile / spilling — docs/BENCH_NOTES.md r3).
    # Single-device path only: the grouped call is not routed through the
    # mesh shard_map region.
    checkpoint_dir: str = "./checkpoints"
    result_dir: str = "./result"
    cache_dir: str = "./cache"         # preprocessed-array cache (EEG)
    stream_from_disk: bool = False     # stream batches from a memmap cache
    # dir instead of holding the split arrays in RAM/HBM (data/stream.py:
    # host RSS stays O(batch); forces the host-feed path with a
    # double-buffered device prefetcher). Beyond-reference: the torch
    # reference materializes every dataset in RAM.
    scan_epoch: bool = False           # fuse the whole TRAINING epoch into
    # ONE compiled dispatch (lax.scan over the HBM-staged step schedule,
    # trainer.train_epoch_staged) — removes all per-step host involvement.
    # Device-resident input path only; numerically equivalent to the
    # per-step staged loop (tests/test_scan_epoch.py). Off by default:
    # measured on-chip the staged per-step TRAIN path already pipelines its
    # one-scalar upload behind compute (24.28 vs 24.52 ms/step on EEGCNN —
    # BENCH_NOTES "whole-epoch fused dispatch"). Also opts the collect=True
    # test() pass into the scanned eval (stacks the full ModelInfo — incl.
    # the (B, 7320) p/d tensors — for every test batch in HBM at once).
    scan_eval: bool = True             # run each VALIDATION pass as one
    # scanned dispatch + one host fetch (trainer.eval_epoch_staged_scan).
    # Default ON: the per-batch eval path pays ~4 blocking device round
    # trips per batch — measured 85.9 -> 5.3 ms/batch (16.1x) on EEGCNN
    # through the relay. Numerically equivalent (tests/test_scan_epoch.py).

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    # --- derived helpers -------------------------------------------------
    @property
    def num_shapelets_per_bank(self) -> Tuple[int, ...]:
        return (self.num_shapelet,) * len(self.shapelet_lengths)

    @property
    def compute_dtype(self):
        import jax.numpy as jnp
        return jnp.bfloat16 if self.amp else jnp.float32

    def checkpoint_key(self) -> str:
        """Checkpoint dir keyed on hyperparams (reference exp:140-152)."""
        return (
            f"{self.model}/{self.dataset}/"
            f"dnn-{self.dnn_type}_seed-{self.seed}_k-{self.num_shapelet}"
            f"_div-{self.lambda_div}_reg-{self.lambda_reg}_eps-{self.epsilon}"
            f"_beta-{self.beta_schedule}_dfunc-{self.distance_func}_cls-{self.sbm_cls}"
        )


DEFAULT_SEEDS = (0, 42, 1234, 8237, 2023)  # reference run.py:564
