"""sie_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for imagined-speech EEG
and generic multivariate time-series classification/regression.

Re-designed from scratch with the capabilities of the reference PyTorch codebase
(`001camellia/Speech-Imagery-EEG`, mounted read-only at /root/reference): the
InterpGN family (shapelet bottleneck + deep backbone with a Gini-gated mixture),
five DNN backbones (FCN / Transformer / TimesNet / PatchTST / ResNet), the
EEGNet-style EEGCNN(+Transformer) baseline, UEA `.ts` classification, Monash
extrinsic regression with a CRPS loss, and the CHISCO imagined-speech EEG
preprocessing pipeline — all built TPU-first:

- compute path: jit-compiled JAX with bf16 matmul policy, Pallas kernels for the
  shapelet sliding-window distance (the hot op), XLA convolutions (MXU) for the
  distance metrics that admit a cross-correlation decomposition;
- parallelism: `jax.sharding.Mesh` + NamedSharding (data / model axes) instead of
  the reference's `nn.DataParallel`; LOSO folds map across mesh axes;
- data path: host-side parsing into dense numpy arrays once, then batched,
  fixed-shape device feeding (no per-batch Python collation in the hot loop).
"""

__version__ = "0.1.0"

from sie_tpu.config import Config  # noqa: F401
