"""Resurrected TSlib layer library (the reference's dormant surface).

The reference ships several layer families that none of its live models
import (SURVEY.md SS2.4 "dead code"): the extra members of
`layers/SelfAttention_Family.py` (DSAttention, ProbAttention, ReformerLayer,
TwoStageAttentionLayer), `layers/Autoformer_EncDec.py`,
`layers/AutoCorrelation.py`, `layers/FourierCorrelation.py`,
`layers/MultiWaveletCorrelation.py`, `layers/ETSformer_EncDec.py`,
`layers/Pyraformer_EncDec.py`, `layers/Crossformer_EncDec.py` and
`Inception_Block_V2` in `layers/Conv_Blocks.py`.

This subpackage provides TPU-native (JAX/flax, static-shape, jit-clean)
re-designs of each so the rebuild's library surface is a superset of the
reference's. Unlike the reference, every layer here is reachable: the
attention variants plug into the Transformer backbone's attention seam via
`Config.attention_variant`, and each module carries unit tests
(tests/test_extra_layers.py) asserting the mathematical invariants of the
mechanism (FFT-correlation identities, perfect-reconstruction filter banks,
exponential-smoothing recurrences) rather than torch transcription.
"""

from sie_tpu.models.extra.attention_variants import (  # noqa: F401
    DSAttentionLayer, LSHAttentionLayer, ProbAttentionLayer,
    TwoStageAttentionLayer)
