"""Classification / imputation / anomaly backbones for the resurrected
layer families — completing the task x model matrix.

Beyond-reference surface: the reference's five live backbones multiplex
over TSlib task branches (e.g. model/Transformer.py:74-125), but the
dormant layer families (SURVEY §2.4 dead code) were never assembled into
any task. `forecasters.py` completed them to forecasting; this module
completes them to the remaining tasks so `--dnn_type Autoformer` (etc.)
works everywhere the stock backbones do — including as the deep expert
inside InterpGN (model/InterpGN.py:13-19 dnn_dict analogue,
`models/registry.py:DNN_REGISTRY`).

Head conventions follow the reference's own task branches:
- classification: gelu -> dropout -> padding-mask multiply -> flatten ->
  Dense(num_class)  (model/Transformer.py:99-110);
- imputation / anomaly: per-timestep Dense(c_out) on the encoder
  representation (model/Transformer.py:81-96; mask is accepted and
  ignored exactly like the reference's Transformer imputation branch).

Each family contributes one representation module mapping
(B, T, enc_in) -> per-timestep features:
- Autoformer/FEDformer: non-positional embedding -> decomposition encoder
  -> (B, T, d_model) seasonal component;
- ETSformer: sum over layers of extracted growth + season components
  (the TSlib ETSformer classification convention), encoder run with
  pred_len=1 because the Fourier extrapolation needs >= 1 horizon step;
- Pyraformer: pyramid encoder's multi-scale gather,
  (B, T, n_scales * d_model);
- Crossformer: DSW segment embedding + two-stage-attention hierarchy;
  classification flattens the coarsest scale, dense tasks project each
  finest-scale segment back to its seg_len timesteps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from sie_tpu.config import Config
from sie_tpu.models.extra.autoformer import AutoformerEncoder
from sie_tpu.models.extra.crossformer import CrossformerEncoder
from sie_tpu.models.extra.etsformer import ETSEncoder
from sie_tpu.models.extra.pyraformer import PyraformerEncoder
from sie_tpu.models.layers import DataEmbedding


class _ClsHead(nn.Module):
    """Reference classification head (model/Transformer.py:99-110)."""

    num_class: int
    dropout: float

    @nn.compact
    def __call__(self, h, padding_mask=None, *, train: bool = False):
        h = jax.nn.gelu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        if padding_mask is not None and h.ndim == 3 \
                and padding_mask.shape[1] == h.shape[1]:
            h = h * padding_mask.astype(h.dtype)[..., None]
        h = h.reshape(h.shape[0], -1)
        out = nn.Dense(self.num_class, name="projection")(h)
        return out.astype(jnp.float32)


# ---------------------------------------------------------------------------
# per-family (B, T, enc_in) -> (B, T, F) representations


class AutoformerRep(nn.Module):
    config: Config
    attention: str = "auto"            # auto | fourier | wavelet

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        cfg = self.config
        h = DataEmbedding(cfg.d_model, cfg.embed, cfg.freq, cfg.dropout,
                          positional=False, name="enc_embedding")(
            x, None, train=train)
        return AutoformerEncoder(
            cfg.d_model, cfg.e_layers, cfg.d_ff, cfg.n_heads, cfg.moving_avg,
            cfg.dropout, cfg.activation, cfg.factor, self.attention,
            name="encoder")(h, train=train)


class ETSformerRep(nn.Module):
    config: Config

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        cfg = self.config
        t = x.shape[1]
        res = DataEmbedding(cfg.d_model, cfg.embed, cfg.freq, cfg.dropout,
                            name="enc_embedding")(x, None, train=train)
        layer_kw = dict(d_model=cfg.d_model, nhead=cfg.n_heads,
                        c_out=cfg.c_out, seq_len=t, pred_len=1,
                        k=max(cfg.top_k, 1), dim_feedforward=cfg.d_ff,
                        dropout=cfg.dropout)
        _, growths, seasons = ETSEncoder(
            layers=(layer_kw,) * cfg.e_layers, name="encoder")(
                res, x, train=train)
        # growth is (B, T+1, D) with index 0 the initial state; season is
        # (B, T+1, D) with the last step the extrapolated horizon
        rep = sum(g[:, 1: t + 1] for g in growths) \
            + sum(s[:, :t] for s in seasons)
        return rep


class PyraformerRep(nn.Module):
    config: Config
    inner_size: int = 5

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        cfg = self.config
        t = x.shape[1]
        window = (4, 4) if t >= 32 else (2, 2)
        return PyraformerEncoder(
            seq_len=t, d_model=cfg.d_model, n_heads=cfg.n_heads,
            d_ff=cfg.d_ff, e_layers=cfg.e_layers, window_size=window,
            inner_size=self.inner_size, dropout=cfg.dropout,
            name="encoder")(x, None, train=train)


class CrossformerScales(nn.Module):
    """DSW embedding + hierarchical encoder (shared with the forecaster's
    layout); returns (scales, pad) where scales[i] is (B, D, seg_i, d_model)
    and pad is the number of front-padded timesteps in segment space."""

    config: Config
    seg_len: int = 12

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        cfg = self.config
        b, t, d = x.shape
        seg_len = min(self.seg_len, t)
        in_seg = -(-t // seg_len)
        pad = in_seg * seg_len - t
        if pad:
            x = jnp.concatenate(
                [jnp.repeat(x[:, :1], pad, axis=1), x], axis=1)
        xseg = x.transpose(0, 2, 1).reshape(b, d, in_seg, seg_len)
        xemb = nn.Dense(cfg.d_model, name="value_embedding")(xseg)
        pos = self.param("enc_pos_embedding", nn.initializers.normal(0.02),
                         (1, d, in_seg, cfg.d_model))
        xemb = nn.Dropout(cfg.dropout)(xemb + pos, deterministic=not train)
        xemb = nn.LayerNorm(name="pre_norm")(xemb)

        blocks, seg = [], in_seg
        for i in range(max(cfg.e_layers, 1)):
            if i > 0:
                seg = -(-seg // 2)
            blocks.append(dict(
                win_size=1 if i == 0 else 2, d_model=cfg.d_model,
                n_heads=cfg.n_heads, d_ff=cfg.d_ff, depth=1,
                dropout=cfg.dropout, seg_num=seg, factor=max(cfg.factor, 1)))
        scales = CrossformerEncoder(blocks=tuple(blocks), name="encoder")(
            xemb, train=train)
        return scales, pad, seg_len


# ---------------------------------------------------------------------------
# classification backbones (DNN_REGISTRY protocol: (x, padding_mask, train))


class AutoformerBackbone(nn.Module):
    config: Config
    attention: str = "auto"

    @nn.compact
    def __call__(self, x, padding_mask=None, train: bool = False):
        h = AutoformerRep(self.config, self.attention, name="rep")(
            x, train=train)
        return _ClsHead(self.config.num_class, self.config.dropout,
                        name="head")(h, padding_mask, train=train)


class FEDformerBackbone(AutoformerBackbone):
    attention: str = "fourier"


class ETSformerBackbone(nn.Module):
    config: Config

    @nn.compact
    def __call__(self, x, padding_mask=None, train: bool = False):
        h = ETSformerRep(self.config, name="rep")(x, train=train)
        return _ClsHead(self.config.num_class, self.config.dropout,
                        name="head")(h, padding_mask, train=train)


class PyraformerBackbone(nn.Module):
    config: Config

    @nn.compact
    def __call__(self, x, padding_mask=None, train: bool = False):
        h = PyraformerRep(self.config, name="rep")(x, train=train)
        return _ClsHead(self.config.num_class, self.config.dropout,
                        name="head")(h, padding_mask, train=train)


class CrossformerBackbone(nn.Module):
    config: Config

    @nn.compact
    def __call__(self, x, padding_mask=None, train: bool = False):
        cfg = self.config
        if padding_mask is not None:
            # no time axis survives segmentation; mask the input instead
            x = x * padding_mask.astype(x.dtype)[..., None]
        scales, _, _ = CrossformerScales(cfg, name="scales")(x, train=train)
        return _ClsHead(cfg.num_class, cfg.dropout, name="head")(
            scales[-1], None, train=train)


# ---------------------------------------------------------------------------
# dense (per-timestep) tasks: imputation / anomaly detection


class _DenseTaskModel(nn.Module):
    """Encoder representation + per-timestep Dense(c_out). The mask
    argument is accepted and ignored, matching the reference Transformer
    imputation branch (Transformer.py:81-88)."""

    config: Config
    rep_cls: type = None
    rep_kwargs: dict = None

    @nn.compact
    def __call__(self, x_enc, x_mark_enc=None, mask=None,
                 train: bool = False):
        cfg = self.config
        h = self.rep_cls(cfg, name="rep", **(self.rep_kwargs or {}))(
            x_enc, train=train)
        out = nn.Dense(cfg.c_out, name="projection")(h)
        return out.astype(jnp.float32)


class CrossformerDenseTask(nn.Module):
    """Dense tasks for Crossformer: each finest-scale segment cell
    (B, D, seg, d_model) is projected back to its seg_len timesteps,
    giving (B, T, D); a final Dense maps features to c_out."""

    config: Config

    @nn.compact
    def __call__(self, x_enc, x_mark_enc=None, mask=None,
                 train: bool = False):
        cfg = self.config
        b, t, d = x_enc.shape
        scales, pad, seg_len = CrossformerScales(cfg, name="scales")(
            x_enc, train=train)
        fine = scales[1] if len(scales) > 1 else scales[0]
        vals = nn.Dense(seg_len, name="seg_projection")(fine)
        vals = vals.reshape(b, d, -1).transpose(0, 2, 1)[:, pad:]
        out = nn.Dense(cfg.c_out, name="projection")(vals)
        return out.astype(jnp.float32)


def make_dense_task(family: str):
    """Imputer/anomaly-detector factory for an extra family name."""
    reps = {"Autoformer": (AutoformerRep, {}),
            "FEDformer": (AutoformerRep, {"attention": "fourier"}),
            "ETSformer": (ETSformerRep, {}),
            "Pyraformer": (PyraformerRep, {})}
    if family == "Crossformer":
        return CrossformerDenseTask
    rep_cls, kw = reps[family]
    import functools
    return functools.partial(_DenseTaskModel, rep_cls=rep_cls, rep_kwargs=kw)
