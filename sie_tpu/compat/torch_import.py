"""Import reference PyTorch checkpoints into sie_tpu flax variables.

The reference saves ``model.state_dict()`` as ``checkpoint.pth`` via
``EarlyStopping.save_checkpoint`` (reference utils/tools.py:34-38) and reloads
it at test time (reference run.py:580-585).  This module converts those
state_dicts — key layout cited per reference model file below — into the
variables pytree of the corresponding sie_tpu model, so a user migrating from
the reference can evaluate or serve reference-trained weights on TPU without
retraining (``run.py --import_torch_ckpt checkpoint.pth``).

Key layouts converted (torch attribute paths -> flax scopes):

- InterpGN (reference model/InterpGN.py:31-37): ``sbm.*`` -> ``sbm`` scope,
  ``deep_model.*`` -> ``deep_model`` scope.
- ShapeBottleneckModel (reference model/Shapelet.py:134-238):
  ``shapelets.{i}.weights`` (n, C, L) -> ``shapelets_{i}``; linear head
  ``output_layer.weight``; bilinear head ``output_bilinear.weight``
  (C, total, total); attention head ``attention.{q,k}_proj`` +
  ``attention.pos_embed``; LTS threshold (1, n, C) -> ``threshold_{i}``
  (reference model/Shapelet.py:90-114,241-263).
- FCN (reference model/FullyConvNet.py:7-59): ``block{k}.0/.1`` Conv1d+BN
  stacks -> ``conv{k}``/``bn{k}``, plus ``fc``.
- ResNet (reference model/ResNet.py:6-66): stem ``conv1/bn1``, blocks
  ``layer{k}.0.{conv1,bn1,conv2,bn2}`` and downsample
  ``layer{k}.0.shortcut.{0,1}`` -> ``short_conv``/``short_bn``, head ``fc``.
- Transformer (reference model/Transformer.py:19-39 + layers/Embed.py:29-43 +
  layers/SelfAttention_Family.py:179-213 + layers/Transformer_EncDec.py:27-80):
  ``enc_embedding.value_embedding.tokenConv`` circular conv,
  ``encoder.attn_layers.{i}.attention.{query,key,value,out}_projection``,
  kernel-1 Conv1d FFN ``conv1/conv2`` -> Dense, ``norm1/norm2``,
  ``encoder.norm``, classification head ``projection``.
- TimesNet (reference model/TimesNet.py:21-105 + layers/Conv_Blocks.py:5-30):
  per-block Inception stacks ``model.{b}.conv.{0,2}.kernels.{ki}`` are
  repacked into the collapsed single-launch tap table of
  ``models/timesnet.py:InceptionConvSeq`` (tap_weights[(ki, dr, dc)] =
  W_ki[:, :, dr+ki, dc+ki]^T; per-branch biases kept, the 1/K mean is applied
  at run time on both sides), plus ``enc_embedding``/``layer_norm``/
  ``projection``.
- PatchTST (reference model/PatchTST.py:34-77 + layers/Embed.py:163-190):
  ``patch_embedding.value_embedding`` Linear(patch_len, d_model, bias=False),
  shared encoder (identical scope layout to the Transformer's under
  ``enc_scan``), head ``projection``.
- EEGCNN (reference model/eegcnn.py:67-108,219-247): the CNN stack keeps the
  reference's own attribute names (block1_conv1, block1_bn1, block1_depthwise,
  block1_bn2, block2_conv1, block2_conv2, block2_bn), torch
  ``nn.TransformerEncoderLayer`` packed ``self_attn.in_proj_*`` is split into
  q/k/v, plus ``cnn_projection`` and ``classifier``.

Array-layout conversions: Linear (out, in) -> Dense kernel (in, out);
Conv1d (out, in, K) -> flax (K, in, out); Conv2d (out, in/g, Kh, Kw) -> flax
(Kh, Kw, in/g, out); BatchNorm weight/bias/running_mean/running_var ->
params.scale/params.bias/batch_stats.mean/batch_stats.var.

Buffers with no flax counterpart (sinusoidal position tables, BN
``num_batches_tracked``) and params unreachable from the classification
forward (the temporal-embedding branch — x_mark is None for every
classification task, reference model/Transformer.py:101) are reported as
``unused`` rather than silently dropped.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import numpy as np

from sie_tpu.config import Config

Array = np.ndarray
Flat = Dict[Tuple[str, ...], Array]   # ("params", "sbm", "shapelets_0") -> arr


class TorchImportError(ValueError):
    pass


# ---------------------------------------------------------------- primitives

def _linear(dst: Flat, scope: Tuple[str, ...], sd: Dict[str, Array],
            src: str, bias: bool = True) -> None:
    dst[scope + ("kernel",)] = sd.pop(src + ".weight").T
    if bias:
        dst[scope + ("bias",)] = sd.pop(src + ".bias")


def _conv1d(dst: Flat, scope: Tuple[str, ...], sd: Dict[str, Array],
            src: str, bias: bool = True) -> None:
    dst[scope + ("kernel",)] = sd.pop(src + ".weight").transpose(2, 1, 0)
    if bias:
        dst[scope + ("bias",)] = sd.pop(src + ".bias")


def _conv2d(dst: Flat, scope: Tuple[str, ...], sd: Dict[str, Array],
            src: str, bias: bool = False) -> None:
    dst[scope + ("kernel",)] = sd.pop(src + ".weight").transpose(2, 3, 1, 0)
    if bias:
        dst[scope + ("bias",)] = sd.pop(src + ".bias")


def _norm(dst: Flat, scope: Tuple[str, ...], sd: Dict[str, Array],
          src: str) -> None:
    """LayerNorm (weight/bias -> scale/bias)."""
    dst[scope + ("scale",)] = sd.pop(src + ".weight")
    dst[scope + ("bias",)] = sd.pop(src + ".bias")


def _batchnorm(dst: Flat, params_scope: Tuple[str, ...], sd: Dict[str, Array],
               src: str) -> None:
    """params_scope is under 'params'; the running stats go to batch_stats at
    the same sub-path."""
    _norm(dst, params_scope, sd, src)
    stats = ("batch_stats",) + params_scope[1:]
    dst[stats + ("mean",)] = sd.pop(src + ".running_mean")
    dst[stats + ("var",)] = sd.pop(src + ".running_var")
    sd.pop(src + ".num_batches_tracked", None)


# ------------------------------------------------------------------- models

def _convert_sbm(dst: Flat, sd: Dict[str, Array], cfg: Config,
                 scope: Tuple[str, ...], prefix: str) -> None:
    banks = [k for k in sd if re.fullmatch(
        re.escape(prefix) + r"shapelets\.\d+\.weights", k)]
    for key in banks:
        i = int(key[len(prefix):].split(".")[1])
        dst[scope + (f"shapelets_{i}",)] = sd.pop(key)
        thr = f"{prefix}shapelets.{i}.threshold"
        if thr in sd:  # LTS (reference Shapelet.py:94): (1, n, C) -> (n, C)
            dst[scope + (f"threshold_{i}",)] = sd.pop(thr)[0]
    _linear(dst, scope + ("output_layer",), sd, prefix + "output_layer",
            bias=False)
    if prefix + "output_bilinear.weight" in sd:
        # nn.Bilinear weight (out, in1, in2) == our (C, total, total)
        dst[scope + ("bilinear_w",)] = sd.pop(prefix + "output_bilinear.weight")
    if prefix + "attention.q_proj.weight" in sd:
        att = scope + ("attention",)
        _linear(dst, att + ("q_proj",), sd, prefix + "attention.q_proj")
        _linear(dst, att + ("k_proj",), sd, prefix + "attention.k_proj")
        dst[att + ("pos_embed",)] = sd.pop(prefix + "attention.pos_embed.weight")


def _convert_fcn(dst: Flat, sd: Dict[str, Array], scope: Tuple[str, ...],
                 prefix: str) -> None:
    for k in (1, 2, 3):
        _conv1d(dst, scope + (f"conv{k}",), sd, f"{prefix}block{k}.0")
        _batchnorm(dst, scope + (f"bn{k}",), sd, f"{prefix}block{k}.1")
    _linear(dst, scope + ("fc",), sd, prefix + "fc")


def _convert_resnet(dst: Flat, sd: Dict[str, Array], scope: Tuple[str, ...],
                    prefix: str) -> None:
    _conv1d(dst, scope + ("conv1",), sd, prefix + "conv1", bias=False)
    _batchnorm(dst, scope + ("bn1",), sd, prefix + "bn1")
    for k in (1, 2, 3):
        blk = f"{prefix}layer{k}.0."
        lscope = scope + (f"layer{k}",)
        for c in ("conv1", "conv2"):
            _conv1d(dst, lscope + (c,), sd, blk + c, bias=False)
        for b in ("bn1", "bn2"):
            _batchnorm(dst, lscope + (b,), sd, blk + b)
        if blk + "shortcut.0.weight" in sd:
            _conv1d(dst, lscope + ("short_conv",), sd, blk + "shortcut.0",
                    bias=False)
            _batchnorm(dst, lscope + ("short_bn",), sd, blk + "shortcut.1")
    _linear(dst, scope + ("fc",), sd, prefix + "fc")


def _convert_encoder(dst: Flat, sd: Dict[str, Array], scope: Tuple[str, ...],
                     prefix: str, e_layers: int) -> None:
    """TSlib Encoder stack (reference Transformer_EncDec.py:27-80 +
    SelfAttention_Family.py:179-213). scope points at our `encoder`."""
    for i in range(e_layers):
        lt = f"{prefix}attn_layers.{i}."
        ls = scope + (f"layer_{i}",)
        att = ls + ("FullAttentionLayer_0",)
        for ours, theirs in (("query", "query_projection"),
                             ("key", "key_projection"),
                             ("value", "value_projection"),
                             ("out", "out_projection")):
            _linear(dst, att + (ours,), sd, lt + "attention." + theirs)
        for c in ("conv1", "conv2"):  # kernel-1 Conv1d == Dense
            w = sd.pop(lt + c + ".weight")
            dst[ls + (c, "kernel")] = w[:, :, 0].T
            dst[ls + (c, "bias")] = sd.pop(lt + c + ".bias")
        _norm(dst, ls + ("norm1",), sd, lt + "norm1")
        _norm(dst, ls + ("norm2",), sd, lt + "norm2")
    _norm(dst, scope + ("norm",), sd, prefix + "norm")


def _drop_unreachable_embedding(sd: Dict[str, Array], prefix: str,
                                unused: List[str]) -> None:
    """Temporal-embedding params are saved by the reference but unreachable
    from the classification forward (x_mark is None — reference
    model/Transformer.py:101); position tables are buffers."""
    for k in list(sd):
        if k.startswith(prefix + "enc_embedding.temporal_embedding.") or \
                k.endswith("position_embedding.pe") or k.endswith(".pe"):
            sd.pop(k)
            unused.append(k)


def _convert_transformer(dst: Flat, sd: Dict[str, Array], cfg: Config,
                         scope: Tuple[str, ...], prefix: str,
                         unused: List[str]) -> None:
    _conv1d(dst, scope + ("enc_embedding", "TokenEmbedding_0", "tokenConv"),
            sd, prefix + "enc_embedding.value_embedding.tokenConv", bias=False)
    _drop_unreachable_embedding(sd, prefix, unused)
    _convert_encoder(dst, sd, scope + ("encoder",), prefix + "encoder.",
                     cfg.e_layers)
    _linear(dst, scope + ("projection",), sd, prefix + "projection")


def _convert_timesnet(dst: Flat, sd: Dict[str, Array], cfg: Config,
                      scope: Tuple[str, ...], prefix: str,
                      unused: List[str]) -> None:
    from sie_tpu.models.timesnet import _inception_taps
    taps = _inception_taps(cfg.num_kernels)
    _conv1d(dst, scope + ("enc_embedding", "TokenEmbedding_0", "tokenConv"),
            sd, prefix + "enc_embedding.value_embedding.tokenConv", bias=False)
    _drop_unreachable_embedding(sd, prefix, unused)
    for b in range(cfg.e_layers):
        for ours, theirs in (("conv1", "conv.0"), ("conv2", "conv.2")):
            branches = [sd.pop(f"{prefix}model.{b}.{theirs}.kernels.{ki}.weight")
                        for ki in range(cfg.num_kernels)]
            biases = [sd.pop(f"{prefix}model.{b}.{theirs}.kernels.{ki}.bias")
                      for ki in range(cfg.num_kernels)]
            tap_w = np.stack([
                branches[ki][:, :, dr + ki, dc + ki].T
                for ki, dr, dc in taps])
            cscope = scope + (f"block_{b}", ours)
            dst[cscope + ("tap_weights",)] = tap_w
            dst[cscope + ("bias",)] = np.stack(biases)
    _norm(dst, scope + ("layer_norm",), sd, prefix + "layer_norm")
    _linear(dst, scope + ("projection",), sd, prefix + "projection")


def _convert_patchtst(dst: Flat, sd: Dict[str, Array], cfg: Config,
                      scope: Tuple[str, ...], prefix: str,
                      unused: List[str]) -> None:
    _linear(dst, scope + ("value_embedding",), sd,
            prefix + "patch_embedding.value_embedding", bias=False)
    _drop_unreachable_embedding(sd, prefix, unused)
    _convert_encoder(dst, sd, scope + ("enc_scan", "encoder"),
                     prefix + "encoder.", cfg.e_layers)
    _linear(dst, scope + ("projection",), sd, prefix + "projection")


def _convert_eegcnn(dst: Flat, sd: Dict[str, Array], cfg: Config,
                    unused: List[str]) -> None:
    cnn = ("params", "eegcnn")
    pre = "eegcnn."
    _conv2d(dst, cnn + ("block1_conv1",), sd, pre + "block1_conv1")
    _batchnorm(dst, cnn + ("block1_bn1",), sd, pre + "block1_bn1")
    _conv2d(dst, cnn + ("block1_depthwise",), sd, pre + "block1_depthwise")
    _batchnorm(dst, cnn + ("block1_bn2",), sd, pre + "block1_bn2")
    _conv2d(dst, cnn + ("block2_conv1",), sd, pre + "block2_conv1")
    _conv2d(dst, cnn + ("block2_conv2",), sd, pre + "block2_conv2")
    _batchnorm(dst, cnn + ("block2_bn",), sd, pre + "block2_bn")
    if "cnn_projection.weight" in sd:
        _linear(dst, ("params", "cnn_projection"), sd, "cnn_projection")
    for i in range(cfg.eegcnn_layers):
        lt = f"transformer_encoder.layers.{i}."
        ls = ("params", f"encoder_{i}")
        inw, inb = sd.pop(lt + "self_attn.in_proj_weight"), \
            sd.pop(lt + "self_attn.in_proj_bias")
        d = inw.shape[1]
        for j, name in enumerate(("q", "k", "v")):
            dst[ls + (name, "kernel")] = inw[j * d:(j + 1) * d].T
            dst[ls + (name, "bias")] = inb[j * d:(j + 1) * d]
        _linear(dst, ls + ("out_proj",), sd, lt + "self_attn.out_proj")
        _linear(dst, ls + ("linear1",), sd, lt + "linear1")
        _linear(dst, ls + ("linear2",), sd, lt + "linear2")
        _norm(dst, ls + ("norm1",), sd, lt + "norm1")
        _norm(dst, ls + ("norm2",), sd, lt + "norm2")
    _linear(dst, ("params", "classifier"), sd, "classifier")
    for k in list(sd):  # sinusoidal pos-encoding buffer
        if "pos_encoder" in k or k.endswith(".pe"):
            sd.pop(k)
            unused.append(k)


_DNN_CONVERTERS = {
    "FCN": lambda dst, sd, cfg, scope, prefix, unused:
        _convert_fcn(dst, sd, scope, prefix),
    "ResNet": lambda dst, sd, cfg, scope, prefix, unused:
        _convert_resnet(dst, sd, scope, prefix),
    "Transformer": _convert_transformer,
    "TimesNet": _convert_timesnet,
    "PatchTST": _convert_patchtst,
}


# --------------------------------------------------------------- entry point

def convert_state_dict(state_dict, cfg: Config, variables):
    """Convert a reference state_dict into the variables pytree of the
    matching sie_tpu model.

    state_dict: torch name -> tensor/ndarray (a ``module.`` DataParallel
    prefix is stripped). variables: the template from ``model.init`` — every
    leaf must be produced by the conversion with an identical shape.
    Returns (new_variables, unused_source_keys).
    """
    import jax

    sd = {k[len("module."):] if k.startswith("module.") else k:
          np.asarray(getattr(v, "numpy", lambda: v)() if hasattr(v, "detach")
                     else v)
          for k, v in ((k, getattr(v, "detach", lambda: v)())
                       for k, v in state_dict.items())}
    dst: Flat = {}
    unused: List[str] = []

    def dnn(scope: Tuple[str, ...], prefix: str) -> None:
        if cfg.dnn_type not in _DNN_CONVERTERS:
            raise TorchImportError(
                f"no torch importer for dnn_type={cfg.dnn_type!r} "
                f"(reference backbones: {sorted(_DNN_CONVERTERS)})")
        _DNN_CONVERTERS[cfg.dnn_type](dst, sd, cfg, scope, prefix, unused)

    if cfg.model in ("SBM", "LTS"):
        _convert_sbm(dst, sd, cfg, ("params",), "")
    elif cfg.model == "InterpGN":
        _convert_sbm(dst, sd, cfg, ("params", "sbm"), "sbm.")
        dnn(("params", "deep_model"), "deep_model.")
    elif cfg.model == "DNN":
        dnn(("params", "backbone"), "")
    elif cfg.model == "EEGCNN":
        _convert_eegcnn(dst, sd, cfg, unused)
    else:
        raise TorchImportError(f"no torch importer for model={cfg.model!r}")

    flat_t = {tuple(str(k.key) for k in path): leaf
              for path, leaf in jax.tree_util.tree_leaves_with_path(variables)}
    missing = [p for p in flat_t if p not in dst]
    if missing:
        raise TorchImportError(
            f"torch checkpoint did not cover {len(missing)} target leaves, "
            f"e.g. {sorted(missing)[:6]}; source keys left: {sorted(sd)[:6]}")
    out = {}
    for path, arr in dst.items():
        if path not in flat_t:
            raise TorchImportError(
                f"converted leaf {path} does not exist in the target model "
                f"(template has e.g. {sorted(flat_t)[:4]})")
        want = flat_t[path]
        if tuple(arr.shape) != tuple(want.shape):
            raise TorchImportError(
                f"shape mismatch at {path}: torch {tuple(arr.shape)} vs "
                f"model {tuple(want.shape)}")
        out[path] = arr.astype(np.asarray(want).dtype)
    unused.extend(sorted(sd))

    def rebuild(path, leaf):
        return out[tuple(str(k.key) for k in path)]

    return (jax.tree_util.tree_map_with_path(rebuild, variables),
            sorted(unused))


def load_torch_checkpoint(path: str, cfg: Config, variables):
    """torch.load a reference ``checkpoint.pth`` and convert it.
    Returns (variables, unused_keys)."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_state_dict(sd, cfg, variables)


def load_into_state(state, cfg: Config, path: str):
    """Import a checkpoint.pth into a Trainer state (classification and
    regression experiments share this; the regression model is the same SBM
    with num_class = nbins, reference exp_regression.py:95-102).
    Returns (new_state, unused_source_keys)."""
    import jax
    template = {"params": jax.device_get(state.params),
                "batch_stats": jax.device_get(state.batch_stats)}
    new_vars, unused = load_torch_checkpoint(path, cfg, template)
    return state.replace(
        params=jax.device_put(new_vars["params"]),
        batch_stats=jax.device_put(new_vars.get("batch_stats", {}))), unused
