"""Round-trip tests for the reference-checkpoint importer
(sie_tpu/compat/torch_import.py).

Source state_dicts are built with torch modules laid out EXACTLY like the
reference models (attribute names per reference model/*.py — the same key
layout `EarlyStopping.save_checkpoint` writes, reference utils/tools.py:34-38).
Where a reference-faithful torch forward exists (parity/torch_reference.py),
the converted sie_tpu model must reproduce its logits; for the remaining
models the conversion must cover every target leaf (convert_state_dict raises
otherwise) and the imported model must run to finite outputs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
tn = torch.nn

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sie_tpu.compat.torch_import import (  # noqa: E402
    TorchImportError,
    convert_state_dict,
)
from sie_tpu.config import Config  # noqa: E402
from sie_tpu.models import build_model  # noqa: E402
from sie_tpu.models.sbm import bank_lengths  # noqa: E402
from sie_tpu.parity.torch_reference import (  # noqa: E402
    TorchInterpGN,
    TorchSBM,
    TorchTransformer,
)

BASE = dict(data="UEA", seq_len=30, enc_in=3, num_class=3, num_shapelet=2,
            shapelet_lengths=(0.1, 0.3), dropout=0.0, amp=False,
            use_pallas=False, seed=0)


def _init(cfg, x):
    model = build_model(cfg)
    variables = model.init(jax.random.key(0), jnp.asarray(x), None,
                           train=False)
    return model, variables


def _rename(sd, pairs):
    out = {}
    for k, v in sd.items():
        for old, new in pairs:
            if k.startswith(old):
                k = new + k[len(old):]
                break
        out[k] = v
    return out


def _apply(model, variables, x):
    out = model.apply(variables, jnp.asarray(x), None, train=False)
    return np.asarray(out[0] if isinstance(out, tuple) else out)


# ------------------------------------------------------- numeric round-trips

def test_sbm_linear_matches_torch_forward(rng):
    cfg = Config(model="SBM", **BASE)
    x = rng.normal(size=(4, cfg.seq_len, cfg.enc_in)).astype(np.float32)
    tm = TorchSBM(cfg).eval()
    # parity module attr `banks` <-> reference attr `shapelets`
    sd = _rename(tm.state_dict(), [("banks.", "shapelets.")])
    model, variables = _init(cfg, x)
    new_vars, unused = convert_state_dict(sd, cfg, variables)
    assert unused == []
    got = _apply(model, new_vars, x)
    want = tm(torch.tensor(x))[0].detach().numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_interpgn_fcn_matches_torch_forward(rng):
    cfg = Config(model="InterpGN", dnn_type="FCN", **BASE)
    x = rng.normal(size=(4, cfg.seq_len, cfg.enc_in)).astype(np.float32)
    tm = TorchInterpGN(cfg)
    # make the BN running stats non-trivial before exporting
    with torch.no_grad():
        for _ in range(3):
            tm(torch.tensor(rng.normal(
                size=x.shape).astype(np.float32)))
    tm.eval()
    sd = _rename(tm.state_dict(),
                 [("sbm.banks.", "sbm.shapelets.")]
                 + [(f"deep_model.blocks.{i}.", f"deep_model.block{i + 1}.")
                    for i in range(3)])
    model, variables = _init(cfg, x)
    new_vars, unused = convert_state_dict(sd, cfg, variables)
    assert unused == []
    got = _apply(model, new_vars, x)
    want = tm(torch.tensor(x))[0].detach().numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def _transformer_cfg(**kw):
    return Config(model="DNN", dnn_type="Transformer", d_model=16, n_heads=2,
                  e_layers=2, d_ff=32, activation="gelu",
                  use_fused_attention=False, **dict(BASE, seq_len=16), **kw)


def _rename_transformer(sd, prefix=""):
    pairs = [(prefix + "tokenConv.",
              prefix + "enc_embedding.value_embedding.tokenConv."),
             (prefix + "layers.", prefix + "encoder.attn_layers."),
             (prefix + "norm.", prefix + "encoder.norm."),
             (prefix + "projection.", prefix + "projection.")]
    out = _rename(sd, pairs)
    # parity attrs q/k/v/out <-> reference {query,key,value,out}_projection
    final = {}
    for k, v in out.items():
        for ours, theirs in ((".q.", ".attention.query_projection."),
                             (".k.", ".attention.key_projection."),
                             (".v.", ".attention.value_projection."),
                             (".out.", ".attention.out_projection.")):
            if ours in k and "attn_layers" in k:
                k = k.replace(ours, theirs)
                break
        final[k] = v
    return final


def test_dnn_transformer_matches_torch_forward(rng):
    cfg = _transformer_cfg()
    x = rng.normal(size=(3, cfg.seq_len, cfg.enc_in)).astype(np.float32)
    tm = TorchTransformer(cfg).eval()
    sd = _rename_transformer(tm.state_dict())
    model, variables = _init(cfg, x)
    new_vars, unused = convert_state_dict(sd, cfg, variables)
    assert unused == ["pe"]  # sinusoidal position buffer has no flax param
    got = _apply(model, new_vars, x)
    mask = torch.ones(x.shape[0], x.shape[1])
    want = tm(torch.tensor(x), mask).detach().numpy()
    # accumulation-order noise through 2 encoder layers + the (T*d_model)
    # flatten head; observed max |delta| ~1.4e-4
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=4e-4)


def test_dataparallel_module_prefix_is_stripped(rng):
    cfg = Config(model="SBM", **BASE)
    x = rng.normal(size=(2, cfg.seq_len, cfg.enc_in)).astype(np.float32)
    tm = TorchSBM(cfg).eval()
    sd = {"module." + k: v
          for k, v in _rename(tm.state_dict(),
                              [("banks.", "shapelets.")]).items()}
    model, variables = _init(cfg, x)
    new_vars, _ = convert_state_dict(sd, cfg, variables)
    np.testing.assert_allclose(_apply(model, new_vars, x),
                               tm(torch.tensor(x))[0].detach().numpy(),
                               rtol=2e-4, atol=1e-5)


# --------------------------------------- reference-layout source state_dicts

class _RefEncoder(tn.Module):
    """Key-layout twin of the reference Encoder stack
    (Transformer_EncDec.py:27-80 + SelfAttention_Family.py:179-213)."""

    def __init__(self, d_model, d_ff, e_layers):
        super().__init__()
        layers = []
        for _ in range(e_layers):
            layer = tn.Module()
            att = tn.Module()
            for name in ("query", "key", "value", "out"):
                setattr(att, f"{name}_projection", tn.Linear(d_model, d_model))
            layer.attention = att
            layer.conv1 = tn.Conv1d(d_model, d_ff, 1)
            layer.conv2 = tn.Conv1d(d_ff, d_model, 1)
            layer.norm1 = tn.LayerNorm(d_model)
            layer.norm2 = tn.LayerNorm(d_model)
            layers.append(layer)
        self.attn_layers = tn.ModuleList(layers)
        self.norm = tn.LayerNorm(d_model)


class _RefBasicBlock(tn.Module):
    """(reference model/ResNet.py:6-41)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = tn.Conv1d(cin, cout, 3, padding=1, bias=False)
        self.bn1 = tn.BatchNorm1d(cout)
        self.conv2 = tn.Conv1d(cout, cout, 3, padding=1, bias=False)
        self.bn2 = tn.BatchNorm1d(cout)
        if cin != cout:
            self.shortcut = tn.Sequential(tn.Conv1d(cin, cout, 1, bias=False),
                                          tn.BatchNorm1d(cout))


class _RefResNet(tn.Module):
    """(reference model/ResNet.py:43-83)."""

    def __init__(self, cfg):
        super().__init__()
        self.conv1 = tn.Conv1d(cfg.enc_in, 64, 7, 2, 3, bias=False)
        self.bn1 = tn.BatchNorm1d(64)
        self.layer1 = tn.Sequential(_RefBasicBlock(64, 64))
        self.layer2 = tn.Sequential(_RefBasicBlock(64, 128))
        self.layer3 = tn.Sequential(_RefBasicBlock(128, 128))
        self.fc = tn.Linear(128, cfg.num_class)


class _RefInception(tn.Module):
    """(reference layers/Conv_Blocks.py:5-30)."""

    def __init__(self, cin, cout, num_kernels):
        super().__init__()
        self.kernels = tn.ModuleList(
            tn.Conv2d(cin, cout, 2 * i + 1, padding=i)
            for i in range(num_kernels))


def _ref_data_embedding(enc_in, d_model):
    """tokenConv + (unreachable) temporal embedding (layers/Embed.py:109-130)."""
    emb = tn.Module()
    emb.value_embedding = tn.Module()
    emb.value_embedding.tokenConv = tn.Conv1d(
        enc_in, d_model, 3, padding=1, padding_mode="circular", bias=False)
    emb.temporal_embedding = tn.Module()
    emb.temporal_embedding.embed = tn.Linear(4, d_model, bias=False)
    return emb


class _RefTimesNet(tn.Module):
    """(reference model/TimesNet.py:21-105)."""

    def __init__(self, cfg):
        super().__init__()
        self.enc_embedding = _ref_data_embedding(cfg.enc_in, cfg.d_model)
        blocks = []
        for _ in range(cfg.e_layers):
            blk = tn.Module()
            blk.conv = tn.Sequential(
                _RefInception(cfg.d_model, cfg.d_ff, cfg.num_kernels),
                tn.GELU(),
                _RefInception(cfg.d_ff, cfg.d_model, cfg.num_kernels))
            blocks.append(blk)
        self.model = tn.ModuleList(blocks)
        self.layer_norm = tn.LayerNorm(cfg.d_model)
        self.projection = tn.Linear(cfg.seq_len * cfg.d_model, cfg.num_class)


class _RefPatchTST(tn.Module):
    """(reference model/PatchTST.py:34-77: patch_len 16, stride 8)."""

    def __init__(self, cfg):
        super().__init__()
        patch_num = (cfg.seq_len + 8 - 16) // 8 + 1
        self.patch_embedding = tn.Module()
        self.patch_embedding.value_embedding = tn.Linear(16, cfg.d_model,
                                                         bias=False)
        self.encoder = _RefEncoder(cfg.d_model, cfg.d_ff, cfg.e_layers)
        self.projection = tn.Linear(cfg.enc_in * patch_num * cfg.d_model,
                                    cfg.num_class)


class _RefEEGcnn(tn.Module):
    """(reference model/eegcnn.py:30-108)."""

    def __init__(self, cfg):
        super().__init__()
        f1, d = cfg.eegcnn_cnn_f1, cfg.eegcnn_cnn_f2
        f2 = f1 * d
        self.block1_conv1 = tn.Conv2d(1, f1, (1, cfg.eegcnn_kernel1),
                                      padding="same", bias=False)
        self.block1_bn1 = tn.BatchNorm2d(f1)
        self.block1_depthwise = tn.Conv2d(f1, d * f1, (cfg.enc_in, 1),
                                          groups=f1, bias=False)
        self.block1_bn2 = tn.BatchNorm2d(d * f1)
        self.block2_conv1 = tn.Conv2d(d * f1, d * f1,
                                      (1, cfg.eegcnn_kernel2),
                                      padding="same", groups=d * f1,
                                      bias=False)
        self.block2_conv2 = tn.Conv2d(d * f1, f2, 1, bias=False)
        self.block2_bn = tn.BatchNorm2d(f2)


class _RefEEGCNNTransformer(tn.Module):
    """(reference model/eegcnn.py:111-247)."""

    def __init__(self, cfg):
        super().__init__()
        self.eegcnn = _RefEEGcnn(cfg)
        f2 = cfg.eegcnn_cnn_f1 * cfg.eegcnn_cnn_f2
        if cfg.d_model != f2:
            self.cnn_projection = tn.Linear(f2, cfg.d_model)
        layer = tn.TransformerEncoderLayer(cfg.d_model, cfg.eegcnn_n_heads,
                                           cfg.eegcnn_d_ff, batch_first=True)
        self.transformer_encoder = tn.TransformerEncoder(layer,
                                                         cfg.eegcnn_layers)
        self.classifier = tn.Linear(cfg.d_model, cfg.num_class)


# ------------------------------------------------ structural coverage + runs

def _roundtrip(cfg, sd, rng, expect_unused=(), ret_xy=False):
    x = rng.normal(size=(2, cfg.seq_len, cfg.enc_in)).astype(np.float32)
    model, variables = _init(cfg, x)
    new_vars, unused = convert_state_dict(sd, cfg, variables)
    assert unused == sorted(expect_unused)
    out = _apply(model, new_vars, x)
    assert out.shape == (2, cfg.num_class)
    assert np.all(np.isfinite(out))
    return (new_vars, x, out) if ret_xy else new_vars


def _torch_resnet_forward(tm, x_np):
    """(reference model/ResNet.py:68-81; the rearrange is a label swap, so
    the conv runs over time with EEG channels as conv channels)."""
    import torch.nn.functional as F
    h = torch.as_tensor(x_np).transpose(1, 2)                # (B, C, T)
    h = F.max_pool1d(F.relu(tm.bn1(tm.conv1(h))), 3, 2, 1)
    for layer in (tm.layer1, tm.layer2, tm.layer3):
        blk = layer[0]
        identity = blk.shortcut(h) if hasattr(blk, "shortcut") else h
        y = blk.bn2(blk.conv2(F.relu(blk.bn1(blk.conv1(h)))))
        h = F.relu(y + identity)
    return tm.fc(h.mean(-1))


@pytest.mark.parametrize("t", [32, 31])   # even + odd stride-2 alignment
def test_resnet_import_matches_torch_forward(rng, t):
    cfg = Config(model="DNN", dnn_type="ResNet", **dict(BASE, seq_len=t))
    tm = _RefResNet(cfg)
    x = rng.normal(size=(3, t, cfg.enc_in)).astype(np.float32)
    with torch.no_grad():                    # warm the BN running stats
        for _ in range(3):
            _torch_resnet_forward(tm, rng.normal(
                size=x.shape).astype(np.float32))
    tm.eval()
    new_vars = _roundtrip(cfg, tm.state_dict(), rng)
    model = build_model(cfg)
    got = _apply(model, new_vars, x)
    with torch.no_grad():
        want = _torch_resnet_forward(tm, x).numpy()
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


def _ref_encoder_layer_forward(layer, x, n_heads, activation="gelu"):
    """Post-norm attention + conv1d FFN on the key-layout twin (reference
    Transformer_EncDec.py:27-51 + SelfAttention_Family.py:48-75,179-213)."""
    import math
    import torch.nn.functional as F
    b, t, dm = x.shape
    dk = dm // n_heads
    att = layer.attention
    split = lambda z: z.view(b, t, n_heads, dk)
    scores = torch.einsum("blhe,bshe->bhls", split(att.query_projection(x)),
                          split(att.key_projection(x)))
    a = torch.softmax(scores / math.sqrt(dk), dim=-1)
    o = torch.einsum("bhls,bshd->blhd", a,
                     split(att.value_projection(x))).reshape(b, t, dm)
    x = x + att.out_projection(o)
    y = x = layer.norm1(x)
    act = F.relu if activation == "relu" else F.gelu
    y = act(layer.conv1(y.transpose(-1, 1)))
    y = layer.conv2(y).transpose(-1, 1)
    return layer.norm2(x + y)


def _torch_patchtst_forward(tm, cfg, x_np):
    """(reference model/PatchTST.py:180-207 + layers/Embed.py:163-190)."""
    import torch.nn.functional as F
    from sie_tpu.models.layers import sinusoidal_embedding
    x = torch.as_tensor(x_np)
    x = x - x.mean(1, keepdim=True)
    x = x / torch.sqrt(torch.var(x, dim=1, keepdim=True, unbiased=False)
                       + 1e-5)
    x = x.permute(0, 2, 1)                             # (B, C, T)
    patches = F.pad(x, (0, 8), mode="replicate").unfold(-1, 16, 8)
    b, c, p, _ = patches.shape
    h = tm.patch_embedding.value_embedding(patches.reshape(b * c, p, 16))
    pe = np.asarray(sinusoidal_embedding(p, h.shape[-1]), np.float32)
    h = h + torch.as_tensor(pe)[None]
    for layer in tm.encoder.attn_layers:
        h = _ref_encoder_layer_forward(layer, h, cfg.n_heads, cfg.activation)
    h = tm.encoder.norm(h)
    h = h.reshape(b, c, p, -1).permute(0, 1, 3, 2).reshape(b, -1)
    return tm.projection(h)


def test_patchtst_import_matches_torch_forward(rng):
    cfg = Config(model="DNN", dnn_type="PatchTST", d_model=16, n_heads=2,
                 e_layers=1, d_ff=32, use_fused_attention=False,
                 **dict(BASE, seq_len=16))
    tm = _RefPatchTST(cfg).eval()
    x = rng.normal(size=(3, cfg.seq_len, cfg.enc_in)).astype(np.float32)
    new_vars = _roundtrip(cfg, tm.state_dict(), rng)
    model = build_model(cfg)
    got = _apply(model, new_vars, x)
    with torch.no_grad():
        want = _torch_patchtst_forward(tm, cfg, x).numpy()
    # same accumulation-order sensitivity as the Transformer's flatten head
    # (one observed order-dependent run exceeded 3e-4)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=4e-4)


def _torch_eegcnn_forward(tm, cfg, x_np):
    """Intended-semantics EEGCNN forward on the reference-layout twin
    (reference model/eegcnn.py:67-108,219-247 with the transposition and
    mask-pooling bugs fixed like sie_tpu/models/eegcnn.py; mean pooling)."""
    import torch.nn.functional as F
    from sie_tpu.models.layers import sinusoidal_embedding
    m = tm.eegcnn
    h = torch.as_tensor(x_np).transpose(1, 2).unsqueeze(1)   # (B, 1, C, T)
    h = m.block1_bn1(m.block1_conv1(h))
    h = F.elu(m.block1_bn2(m.block1_depthwise(h)))
    h = F.avg_pool2d(h, (1, cfg.eegcnn_pool1))
    h = F.elu(m.block2_bn(m.block2_conv2(m.block2_conv1(h))))
    h = F.avg_pool2d(h, (1, cfg.eegcnn_pool2))
    h = h.squeeze(2).transpose(1, 2)                         # (B, T_red, F2)
    h = tm.cnn_projection(h)
    pe = np.asarray(sinusoidal_embedding(h.shape[1], h.shape[2]), np.float32)
    h = tm.transformer_encoder(h + torch.as_tensor(pe)[None])
    return tm.classifier(h.mean(dim=1))


def test_eegcnn_import_matches_torch_forward(rng):
    cfg = Config(model="EEGCNN", d_model=16, eegcnn_layers=1,
                 eegcnn_cnn_f1=4, eegcnn_cnn_f2=2, eegcnn_kernel1=7,
                 eegcnn_kernel2=5, eegcnn_pool1=2, eegcnn_pool2=2,
                 eegcnn_n_heads=2, eegcnn_d_ff=32, eegcnn_dropout1=0.0,
                 eegcnn_dropout2=0.0, **dict(BASE, seq_len=40, enc_in=6))
    tm = _RefEEGCNNTransformer(cfg)
    x = rng.normal(size=(3, cfg.seq_len, cfg.enc_in)).astype(np.float32)
    with torch.no_grad():                    # warm the BN running stats
        for _ in range(3):
            _torch_eegcnn_forward(tm, cfg, rng.normal(
                size=x.shape).astype(np.float32))
    tm.eval()
    new_vars = _roundtrip(cfg, tm.state_dict(), rng)
    model = build_model(cfg)
    got = _apply(model, new_vars, x)
    with torch.no_grad():
        want = _torch_eegcnn_forward(tm, cfg, x).numpy()
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


def _torch_predicates(sd, cfg, x_np):
    """SBM/LTS predicate vector in torch from reference-layout arrays
    (reference Shapelet.py:46-114; eval: STE max/min equals plain max/min,
    and max of exp(-(eps d)^2) is exp(-(eps min_d)^2))."""
    x = torch.as_tensor(x_np).transpose(1, 2)
    x = (x - x.mean(-1, keepdim=True)) / (x.std(-1, keepdim=True) + 1e-8)
    ps = []
    for i, l in enumerate(bank_lengths(cfg)):
        w = torch.as_tensor(np.array(sd[f"shapelets.{i}.weights"]))
        win = x.unfold(2, l, 1).permute(0, 2, 1, 3).unsqueeze(2)
        min_d = (win - w).abs().mean(-1).min(1).values       # (B, n, C)
        thr_key = f"shapelets.{i}.threshold"
        if thr_key in sd:                                    # LTS
            thr = torch.as_tensor(np.array(sd[thr_key]))[0]
            p = torch.sigmoid(thr - min_d)
        else:
            p = torch.exp(-(cfg.epsilon * min_d) ** 2)
        ps.append(p.flatten(1))
    return torch.cat(ps, -1)


def test_lts_and_nonlinear_sbm_heads_match_torch_math(rng):
    import torch.nn.functional as F
    base = dict(BASE)
    # LTS: per-bank (1, n, C) thresholds (reference Shapelet.py:90-114)
    cfg = Config(model="LTS", **base)
    nums = cfg.num_shapelets_per_bank
    c = cfg.enc_in
    total = sum(n * c for n in nums)
    sd = {"output_layer.weight":
          rng.normal(size=(cfg.num_class, total)).astype(np.float32)}
    for i, l in enumerate(bank_lengths(cfg)):
        sd[f"shapelets.{i}.weights"] = rng.normal(
            size=(nums[i], c, l)).astype(np.float32)
        sd[f"shapelets.{i}.threshold"] = rng.uniform(
            size=(1, nums[i], c)).astype(np.float32)
    _, x, got = _roundtrip(cfg, sd, rng, ret_xy=True)
    wl = torch.as_tensor(sd["output_layer.weight"])
    with torch.no_grad():
        p = _torch_predicates(sd, cfg, x)
        np.testing.assert_allclose(got, (p @ wl.T).numpy(),
                                   rtol=2e-4, atol=1e-5)

    # bilinear head: linear + nn.Bilinear(total, total, C, bias=False)
    # (reference Shapelet.py:172-174,201-202)
    cfg = Config(model="SBM", sbm_cls="bilinear", **base)
    sd_b = {k: v for k, v in sd.items() if "threshold" not in k}
    sd_b["output_bilinear.weight"] = rng.normal(
        size=(cfg.num_class, total, total)).astype(np.float32) * 0.01
    _, x, got = _roundtrip(cfg, sd_b, rng, ret_xy=True)
    with torch.no_grad():
        p = _torch_predicates(sd_b, cfg, x)
        want = p @ wl.T + torch.einsum(
            "bi,kij,bj->bk", p,
            torch.as_tensor(sd_b["output_bilinear.weight"]), p)
        np.testing.assert_allclose(got, want.numpy(), rtol=2e-4, atol=2e-5)

    # attention head: q/k 1->16 projections + positional embedding, sdpa over
    # the predicate scalars (reference Shapelet.py:117-131)
    cfg = Config(model="SBM", sbm_cls="attention", **base)
    sd_a = {k: v for k, v in sd.items() if "threshold" not in k}
    for proj in ("q_proj", "k_proj"):
        sd_a[f"attention.{proj}.weight"] = rng.normal(
            size=(16, 1)).astype(np.float32)
        sd_a[f"attention.{proj}.bias"] = rng.normal(
            size=(16,)).astype(np.float32)
    sd_a["attention.pos_embed.weight"] = rng.normal(
        size=(total, 16)).astype(np.float32)
    _, x, got = _roundtrip(cfg, sd_a, rng, ret_xy=True)
    with torch.no_grad():
        p = _torch_predicates(sd_a, cfg, x)
        pos = torch.as_tensor(sd_a["attention.pos_embed.weight"])
        lin = lambda name: F.linear(
            p.unsqueeze(-1), torch.as_tensor(sd_a[f"attention.{name}.weight"]),
            torch.as_tensor(sd_a[f"attention.{name}.bias"])) + pos
        att = F.scaled_dot_product_attention(
            lin("q_proj"), lin("k_proj"), p.unsqueeze(-1)).squeeze(-1)
        np.testing.assert_allclose(got, (att @ wl.T).numpy(),
                                   rtol=2e-4, atol=2e-5)


def _torch_inception(block, img):
    """mean over the parallel odd-kernel Conv2d branches
    (reference layers/Conv_Blocks.py:5-30)."""
    return sum(k(img) for k in block.kernels) / len(block.kernels)


def _torch_times_block(blk, cfg, x):
    """(reference model/TimesNet.py:36-68: data-dependent period fold)."""
    import torch.nn.functional as F
    b, t, n = x.shape
    xf = torch.fft.rfft(x, dim=1)
    fl = xf.abs().mean(0).mean(-1)
    fl[0] = 0
    _, top = torch.topk(fl, cfg.top_k)
    periods = t // top.numpy()
    weight = xf.abs().mean(-1)[:, top]
    res = []
    for i in range(cfg.top_k):
        p = int(periods[i])
        rows = -(-t // p)
        out = torch.cat([x, torch.zeros(b, rows * p - t, n)], dim=1)
        img = out.reshape(b, rows, p, n).permute(0, 3, 1, 2)
        img = _torch_inception(blk.conv[2], F.gelu(_torch_inception(
            blk.conv[0], img)))
        res.append(img.permute(0, 2, 3, 1).reshape(b, -1, n)[:, :t])
    stacked = torch.stack(res, dim=-1)
    w = torch.softmax(weight, dim=1)
    return (stacked * w[:, None, None, :]).sum(-1) + x


def _torch_timesnet_forward(tm, cfg, x_np):
    """(reference model/TimesNet.py:70-105,188-204, classification path)."""
    import torch.nn.functional as F
    from sie_tpu.models.layers import sinusoidal_embedding
    x = torch.as_tensor(x_np)
    h = tm.enc_embedding.value_embedding.tokenConv(
        x.permute(0, 2, 1)).transpose(1, 2)
    pe = np.asarray(sinusoidal_embedding(h.shape[1], h.shape[2]), np.float32)
    h = h + torch.as_tensor(pe)[None]
    for blk in tm.model:
        h = tm.layer_norm(_torch_times_block(blk, cfg, h))
    h = F.gelu(h)
    return tm.projection(h.reshape(h.shape[0], -1))


def test_timesnet_import_matches_torch_forward(rng):
    """Identical weights through the importer: the shape-static shifted-matmul
    period fold must reproduce the reference's data-dependent reshape + 2D
    Inception conv, end to end."""
    cfg = Config(model="DNN", dnn_type="TimesNet", d_model=8, d_ff=12,
                 e_layers=2, num_kernels=2, top_k=2,
                 **dict(BASE, seq_len=12))
    tm = _RefTimesNet(cfg).eval()
    x = rng.normal(size=(3, cfg.seq_len, cfg.enc_in)).astype(np.float32)
    new_vars = _roundtrip(
        cfg, tm.state_dict(), rng,
        expect_unused=["enc_embedding.temporal_embedding.embed.weight"])
    model = build_model(cfg)
    got = _apply(model, new_vars, x)
    with torch.no_grad():
        want = _torch_timesnet_forward(tm, cfg, x).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=4e-4)


def test_timesnet_conversion_and_inception_repack(rng):
    cfg = Config(model="DNN", dnn_type="TimesNet", d_model=8, d_ff=12,
                 e_layers=1, num_kernels=2, top_k=2,
                 **dict(BASE, seq_len=12))
    twin = _RefTimesNet(cfg)
    new_vars = _roundtrip(
        cfg, twin.state_dict(), rng,
        expect_unused=["enc_embedding.temporal_embedding.embed.weight"])

    # the repacked tap table must reproduce the torch Inception block:
    # fold a short series into a (rows, period) image and compare
    # mean-of-branch-Conv2d against InceptionConvSeq with imported params
    from sie_tpu.models.timesnet import InceptionConvSeq
    conv1 = new_vars["params"]["backbone"]["block_0"]["conv1"]
    period, t = 3, cfg.seq_len
    rows = -(-t // period)
    canvas_len = rows * period
    x = rng.normal(size=(2, t, cfg.d_model)).astype(np.float32)
    canvas = jnp.concatenate(
        [jnp.asarray(x), jnp.zeros((2, canvas_len - t, cfg.d_model))], axis=1)
    mod = InceptionConvSeq(cfg.d_model, cfg.d_ff, cfg.num_kernels)
    got = np.asarray(mod.apply({"params": conv1}, canvas, period,
                               canvas_len))[:, :t]

    xp = np.concatenate([x, np.zeros((2, canvas_len - t, cfg.d_model),
                                     np.float32)], axis=1)
    img = torch.tensor(xp.reshape(2, rows, period, cfg.d_model)
                       .transpose(0, 3, 1, 2))
    with torch.no_grad():
        out_img = sum(k(img) for k in twin.model[0].conv[0].kernels)
    out_img = (out_img / cfg.num_kernels).numpy()
    want = out_img.transpose(0, 2, 3, 1).reshape(2, canvas_len,
                                                 cfg.d_ff)[:, :t]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


# ----------------------------------------------------------------- CLI e2e

@pytest.mark.slow
def test_cli_import_torch_checkpoint_reproduces_accuracy(tmp_path):
    """checkpoint.pth -> `run.py --import_torch_ckpt` -> the reported test
    accuracy equals the torch model's own eval accuracy on the same split."""
    import run as run_cli
    from sie_tpu.data.synthetic import write_synthetic_uea
    from sie_tpu.train.experiment import Experiment

    write_synthetic_uea(str(tmp_path), "Toy", n_train=24, n_test=12,
                        n_dims=2, length=30, n_classes=2, seed=1)
    flags = ["--data", "UEA", "--data_root", str(tmp_path),
             "--dataset", "Toy", "--model", "SBM", "--num_shapelet", "2",
             "--batch_size", "8", "--seed", "0", "--no-amp", "--no_pallas",
             "--checkpoint_dir", str(tmp_path / "ckpt"),
             "--result_dir", str(tmp_path / "result"),
             "--cache_dir", str(tmp_path / "cache")]
    cfg0 = run_cli.args_to_config(run_cli.get_args(flags), seed=0)
    exp = Experiment(cfg0)          # for the data-derived cfg + test split
    torch.manual_seed(0)
    tm = TorchSBM(exp.cfg).eval()
    pth = tmp_path / "checkpoint.pth"
    torch.save(_rename(tm.state_dict(), [("banks.", "shapelets.")]), str(pth))

    out_pth = tmp_path / "exported.pth"
    results = run_cli.main(flags + ["--import_torch_ckpt", str(pth),
                                    "--export_torch_ckpt", str(out_pth)])
    _, _, metrics = results[0]

    with torch.no_grad():
        logits, _ = tm(torch.tensor(np.asarray(exp.test_data.x, np.float32)))
    want = 100.0 * float((logits.argmax(-1).numpy()
                          == np.asarray(exp.test_data.y)).mean())
    assert metrics["accuracy"] == pytest.approx(want, abs=1e-6)

    # import -> export must reproduce the original torch weights bitwise
    back = torch.load(str(out_pth), map_location="cpu", weights_only=True)
    sd = torch.load(str(pth), map_location="cpu", weights_only=True)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k].numpy(), sd[k].numpy(),
                                      err_msg=k)


# ------------------------------------------------- export (inverse) direction

def _roundtrip_export(cfg, rng):
    """export -> import must reproduce every leaf bitwise (certifies the
    exporter against the numerics-tested importer)."""
    from sie_tpu.compat.torch_export import export_state_dict
    x = rng.normal(size=(2, cfg.seq_len, cfg.enc_in)).astype(np.float32)
    _, variables = _init(cfg, x)
    sd = export_state_dict(variables, cfg)
    new_vars, unused = convert_state_dict(sd, cfg, variables)
    assert unused == []
    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = {tuple(str(k.key) for k in p): l for p, l in
              jax.tree_util.tree_leaves_with_path(new_vars)}
    for path, leaf in flat_a:
        key = tuple(str(k.key) for k in path)
        np.testing.assert_array_equal(np.asarray(leaf), flat_b[key],
                                      err_msg=str(key))


@pytest.mark.parametrize("kind", [
    dict(model="SBM"),
    dict(model="SBM", sbm_cls="bilinear"),
    dict(model="SBM", sbm_cls="attention"),
    dict(model="LTS"),
    dict(model="InterpGN", dnn_type="FCN"),
    dict(model="DNN", dnn_type="ResNet"),
    dict(model="EEGCNN"),
])
def test_export_import_roundtrip_is_bitwise(rng, kind):
    over = dict(BASE)
    if kind["model"] == "EEGCNN":
        over.update(seq_len=40, enc_in=6)
        kind = dict(kind, d_model=16, eegcnn_layers=1, eegcnn_cnn_f1=4,
                    eegcnn_cnn_f2=2, eegcnn_kernel1=7, eegcnn_kernel2=5,
                    eegcnn_pool1=2, eegcnn_pool2=2, eegcnn_n_heads=2,
                    eegcnn_d_ff=32)
    _roundtrip_export(Config(**kind, **over), rng)


@pytest.mark.parametrize("dnn", ["Transformer", "TimesNet", "PatchTST"])
def test_export_import_roundtrip_encoder_backbones(rng, dnn):
    kw = dict(d_model=16, n_heads=2, e_layers=2, d_ff=32,
              use_fused_attention=False)
    if dnn == "TimesNet":
        kw.update(d_ff=12, e_layers=1, num_kernels=2, top_k=2)
    _roundtrip_export(Config(model="DNN", dnn_type=dnn, **kw,
                             **dict(BASE, seq_len=16)), rng)


def test_exported_sbm_loads_into_torch_and_matches(rng):
    from sie_tpu.compat.torch_export import export_state_dict
    cfg = Config(model="SBM", **BASE)
    x = rng.normal(size=(4, cfg.seq_len, cfg.enc_in)).astype(np.float32)
    model, variables = _init(cfg, x)
    sd = export_state_dict(variables, cfg)
    tm = TorchSBM(cfg)
    tm.load_state_dict({k.replace("shapelets.", "banks."): torch.from_numpy(
        np.array(v)) for k, v in sd.items()}, strict=True)
    tm.eval()
    np.testing.assert_allclose(_apply(model, variables, x),
                               tm(torch.tensor(x))[0].detach().numpy(),
                               rtol=2e-4, atol=1e-5)


def test_exporter_rejects_unconsumed_leaves(rng):
    from sie_tpu.compat.torch_export import (TorchExportError,
                                             export_state_dict)
    cfg = Config(model="SBM", **BASE)
    x = rng.normal(size=(2, cfg.seq_len, cfg.enc_in)).astype(np.float32)
    _, variables = _init(cfg, x)
    variables = dict(variables)
    variables["params"] = dict(variables["params"],
                               rogue=np.zeros((2, 2), np.float32))
    with pytest.raises(TorchExportError, match="did not consume"):
        export_state_dict(variables, cfg)


@pytest.mark.slow
def test_regression_import_matches_torch_logits(tmp_path):
    """Reference regression checkpoints are the same SBM with num_class=nbins
    (reference exp_regression.py:95-102): import one into the
    RegressionExperiment and match the torch forward on the test split."""
    from sie_tpu.data.synthetic import write_synthetic_monash
    from sie_tpu.train.regression import RegressionExperiment, subsample_batch

    write_synthetic_monash(str(tmp_path), "ToyReg", n_train=16, n_test=8,
                           n_dims=2, length=30, seed=3)
    cfg = Config(data="Monash", dataset="ToyReg", task_name="regression",
                 data_root=str(tmp_path), model="SBM", num_shapelet=2,
                 shapelet_lengths=(0.1, 0.3), dropout=0.0, amp=False,
                 use_pallas=False, seed=0, batch_size=8,
                 checkpoint_dir=str(tmp_path / "ckpt"),
                 result_dir=str(tmp_path / "result"))
    exp = RegressionExperiment(cfg, verbose=False)
    torch.manual_seed(2)
    tm = TorchSBM(exp.cfg).eval()   # exp.cfg has num_class = nbins
    pth = tmp_path / "checkpoint.pth"
    torch.save(_rename(tm.state_dict(), [("banks.", "shapelets.")]), str(pth))
    unused = exp.load_torch_checkpoint(str(pth))
    assert unused == []

    xs = subsample_batch(np.asarray(exp.test_data.x, np.float32))
    got = np.asarray(exp.state.apply_fn(
        {"params": exp.state.params}, jnp.asarray(xs), None,
        train=False)[0])
    want = tm(torch.tensor(xs))[0].detach().numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)

    loss, _, _ = exp.test(save_csv=False)
    assert np.isfinite(loss)


# ------------------------------------------------------------------- errors

def test_missing_and_mismatched_keys_raise(rng):
    cfg = Config(model="SBM", **BASE)
    tm = TorchSBM(cfg)
    sd = _rename(tm.state_dict(), [("banks.", "shapelets.")])
    x = rng.normal(size=(2, cfg.seq_len, cfg.enc_in)).astype(np.float32)
    _, variables = _init(cfg, x)

    incomplete = {k: v for k, v in sd.items() if k != "output_layer.weight"}
    with pytest.raises((TorchImportError, KeyError)):
        convert_state_dict(incomplete, cfg, variables)

    wrong = dict(sd)
    wrong["shapelets.0.weights"] = torch.zeros(1, 2, 3)
    with pytest.raises(TorchImportError, match="shape mismatch"):
        convert_state_dict(wrong, cfg, variables)
