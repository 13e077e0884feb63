"""Reference-faithful PyTorch backbones for the convergence-parity harness
(VERDICT r3 item 1): ResNet, TimesNet, PatchTST as standalone DNNs and as
InterpGN experts, plus the bilinear / attention SBM classifier heads.

Like `torch_reference.py`, these are verification yardsticks only — never part
of the TPU compute path — and are independent rewrites of the reference's live
semantics, cited per component:

- ResNet: stem Conv1d(7, stride 2, pad 3) + BN + ReLU + MaxPool(3, 2, 1),
  three BasicBlocks (64/128/128, all stride 1), adaptive avg pool, fc
                                    (reference model/ResNet.py:43-83)
- TimesNet: FFT top-k period fold + Inception_Block_V1 conv stacks, shared
  LayerNorm after every block, gelu/dropout/mask/flatten/Linear head
                                    (model/TimesNet.py:9-223,
                                     layers/Conv_Blocks.py:5-30)
- PatchTST: NS-normalize (detached stats, biased var + 1e-5), channel-
  independent PatchEmbedding (len 16 / stride 8 / ReplicationPad1d(0, 8),
  bias-free value Linear + sinusoidal PE), shared post-norm encoder with a
  final LayerNorm, permute-to-(B,C,D,P) flatten head
                                    (model/PatchTST.py:23-77,181-208,
                                     layers/Embed.py:165-190)
- SBM heads: bilinear = bias-free Linear + bias-free nn.Bilinear over
  independently-dropped predicates; attention = scalar self-attention with
  q/k Linear(1,16) + nn.Embedding positional table, then the linear head
                                    (model/Shapelet.py:117-131,170-178,199-205)
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from sie_tpu.config import Config


def _sinusoidal_pe(n: int, d_model: int) -> torch.Tensor:
    """Sinusoidal positional table (n, d_model) — reference layers/Embed.py:8-19."""
    pe = torch.zeros(n, d_model)
    pos = torch.arange(n).float().unsqueeze(1)
    div = (torch.arange(0, d_model, 2).float()
           * -(math.log(10000.0) / d_model)).exp()
    pe[:, 0::2] = torch.sin(pos * div)
    pe[:, 1::2] = torch.cos(pos * div)
    return pe


# --------------------------------------------------------------------------
# ResNet (reference model/ResNet.py:43-83)
# --------------------------------------------------------------------------

class _BasicBlock1d(nn.Module):
    def __init__(self, c_in: int, c_out: int, stride: int = 1):
        super().__init__()
        self.conv1 = nn.Conv1d(c_in, c_out, 3, stride=stride, padding=1,
                               bias=False)
        self.bn1 = nn.BatchNorm1d(c_out)
        self.conv2 = nn.Conv1d(c_out, c_out, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm1d(c_out)
        self.short = None
        if stride != 1 or c_in != c_out:
            self.short = nn.Sequential(
                nn.Conv1d(c_in, c_out, 1, stride=stride, bias=False),
                nn.BatchNorm1d(c_out))

    def forward(self, x):
        identity = x if self.short is None else self.short(x)
        h = F.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        return F.relu(h + identity)


class TorchResNet(nn.Module):
    def __init__(self, cfg: Config):
        super().__init__()
        self.conv1 = nn.Conv1d(cfg.enc_in, 64, 7, stride=2, padding=3,
                               bias=False)
        self.bn1 = nn.BatchNorm1d(64)
        self.blocks = nn.Sequential(_BasicBlock1d(64, 64),
                                    _BasicBlock1d(64, 128),
                                    _BasicBlock1d(128, 128))
        self.fc = nn.Linear(128, cfg.num_class)

    def forward(self, x, *_args, **_kw):
        # the reference's rearrange('b c t -> b t c') on a (B, T, C) input is
        # a transpose landing EEG channels on the conv-channel axis
        h = x.transpose(1, 2)
        h = F.max_pool1d(F.relu(self.bn1(self.conv1(h))), 3, 2, padding=1)
        h = self.blocks(h)
        return self.fc(F.adaptive_avg_pool1d(h, 1).flatten(1))


# --------------------------------------------------------------------------
# TimesNet (reference model/TimesNet.py + layers/Conv_Blocks.py:5-30)
# --------------------------------------------------------------------------

class _Inception2d(nn.Module):
    """Parallel odd-kernel Conv2d branches, mean-aggregated; kaiming-normal
    fan_out init, zero bias (Conv_Blocks.py:5-30)."""

    def __init__(self, c_in: int, c_out: int, num_kernels: int):
        super().__init__()
        self.kernels = nn.ModuleList(
            nn.Conv2d(c_in, c_out, 2 * i + 1, padding=i)
            for i in range(num_kernels))
        for m in self.kernels:
            nn.init.kaiming_normal_(m.weight, mode="fan_out",
                                    nonlinearity="relu")
            nn.init.constant_(m.bias, 0)

    def forward(self, x):
        return torch.stack([k(x) for k in self.kernels], -1).mean(-1)


class _TimesBlock(nn.Module):
    def __init__(self, cfg: Config):
        super().__init__()
        self.seq_len, self.k = cfg.seq_len, cfg.top_k
        self.conv = nn.Sequential(
            _Inception2d(cfg.d_model, cfg.d_ff, cfg.num_kernels),
            nn.GELU(),
            _Inception2d(cfg.d_ff, cfg.d_model, cfg.num_kernels))

    def forward(self, x):
        b, t, n = x.shape
        # FFT_for_Period (TimesNet.py:9-18): batch/channel-mean amplitude,
        # DC zeroed, top-k frequencies -> integer periods
        xf = torch.fft.rfft(x, dim=1)
        amp = xf.abs().mean(0).mean(-1)
        amp[0] = 0
        top = torch.topk(amp, self.k).indices.detach().cpu().numpy()
        periods = x.shape[1] // top
        weight = xf.abs().mean(-1)[:, top]                 # (B, k)
        outs = []
        for i in range(self.k):
            p = max(int(periods[i]), 1)
            rows = -(-self.seq_len // p)
            pad = rows * p - t
            h = F.pad(x, (0, 0, 0, pad)) if pad else x
            h = h.reshape(b, rows, p, n).permute(0, 3, 1, 2).contiguous()
            h = self.conv(h)
            h = h.permute(0, 2, 3, 1).reshape(b, -1, n)
            outs.append(h[:, :t, :])
        res = torch.stack(outs, dim=-1)                    # (B, T, N, k)
        w = F.softmax(weight, dim=1)[:, None, None, :]
        return (res * w).sum(-1) + x


class TorchTimesNet(nn.Module):
    def __init__(self, cfg: Config):
        super().__init__()
        self.cfg = cfg
        # DataEmbedding with x_mark=None: circular token conv + sinusoidal PE
        # (layers/Embed.py:22-41,109-124)
        self.tokenConv = nn.Conv1d(cfg.enc_in, cfg.d_model, 3, padding=1,
                                   padding_mode="circular", bias=False)
        nn.init.kaiming_normal_(self.tokenConv.weight, mode="fan_in",
                                nonlinearity="leaky_relu")
        self.register_buffer(
            "pe", _sinusoidal_pe(cfg.seq_len, cfg.d_model).unsqueeze(0))
        self.emb_dropout = nn.Dropout(cfg.dropout)
        self.blocks = nn.ModuleList(_TimesBlock(cfg)
                                    for _ in range(cfg.e_layers))
        self.layer_norm = nn.LayerNorm(cfg.d_model)        # SHARED across blocks
        self.dropout = nn.Dropout(cfg.dropout)
        self.projection = nn.Linear(cfg.d_model * cfg.seq_len, cfg.num_class)

    def forward(self, x, mask=None, *_args, **_kw):
        h = self.tokenConv(x.permute(0, 2, 1)).transpose(1, 2) + self.pe
        h = self.emb_dropout(h)
        for block in self.blocks:
            h = self.layer_norm(block(h))
        h = self.dropout(F.gelu(h))
        if mask is not None:
            h = h * mask.unsqueeze(-1)
        return self.projection(h.reshape(h.shape[0], -1))


# --------------------------------------------------------------------------
# PatchTST (reference model/PatchTST.py:23-77,181-208)
# --------------------------------------------------------------------------

class TorchPatchTST(nn.Module):
    patch_len, stride = 16, 8

    def __init__(self, cfg: Config):
        super().__init__()
        from sie_tpu.parity.torch_reference import _TorchEncoderLayer
        self.cfg = cfg
        self.value_embedding = nn.Linear(self.patch_len, cfg.d_model,
                                         bias=False)
        self.register_buffer("pe", _sinusoidal_pe(5000, cfg.d_model))
        self.emb_dropout = nn.Dropout(cfg.dropout)
        self.layers = nn.ModuleList(
            _TorchEncoderLayer(cfg.d_model, cfg.n_heads, cfg.d_ff,
                               cfg.dropout, cfg.activation)
            for _ in range(cfg.e_layers))
        self.norm = nn.LayerNorm(cfg.d_model)
        head_nf = cfg.d_model * int((cfg.seq_len - self.patch_len)
                                    / self.stride + 2)
        self.dropout = nn.Dropout(cfg.dropout)
        self.projection = nn.Linear(head_nf * cfg.enc_in, cfg.num_class)

    def forward(self, x, *_args, **_kw):
        b, t, c = x.shape
        # NS-normalization with detached stats (PatchTST.py:181-187)
        mean = x.mean(1, keepdim=True).detach()
        xz = x - mean
        std = torch.sqrt(torch.var(xz, dim=1, keepdim=True,
                                   unbiased=False) + 1e-5)
        xz = xz / std
        # patching (Embed.py:165-190): replication pad then unfold
        h = xz.permute(0, 2, 1)                            # (B, C, T)
        h = torch.cat([h, h[:, :, -1:].expand(-1, -1, self.stride)], -1)
        h = h.unfold(-1, self.patch_len, self.stride)      # (B, C, P, L)
        p = h.shape[2]
        h = h.reshape(b * c, p, self.patch_len)
        h = self.emb_dropout(self.value_embedding(h) + self.pe[:p])
        for layer in self.layers:
            h = layer(h)
        h = self.norm(h)
        h = h.reshape(b, c, p, -1).permute(0, 1, 3, 2)     # (B, C, D, P)
        h = self.dropout(h.flatten(-2))
        return self.projection(h.reshape(b, -1))


# --------------------------------------------------------------------------
# SBM classifier heads (reference model/Shapelet.py:117-131,170-178,199-205)
# --------------------------------------------------------------------------

class TorchPredicateAttention(nn.Module):
    """Scalar self-attention over the predicate vector: q/k = Linear(1, 16)
    projections + positional nn.Embedding, v = the raw predicate scalar,
    scaled-dot-product softmax over keys (Shapelet.py:117-131)."""

    def __init__(self, dim_feature: int, dim_attn: int = 16):
        super().__init__()
        self.q_proj = nn.Linear(1, dim_attn)
        self.k_proj = nn.Linear(1, dim_attn)
        self.pos_embed = nn.Embedding(dim_feature, dim_attn)

    def forward(self, x):                                  # x: (B, F)
        pos = self.pos_embed(torch.arange(x.shape[1], device=x.device))
        q = self.q_proj(x.unsqueeze(-1)) + pos
        k = self.k_proj(x.unsqueeze(-1)) + pos
        out = F.scaled_dot_product_attention(q, k, x.unsqueeze(-1))
        return out.squeeze(-1)
