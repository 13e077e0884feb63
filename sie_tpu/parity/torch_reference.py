"""Reference-faithful PyTorch InterpGN used ONLY for convergence-parity A/B
runs (VERDICT r2 item 1) — this is the verification yardstick, not part of the
TPU compute path.

Faithful to the reference's live semantics, cited per component:
- Shapelet unit: unfold + mean-|diff| distance, RBF, straight-through max over
  windows                       (model/Shapelet.py:46-88)
- ShapeBottleneckModel: per-bank L = max(3, ceil(frac*T)), instance norm with
  unbiased std + 1e-8, linear head without bias, L1-reg + exp(-pairwise-dist)
  diversity loss, non-negative weight clamp (model/Shapelet.py:134-238)
- InterpGN Gini gate eta = (C*sum p^2 - 1)/(C-1), optional hard gating
                                  (model/InterpGN.py:39-60)
- FCN backbone: Conv1d(8/5/3) + BN + ReLU stacks, adaptive avg pool
                                  (model/FullyConvNet.py:7-59)
- Transformer backbone: circular-conv token embedding + sinusoidal PE,
  post-norm encoder with conv1d FFN, gelu/dropout/mask/flatten head
  (model/Transformer.py:99-110, layers/Embed.py:22-41,
   layers/SelfAttention_Family.py:48-75,179-213,
   layers/Transformer_EncDec.py:27-80)
- Training: Adam(lr) + CosineAnnealingWarmRestarts(T_0=train_epochs) stepped
  per epoch under --lr_decay, loss = CE + model_info.loss.mean()
  + beta(epoch)*CE(shapelet_preds), gradient accumulation / clip, pos_weight
  clamp after optimizer step, early stopping on negative validation accuracy
  with patience, best-checkpoint restore (exp/experiment_classification.py:
  295-378,19-26; utils/tools.py:9-38)

The implementation is an independent rewrite from the SURVEY.md description
(not a copy): modules are condensed to the live code paths only (no dead
forecast branches, no memory_efficient autograd twin).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from sie_tpu.config import Config


def _bank_lengths(cfg: Config) -> List[int]:
    return [max(3, int(np.ceil(f * cfg.seq_len))) for f in cfg.shapelet_lengths]


def _stride(seq_len: int, length: int) -> int:
    return 1 if seq_len < 3000 else max(1, int(np.log2(length)))


class TorchShapeletBank(nn.Module):
    """One shapelet bank (reference Shapelet.py:46-88). distance_func
    'euclidean' is the reference default mean-|diff| (Shapelet.py:74);
    'sqeuclidean' is the mean-squared-diff the reference computes on its
    memory_efficient path (Shapelet.py:27-28)."""

    def __init__(self, n: int, c: int, length: int, stride: int, eps: float,
                 distance_func: str = "euclidean"):
        super().__init__()
        self.length, self.stride, self.eps = length, stride, eps
        if distance_func not in ("euclidean", "sqeuclidean"):
            raise NotImplementedError(
                f"torch twin distance_func={distance_func!r}")
        self.distance_func = distance_func
        self.weights = nn.Parameter(torch.normal(0.0, 1.0, (n, c, length)))

    def _dist(self, win: torch.Tensor) -> torch.Tensor:
        diff = win - self.weights                        # (B, W, n, C, L)
        if self.distance_func == "sqeuclidean":
            return diff.pow(2).mean(-1)
        return diff.abs().mean(-1)

    def forward(self, x: torch.Tensor) -> Tuple[torch.Tensor, torch.Tensor]:
        # x: instance-normalized (B, C, T)
        win = x.unfold(2, self.length, self.stride)      # (B, C, W, L)
        win = win.permute(0, 2, 1, 3).unsqueeze(2)       # (B, W, 1, C, L)
        d = self._dist(win)                              # (B, W, n, C)
        p = torch.exp(-(self.eps * d) ** 2)
        # straight-through max over windows (Shapelet.py:79-83)
        hard = torch.zeros_like(p).scatter_(1, p.argmax(1, keepdim=True), 1.0)
        soft = torch.softmax(p, dim=1)
        max_p = ((hard + soft - soft.detach()) * p).sum(1)
        return max_p.flatten(1), d.min(1).values.flatten(1)


class TorchSBM(nn.Module):
    """(reference Shapelet.py:134-238; linear / bilinear / attention heads,
    Shapelet.py:170-178,199-205)."""

    def __init__(self, cfg: Config):
        super().__init__()
        self.cfg = cfg
        nums = cfg.num_shapelets_per_bank
        self.banks = nn.ModuleList(
            TorchShapeletBank(nums[i], cfg.enc_in, l,
                              _stride(cfg.seq_len, l), cfg.epsilon,
                              cfg.distance_func)
            for i, l in enumerate(_bank_lengths(cfg)))
        total = sum(n * cfg.enc_in for n in nums)
        self.output_layer = nn.Linear(total, cfg.num_class, bias=False)
        if cfg.sbm_cls == "bilinear":
            self.output_bilinear = nn.Bilinear(total, total, cfg.num_class,
                                               bias=False)
        elif cfg.sbm_cls == "attention":
            from sie_tpu.parity.torch_backbones import TorchPredicateAttention
            self.attention = TorchPredicateAttention(total, 16)
        self.dropout = nn.Dropout(cfg.dropout)
        self.pdist = nn.PairwiseDistance(p=2)            # eps=1e-6 default

    def forward(self, x, *_args, **_kw):
        x = x.transpose(1, 2)                            # (B, C, T)
        x = (x - x.mean(-1, keepdim=True)) / (x.std(-1, keepdim=True) + 1e-8)
        ps, ds = zip(*[bank(x) for bank in self.banks])
        p = torch.cat(ps, -1)
        d = torch.cat(ds, -1)
        if self.cfg.sbm_cls == "bilinear":
            out = self.output_layer(self.dropout(p)) \
                + self.output_bilinear(self.dropout(p), self.dropout(p))
        elif self.cfg.sbm_cls == "attention":
            out = self.output_layer(self.dropout(self.attention(p)))
        else:
            out = self.output_layer(self.dropout(p))
        return out, {"d": d, "p": p, "shapelet_preds": out, "preds": out,
                     "loss": self.loss().unsqueeze(0)}

    def loss(self) -> torch.Tensor:
        cfg = self.cfg
        reg = self.output_layer.weight.abs().mean()
        div = torch.zeros((), device=reg.device)
        if cfg.lambda_div > 0:
            for bank in self.banks:
                sh = bank.weights.permute(1, 0, 2)       # (C, n, L)
                dist = self.pdist(sh.unsqueeze(1), sh.unsqueeze(2))
                eye = torch.eye(sh.shape[1], device=dist.device).unsqueeze(0)
                div = div + (torch.exp(-dist) * (1.0 - eye)).mean()
        return cfg.lambda_reg * reg + cfg.lambda_div * div

    def step(self):
        with torch.no_grad():
            self.output_layer.weight.clamp_(0.0)


class TorchLTSBank(TorchShapeletBank):
    """Distance-threshold shapelet (reference Shapelet.py:90-114): learnable
    |U[0,1)| threshold, straight-through argmin over windows,
    p = sigmoid(threshold - min_d)."""

    def __init__(self, n: int, c: int, length: int, stride: int, eps: float,
                 distance_func: str = "euclidean"):
        super().__init__(n, c, length, stride, eps, distance_func)
        self.threshold = nn.Parameter(torch.rand(1, n, c).abs())

    def forward(self, x: torch.Tensor) -> Tuple[torch.Tensor, torch.Tensor]:
        win = x.unfold(2, self.length, self.stride)      # (B, C, W, L)
        win = win.permute(0, 2, 1, 3).unsqueeze(2)       # (B, W, 1, C, L)
        d = self._dist(win)                              # (B, W, n, C)
        hard = torch.zeros_like(d).scatter_(1, d.argmin(1, keepdim=True), 1.0)
        soft = torch.softmax(-d, dim=1)                  # softmin
        min_d = ((hard + soft - soft.detach()) * d).sum(1)
        p = torch.sigmoid(self.threshold - min_d)
        return p.flatten(1), d.min(1).values.flatten(1)


class TorchLTS(TorchSBM):
    """(reference Shapelet.py:241-263: same SBM skeleton/losses, threshold
    banks; the experiment passes the same 6-bank config, exp:253-268)."""

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        nums = cfg.num_shapelets_per_bank
        self.banks = nn.ModuleList(
            TorchLTSBank(nums[i], cfg.enc_in, l,
                         _stride(cfg.seq_len, l), cfg.epsilon,
                         cfg.distance_func)
            for i, l in enumerate(_bank_lengths(cfg)))


class TorchFCN(nn.Module):
    """(reference model/FullyConvNet.py:7-59)."""

    def __init__(self, cfg: Config):
        super().__init__()
        ks = (3, 3, 2) if cfg.seq_len <= 10 else (8, 5, 3)
        chans = (cfg.enc_in, 128, 256, 128)
        self.blocks = nn.Sequential(*[
            nn.Sequential(nn.Conv1d(chans[i], chans[i + 1], ks[i]),
                          nn.BatchNorm1d(chans[i + 1]), nn.ReLU())
            for i in range(3)])
        self.fc = nn.Linear(128, cfg.num_class)

    def forward(self, x, *_args, **_kw):
        h = self.blocks(x.transpose(1, 2))
        return self.fc(F.adaptive_avg_pool1d(h, 1).flatten(1))


class _TorchEncoderLayer(nn.Module):
    """Post-norm attention + conv1d FFN (Transformer_EncDec.py:27-51 with
    FullAttention mask_flag=False, SelfAttention_Family.py:48-75)."""

    def __init__(self, d_model: int, n_heads: int, d_ff: int, dropout: float,
                 activation: str):
        super().__init__()
        self.h = n_heads
        self.q = nn.Linear(d_model, d_model)
        self.k = nn.Linear(d_model, d_model)
        self.v = nn.Linear(d_model, d_model)
        self.out = nn.Linear(d_model, d_model)
        self.conv1 = nn.Conv1d(d_model, d_ff, 1)
        self.conv2 = nn.Conv1d(d_ff, d_model, 1)
        self.norm1 = nn.LayerNorm(d_model)
        self.norm2 = nn.LayerNorm(d_model)
        self.dropout = nn.Dropout(dropout)
        self.act = F.relu if activation == "relu" else F.gelu

    def forward(self, x):
        b, t, dm = x.shape
        dk = dm // self.h
        split = lambda z: z.view(b, t, self.h, dk)
        scores = torch.einsum("blhe,bshe->bhls", split(self.q(x)),
                              split(self.k(x)))
        a = self.dropout(torch.softmax(scores / math.sqrt(dk), dim=-1))
        attn = torch.einsum("bhls,bshd->blhd", a, split(self.v(x)))
        x = x + self.dropout(self.out(attn.reshape(b, t, dm)))
        y = x = self.norm1(x)
        y = self.dropout(self.act(self.conv1(y.transpose(-1, 1))))
        y = self.dropout(self.conv2(y).transpose(-1, 1))
        return self.norm2(x + y)


class TorchTransformer(nn.Module):
    """Classification path of the TSlib Transformer (model/Transformer.py:99-110)."""

    def __init__(self, cfg: Config):
        super().__init__()
        self.tokenConv = nn.Conv1d(cfg.enc_in, cfg.d_model, 3, padding=1,
                                   padding_mode="circular", bias=False)
        nn.init.kaiming_normal_(self.tokenConv.weight, mode="fan_in",
                                nonlinearity="leaky_relu")
        pe = torch.zeros(cfg.seq_len, cfg.d_model)
        pos = torch.arange(cfg.seq_len).float().unsqueeze(1)
        div = (torch.arange(0, cfg.d_model, 2).float()
               * -(math.log(10000.0) / cfg.d_model)).exp()
        pe[:, 0::2] = torch.sin(pos * div)
        pe[:, 1::2] = torch.cos(pos * div)
        self.register_buffer("pe", pe.unsqueeze(0))
        self.emb_dropout = nn.Dropout(cfg.dropout)
        self.layers = nn.ModuleList(
            _TorchEncoderLayer(cfg.d_model, cfg.n_heads, cfg.d_ff,
                               cfg.dropout, cfg.activation)
            for _ in range(cfg.e_layers))
        self.norm = nn.LayerNorm(cfg.d_model)
        self.dropout = nn.Dropout(cfg.dropout)
        self.projection = nn.Linear(cfg.seq_len * cfg.d_model, cfg.num_class)

    def forward(self, x, mask=None, *_args, **_kw):
        h = self.tokenConv(x.permute(0, 2, 1)).transpose(1, 2) + self.pe
        h = self.emb_dropout(h)
        for layer in self.layers:
            h = layer(h)
        h = self.dropout(F.gelu(self.norm(h)))
        if mask is not None:
            h = h * mask.unsqueeze(-1)
        return self.projection(h.reshape(h.shape[0], -1))


class TorchEEGCNN(nn.Module):
    """EEGNet-style CNN + torch TransformerEncoder, intended semantics
    (reference model/eegcnn.py:30-247 with the transposed-input and
    mask-length bugs fixed like sie_tpu/models/eegcnn.py; mean pooling)."""

    def __init__(self, cfg: Config):
        super().__init__()
        self.cfg = cfg
        f1, d = cfg.eegcnn_cnn_f1, cfg.eegcnn_cnn_f2
        f2 = f1 * d
        self.block1_conv1 = nn.Conv2d(1, f1, (1, cfg.eegcnn_kernel1),
                                      padding="same", bias=False)
        self.block1_bn1 = nn.BatchNorm2d(f1)
        self.block1_depthwise = nn.Conv2d(f1, d * f1, (cfg.enc_in, 1),
                                          groups=f1, bias=False)
        self.block1_bn2 = nn.BatchNorm2d(d * f1)
        self.block2_conv1 = nn.Conv2d(d * f1, d * f1,
                                      (1, cfg.eegcnn_kernel2),
                                      padding="same", groups=d * f1,
                                      bias=False)
        self.block2_conv2 = nn.Conv2d(d * f1, f2, 1, bias=False)
        self.block2_bn = nn.BatchNorm2d(f2)
        self.drop1 = nn.Dropout(cfg.eegcnn_dropout1)
        self.cnn_projection = (nn.Linear(f2, cfg.d_model)
                               if cfg.d_model != f2 else nn.Identity())
        layer = nn.TransformerEncoderLayer(cfg.d_model, cfg.eegcnn_n_heads,
                                           cfg.eegcnn_d_ff,
                                           cfg.eegcnn_dropout2,
                                           batch_first=True)
        self.encoder = nn.TransformerEncoder(layer, cfg.eegcnn_layers)
        self.drop2 = nn.Dropout(cfg.eegcnn_dropout2)
        self.classifier = nn.Linear(cfg.d_model, cfg.num_class)
        self._pe: Optional[torch.Tensor] = None

    def forward(self, x, mask=None, gating_value=None):
        cfg = self.cfg
        h = x.transpose(1, 2).unsqueeze(1)                  # (B, 1, C, T)
        h = self.block1_bn1(self.block1_conv1(h))
        h = F.elu(self.block1_bn2(self.block1_depthwise(h)))
        h = self.drop1(F.avg_pool2d(h, (1, cfg.eegcnn_pool1)))
        h = F.elu(self.block2_bn(self.block2_conv2(self.block2_conv1(h))))
        h = self.drop1(F.avg_pool2d(h, (1, cfg.eegcnn_pool2)))
        h = h.squeeze(2).transpose(1, 2)                    # (B, T_red, F2)
        h = self.cnn_projection(h)
        if self._pe is None or self._pe.shape[0] != h.shape[1]:
            from sie_tpu.models.layers import sinusoidal_embedding
            self._pe = torch.tensor(
                np.asarray(sinusoidal_embedding(h.shape[1], h.shape[2]),
                           np.float32))
        h = self.drop2(h + self._pe[None])
        h = self.encoder(h)
        logits = self.classifier(h.mean(dim=1))
        return logits, {"loss": torch.zeros(1)}


class TorchInterpGN(nn.Module):
    """(reference model/InterpGN.py:22-66)."""

    def __init__(self, cfg: Config):
        super().__init__()
        self.sbm = TorchSBM(cfg)
        self.deep_model = _dnn_registry()[cfg.dnn_type](cfg)

    def forward(self, x, mask=None, gating_value=None):
        sbm_out, info = self.sbm(x)
        deep_out = self.deep_model(x, mask)
        p = torch.softmax(sbm_out, dim=-1)
        c = sbm_out.shape[-1]
        eta = (c * p.pow(2).sum(-1, keepdim=True) - 1) / (c - 1)
        if gating_value is not None:
            hard = (eta > gating_value).float()
            eta = hard + eta * (1 - hard)
        out = eta * sbm_out + (1 - eta) * deep_out
        info.update(eta=eta, dnn_preds=deep_out, preds=out,
                    shapelet_preds=sbm_out)
        return out, info

    def loss(self):
        return self.sbm.loss()

    def step(self):
        self.sbm.step()


def _dnn_registry():
    """All 5 reference backbones (exp:87-93 dnn_dict)."""
    from sie_tpu.parity.torch_backbones import (TorchPatchTST, TorchResNet,
                                                TorchTimesNet)
    return {"FCN": TorchFCN, "Transformer": TorchTransformer,
            "ResNet": TorchResNet, "TimesNet": TorchTimesNet,
            "PatchTST": TorchPatchTST}


def build_torch_model(cfg: Config) -> nn.Module:
    if cfg.model == "SBM":
        return TorchSBM(cfg)
    if cfg.model == "LTS":
        return TorchLTS(cfg)
    if cfg.model == "InterpGN":
        return TorchInterpGN(cfg)
    if cfg.model == "EEGCNN":
        return TorchEEGCNN(cfg)
    if cfg.model == "DNN":
        return _dnn_registry()[cfg.dnn_type](cfg)
    raise ValueError(
        f"parity harness covers SBM/LTS/InterpGN/EEGCNN/DNN, not {cfg.model}")


def _compute_beta(epoch: int, max_epoch: int, schedule: str) -> float:
    if schedule == "cosine":
        return 0.5 * (1 + math.cos(math.pi * epoch / max_epoch))
    if schedule == "linear":
        return 1 - epoch / max_epoch
    return 1.0


@torch.no_grad()
def _eval(model: nn.Module, cfg: Config, x: np.ndarray, y: np.ndarray,
          batch_size: int) -> Tuple[float, float]:
    model.eval()
    losses, correct = [], 0
    for i in range(0, len(x), batch_size):
        xb = torch.from_numpy(x[i:i + batch_size]).float()
        yb = torch.from_numpy(y[i:i + batch_size]).long()
        mask = torch.ones(xb.shape[0], xb.shape[1])
        if cfg.model == "DNN":
            logits = model(xb, mask)
            loss = F.cross_entropy(logits, yb, reduction="none")
        else:
            logits, info = model(xb, mask)
            loss = F.cross_entropy(logits, yb, reduction="none") \
                + info["loss"].mean()
        losses.append(loss.flatten())
        correct += (logits.argmax(-1) == yb).sum().item()
    model.train()
    return float(torch.cat(losses).mean()), correct / max(len(x), 1)


class TorchCRPSLoss(nn.Module):
    """Binned CRPS (reference exp/experiment_regression.py:59-75): softmax ->
    CDF over the bins vs the empirical step CDF at the bin edges, summed
    squared difference, batch-averaged."""

    def __init__(self, bin_edges: np.ndarray):
        super().__init__()
        self.register_buffer("bin_edges",
                             torch.from_numpy(np.asarray(bin_edges,
                                                         np.float32)))

    def forward(self, pred, target):
        cdf_pred = torch.cumsum(torch.softmax(pred, dim=1), dim=1)
        cdf_true = (self.bin_edges.unsqueeze(0)
                    >= target.unsqueeze(1)).float()
        return torch.mean(torch.sum((cdf_pred - cdf_true) ** 2, dim=1))


def train_torch_regression(cfg: Config, splits, bin_edges: np.ndarray,
                           batch_schedule: Optional[List[List[np.ndarray]]] = None,
                           verbose: bool = False) -> Dict[str, float]:
    """Reference-faithful regression training loop
    (exp/experiment_regression.py:140-230): CRPS + model loss (+ beta * CRPS
    of the SBM branch for InterpGN), `label.long()` target truncation
    (exp:157 — the documented reference quirk, reproduced here because the
    sie_tpu side runs with truncate_targets=True for this A/B), early stopping
    on VALIDATION LOSS with best-checkpoint restore, val == test."""
    torch.manual_seed(cfg.seed)
    np.random.seed(cfg.seed)
    model = build_torch_model(cfg)
    loss_fn = TorchCRPSLoss(bin_edges)
    opt = torch.optim.Adam(model.parameters(), lr=cfg.lr)
    sched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
        opt, T_0=cfg.train_epochs) if cfg.lr_decay else None
    xtr, ytr = splits["train"]

    def _loss(xb, yb):
        # exp:157 casts the float target with .long() before CRPS; the
        # validation loss has no beta term (exp_regression:210-230)
        t = yb.long().float()
        if cfg.model == "DNN":
            return loss_fn(model(xb, None), t)
        logits, info = model(xb)
        return loss_fn(logits, t) + info["loss"].mean()

    @torch.no_grad()
    def _eval(x, y):
        model.eval()
        losses = []
        for i in range(0, len(x), cfg.batch_size):
            xb = torch.from_numpy(x[i:i + cfg.batch_size]).float()
            yb = torch.from_numpy(y[i:i + cfg.batch_size]).float()
            losses.append(float(_loss(xb, yb)))
        model.train()
        return float(np.mean(losses))

    best_loss, best_state, patience_left = float("inf"), None, cfg.patience
    epoch_stop = 0
    for epoch in range(cfg.train_epochs):
        if batch_schedule is not None:
            batches = batch_schedule[epoch % len(batch_schedule)]
        else:
            order = np.random.permutation(len(xtr))
            batches = [order[i:i + cfg.batch_size]
                       for i in range(0, len(order), cfg.batch_size)]
        for idx in batches:
            xb = torch.from_numpy(xtr[idx]).float()
            yb = torch.from_numpy(ytr[idx]).float()
            t = yb.long().float()
            if cfg.model == "DNN":
                loss = loss_fn(model(xb, None), t)
            else:
                logits, info = model(xb)
                loss = loss_fn(logits, t) + info["loss"].mean()
                if cfg.model == "InterpGN":
                    beta = _compute_beta(epoch, cfg.train_epochs,
                                         cfg.beta_schedule)
                    loss = loss + beta * loss_fn(info["shapelet_preds"], t)
            loss.backward()
            if cfg.gradient_clip > 0:
                nn.utils.clip_grad_norm_(model.parameters(),
                                         cfg.gradient_clip)
            opt.step()
            if cfg.pos_weight and cfg.model != "DNN":
                model.step()
            opt.zero_grad()
        val_loss = _eval(*splits["val"])
        if verbose and (epoch + 1) % cfg.log_interval == 0:
            print(f"[torch] epoch {epoch + 1} val_crps {val_loss:.4f}")
        if cfg.lr_decay:
            sched.step()
        if epoch >= cfg.min_epochs:
            if val_loss < best_loss:
                best_loss = val_loss
                best_state = {k: v.detach().clone()
                              for k, v in model.state_dict().items()}
                patience_left = cfg.patience
            else:
                patience_left -= 1
                if patience_left <= 0:
                    epoch_stop = epoch
                    break
        epoch_stop = epoch
    if best_state is not None:
        model.load_state_dict(best_state)
    test_loss = _eval(*splits["test"])
    # an accuracy-like secondary metric: fraction of samples whose argmax
    # bin contains the true target (both sides compute it identically)
    @torch.no_grad()
    def _bin_acc(x, y):
        model.eval()
        hits, n = 0, 0
        edges = np.asarray(bin_edges, np.float32)
        for i in range(0, len(x), cfg.batch_size):
            xb = torch.from_numpy(x[i:i + cfg.batch_size]).float()
            out = model(xb, None) if cfg.model == "DNN" else model(xb)[0]
            pred_bin = out.argmax(-1).numpy()
            true_bin = np.searchsorted(edges[:-1],
                                       y[i:i + cfg.batch_size].astype(np.int64)
                                       .astype(np.float32), side="left")
            hits += int((pred_bin == true_bin).sum())
            n += len(pred_bin)
        return hits / max(n, 1)

    return {"test_loss": test_loss, "val_loss": best_loss,
            "bin_accuracy": 100.0 * _bin_acc(*splits["test"]),
            "epoch_stop": epoch_stop}


def train_torch_reference(cfg: Config, splits: Dict[str, Tuple[np.ndarray, np.ndarray]],
                          batch_schedule: Optional[List[List[np.ndarray]]] = None,
                          verbose: bool = False) -> Dict[str, float]:
    """Trains the torch reference on host arrays; returns test metrics.

    splits: {"train"/"val"/"test": (x (N,T,C) f32, y (N,) int)}.
    batch_schedule: optional per-epoch list of index arrays so the torch and
    sie_tpu runs consume IDENTICAL batch orderings (removes shuffling as a
    parity confound)."""
    torch.manual_seed(cfg.seed)
    np.random.seed(cfg.seed)
    model = build_torch_model(cfg)
    opt = torch.optim.Adam(model.parameters(), lr=cfg.lr)
    sched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
        opt, T_0=cfg.train_epochs) if cfg.lr_decay else None
    xtr, ytr = splits["train"]
    best_acc, best_state, patience_left = -1.0, None, cfg.patience
    epoch_stop = 0
    train_step = 0
    for epoch in range(cfg.train_epochs):
        if batch_schedule is not None:
            batches = batch_schedule[epoch % len(batch_schedule)]
        else:
            order = np.random.permutation(len(xtr))
            batches = [order[i:i + cfg.batch_size]
                       for i in range(0, len(order), cfg.batch_size)]
        for idx in batches:
            train_step += 1
            xb = torch.from_numpy(xtr[idx]).float()
            yb = torch.from_numpy(ytr[idx]).long()
            mask = torch.ones(xb.shape[0], xb.shape[1])
            if cfg.model == "DNN":
                logits = model(xb, mask)
                loss = F.cross_entropy(logits, yb)
            else:
                logits, info = model(xb, mask)
                loss = F.cross_entropy(logits, yb) + info["loss"].mean()
                if cfg.model == "InterpGN":
                    beta = _compute_beta(epoch, cfg.train_epochs,
                                         cfg.beta_schedule)
                    loss = loss + beta * F.cross_entropy(
                        info["shapelet_preds"], yb)
            accum = max(cfg.gradient_accumulation_steps, 1)
            (loss / accum).backward()
            if train_step % accum == 0:
                if cfg.gradient_clip > 0:
                    nn.utils.clip_grad_norm_(model.parameters(),
                                             cfg.gradient_clip)
                opt.step()
                if cfg.pos_weight and cfg.model != "DNN":
                    model.step()
                opt.zero_grad()
        val_loss, val_acc = _eval(model, cfg, *splits["val"], cfg.batch_size)
        if verbose and (epoch + 1) % cfg.log_interval == 0:
            print(f"[torch] epoch {epoch + 1} val_loss {val_loss:.4f} "
                  f"val_acc {val_acc:.4f}")
        if cfg.lr_decay:
            sched.step()
        if epoch >= cfg.min_epochs:
            # EarlyStopping(delta=0) on score=-val_acc: improvement iff
            # score < best (utils/tools.py:9-38 via exp:360-366)
            if val_acc > best_acc:
                best_acc = val_acc
                best_state = {k: v.detach().clone()
                              for k, v in model.state_dict().items()}
                patience_left = cfg.patience
            else:
                patience_left -= 1
                if patience_left <= 0:
                    epoch_stop = epoch
                    break
        epoch_stop = epoch
    if best_state is not None:
        model.load_state_dict(best_state)
    test_loss, test_acc = _eval(model, cfg, *splits["test"], cfg.batch_size)
    return {"test_accuracy": 100.0 * test_acc, "test_loss": test_loss,
            "val_accuracy": 100.0 * max(best_acc, 0.0),
            "epoch_stop": epoch_stop}
