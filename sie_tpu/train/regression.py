"""Regression Experiment with a binned CRPS loss
(reference exp/experiment_regression.py:59-353).

- data flags TRAIN/TEST with val == test (exp:86-88);
- bin_edges computed on TRAIN and shared (Monashloader);
- sequences longer than 1000 steps are stride-subsampled (exp:32-37);
- CRPS: softmax -> CDF vs the empirical step CDF at the bin edges, summed
  squared difference, batch-averaged (exp:59-75);
- early stopping on val loss; test dumps the interpretability dict + CSV.

NOTE (documented divergence): the reference casts the float regression target
with `label.long()` (exp:157), silently truncating it before the CRPS
comparison — almost certainly an artifact of copied classification code. We
keep the float target; set `truncate_targets=True` for bit-parity with the
reference.
"""

from __future__ import annotations

import math
import os
import time
from datetime import datetime
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sie_tpu.config import Config
from sie_tpu.data.provider import data_provider
from sie_tpu.train import checkpoint as ckpt
from sie_tpu.train.trainer import Trainer, compute_beta
from sie_tpu.utils.shapelet_util import extract_shapelets
from sie_tpu.utils.tools import EarlyStopping, gini_coefficient


def subsample_factor(seq_len: int, max_length: int = 1000) -> int:
    return math.ceil(seq_len / max_length) if seq_len >= max_length else 1


def subsample_batch(x: np.ndarray, max_length: int = 1000) -> np.ndarray:
    """(reference exp/experiment_regression.py:32-37)"""
    factor = subsample_factor(x.shape[1], max_length)
    return x[:, ::factor, :] if factor > 1 else x


def make_crps_head(bin_edges: np.ndarray, truncate_targets: bool = False):
    edges = jnp.asarray(bin_edges, jnp.float32)

    def crps(logits, targets, weights):
        probs = jax.nn.softmax(logits, axis=1)
        cdf_pred = jnp.cumsum(probs, axis=1)
        t = targets.astype(jnp.float32)
        if truncate_targets:
            t = jnp.trunc(t)
        cdf_true = (edges[None, :] >= t[:, None]).astype(jnp.float32)
        per_sample = jnp.sum(jnp.square(cdf_pred - cdf_true), axis=1)
        return jnp.sum(per_sample * weights) / jnp.maximum(jnp.sum(weights), 1.0)

    return crps


class RegressionExperiment:
    def __init__(self, cfg: Config, mesh=None, verbose: bool = True,
                 truncate_targets: bool = False, metrics_hook=None):
        self.verbose = verbose
        self.metrics_hook = metrics_hook   # per-epoch dict, like Experiment
        self.train_data, self.train_loader = data_provider(cfg, "TRAIN")
        self.test_data, self.test_loader = data_provider(
            cfg, "TEST", bin_edges=self.train_data.bin_edges)
        self.val_data, self.val_loader = self.test_data, self.test_loader

        seq_len = subsample_batch(self.train_data.x[:1]).shape[1]
        cfg = cfg.replace(seq_len=seq_len, enc_in=self.train_data.enc_in,
                          num_class=self.train_data.num_class,
                          pred_len=0, label_len=0)
        self.cfg = cfg
        self.loss_head = make_crps_head(self.train_data.bin_edges,
                                        truncate_targets)
        self.trainer = Trainer(cfg, steps_per_epoch=max(len(self.train_loader), 1),
                               loss_head=self.loss_head, mesh=mesh)
        self.checkpoint_dir = os.path.join(cfg.checkpoint_dir,
                                           cfg.checkpoint_key())
        self.epoch_stop = 0
        self.state = None

    def _log(self, msg):
        if self.verbose:
            print(msg, flush=True)

    def _batch(self, batch):
        x, y, mask, w = batch
        factor = subsample_factor(x.shape[1])
        if factor > 1:
            # stride the mask with the same factor — truncating it would mark
            # tail padding of shorter-than-max samples as real timesteps
            x, mask = x[:, ::factor, :], mask[:, ::factor]
        return x, y, mask, w

    def _init_state(self):
        sample = self._batch(next(iter(self.train_loader.epoch(0))))
        self.state = self.trainer.init_state(sample, seed=max(self.cfg.seed, 0))

    def train(self):
        cfg = self.cfg
        if self.state is None:
            self._init_state()
        early = EarlyStopping(patience=cfg.patience)
        best = (jax.device_get(self.state.params),
                jax.device_get(self.state.batch_stats))
        t0 = time.time()
        for epoch in range(cfg.train_epochs):
            beta = compute_beta(epoch, cfg.train_epochs, cfg.beta_schedule)
            losses = []
            for batch in self.train_loader.epoch(epoch):
                self.state, loss, _ = self.trainer.train_step(
                    self.state, self._batch(batch), beta)
                losses.append(loss)
            val_loss = self.validation()
            if self.metrics_hook is not None:
                self.metrics_hook({
                    "epoch": epoch,
                    "train_loss": float(np.mean(jax.device_get(losses))),
                    "val_loss": float(val_loss), "beta": float(beta),
                    "seconds": time.time() - t0})
            if (epoch + 1) % cfg.log_interval == 0:
                self._log(f"Epoch {epoch}/{cfg.train_epochs} | "
                          f"Train {float(np.mean(jax.device_get(losses))):.4f} | "
                          f"Val {val_loss:.4f}")
            if epoch >= cfg.min_epochs:
                if early(val_loss):
                    best = (jax.device_get(self.state.params),
                            jax.device_get(self.state.batch_stats))
                    ckpt.save_checkpoint(self.checkpoint_dir, best[0], best[1],
                                         meta={"epoch_stop": epoch,
                                               "val_loss": float(val_loss)},
                                         background=True)
            if early.early_stop:
                self._log("Early stopping")
                self.epoch_stop = epoch
                break
            self.epoch_stop = epoch
        ckpt.wait_pending(self.checkpoint_dir)
        self.state = self.state.replace(params=jax.device_put(best[0]),
                                        batch_stats=jax.device_put(best[1]))
        return self.state

    def load_checkpoint(self) -> bool:
        if self.state is None:
            self._init_state()
        template = {"params": jax.device_get(self.state.params),
                    "batch_stats": jax.device_get(self.state.batch_stats)}
        restored = ckpt.load_checkpoint(self.checkpoint_dir, template)
        if restored is None:
            return False
        self.state = self.state.replace(
            params=jax.device_put(restored["params"]),
            batch_stats=jax.device_put(restored["batch_stats"]))
        # restored runs report the true stop epoch in the CSV, like the
        # classification experiment
        self.epoch_stop = ckpt.load_meta(self.checkpoint_dir).get(
            "epoch_stop", self.epoch_stop)
        return True

    def has_checkpoint(self) -> bool:
        return ckpt.has_checkpoint(self.checkpoint_dir)

    def load_torch_checkpoint(self, path: str):
        """Import a reference-trained regression ``checkpoint.pth`` (same SBM
        layout with num_class = nbins, reference exp_regression.py:95-102)."""
        if self.state is None:
            self._init_state()
        from sie_tpu.compat.torch_import import load_into_state
        self.state, unused = load_into_state(self.state, self.cfg, path)
        return unused

    def _loader_loss(self, loader, gating_value=None, collect=False):
        losses, buf = [], {"x": [], "pred": [], "target": [], "p": [], "d": [],
                           "eta": [], "sp": []}
        for batch in loader.epoch(0):
            b = self._batch(batch)
            x, y, mask, w = b
            logits, info = self.trainer.eval_step(self.state, b,
                                                  gating_value=gating_value)
            loss = float(jax.device_get(
                self.loss_head(logits, jnp.asarray(y), jnp.asarray(w))))
            if info.loss is not None:
                loss += float(jax.device_get(info.loss).mean())
            losses.append(loss)
            if collect:
                keep = w > 0
                info = jax.device_get(info)
                buf["x"].append(x[keep])
                buf["pred"].append(np.asarray(logits)[keep])
                buf["target"].append(y[keep])
                if info.p is not None:
                    buf["p"].append(np.asarray(info.p)[keep])
                    buf["d"].append(np.asarray(info.d)[keep])
                    buf["sp"].append(np.asarray(info.shapelet_preds)[keep])
                if info.eta is not None:
                    buf["eta"].append(np.asarray(info.eta)[keep])
        return (float(np.mean(losses)) if losses else float("inf")), buf

    def validation(self):
        loss, _ = self._loader_loss(self.val_loader)
        return loss

    def test(self, save_csv: bool = True, result_dir: Optional[str] = None):
        cfg = self.cfg
        if self.state is None:
            self._init_state()
        total_loss, buf = self._loader_loss(
            self.test_loader, gating_value=cfg.gating_value, collect=True)

        cat = lambda k: np.concatenate(buf[k]) if buf[k] else None
        df = {"x": cat("x"), "pred": cat("pred"), "target": cat("target")}
        if cfg.model != "DNN":
            params = jax.device_get(self.state.params)
            sbm_params = params.get("sbm", params)
            w = np.asarray(sbm_params["output_layer"]["kernel"]).T
            df.update(predicate=cat("p"), w=w,
                      shapelets=extract_shapelets(params),
                      eta=cat("eta"), sbm_pred=cat("sp"))
        if save_csv:
            import pandas as pd
            row = {k: getattr(cfg, k) for k in (
                "model", "dataset", "dnn_type", "train_epochs", "num_shapelet",
                "lambda_reg", "lambda_div", "epsilon", "lr", "seed",
                "pos_weight", "beta_schedule", "gating_value", "distance_func",
                "sbm_cls")}
            row.update(test_loss=total_loss, epoch_stop=self.epoch_stop)
            if cfg.model != "DNN":
                eta = df.get("eta")
                if eta is not None:
                    row["eta_mean"] = float(eta.mean())
                    row["eta_std"] = float(eta.std())
                aw = np.abs(df["w"])
                for thr, tag in ((1.0, "10"), (0.5, "5"), (0.1, "1")):
                    row[f"w_sum_{tag}"] = float((aw > thr).sum())
                    row[f"w_mean_{tag}"] = float((aw > thr).mean())
                row["w_max"] = float(aw.max())
                row["w_gini_clip"] = gini_coefficient(np.clip(df["w"], 0, None))
                row["w_gini_abs"] = gini_coefficient(aw)
            out_dir = result_dir or os.path.join(cfg.result_dir, cfg.model)
            os.makedirs(out_dir, exist_ok=True)
            ts = datetime.now().strftime("%Y-%m-%d-%H-%M-%S")
            path = os.path.join(
                out_dir, f"{cfg.dataset}-{cfg.seed}-{cfg.model}-"
                         f"{cfg.num_shapelet}-{cfg.lambda_div}-{cfg.lambda_reg}-{ts}.csv")
            pd.DataFrame({k: [v] for k, v in row.items()}).to_csv(path, index=False)
            self._log(f"Test summary saved at: {path}")
        return total_loss, None, df
