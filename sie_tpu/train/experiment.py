"""Classification Experiment (reference exp/experiment_classification.py:85-1138).

Lifecycle: load data -> derive config from data -> build jitted trainer ->
epoch loop with per-epoch validation + early stopping on val accuracy ->
reload best -> test with hard gating + interpretability stats + CSV summary.

The CSV summary implements the full spec from the reference's dead-draft test
(exp:500-532 — test_accuracy, epoch_stop, eta mean/std, shapelet_score,
|w|-sparsity counts at 1/0.5/0.1, w_max, w Gini) which the live reference left
stubbed (exp:1130-1136).
"""

from __future__ import annotations

import os
import time
from datetime import datetime
from typing import Optional

import jax
import numpy as np
import optax

from sie_tpu.config import Config
from sie_tpu.data.provider import data_provider
from sie_tpu.train import checkpoint as ckpt
from sie_tpu.train.trainer import Trainer, compute_beta
from sie_tpu.utils.metrics import accuracy, class_distribution
from sie_tpu.utils.shapelet_util import (ClassificationResult,
                                         compute_shapelet_score,
                                         extract_shapelets)
from sie_tpu.utils.tools import EarlyStopping, convert_to_hms, gini_coefficient


class Experiment:
    def __init__(self, cfg: Config, mesh=None, loso_test_subject=None,
                 verbose: bool = True, metrics_hook=None):
        self.verbose = verbose
        # metrics_hook(dict) fires once per epoch with the scalar record
        # {epoch, train_loss, val_loss, val_accuracy, beta, seconds} —
        # run.py wires a JSONL writer (--metrics_jsonl); production
        # monitoring can plug anything callable
        self.metrics_hook = metrics_hook
        self.train_data, self.train_loader = data_provider(
            cfg, "train", loso_test_subject=loso_test_subject)
        self.val_data, self.val_loader = data_provider(
            cfg, "val", loso_test_subject=loso_test_subject)
        self.test_data, self.test_loader = data_provider(
            cfg, "test", loso_test_subject=loso_test_subject)

        # derive model config from the data (reference exp:166-249)
        cfg = cfg.replace(
            seq_len=self.train_data.seq_len,
            enc_in=self.train_data.enc_in,
            num_class=self.train_data.num_class,
            pred_len=0, label_len=0,
            original_fs=self.train_data.original_fs,
            target_fs=self.train_data.target_fs,
        )
        self.cfg = cfg
        self.trainer = Trainer(cfg, steps_per_epoch=max(len(self.train_loader), 1),
                               mesh=mesh)
        self.checkpoint_dir = os.path.join(cfg.checkpoint_dir,
                                           cfg.checkpoint_key())
        self.epoch_stop = 0
        self.state = None
        # device-resident data path: whole splits live in HBM, batches are
        # gathered on-device (single-device only; mesh path feeds per host)
        total_bytes = sum(d.x.nbytes for d in
                          (self.train_data, self.val_data, self.test_data))
        # stream_from_disk keeps splits on disk (data/stream.py memmaps):
        # staging them whole into HBM would defeat the point
        self.device_resident = (mesh is None and not cfg.stream_from_disk
                                and total_bytes < 4 * 1024 ** 3)
        # MoE capacity is per-group over ALL timesteps, real or padded
        # (models/moe.py) — warn once on genuinely ragged batches, where
        # padded tokens can crowd real ones out of expert capacity
        if cfg.moe_experts > 0:
            pm = getattr(self.train_data, "padding_mask", None)
            if pm is not None and float(np.min(pm)) == 0.0:
                frac = 1.0 - float(np.mean(pm))
                self._log(
                    f"WARNING: --moe_experts with ragged batches — "
                    f"{100 * frac:.1f}% of timesteps are padding and are "
                    f"routed like real tokens, consuming expert capacity "
                    f"(models/moe.py). Real tokens may be dropped at the "
                    f"capacity margin; raise --moe_capacity_factor (e.g. by "
                    f"1/(1-{frac:.2f}) = {1.0 / max(1e-6, 1 - frac):.2f}x) "
                    f"to absorb the padded load.")

    def _log(self, msg: str):
        if self.verbose:
            print(msg, flush=True)

    def _init_state(self):
        sample = next(iter(self.train_loader.epoch(0)))
        self.state = self.trainer.init_state(sample, seed=max(self.cfg.seed, 0))

    # ------------------------------------------------------------------
    def train(self, resume: bool = False, snapshot_every: int = 0):
        """resume=True continues an interrupted run from the full-state
        snapshot (optimizer + loop position) — beyond the reference's
        best-params-only restart. snapshot_every=k writes the snapshot every
        k epochs (0 = off)."""
        cfg = self.cfg
        if self.state is None:
            self._init_state()
        early = EarlyStopping(patience=cfg.patience)
        start_epoch = 0
        best = None
        if resume:
            restored = ckpt.load_train_state(self.checkpoint_dir, self.state)
            if restored is not None:
                self.state, start_epoch, early_state = restored
                early.load_state_dict(early_state)
                self._log(f"resumed at epoch {start_epoch}")
                # best-so-far params live in the best-checkpoint file
                template = {"params": jax.device_get(self.state.params),
                            "batch_stats": jax.device_get(self.state.batch_stats)}
                best_ckpt = ckpt.load_checkpoint(self.checkpoint_dir, template)
                if best_ckpt is not None:
                    best = (best_ckpt["params"], best_ckpt["batch_stats"])
        if best is None:
            best = (jax.device_get(self.state.params),
                    jax.device_get(self.state.batch_stats))
        t0 = time.time()

        dev_train = (self.trainer.device_data("train", self.train_data)
                     if self.device_resident else None)
        for epoch in range(start_epoch, cfg.train_epochs):
            beta = compute_beta(epoch, cfg.train_epochs, cfg.beta_schedule)
            losses = []
            if dev_train is not None:
                # stage the epoch's whole (idx, w) schedule + beta up front:
                # per-step host->device traffic is then ONE int scalar
                # (3 buffer uploads/step measured ~7 ms through the relay)
                steps = list(self.train_loader.epoch_indices(epoch))
                staged = self.trainer.stage_steps(steps, beta)
                if cfg.scan_epoch and staged is not None:
                    # whole epoch in ONE dispatch (trainer.train_epoch_staged);
                    # losses holds the single (n_steps,) array — ONE host
                    # fetch at the aggregation below (np.mean flattens it)
                    self.state, loss_arr = self.trainer.train_epoch_staged(
                        self.state, dev_train, staged)
                    losses = [loss_arr]
                else:
                    for k in range(len(steps)):
                        self.state, loss, _logits = \
                            self.trainer.train_step_staged(
                                self.state, dev_train, staged, k)
                        losses.append(loss)
            else:
                # host feed: a background thread gathers batch k+1 (disk
                # rows when streaming) and starts its device upload while
                # the device runs batch k (data/stream.py)
                from sie_tpu.data.stream import prefetch_to_device
                for batch in prefetch_to_device(
                        self.train_loader.epoch(epoch),
                        device_put=self.trainer._device_batch):
                    self.state, loss, _logits = self.trainer.train_step(
                        self.state, batch, beta)
                    losses.append(loss)
            if not losses:
                continue
            train_loss = float(np.mean([jax.device_get(l) for l in losses]))
            val_loss, val_acc = self.validation()
            if (epoch + 1) % cfg.log_interval == 0:
                remain = (time.time() - t0) * (cfg.train_epochs - epoch) / (epoch + 1)
                self._log(f"Epoch {epoch + 1}/{cfg.train_epochs} | "
                          f"Train Loss {train_loss:.4f} | Val Loss {val_loss:.4f} | "
                          f"Val Acc {val_acc:.4f} | Time Rem {convert_to_hms(remain)}")
            if self.metrics_hook is not None:
                self.metrics_hook({"epoch": epoch, "train_loss": train_loss,
                                   "val_loss": val_loss,
                                   "val_accuracy": val_acc,
                                   "beta": float(beta),
                                   "seconds": time.time() - t0})
            if epoch >= cfg.min_epochs:
                improved = early(-val_acc)
                if improved:
                    best = (jax.device_get(self.state.params),
                            jax.device_get(self.state.batch_stats))
                    # background=True: serialize+write overlaps the next
                    # epoch (params already on host; loads wait_pending)
                    ckpt.save_checkpoint(self.checkpoint_dir, best[0], best[1],
                                         meta={"epoch_stop": epoch,
                                               "val_accuracy": float(val_acc)},
                                         background=True)
            if snapshot_every and (epoch + 1) % snapshot_every == 0:
                ckpt.save_train_state(self.checkpoint_dir, self.state,
                                      epoch + 1, early.state_dict())
            if early.early_stop:
                self._log("Early stopping")
                self.epoch_stop = epoch
                break
            self.epoch_stop = epoch

        # reload best (reference exp:372-376); make sure the final
        # background checkpoint save has landed before we return
        ckpt.wait_pending(self.checkpoint_dir)
        self.state = self.state.replace(
            params=jax.device_put(best[0]),
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
        self.epoch_stop = ckpt.load_meta(self.checkpoint_dir).get(
            "epoch_stop", self.epoch_stop)
        return True

    def has_checkpoint(self) -> bool:
        return ckpt.has_checkpoint(self.checkpoint_dir)

    def load_torch_checkpoint(self, path: str):
        """Import a reference-trained ``checkpoint.pth``
        (EarlyStopping.save_checkpoint, reference utils/tools.py:34-38) into
        this experiment's state via compat/torch_import.py. Returns the list
        of source keys without a flax counterpart (buffers etc.)."""
        if self.state is None:
            self._init_state()
        from sie_tpu.compat.torch_import import load_into_state
        self.state, unused = load_into_state(self.state, self.cfg, path)
        return unused

    # ------------------------------------------------------------------
    def _eval_loader(self, loader, gating_value=None, collect=False):
        losses, preds, trues = [], [], []
        buf = {"p": [], "d": [], "eta": [], "sp": [], "dp": [], "x": []}
        num_class = self.cfg.num_class
        dev = None
        if self.device_resident:
            # explicit identity -> cache-tag map; an unknown loader falls back
            # to host feeding instead of silently aliasing another split's
            # device cache
            tags = {id(self.train_loader): "train", id(self.val_loader): "val",
                    id(self.test_loader): "test"}
            tag = tags.get(id(loader))
            if tag is not None:
                dev = self.trainer.device_data(tag, loader.ds)
        steps = list(loader.epoch_indices(0))
        staged = self.trainer.stage_steps(steps) if dev is not None else None
        scanned = None
        # whole eval pass in ONE dispatch + ONE host fetch
        # (trainer.eval_epoch_staged_scan); the per-batch path below pays
        # ~4 blocking device round trips per batch (measured 85.9 -> 5.3
        # ms/batch on-chip, BENCH_NOTES). Validation (collect=False) scans
        # iff cfg.scan_eval — --no-scan_eval always restores the per-batch
        # path, even under --scan_epoch (run.py help contract). The
        # collect=True test() pass stacks the full ModelInfo in HBM, so it
        # scans only under the explicit --scan_epoch opt-in.
        if staged is not None and (self.cfg.scan_epoch if collect
                                   else self.cfg.scan_eval):
            scanned = jax.device_get(self.trainer.eval_epoch_staged_scan(
                self.state, dev, staged, gating_value=gating_value,
                collect=collect))
        for bi, batch_idx in enumerate(steps):
            idx, w = batch_idx
            # x is consumed only by the collect buffer and the host-feed
            # fallback; gathering it unconditionally would pay a multi-MB
            # numpy fancy-index copy per batch in the scanned hot path
            x = loader.ds.x[idx] if (collect or dev is None) else None
            y = loader.ds.y[idx]
            if scanned is not None:
                logits = np.asarray(scanned[0][bi])
                ce = np.asarray(scanned[1][bi])
                model_loss = float(scanned[2][bi])
                info = (jax.tree.map(lambda a: a[bi], scanned[3])
                        if collect else None)
            else:
                if dev is not None:
                    logits, info = self.trainer.eval_step_staged(
                        self.state, dev, staged, bi,
                        gating_value=gating_value)
                else:
                    batch = (x, y, loader.ds.padding_mask[idx], w)
                    logits, info = self.trainer.eval_step(
                        self.state, batch, gating_value=gating_value)
                logits = np.asarray(jax.device_get(logits))
                ce = np.asarray(jax.device_get(
                    optax.softmax_cross_entropy_with_integer_labels(
                        jax.numpy.asarray(logits), jax.numpy.asarray(y))))
                model_loss = float(jax.device_get(info.loss).mean()) \
                    if info.loss is not None else 0.0
            # defensive label filtering (reference exp:906-929)
            keep = (w > 0) & (y >= 0) & (y < num_class)
            losses.append(ce[keep] + model_loss)
            preds.append(logits[keep])
            trues.append(y[keep])
            if collect:
                info = jax.device_get(info)
                buf["x"].append(x[keep])
                if info.p is not None:
                    buf["p"].append(np.asarray(info.p)[keep])
                    buf["d"].append(np.asarray(info.d)[keep])
                    buf["sp"].append(np.asarray(info.shapelet_preds)[keep])
                if info.eta is not None:
                    buf["eta"].append(np.asarray(info.eta)[keep])
                    buf["dp"].append(np.asarray(info.dnn_preds)[keep])
        if not losses:
            return float("inf"), np.zeros((0, 1)), np.zeros((0,)), buf
        return (float(np.concatenate(losses).mean()),
                np.concatenate(preds), np.concatenate(trues), buf)

    def validation(self):
        """(reference exp:380-421)"""
        loss, preds, trues, _ = self._eval_loader(self.val_loader)
        if len(trues) == 0:
            return float("inf"), 0.0
        return loss, accuracy(np.argmax(preds, -1), trues)

    # ------------------------------------------------------------------
    def test(self, save_csv: bool = True, result_dir: Optional[str] = None):
        """(reference exp:828-1138 + the dead-draft CSV spec exp:500-532)"""
        cfg = self.cfg
        if self.state is None:
            self._init_state()
        loss, preds, trues, buf = self._eval_loader(
            self.test_loader, gating_value=cfg.gating_value, collect=True)
        y_pred = np.argmax(preds, -1) if len(preds) else np.zeros((0,), int)
        acc = accuracy(y_pred, trues)

        result = ClassificationResult(
            accuracy=acc, loss=loss, num_samples=len(trues),
            x=np.concatenate(buf["x"]) if buf["x"] else None,
            trues=trues, preds=preds,
            p=np.concatenate(buf["p"]) if buf["p"] else None,
            d=np.concatenate(buf["d"]) if buf["d"] else None,
            eta=np.concatenate(buf["eta"]) if buf["eta"] else None,
            shapelet_preds=np.concatenate(buf["sp"]) if buf["sp"] else None,
            dnn_preds=np.concatenate(buf["dp"]) if buf["dp"] else None,
        )

        params = jax.device_get(self.state.params)
        if cfg.model in ("SBM", "LTS", "InterpGN"):
            sbm_params = params.get("sbm", params)
            kernel = np.asarray(sbm_params["output_layer"]["kernel"])
            result.w = kernel.T                    # torch layout (num_class, F)
            result.shapelets = extract_shapelets(params)

        metrics = {
            "accuracy": acc * 100.0,
            "loss": loss,
            "num_samples": len(trues),
            "class_distribution": class_distribution(trues, cfg.num_class)
            if len(trues) else {},
            "random_baseline": 100.0 / cfg.num_class,
        }
        self._log(f"Test accuracy {metrics['accuracy']:.2f}% "
                  f"(random baseline {metrics['random_baseline']:.2f}%)")

        if save_csv:
            result.summary = self._summary_frame(result, metrics)
            out_dir = result_dir or os.path.join(cfg.result_dir, cfg.model)
            os.makedirs(out_dir, exist_ok=True)
            ts = datetime.now().strftime("%Y-%m-%d-%H-%M-%S")
            path = os.path.join(
                out_dir, f"{cfg.dataset}-{cfg.seed}-{cfg.model}-"
                         f"{cfg.num_shapelet}-{cfg.lambda_div}-{cfg.lambda_reg}-{ts}.csv")
            result.summary.to_csv(path, index=False)
            self._log(f"Test summary saved at: {path}")
        # one return type regardless of save_csv: the full ClassificationResult
        # (the summary frame rides on result.summary)
        return loss, metrics, result

    def _summary_frame(self, result: ClassificationResult, metrics: dict):
        import pandas as pd
        cfg = self.cfg
        row = {k: getattr(cfg, k) for k in (
            "model", "dataset", "dnn_type", "train_epochs", "num_shapelet",
            "lambda_reg", "lambda_div", "epsilon", "lr", "seed", "pos_weight",
            "beta_schedule", "gating_value", "distance_func", "sbm_cls")}
        row["test_accuracy"] = result.accuracy
        row["test_loss"] = result.loss
        row["epoch_stop"] = self.epoch_stop
        if result.eta is not None:
            row["eta_mean"] = float(result.eta.mean())
            row["eta_std"] = float(result.eta.std())
        if result.w is not None:
            w = result.w
            if result.d is not None and len(result.trues):
                row["shapelet_score"] = compute_shapelet_score(
                    result.d, w, np.argmax(result.preds, -1), result.trues)
            aw = np.abs(w)
            for thr, tag in ((1.0, "10"), (0.5, "5"), (0.1, "1")):
                row[f"w_sum_{tag}"] = float((aw > thr).sum())
                row[f"w_mean_{tag}"] = float((aw > thr).mean())
            row["w_max"] = float(aw.max())
            row["w_gini_clip"] = gini_coefficient(np.clip(w, 0, None))
            row["w_gini_abs"] = gini_coefficient(aw)
        return pd.DataFrame({k: [v] for k, v in row.items()})
