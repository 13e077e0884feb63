#!/usr/bin/env python
"""CLI driver — drop-in flag-compatible with the reference `run.py:14-144,490-692`.

Multi-seed loop over {0, 42, 1234, 8237, 2023} (or --seed), per seed:
build experiment -> skip training when the checkpoint already exists ->
train -> reload best -> test (CSV + pickle) -> accuracy vs random baseline.

Known reference quirks intentionally fixed (SURVEY.md SS0):
- `--amp` is a proper on/off pair (`--amp/--no-amp`, default on) instead of the
  reference's inverted `action='store_false'` trap (run.py:100);
- subject_ids parsing happens once (the reference discards it by re-calling
  get_args(), run.py:518).
"""

from __future__ import annotations

import argparse
import os
import pickle

from sie_tpu.config import DEFAULT_SEEDS, Config


def get_args(argv=None):
    p = argparse.ArgumentParser()
    # ===== EEG data params =====
    p.add_argument("--data", type=str, default="EEG3",
                   choices=["EEG", "EEG3", "UEA", "Monash",
                            # forecast / anomaly families (full data_dict
                            # surface, reference data_factory.py:10-26) —
                            # reachable via the extended --task_name below
                            "ETTh1", "ETTh2", "ETTm1", "ETTm2", "custom",
                            "m4", "PSM", "MSL", "SMAP", "SMD", "SWAT"])
    p.add_argument("--data_root", type=str, default="./data")
    p.add_argument("--json_path", type=str, default="./data/textmaps.json")
    p.add_argument("--target_channels", type=int, default=122)
    p.add_argument("--target_timepoints", type=int, default=1651)
    p.add_argument("--max_files", type=int, default=1000)
    p.add_argument("--max_subjects", type=int, default=5)
    p.add_argument("--synthetic_trials", type=int, default=0,
                   help="synthetic-EEG fallback: generate exactly this many "
                        "trials (imbalanced classes, max_subjects subjects); "
                        "0 = legacy min(max_files*10, 240)")
    p.add_argument("--subject_id", type=str, default="sub-01")
    p.add_argument("--subject_ids", type=str, nargs="+",
                   default=["sub-01,sub-02,sub-03"])
    p.add_argument("--task_type", type=str, default="imagine",
                   choices=["imagine", "read", "both"])
    p.add_argument("--normalizer", type=str, default="standardization",
                   choices=["standardization", "minmax", "per_sample_std",
                            "per_sample_minmax"],
                   help="UEA whole-set/per-sample normalization mode "
                        "(reference data_factory/uea.py:85-109)")
    # ===== EEGCNN =====
    p.add_argument("--eegcnn_layers", type=int, default=2)
    p.add_argument("--eegcnn_pooling", type=str, default="mean",
                   choices=["none", "mean", "sum", "top"])
    p.add_argument("--eegcnn_cnn_f1", type=int, default=8)
    p.add_argument("--eegcnn_cnn_f2", type=int, default=8)
    p.add_argument("--eegcnn_kernel1", type=int, default=125)
    p.add_argument("--eegcnn_kernel2", type=int, default=25)
    p.add_argument("--eegcnn_pool1", type=int, default=2)
    p.add_argument("--eegcnn_pool2", type=int, default=5)
    p.add_argument("--eegcnn_dropout1", type=float, default=0.1)
    p.add_argument("--eegcnn_dropout2", type=float, default=0.1)
    p.add_argument("--eegcnn_n_heads", type=int, default=8)
    p.add_argument("--eegcnn_d_ff", type=int, default=256)
    # ===== model / SBM hyperparams =====
    p.add_argument("--model", type=str, default="InterpGN",
                   choices=["SBM", "LTS", "InterpGN", "DNN", "EEGCNN"])
    p.add_argument("--dnn_type", type=str, default="Transformer",
                   choices=["FCN", "Transformer", "TimesNet", "PatchTST",
                            "ResNet",
                            # families assembled from the resurrected layer
                            # library (models/extra/) — usable for every
                            # task, incl. classification inside InterpGN
                            "Autoformer", "FEDformer", "ETSformer",
                            "Pyraformer", "Crossformer"])
    p.add_argument("--dataset", type=str, default="BasicMotions")
    p.add_argument("--lambda_reg", type=float, default=0.1)
    p.add_argument("--lambda_div", type=float, default=0.1)
    p.add_argument("--epsilon", type=float, default=1.0)
    p.add_argument("--num_shapelet", type=int, default=10)
    p.add_argument("--gating_value", type=float, default=None)
    p.add_argument("--pos_weight", action="store_true")
    p.add_argument("--sbm_cls", type=str, default="linear")
    p.add_argument("--distance_func", type=str, default="euclidean")
    p.add_argument("--beta_schedule", type=str, default="constant")
    p.add_argument("--memory_efficient", action="store_true")
    # ===== experiment config =====
    p.add_argument("--lr", type=float, default=5e-3)
    p.add_argument("--lr_decay", action="store_true")
    p.add_argument("--lr_warmup_epochs", type=float, default=0.0,
                   help="TPU-side extension: linear lr warmup over the first "
                        "N epochs (0 = off, reference behavior)")
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--gradient_clip", type=float, default=0)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--log_interval", type=int, default=20)
    p.add_argument("--min_epochs", type=int, default=0)
    p.add_argument("--train_epochs", type=int, default=500)
    p.add_argument("--num_workers", type=int, default=0)
    p.add_argument("--patience", type=int, default=50)
    p.add_argument("--multi_gpu", action="store_true",
                   help="parity flag; use --mesh for TPU parallelism")
    p.add_argument("--test_only", action="store_true")
    p.add_argument("--seed", type=int, default=-1)
    p.add_argument("--amp", action=argparse.BooleanOptionalAction, default=True)
    # ===== basic config =====
    p.add_argument("--task_name", type=str, default="classification",
                   choices=["classification", "regression",
                            # TPU-side extension: the reference restricts the
                            # CLI to the first two (run.py:103) while shipping
                            # the loaders and model branches for the rest —
                            # here they are runnable end-to-end (train/tasks.py)
                            "long_term_forecast", "short_term_forecast",
                            "imputation", "anomaly_detection"])
    p.add_argument("--model_id", type=str, default="test")
    p.add_argument("--embed", type=str, default="timeF")
    p.add_argument("--freq", type=str, default="h")
    # ===== DNN configs =====
    p.add_argument("--top_k", type=int, default=5)
    p.add_argument("--num_kernels", type=int, default=6)
    p.add_argument("--patch_chunk_rows", type=int, default=0,
                   help="PatchTST encoder scan chunk (rows); 0=default 2048, "
                        ">= B*C disables chunking and remat")
    p.add_argument("--enc_in", type=int, default=7)
    p.add_argument("--dec_in", type=int, default=7)
    p.add_argument("--c_out", type=int, default=7)
    p.add_argument("--d_model", type=int, default=512)
    p.add_argument("--n_heads", type=int, default=8)
    p.add_argument("--e_layers", type=int, default=2)
    p.add_argument("--d_layers", type=int, default=1)
    p.add_argument("--d_ff", type=int, default=2048)
    p.add_argument("--moving_avg", type=int, default=25)
    p.add_argument("--factor", type=int, default=1)
    p.add_argument("--distil", action="store_false", default=True)
    p.add_argument("--dropout", type=float, default=0)
    p.add_argument("--activation", type=str, default="gelu")
    p.add_argument("--output_attention", action="store_true")
    p.add_argument("--seq_len", type=int, default=96,
                   help="forecast lookback window (classification/regression "
                   "derive seq_len from the data and ignore this)")
    p.add_argument("--label_len", type=int, default=48)
    p.add_argument("--pred_len", type=int, default=96)
    p.add_argument("--seasonal_patterns", type=str, default="Monthly",
                   help="M4 subset (reference run.py:134)")
    p.add_argument("--inverse", action="store_true", default=False,
                   help="report forecast test metrics in original units by "
                   "undoing the train-fitted standardization (reference "
                   "run.py:135; functional here via --task_name "
                   "long_term_forecast)")
    p.add_argument("--features", type=str, default="M",
                   choices=["M", "S", "MS"],
                   help="forecast mode: M multi->multi, S uni->uni, "
                   "MS multi->target")
    p.add_argument("--target", type=str, default="OT",
                   help="target column for --features S/MS")
    p.add_argument("--mask_rate", type=float, default=0.25,
                   help="imputation: fraction of points hidden")
    p.add_argument("--anomaly_ratio", type=float, default=1.0,
                   help="anomaly detection: threshold percentile (expected "
                   "%% anomalous points)")
    # ===== TPU-specific =====
    p.add_argument("--mesh", type=str, default="",
                   help="device mesh, e.g. '8' (dp) or '4x2' (dp x mp)")
    p.add_argument("--mesh_axes", type=str, default="data,model",
                   help="comma-separated mesh axis names matching --mesh, "
                        "from {data, seq, model, expert} — e.g. "
                        "'data,seq,model' with --mesh 2x2x2 for dp x sp x "
                        "tp, or 'data,expert' with --mesh 2x4 for dp x ep")
    p.add_argument("--moe_experts", type=int, default=0,
                   help="replace the Transformer encoder FFN with a "
                        "Switch-style mixture of this many expert FFNs "
                        "(models/moe.py); shard them with an 'expert' mesh "
                        "axis (beyond-reference)")
    p.add_argument("--moe_capacity_factor", type=float, default=1.25)
    p.add_argument("--moe_top_k", type=int, default=1)
    p.add_argument("--moe_aux_weight", type=float, default=0.01)
    p.add_argument("--no_pallas", action="store_true")
    p.add_argument("--fused_attention_max_len", type=int, default=4096,
                   help="sequence length above which attention falls back "
                        "to XLA (0 = unlimited via the kv-blocked kernel "
                        "variant)")
    p.add_argument("--scan_epoch", action="store_true",
                   help="fuse each training epoch into one compiled "
                        "dispatch (lax.scan over the staged schedule; "
                        "device-resident input path only)")
    p.add_argument("--scan_eval", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="run each validation pass as one scanned dispatch "
                        "+ one host fetch (16x faster than per-batch "
                        "through a remote-attached TPU; --no-scan_eval "
                        "restores the per-batch path)")
    p.add_argument("--fused_attention_min_len", type=int, default=256,
                   help="sequence length below which attention falls back "
                        "to XLA (short-T/huge-BH shapes lose to tiny kernel "
                        "launches; 0 = always use the kernel)")
    p.add_argument("--attention_variant", type=str, default="full",
                   choices=["full", "ds", "prob", "lsh"],
                   help="encoder attention mechanism (beyond-reference: the "
                        "reference defines DS/Prob/Reformer attention in "
                        "layers/SelfAttention_Family.py but never wires "
                        "them to a model)")
    p.add_argument("--loso", action="store_true",
                   help="leave-one-subject-out sweep (EEG)")
    p.add_argument("--checkpoint_dir", type=str, default="./checkpoints")
    p.add_argument("--result_dir", type=str, default="./result")
    p.add_argument("--cache_dir", type=str, default="./cache")
    p.add_argument("--stream_from_disk", action="store_true",
                   help="stream batches from a memmap cache dir instead of "
                        "holding splits in RAM/HBM (archives larger than "
                        "host memory; sie_tpu/data/stream.py)")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler (XProf) trace of training here")
    p.add_argument("--export_bundle", type=str, default=None,
                   help="after test, export a self-contained serving bundle "
                        "(config.json + weights; sie_tpu/serve.py) here — "
                        "load with sie_tpu.serve.Predictor.load_bundle")
    p.add_argument("--augment", type=str, default="",
                   help="comma-separated train-time on-device augmentations "
                        "from {noise, scale, chdrop, tshift} "
                        "(data/augment.py; beyond-reference, off by "
                        "default)")
    p.add_argument("--augment_noise_std", type=float, default=0.1)
    p.add_argument("--augment_scale_std", type=float, default=0.1)
    p.add_argument("--augment_chdrop_prob", type=float, default=0.1)
    p.add_argument("--augment_tshift_max", type=int, default=16)
    p.add_argument("--metrics_jsonl", type=str, default=None,
                   help="append one JSON line per epoch (epoch/train_loss/"
                        "val_loss/beta/seconds/seed, plus val_accuracy for "
                        "classification) — machine-readable training "
                        "telemetry for monitoring; the reference only "
                        "prints")
    p.add_argument("--export_stablehlo", type=str, default=None,
                   help="after test, export self-contained ahead-of-time "
                        "StableHLO serving artifacts (weights baked in; "
                        "serve with sie_tpu.serve.CompiledPredictor — no "
                        "model code needed on the host). Platform-bound: "
                        "export on the platform you serve on")
    p.add_argument("--stablehlo_batch_sizes", type=int, nargs="+",
                   default=[1, 32],
                   help="batch buckets to export with --export_stablehlo")
    p.add_argument("--quantize_bundle", action="store_true",
                   help="with --export_bundle: store large weight tensors "
                        "as per-channel int8 (sie_tpu/quant.py, ~4x "
                        "smaller bundle + serving HBM; dequantized inside "
                        "the compiled program on load)")
    p.add_argument("--export_torch_ckpt", type=str, default=None,
                   help="after test, write the trained weights as a "
                        "reference-loadable torch checkpoint.pth "
                        "(sie_tpu/compat/torch_export.py; load there with "
                        "strict=False)")
    p.add_argument("--import_torch_ckpt", type=str, default=None,
                   help="evaluate/export a reference-trained torch "
                        "checkpoint.pth (reference utils/tools.py:34-38) on "
                        "TPU: its state_dict is converted into this model's "
                        "variables (sie_tpu/compat/torch_import.py) and "
                        "training is skipped")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans (fail fast on NaN/Inf; the "
                        "reference's closest analog is cudnn-determinism in "
                        "set_seed, run.py:152)")
    return p.parse_args(argv)


def args_to_config(args, seed: int) -> Config:
    subject_ids = []
    for s in args.subject_ids:
        subject_ids.extend(t.strip() for t in s.split(",") if t.strip())
    mesh_shape = tuple(int(t) for t in args.mesh.split("x") if t) if args.mesh else ()
    pooling = None if args.eegcnn_pooling == "none" else args.eegcnn_pooling
    fields = {f for f in Config.__dataclass_fields__}
    kw = {k: v for k, v in vars(args).items() if k in fields}
    from sie_tpu.data.augment import validate as validate_augment
    kw.update(subject_ids=tuple(subject_ids), seed=seed,
              augment=validate_augment(
                  tuple(t.strip() for t in args.augment.split(",")
                        if t.strip())),
              mesh_shape=mesh_shape,
              mesh_axes=tuple(t.strip() for t in args.mesh_axes.split(",")
                              if t.strip()),
              use_pallas=not args.no_pallas,
              eegcnn_pooling=pooling, gradient_clip=float(args.gradient_clip),
              dropout=float(args.dropout))
    if args.data in ("EEG", "EEG3"):
        # label artifacts by the EEG workload, not the (UEA-only) --dataset
        # default (the reference writes 'BasicMotions' into EEG checkpoint
        # paths, run.py:74 + exp:140-152)
        kw["dataset"] = args.data
    elif args.data.startswith("ETT"):
        # ETT csv files are named after the dataset (ETTh1.csv, ...) — the
        # provider builds the path from cfg.dataset (provider.py:51)
        kw["dataset"] = args.data
    return Config(**kw)


def main(argv=None):
    args = get_args(argv)
    if args.debug_nans:
        import jax
        jax.config.update("jax_debug_nans", True)
    seeds = list(DEFAULT_SEEDS) if args.seed == -1 else [args.seed]
    all_results = []

    for i, seed in enumerate(seeds):
        print(f"\n===== experiment {i + 1}/{len(seeds)} — seed {seed} =====")
        cfg = args_to_config(args, seed)

        mesh = None
        if cfg.mesh_shape:
            from sie_tpu.parallel.mesh import make_mesh
            mesh = make_mesh(cfg)

        if args.loso and args.data in ("EEG", "EEG3"):
            from sie_tpu.parallel.loso import run_loso
            from sie_tpu.parallel.multihost import (init_distributed,
                                                    run_loso_multihost)
            if init_distributed():
                import jax
                # per-host fold parallelism over DCN: disjoint contiguous
                # fold ranges, no cross-host gradient traffic
                from sie_tpu.data.eeg import load_eeg_dataset
                probe = load_eeg_dataset(cfg, "train",
                                         three_class=(cfg.data == "EEG3"))
                n_subj = (int(probe.subject_ids.max()) + 1
                          if probe.subject_ids is not None else 1)
                fold_results, sl = run_loso_multihost(cfg, n_subj, mesh=mesh)
                print(f"[multihost] process {jax.process_index()}/"
                      f"{jax.process_count()} took folds {sl}")
            else:
                fold_results = run_loso(cfg, mesh=mesh)
            accs = [r["accuracy"] for r in fold_results]
            if not accs:
                # more hosts than folds: this host's slice is empty — don't
                # let np.mean([]) poison the cross-seed summary with NaN
                print("LOSO: no folds assigned to this host")
                continue
            import numpy as np
            num_class = 3 if cfg.data == "EEG3" else 39
            print(f"LOSO ({len(accs)} folds): accuracy "
                  f"{np.mean(accs):.2f} +/- {np.std(accs):.2f} "
                  f"(random baseline {100.0 / num_class:.2f})")
            all_results.append((seed, None, {"accuracy": float(np.mean(accs)),
                                             "random_baseline": 100.0 / num_class,
                                             "per_fold": fold_results}))
            continue

        if args.task_name in ("long_term_forecast", "short_term_forecast",
                              "imputation", "anomaly_detection"):
            from sie_tpu.train.tasks import TASK_EXPERIMENTS
            experiment = TASK_EXPERIMENTS[args.task_name](cfg)
            params = experiment.train(seed=seed, verbose=True)
            metrics = experiment.test(params)
            print(f"[{args.task_name}] test: "
                  + ", ".join(f"{k} {v:.5f}" for k, v in metrics.items()))
            result_dir = os.path.join(args.result_dir, args.model)
            os.makedirs(result_dir, exist_ok=True)
            if hasattr(experiment, "write_forecast_csv"):
                # M4 protocol: emit {group}_forecast.csv for M4Summary OWA
                print("forecasts written to "
                      + experiment.write_forecast_csv(params, result_dir))
            with open(os.path.join(result_dir,
                                   f"{args.task_name}_seed{seed}.pkl"),
                      "wb") as f:
                pickle.dump({"metrics": metrics, "args": vars(args)}, f)
            all_results.append((seed, None, metrics))
            continue

        metrics_hook = None
        if args.metrics_jsonl:
            import json as _json
            os.makedirs(os.path.dirname(args.metrics_jsonl) or ".",
                        exist_ok=True)

            def metrics_hook(rec, _seed=seed):
                rec = dict(rec, seed=_seed)
                with open(args.metrics_jsonl, "a") as f:
                    f.write(_json.dumps(rec) + "\n")
        if args.task_name == "regression":
            from sie_tpu.train.regression import RegressionExperiment
            experiment = RegressionExperiment(cfg, mesh=mesh,
                                              metrics_hook=metrics_hook)
        else:
            from sie_tpu.train.experiment import Experiment
            experiment = Experiment(cfg, mesh=mesh,
                                    metrics_hook=metrics_hook)

        if args.import_torch_ckpt:
            if not hasattr(experiment, "load_torch_checkpoint"):
                raise SystemExit("this experiment type does not support "
                                 "--import_torch_ckpt")
            unused = experiment.load_torch_checkpoint(args.import_torch_ckpt)
            print(f"imported torch checkpoint {args.import_torch_ckpt} "
                  f"({len(unused)} source keys without a flax counterpart)")
        elif not args.test_only:
            if experiment.has_checkpoint():
                print("checkpoint exists — skipping training")
                experiment.load_checkpoint()
            else:
                from sie_tpu.utils.profiling import trace
                with trace(args.profile_dir):
                    experiment.train()
        else:
            if not experiment.load_checkpoint():
                print("warning: no checkpoint found; testing a fresh model")

        test_loss, test_metrics, test_result = experiment.test(
            save_csv=True, result_dir=os.path.join(args.result_dir, args.model))
        result_file = os.path.join(experiment.checkpoint_dir, "test_results.pkl")
        os.makedirs(experiment.checkpoint_dir, exist_ok=True)
        with open(result_file, "wb") as f:
            # full per-seed result bundle (reference run.py:616-625): the
            # ClassificationResult carries x/p/d/eta/shapelets/w, everything
            # utils/shapelet_util.py visualization consumes
            pickle.dump({"test_loss": test_loss, "test_metrics": test_metrics,
                         "result": test_result, "args": vars(args)}, f)
        print(f"results pickled to {result_file}")

        if args.export_bundle:
            from sie_tpu.serve import Predictor
            bundle_dir = (os.path.join(args.export_bundle, f"seed-{seed}")
                          if len(seeds) > 1 else args.export_bundle)
            Predictor(experiment.cfg,
                      {"params": experiment.state.params,
                       "batch_stats": experiment.state.batch_stats}
                      ).save_bundle(bundle_dir,
                                    quantize=args.quantize_bundle)
            print(f"serving bundle exported to {bundle_dir}"
                  + (" (int8 weights)" if args.quantize_bundle else ""))

        if args.export_stablehlo:
            from sie_tpu.serve import Predictor
            hlo_dir = (os.path.join(args.export_stablehlo, f"seed-{seed}")
                       if len(seeds) > 1 else args.export_stablehlo)
            Predictor(experiment.cfg,
                      {"params": experiment.state.params,
                       "batch_stats": experiment.state.batch_stats}
                      ).export_stablehlo(
                hlo_dir, batch_sizes=tuple(args.stablehlo_batch_sizes))
            print(f"StableHLO serving artifacts exported to {hlo_dir}")

        if args.export_torch_ckpt:
            if not hasattr(experiment, "state"):
                raise SystemExit("--export_torch_ckpt covers classification "
                                 "models only")
            from sie_tpu.compat.torch_export import save_torch_checkpoint
            import jax
            pth = (args.export_torch_ckpt if len(seeds) == 1 else
                   args.export_torch_ckpt + f".seed{seed}")
            save_torch_checkpoint(
                pth, {"params": jax.device_get(experiment.state.params),
                      "batch_stats": jax.device_get(
                          experiment.state.batch_stats)},
                experiment.cfg)
            print(f"torch checkpoint exported to {pth}")

        if test_metrics and "accuracy" in test_metrics:
            acc = test_metrics["accuracy"]
            baseline = test_metrics["random_baseline"]
            print(f"accuracy {acc:.2f}% vs random baseline {baseline:.2f}% "
                  f"({acc - baseline:+.2f})")
        all_results.append((seed, test_loss, test_metrics))

    if len(all_results) > 1:
        accs = [m["accuracy"] for _, _, m in all_results
                if m and "accuracy" in m]
        if accs:
            import numpy as np
            print(f"\n=== {len(accs)} seeds: accuracy "
                  f"{np.mean(accs):.2f} +/- {np.std(accs):.2f} ===")
    return all_results


if __name__ == "__main__":
    main()
