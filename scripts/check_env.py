#!/usr/bin/env python
"""Environment + data smoke test (reference data_factory/testdata.py:1-387 and
test_fix_import.py equivalents): verifies imports, devices, data paths, FIF
discovery, and exercises the preprocessing engine on one batch."""

from __future__ import annotations

import argparse
import os
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", default="./data")
    p.add_argument("--json_path", default="./data/textmaps.json")
    args = p.parse_args()

    print("== imports ==")
    import numpy as np
    import jax
    import flax, optax  # noqa: F401
    print(f"  jax {jax.__version__}  backend={jax.default_backend()}  "
          f"devices={jax.devices()}")
    try:
        import mne  # noqa: F401
        print(f"  mne {mne.__version__}")
        has_mne = True
    except ImportError:
        print("  mne NOT installed — .fif reading unavailable "
              "(npz cache / synthetic data still work)")
        has_mne = False

    print("== paths ==")
    print(f"  data_root {args.data_root}: exists={os.path.isdir(args.data_root)}")
    print(f"  json_path {args.json_path}: exists={os.path.isfile(args.json_path)}")

    if os.path.isdir(args.data_root):
        from sie_tpu.data.eeg import find_all_subjects, find_imagine_fif_files
        subs = find_all_subjects(args.data_root)
        print(f"  subjects found: {subs}")
        fifs = find_imagine_fif_files(args.data_root)
        print(f"  imagine .fif files: {len(fifs)}")
        for f in fifs[:5]:
            print(f"    {f}")
        if fifs and has_mne:
            import mne
            ep = mne.read_epochs(fifs[0], preload=True, verbose="ERROR")
            print(f"  first file: {len(ep)} epochs, "
                  f"{len(ep.ch_names)} channels, sfreq={ep.info['sfreq']}")

    print("== preprocessing engine (synthetic batch) ==")
    from sie_tpu.data.preprocess import preprocess_trials
    import numpy as np
    raw = np.random.default_rng(0).normal(0, 1e-5, (4, 125, 1651))
    out = preprocess_trials(raw, 122, 845)
    print(f"  preprocess (4,125,1651) -> {out.shape} "
          f"mean={float(abs(np.asarray(out)).mean()):.3f}")
    print("OK")


if __name__ == "__main__":
    main()
