"""Relay liveness probe for on-chip drivers.

The axon TPU relay in this deployment can go down entirely: even a tiny
matmul + device_get then hangs forever at ~0% CPU inside backend init
(observed r3 and r4 — CLAUDE.md "TPU-runtime gotchas"). jax.device_get has
no timeout, so a dead relay silently stalls any long certification or
benchmark run. This module probes the default backend in a SUBPROCESS
(the hang happens inside backend init, so the parent process must never
touch jax first) and lets drivers fail fast and loudly instead.

No reference parity — the torch reference has no remote-attached
accelerator; this is deployment infrastructure for this container.
"""

from __future__ import annotations

import subprocess
import sys

_PROBE = ("import jax, jax.numpy as jnp; x = jnp.ones((128, 128)); "
          "print(float(jax.device_get((x @ x).sum())))")


def probe_backend(timeout_s: int = 300):
    """Run the tiny matmul + device_get probe in a subprocess.

    Returns (alive: bool, detail: str) where detail distinguishes the
    failure modes — a hung relay (timeout) vs an immediately-crashing
    probe (nonzero exit, e.g. missing backend plugin), with a stderr tail
    for the latter — so callers don't misdiagnose a crash as an outage
    (ADVICE r4)."""
    try:
        subprocess.run([sys.executable, "-c", _PROBE], check=True,
                       timeout=timeout_s, stdout=subprocess.DEVNULL,
                       stderr=subprocess.PIPE)
        return True, "ok"
    except subprocess.TimeoutExpired:
        return False, f"probe matmul timed out after {timeout_s}s (relay hang)"
    except subprocess.CalledProcessError as e:
        tail = (e.stderr or b"").decode("utf-8", "replace").strip()
        tail = tail[-400:] if tail else "<no stderr>"
        return False, (f"probe subprocess exited rc={e.returncode} "
                       f"(crash, not a hang); stderr tail: {tail}")
    except Exception as e:  # noqa: BLE001 — e.g. no python executable
        return False, f"probe could not launch: {type(e).__name__}: {e}"


def backend_alive(timeout_s: int = 300) -> bool:
    """True iff the default jax backend answers a tiny matmul + device_get
    within `timeout_s`. A healthy relay answers in well under a minute
    (first touch pays backend init); CPU backends answer in seconds."""
    return probe_backend(timeout_s)[0]


def _cpu_forced() -> bool:
    """True when this process already pinned jax to the CPU backend (e.g.
    tests/conftest.py's jax.config.update('jax_platforms', 'cpu')). The CPU
    backend cannot hang, and the subprocess probe would NOT inherit the
    in-process config — it would touch the relay the caller explicitly
    opted out of."""
    try:
        import jax
        plats = jax.config.jax_platforms
        return bool(plats) and set(str(plats).split(",")) == {"cpu"}
    except Exception:  # noqa: BLE001 — no jax / no such option
        return False


def require_backend(timeout_s: int = 300, what: str = "this run") -> None:
    """Exit(1) with a loud message if the backend probe fails. Call at the
    top of every on-chip driver script BEFORE importing jax in-process."""
    if _cpu_forced():
        return
    alive, detail = probe_backend(timeout_s)
    if not alive:
        import os
        print(f"[relay] backend unreachable ({detail}) — refusing to start "
              f"{os.path.basename(str(what))}; rerun when the TPU relay is "
              f"back", file=sys.stderr)
        sys.exit(1)
