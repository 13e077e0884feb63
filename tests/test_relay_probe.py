"""Relay liveness gate (sie_tpu/utils/relay.py): on-chip driver scripts
probe the backend in a subprocess and refuse to start when the axon relay
is down (CLAUDE.md gotcha) — but must NOT touch the relay when the process
already pinned jax to the CPU backend (the test suite, relay-down CPU
verification runs)."""

from sie_tpu.utils import relay


def test_cpu_forced_detected_under_conftest():
    # conftest.py pins jax_platforms to cpu for the whole suite
    assert relay._cpu_forced() is True


def test_require_backend_skips_probe_when_cpu_forced(monkeypatch):
    def boom(*a, **kw):  # pragma: no cover - must not be reached
        raise AssertionError("subprocess probe ran despite CPU-forced jax")

    monkeypatch.setattr(relay, "probe_backend", boom)
    relay.require_backend(what="test")  # returns, no probe, no exit


def test_require_backend_exits_on_dead_backend(monkeypatch, capsys):
    import pytest

    monkeypatch.setattr(relay, "_cpu_forced", lambda: False)
    monkeypatch.setattr(relay, "probe_backend",
                        lambda timeout_s: (False, "probe matmul timed out "
                                                  "after 1s (relay hang)"))
    with pytest.raises(SystemExit) as ei:
        relay.require_backend(what="/abs/path/to/script.py")
    assert ei.value.code == 1
    err = capsys.readouterr().err
    assert "relay hang" in err          # failure mode is surfaced (ADVICE r4)
    assert "/abs/path" not in err       # basename only (ADVICE r4)
    assert "script.py" in err


def test_probe_backend_distinguishes_crash_from_hang(monkeypatch):
    """A probe subprocess that exits nonzero must be reported as a crash
    with a stderr tail, not as a relay timeout (ADVICE r4)."""
    import subprocess

    def fake_run(*a, **kw):
        raise subprocess.CalledProcessError(
            returncode=3, cmd=a[0], stderr=b"ImportError: no backend\n")

    monkeypatch.setattr(relay.subprocess, "run", fake_run)
    alive, detail = relay.probe_backend(timeout_s=1)
    assert alive is False
    assert "rc=3" in detail and "ImportError: no backend" in detail
    assert "timed out" not in detail

    def fake_hang(*a, **kw):
        raise subprocess.TimeoutExpired(cmd=a[0], timeout=1)

    monkeypatch.setattr(relay.subprocess, "run", fake_hang)
    alive, detail = relay.probe_backend(timeout_s=1)
    assert alive is False and "timed out" in detail
