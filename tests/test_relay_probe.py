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

    monkeypatch.setattr(relay, "backend_alive", boom)
    relay.require_backend(what="test")  # returns, no probe, no exit


def test_require_backend_exits_on_dead_backend(monkeypatch):
    import pytest

    monkeypatch.setattr(relay, "_cpu_forced", lambda: False)
    monkeypatch.setattr(relay, "backend_alive", lambda timeout_s: False)
    with pytest.raises(SystemExit) as ei:
        relay.require_backend(what="test")
    assert ei.value.code == 1
