"""Multi-host DATA parallelism: two real jax.distributed CPU processes
train one global batch over a cross-process 'data' mesh
(parallel/mesh.py:global_batch_from_local — each host feeds only its local
rows), and the loss trajectory must match a single-process run on the full
batch exactly. Beyond-reference (the reference's only parallelism is
single-process nn.DataParallel)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


_WORKER = """
import json, os, sys
sys.path.insert(0, {repo!r})
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from sie_tpu.config import Config
from sie_tpu.parallel.mesh import make_mesh, mesh_spans_processes
from sie_tpu.parallel.multihost import init_distributed
from sie_tpu.train.trainer import Trainer

assert init_distributed() is True
assert jax.process_count() == 2 and jax.device_count() == 2

cfg = Config(model="SBM", data="UEA", seq_len=20, enc_in=3, num_class=2,
             num_shapelet=2, batch_size=8, dropout=0.0, amp=False,
             use_pallas=False, lr=1e-2, seed=0,
             mesh_shape=(2,), mesh_axes=("data",))
mesh = make_mesh(cfg)
assert mesh_spans_processes(mesh)

rng = np.random.default_rng(7)
y = rng.integers(0, 2, 8).astype(np.int32)
x = (rng.normal(size=(8, 20, 3)) + 1.5 * y[:, None, None]).astype(np.float32)
mask = np.ones((8, 20), np.float32)
w = np.ones((8,), np.float32)

pid = jax.process_index()
lo, hi = pid * 4, pid * 4 + 4           # this host's rows of the global batch
local = (x[lo:hi], y[lo:hi], mask[lo:hi], w[lo:hi])

trainer = Trainer(cfg, steps_per_epoch=3, mesh=mesh)
state = trainer.init_state(local, seed=0)
losses = []
for _ in range(3):
    gbatch = trainer.device_batch_from_local(local)
    state, loss, _ = trainer.train_step(state, gbatch, beta=1.0)
    losses.append(float(jax.device_get(loss)))
with open(os.path.join({out!r}, "loss_%d.json" % pid), "w") as f:
    json.dump(losses, f)
"""


@pytest.mark.slow
def test_two_process_dp_matches_single_process(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=repo, out=str(tmp_path)))
    s = socket.socket()
    s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    env_base = {**os.environ, "SIE_TPU_COORDINATOR": f"localhost:{port}",
                "SIE_TPU_NUM_PROCESSES": "2", "JAX_PLATFORMS": "cpu"}
    env_base.pop("XLA_FLAGS", None)
    logs = [open(tmp_path / f"worker_{i}.log", "wb") for i in range(2)]
    s.close()
    procs = [subprocess.Popen([sys.executable, str(script)],
                              env={**env_base, "SIE_TPU_PROCESS_ID": str(i)},
                              stdout=logs[i], stderr=subprocess.STDOUT)
             for i in range(2)]
    try:
        for p in procs:
            p.wait(timeout=900)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for lg in logs:
            lg.close()
    for i, p in enumerate(procs):
        out = (tmp_path / f"worker_{i}.log").read_bytes().decode()
        assert p.returncode == 0, out[-3000:]

    with open(tmp_path / "loss_0.json") as f:
        l0 = json.load(f)
    with open(tmp_path / "loss_1.json") as f:
        l1 = json.load(f)
    np.testing.assert_allclose(l0, l1, rtol=1e-6)   # same global program

    # single-process reference on the identical full batch
    from sie_tpu.config import Config
    from sie_tpu.train.trainer import Trainer
    cfg = Config(model="SBM", data="UEA", seq_len=20, enc_in=3, num_class=2,
                 num_shapelet=2, batch_size=8, dropout=0.0, amp=False,
                 use_pallas=False, lr=1e-2, seed=0)
    rng = np.random.default_rng(7)
    y = rng.integers(0, 2, 8).astype(np.int32)
    x = (rng.normal(size=(8, 20, 3))
         + 1.5 * y[:, None, None]).astype(np.float32)
    batch = (x, y, np.ones((8, 20), np.float32), np.ones((8,), np.float32))
    tr = Trainer(cfg, steps_per_epoch=3)
    st = tr.init_state(batch, seed=0)
    ref = []
    for _ in range(3):
        st, loss, _ = tr.train_step(st, batch, beta=1.0)
        ref.append(float(loss))
    np.testing.assert_allclose(l0, ref, rtol=1e-5, atol=1e-6)
