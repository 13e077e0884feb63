"""Classification / imputation / anomaly backbones for the resurrected
layer families (sie_tpu/models/extra/backbones.py): forward shapes, grad
flow, registry reachability (standalone DNN + inside InterpGN), and a
slow e2e classification training run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sie_tpu.config import Config

FAMILIES = ["Autoformer", "FEDformer", "ETSformer", "Pyraformer",
            "Crossformer"]


def _cfg(**kw):
    base = dict(model="DNN", seq_len=32, enc_in=3, c_out=3, num_class=4,
                d_model=16, d_ff=32, n_heads=2, e_layers=2, moving_avg=5,
                factor=1, top_k=2, dropout=0.1, amp=False, use_pallas=False)
    base.update(kw)
    return Config(**base)


def _x(cfg, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(2, cfg.seq_len, cfg.enc_in)),
                       jnp.float32)


def _grads_finite_nonzero(model, params, args, kwargs=None):
    kwargs = kwargs or {}

    def loss_fn(p):
        out = model.apply({**params, "params": p}, *args, train=True,
                          rngs={"dropout": jax.random.PRNGKey(2)},
                          mutable=["batch_stats"], **kwargs)[0]
        return jnp.mean(out ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(params["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert bool(jnp.isfinite(loss))
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    assert sum(float(jnp.abs(g).sum()) for g in leaves) > 0.0


@pytest.mark.parametrize("name", FAMILIES)
def test_classification_backbone(name):
    from sie_tpu.models.registry import DNN_REGISTRY
    cfg = _cfg(dnn_type=name)
    model = DNN_REGISTRY[name](cfg)
    x = _x(cfg)
    mask = jnp.ones((2, cfg.seq_len), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, x, mask)
    out = model.apply(params, x, mask)
    assert out.shape == (2, cfg.num_class)
    assert bool(jnp.isfinite(out).all())
    _grads_finite_nonzero(model, params, (x, mask))


@pytest.mark.parametrize("name", ["Autoformer", "Crossformer"])
def test_interpgn_with_extra_backbone(name):
    """The extra families serve as the deep expert inside InterpGN."""
    from sie_tpu.models.registry import build_model
    cfg = _cfg(model="InterpGN", dnn_type=name, num_shapelet=2)
    model = build_model(cfg)
    x = _x(cfg)
    mask = jnp.ones((2, cfg.seq_len), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, x, mask)
    out, info = model.apply(params, x, mask)
    assert out.shape == (2, cfg.num_class)
    assert info.eta.shape == (2, 1)
    assert bool(jnp.isfinite(out).all())


@pytest.mark.parametrize("task", ["imputation", "anomaly"])
def test_dense_task_registry(task):
    """build_task_model resolves every extra family for the dense tasks."""
    from sie_tpu.train.tasks import build_task_model
    for name in FAMILIES:
        model = build_task_model(_cfg(dnn_type=name), task)
        assert model is not None


@pytest.mark.parametrize("name", FAMILIES)
def test_dense_task_backbone(name):
    """Imputer/anomaly representation: (B, T, enc_in) -> (B, T, c_out)."""
    from sie_tpu.models.extra.backbones import make_dense_task
    cfg = _cfg(dnn_type=name)
    model = make_dense_task(name)(cfg)
    x = _x(cfg)
    mask = jnp.ones_like(x)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, x, None, mask)
    out = model.apply(params, x, None, mask)
    assert out.shape == (2, cfg.seq_len, cfg.c_out)
    assert bool(jnp.isfinite(out).all())
    _grads_finite_nonzero(model, params, (x, None, mask))


def test_crossformer_dense_unpadded_alignment():
    """T an exact multiple of seg_len: no front pad, output aligns 1:1."""
    from sie_tpu.models.extra.backbones import make_dense_task
    cfg = _cfg(dnn_type="Crossformer", seq_len=24)
    model = make_dense_task("Crossformer")(cfg)
    x = _x(cfg)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, x)
    out = model.apply(params, x)
    assert out.shape == (2, 24, cfg.c_out)


@pytest.mark.slow
def test_classification_e2e_extra_backbone(tmp_path):
    """Full Experiment train/test with an extra-family deep expert."""
    from sie_tpu.data.synthetic import write_synthetic_uea
    from sie_tpu.train.experiment import Experiment
    write_synthetic_uea(str(tmp_path), "ToyX", n_train=24, n_test=12,
                        n_dims=3, length=32, n_classes=2, seed=3)
    cfg = Config(model="InterpGN", dnn_type="Autoformer", data="UEA",
                 data_root=str(tmp_path), dataset="ToyX", num_shapelet=2,
                 d_model=16, d_ff=32, n_heads=2, e_layers=1, moving_avg=5,
                 batch_size=8, train_epochs=3, patience=3, seed=0,
                 checkpoint_dir=str(tmp_path / "ckpt"), amp=False)
    exp = Experiment(cfg)
    exp.train()
    loss, metrics, result = exp.test(save_csv=False)
    assert np.isfinite(loss)
    assert 0.0 <= result.accuracy <= 1.0
