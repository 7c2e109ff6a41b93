"""Multi-device sharding + training tests on the virtual 8-device CPU mesh
(SURVEY.md §4: multi-chip behavior is tested the JAX way)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppocr_tpu.models import init_rec_params, rec_forward
from ppocr_tpu.ops.ctc import ctc_topk_device
from ppocr_tpu.parallel import make_mesh, shard_batch
from ppocr_tpu.parallel.mesh import shard_rec_params, sharded_rec_infer
from ppocr_tpu.train import make_train_step
from ppocr_tpu.train.trainer import ctc_train_loss


needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@needs_8
def test_mesh_shapes():
    mesh = make_mesh(8, model=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")
    trivial = make_mesh(1)
    assert trivial.devices.shape == (1, 1)


@needs_8
def test_data_parallel_rec_matches_single_device():
    params = init_rec_params(seed=0)
    x = np.random.default_rng(0).normal(0, 1, (8, 48, 64, 3)).astype(np.float32)

    idx1, val1 = jax.jit(
        lambda p, b: ctc_topk_device(rec_forward(p, b))
    )(params, x)

    mesh = make_mesh(8, model=1)
    run = sharded_rec_infer(mesh)
    sharded_params = shard_rec_params(mesh, params)
    idx8, val8 = run(sharded_params, x)

    np.testing.assert_array_equal(np.asarray(idx1), np.asarray(idx8))
    np.testing.assert_allclose(np.asarray(val1), np.asarray(val8), rtol=1e-5)


@needs_8
def test_tensor_parallel_head_matches():
    params = init_rec_params(seed=1)
    x = np.random.default_rng(1).normal(0, 1, (4, 48, 64, 3)).astype(np.float32)
    ref = np.asarray(jax.jit(rec_forward)(params, x))

    mesh = make_mesh(8, model=2)
    sharded_params = shard_rec_params(mesh, params)
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else mesh:
        out = np.asarray(jax.jit(rec_forward)(sharded_params, shard_batch(mesh, x)))
    np.testing.assert_allclose(ref, out, rtol=2e-4, atol=1e-6)


@needs_8
def test_train_step_decreases_loss():
    mesh = make_mesh(8, model=2)
    params = init_rec_params(seed=0)
    _, init_fn, step_fn = make_train_step(mesh, learning_rate=3e-4)
    state = init_fn(params)

    rng = np.random.default_rng(0)
    batch = {
        "images": rng.normal(0, 1, (8, 48, 64, 3)).astype(np.float32),
        "labels": np.tile(np.array([[5, 9, 2, 0]], np.int32), (8, 1)),
        "label_paddings": np.tile(
            np.array([[0, 0, 0, 1]], np.float32), (8, 1)
        ),
    }
    loss0 = float(ctc_train_loss(params, {k: jnp.asarray(v) for k, v in batch.items()}))
    state, l1 = step_fn(state, batch)
    state, l2 = step_fn(state, batch)
    state, l3 = step_fn(state, batch)
    assert np.isfinite([l1, l2, l3]).all()
    assert float(l3) < loss0  # same batch thrice → loss must drop
    assert int(state.step) == 3


def test_graft_entry_single_chip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (2, 12, 6625)
    assert np.isfinite(np.asarray(out)).all()


@needs_8
def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_make_mesh_explicit_data_subsets_devices():
    """data= smaller than the device count takes the first data*model
    devices (review r3: it crashed in numpy reshape); oversubscription is
    a clear error."""
    import pytest

    from ppocr_tpu.parallel import make_mesh

    m = make_mesh(data=1, model=1)
    assert dict(zip(m.axis_names, m.devices.shape)) == {"data": 1, "model": 1}
    m2 = make_mesh(data=2, model=2)
    assert m2.devices.size == 4
    with pytest.raises(ValueError, match="needs 32 devices"):
        make_mesh(data=16, model=2)
