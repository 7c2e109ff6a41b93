"""Numerics parity: hand-written NHWC models vs the graph executor.

The executor runs the exported graph op-by-op (ground truth for Paddle
semantics); the hand-written models must reproduce it to float tolerance —
with real weights for cls, and discriminative random weights for det/rec
(whose .pdiparams are not bundled; SURVEY.md §2.2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppocr_tpu.models import (
    cls_forward,
    convert_cls_params,
    convert_det_params,
    convert_rec_params,
    det_forward,
    init_cls_params,
    init_det_params,
    init_rec_params,
    rec_forward,
)
from ppocr_tpu.paddle_compat import (
    build_forward,
    init_random_params,
    load_params,
    load_program,
)


def _nchw(x_nhwc):
    return np.ascontiguousarray(np.transpose(x_nhwc, (0, 3, 1, 2)))


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


def test_det_parity_random_weights(reference_models, rng):
    prog = load_program(str(reference_models / "det" / "inference.pdmodel"))
    pp = init_random_params(prog, seed=7)
    x = rng.normal(0, 1, (1, 32, 64, 3)).astype(np.float32)

    ref = jax.jit(build_forward(prog))(pp, {"x": _nchw(x)})["sigmoid_0.tmp_0"]
    ours = jax.jit(det_forward)(convert_det_params(prog, pp), jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(ref)[:, 0], rtol=2e-4, atol=2e-5
    )


def test_cls_parity_real_weights(reference_models, rng):
    prog = load_program(str(reference_models / "cls" / "inference.pdmodel"))
    pp = load_params(prog, str(reference_models / "cls" / "inference.pdiparams"))
    x = rng.normal(0, 1, (3, 48, 192, 3)).astype(np.float32)

    ref = jax.jit(build_forward(prog))(pp, {"x": _nchw(x)})["softmax_0.tmp_0"]
    ours = jax.jit(cls_forward)(convert_cls_params(prog, pp), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_rec_parity_random_weights(reference_models, rng):
    prog = load_program(str(reference_models / "rec" / "inference.pdmodel"))
    pp = init_random_params(prog, seed=9)
    x = rng.normal(0, 1, (2, 48, 320, 3)).astype(np.float32)

    ref = jax.jit(build_forward(prog))(pp, {"x": _nchw(x)})["softmax_11.tmp_0"]
    ours = jax.jit(rec_forward)(convert_rec_params(prog, pp), jnp.asarray(x))
    assert ours.shape == (2, 40, 6625)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_random_init_shapes_match_converted(reference_models):
    """init_*_params must produce the exact tree/shape structure the
    converters emit (so training & serving paths are interchangeable)."""
    cases = [
        ("det", init_det_params, convert_det_params),
        ("cls", init_cls_params, convert_cls_params),
        ("rec", init_rec_params, convert_rec_params),
    ]
    for name, init_fn, conv_fn in cases:
        prog = load_program(str(reference_models / name / "inference.pdmodel"))
        converted = conv_fn(prog, init_random_params(prog))
        ours = init_fn()
        ref_paths = jax.tree.structure(converted)
        our_paths = jax.tree.structure(ours)
        assert ref_paths == our_paths, name
        for a, b in zip(jax.tree.leaves(converted), jax.tree.leaves(ours)):
            assert a.shape == b.shape, name


def test_bf16_forward_close(reference_models, rng):
    """bf16 weights + activations stay within bf16 tolerance of f32 —
    the serving dtype on TPU."""
    from ppocr_tpu.models import cast_tree

    prog = load_program(str(reference_models / "cls" / "inference.pdmodel"))
    pp = load_params(prog, str(reference_models / "cls" / "inference.pdiparams"))
    params = convert_cls_params(prog, pp)
    x = rng.normal(0, 1, (2, 48, 192, 3)).astype(np.float32)

    full = jax.jit(cls_forward)(params, jnp.asarray(x))
    half = jax.jit(cls_forward)(
        cast_tree(params, jnp.bfloat16), jnp.asarray(x, jnp.bfloat16)
    )
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(half, np.float32), atol=0.02
    )
