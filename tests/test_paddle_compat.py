"""Tests for the Paddle artifact compatibility layer.

Ground truth: the three bundled PP-OCR graphs at /root/reference/models and
the bundled cls weights (the only .pdiparams shipped with the reference).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppocr_tpu.paddle_compat import (
    build_forward,
    init_random_params,
    load_params,
    load_program,
)

EXPECTED = {
    # model: (n_ops, feeds, fetches, n_persistable_params)
    "det": (312, ["x"], ["sigmoid_0.tmp_0"], 234),
    "cls": (184, ["x"], ["softmax_0.tmp_0"], 213),
    "rec": (323, ["x"], ["softmax_11.tmp_0"], 234),
}


@pytest.mark.parametrize("name", ["det", "cls", "rec"])
def test_program_decodes(reference_models, name):
    prog = load_program(str(reference_models / name / "inference.pdmodel"))
    n_ops, feeds, fetches, n_params = EXPECTED[name]
    assert len(prog.main_block.ops) == n_ops
    assert prog.feed_names() == feeds
    assert prog.fetch_names() == fetches
    assert len(prog.persistable_vars()) == n_params


def test_cls_params_load_and_align(reference_models):
    prog = load_program(str(reference_models / "cls" / "inference.pdmodel"))
    params = load_params(prog, str(reference_models / "cls" / "inference.pdiparams"))
    assert len(params) == 213
    # every program var got a tensor of the declared shape
    for var in prog.persistable_vars():
        arr = params[var.name]
        assert list(arr.shape) == [int(d) for d in var.tensor.dims], var.name
    # the final FC maps 200 features -> 2 classes
    assert params["fc_0.w_0"].shape == (200, 2)


def test_cls_forward_real_weights(reference_models):
    prog = load_program(str(reference_models / "cls" / "inference.pdmodel"))
    params = load_params(prog, str(reference_models / "cls" / "inference.pdiparams"))
    fwd = jax.jit(build_forward(prog))
    out = fwd(params, {"x": jnp.zeros((2, 3, 48, 192), jnp.float32)})
    probs = np.asarray(out["softmax_0.tmp_0"])
    assert probs.shape == (2, 2)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    assert (probs > 0).all()


def test_cls_orientation_flip(reference_models, card_image_path):
    """Real weights must prefer 0° for an upright crop and flip when the
    crop is rotated 180° — behavioral check of ocr_cls.cpp:90-99 semantics."""
    cv2 = pytest.importorskip("cv2")
    prog = load_program(str(reference_models / "cls" / "inference.pdmodel"))
    params = load_params(prog, str(reference_models / "cls" / "inference.pdiparams"))
    fwd = jax.jit(build_forward(prog))

    img = cv2.imread(str(card_image_path))
    crop = cv2.resize(img[40:88, 30:222], (192, 48)).astype(np.float32)

    def prep(c):
        return ((c / 255.0 - 0.5) / 0.5).transpose(2, 0, 1)[None]

    batch = np.concatenate(
        [prep(crop), prep(cv2.rotate(crop, cv2.ROTATE_180))], 0
    ).astype(np.float32)
    probs = np.asarray(fwd(params, {"x": batch})["softmax_0.tmp_0"])
    assert probs[0].argmax() == 0  # upright → label 0 (0°)
    assert probs[1, 1] > probs[0, 1]  # rotated crop shifts mass to 180°


@pytest.mark.parametrize(
    "name,feed_shape,out_shape",
    [
        ("det", (1, 3, 192, 320), (1, 1, 192, 320)),
        ("rec", (2, 3, 48, 320), (2, 40, 6625)),
    ],
)
def test_graph_executes_random_weights(reference_models, name, feed_shape, out_shape):
    prog = load_program(str(reference_models / name / "inference.pdmodel"))
    params = init_random_params(prog, seed=0)
    fwd = jax.jit(build_forward(prog))
    out = fwd(params, {"x": jnp.zeros(feed_shape, jnp.float32)})
    (arr,) = out.values()
    assert arr.shape == out_shape
    arr = np.asarray(arr)
    assert np.isfinite(arr).all()
    if name == "rec":  # CTC head ends in softmax over 6625 classes
        np.testing.assert_allclose(arr.sum(-1), 1.0, atol=1e-4)
    else:  # DB head ends in sigmoid probability map
        assert (arr >= 0).all() and (arr <= 1).all()


def test_det_output_tracks_input_resolution(reference_models):
    """DB det is fully convolutional: prob map matches input H,W (ocr_det.cpp:127-149)."""
    prog = load_program(str(reference_models / "det" / "inference.pdmodel"))
    params = init_random_params(prog, seed=0)
    fwd = jax.jit(build_forward(prog))
    out = fwd(params, {"x": jnp.zeros((1, 3, 256, 416), jnp.float32)})
    assert out["sigmoid_0.tmp_0"].shape == (1, 1, 256, 416)
