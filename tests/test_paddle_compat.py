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


class TestDecoderStrictness:
    """Round-3 review: latent graph-variant holes fail loudly or exactly,
    never silently wrong."""

    def _op(self, type_, attrs=None, inputs=None, outputs=None):
        from ppocr_tpu.paddle_compat.program import OpDesc

        op = OpDesc()
        op.type = type_
        op.attrs = attrs or {}
        op.inputs = inputs or {}
        op.outputs = outputs or {}
        return op

    def test_unsupported_attr_raises_instead_of_shadowing_default(self):
        from ppocr_tpu.paddle_compat.program import UNSUPPORTED_ATTR

        op = self._op("fill_constant", attrs={"value": UNSUPPORTED_ATTR})
        with pytest.raises(NotImplementedError, match="attr 'value'"):
            op.attr("value", 0.0)
        # untouched attrs still honor defaults
        assert op.attr("shape", [1]) == [1]

    def test_slice_with_tensor_bounds_rejected(self):
        from ppocr_tpu.paddle_compat.executor import _op_slice

        op = self._op(
            "slice",
            attrs={"axes": [0], "starts": [-1], "ends": [-1]},
            inputs={"Input": ["x"], "StartsTensor": ["s"]},
        )
        with pytest.raises(NotImplementedError, match="StartsTensor"):
            _op_slice(op, np.zeros((4, 4)))

    def test_dilated_conv_transpose_rejected(self):
        from ppocr_tpu.paddle_compat.executor import _op_conv2d_transpose

        op = self._op(
            "conv2d_transpose",
            attrs={"strides": [2, 2], "dilations": [2, 2]},
        )
        with pytest.raises(NotImplementedError, match="dilated"):
            _op_conv2d_transpose(
                op, jnp.zeros((1, 2, 4, 4)), jnp.zeros((2, 2, 3, 3))
            )

    def test_pool2d_same_padding_and_default_stride(self):
        from ppocr_tpu.paddle_compat.executor import _op_pool2d

        x = jnp.arange(25, dtype=jnp.float32).reshape(1, 1, 5, 5)
        # SAME with stride 2: out = ceil(5/2) = 3 per axis
        op = self._op(
            "pool2d",
            attrs={
                "pooling_type": "max",
                "ksize": [3, 3],
                "strides": [2, 2],
                "padding_algorithm": "SAME",
                "paddings": [9, 9],  # must be overridden by SAME
            },
        )
        assert _op_pool2d(op, x).shape == (1, 1, 3, 3)
        # omitted strides default to [1,1] (the op proto default), not ksize
        op2 = self._op(
            "pool2d", attrs={"pooling_type": "max", "ksize": [3, 3]}
        )
        assert _op_pool2d(op2, x).shape == (1, 1, 3, 3)  # (5-3)/1+1

    def test_nearest_interp_matches_paddle_floor_mapping(self):
        """Paddle nearest (align_corners=False) maps dst i -> floor(i*in/out):
        3 -> 5 picks source cols [0,0,1,1,2]; jax.image.resize picked
        [0,0,1,2,2]."""
        from ppocr_tpu.paddle_compat.executor import build_forward
        from ppocr_tpu.paddle_compat.program import (
            BlockDesc,
            OpDesc,
            ProgramDesc,
        )

        prog = ProgramDesc()
        blk = BlockDesc()
        feed = OpDesc(); feed.type = "feed"
        feed.outputs = {"Out": ["x"]}; feed.attrs = {"col": 0}
        interp = OpDesc(); interp.type = "nearest_interp_v2"
        interp.inputs = {"X": ["x"]}
        interp.outputs = {"Out": ["y"]}
        interp.attrs = {"scale": [], "out_h": 5, "out_w": 5}
        fetch = OpDesc(); fetch.type = "fetch"
        fetch.inputs = {"X": ["y"]}; fetch.attrs = {"col": 0}
        blk.ops = [feed, interp, fetch]
        prog.blocks = [blk]
        fwd = build_forward(prog)
        x = np.arange(3, dtype=np.float32).reshape(1, 1, 1, 3)
        x = np.broadcast_to(x, (1, 1, 3, 3)).copy()
        out = np.asarray(list(fwd({}, {"x": x}).values())[0])
        np.testing.assert_array_equal(out[0, 0, 0], [0, 0, 1, 1, 2])

    def test_feed_fetch_order_follows_col_attr(self):
        from ppocr_tpu.paddle_compat.program import (
            BlockDesc,
            OpDesc,
            ProgramDesc,
        )

        prog = ProgramDesc()
        blk = BlockDesc()
        f1 = OpDesc(); f1.type = "feed"
        f1.outputs = {"Out": ["b"]}; f1.attrs = {"col": 1}
        f0 = OpDesc(); f0.type = "feed"
        f0.outputs = {"Out": ["a"]}; f0.attrs = {"col": 0}
        blk.ops = [f1, f0]  # serialized out of col order
        prog.blocks = [blk]
        assert prog.feed_names() == ["a", "b"]
