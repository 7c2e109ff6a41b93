"""Tests: checkpointing, visualization, sysinfo, pallas kernel, cache."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppocr_tpu.models import init_cls_params
from ppocr_tpu.utils.checkpoint import (
    load_params_npz,
    restore_train_state,
    save_params_npz,
    save_train_state,
)


class TestNpzCheckpoint:
    def test_roundtrip_nested_tree(self, tmp_path):
        params = init_cls_params(seed=3)
        path = str(tmp_path / "cls.npz")
        save_params_npz(path, params)
        loaded = load_params_npz(path)
        assert jax.tree.structure(params) == jax.tree.structure(loaded)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_engine_npz_override(self, tmp_path, reference_models):
        """A weights.npz dropped next to inference.pdmodel wins — the
        deployment path for fine-tuned weights."""
        import shutil

        from test_pipeline import small_config

        from ppocr_tpu.pipeline import OCREngine

        model_dir = tmp_path / "models"
        for name in ("det", "cls", "rec"):
            (model_dir / name).mkdir(parents=True)
            shutil.copy(
                reference_models / name / "inference.pdmodel",
                model_dir / name / "inference.pdmodel",
            )
        shutil.copy(
            reference_models / "rec" / "ppocr_keys_v1.txt",
            model_dir / "rec" / "ppocr_keys_v1.txt",
        )
        params = init_cls_params(seed=9)
        save_params_npz(str(model_dir / "cls" / "weights.npz"), params)

        engine = OCREngine(str(model_dir), small_config())
        assert engine.random_weights["cls"] is False  # npz override used
        assert engine.random_weights["det"] is True  # no weights at all
        got = np.asarray(
            jax.tree.leaves(engine.cls_params)[0], dtype=np.float32
        )
        want = np.asarray(jax.tree.leaves(params)[0], dtype=np.float32)
        np.testing.assert_allclose(got, want, atol=0.01)  # bf16 cast


class TestTrainCheckpoint:
    def test_orbax_roundtrip(self, tmp_path):
        from ppocr_tpu.models import init_rec_params
        from ppocr_tpu.parallel import make_mesh
        from ppocr_tpu.train import make_train_step

        mesh = make_mesh(1)
        _, init_fn, step_fn = make_train_step(mesh, 1e-4)
        state = init_fn(init_rec_params(seed=0))
        batch = {
            "images": np.zeros((1, 48, 64, 3), np.float32),
            "labels": np.array([[5, 9]], np.int32),
            "label_paddings": np.zeros((1, 2), np.float32),
        }
        state, _ = step_fn(state, batch)
        path = save_train_state(str(tmp_path / "ckpt"), state)
        restored = restore_train_state(path, state)
        assert int(np.asarray(restored.step)) == 1
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_visualize_boxes(tmp_path):
    from ppocr_tpu.utils.visualize import visualize_boxes

    img = np.zeros((60, 80, 3), np.uint8)
    words = [{"text": "x", "confidence": 0.9, "box": [[5, 5], [40, 5], [40, 20], [5, 20]]}]
    out_path = str(tmp_path / "vis.png")
    canvas = visualize_boxes(img, words, out_path)
    assert os.path.exists(out_path)
    # green, CV_RGB(0,255,0) like the reference's VisualizeBboxes
    assert canvas[5, 20].tolist() == [0, 255, 0]  # drawn edge pixel


def test_worker_recommendation():
    from ppocr_tpu.pipeline import worker_recommendation

    rec = worker_recommendation()
    assert rec.recommended_workers >= 2
    assert rec.devices >= 1
    assert "share one device-resident" in rec.notes
    assert "Recommended workers" in rec.pretty()


def test_pallas_ctc_topk_interpret():
    from ppocr_tpu.ops.pallas_kernels import ctc_topk_pallas

    rng = np.random.default_rng(4)
    p = rng.random((2, 12, 333)).astype(np.float32)
    idx, val = ctc_topk_pallas(jnp.asarray(p), interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), p.argmax(-1))
    np.testing.assert_allclose(np.asarray(val), p.max(-1), rtol=1e-6)


def test_pallas_ctc_topk_nan_row_stays_in_range():
    """A NaN row defeats the kernel's `masked == val` hit test (NaN !=
    NaN); the index must stay < V like jnp.argmax (in-range garbage), not
    the padded-lane sentinel that would IndexError the host charset join
    (review r3)."""
    from ppocr_tpu.ops.pallas_kernels import ctc_topk_pallas

    p = np.full((1, 3, 333), 0.1, np.float32)
    p[0, 1, :] = np.nan
    idx, _ = ctc_topk_pallas(jnp.asarray(p), interpret=True)
    assert int(np.asarray(idx).max()) < 333


def test_pallas_blob_stats_interpret():
    """blob_stats_pallas == the masked-reduction formulation
    (pipeline.fused._blob_stats) on a random label map, including
    empty-root sentinel behavior."""
    import jax.numpy as jnp
    import numpy as np

    from ppocr_tpu.ops.pallas_kernels import blob_stats_pallas

    rng = np.random.default_rng(3)
    h, w, k = 40, 70, 8
    # synthetic labels: a few rectangular blobs tagged by their root
    labels = np.full((h, w), h * w, np.int32)
    roots = []
    for _ in range(5):
        y0, x0 = int(rng.integers(0, h - 6)), int(rng.integers(0, w - 8))
        bh, bw = int(rng.integers(2, 6)), int(rng.integers(3, 8))
        root = y0 * w + x0
        labels[y0 : y0 + bh, x0 : x0 + bw] = root
        roots.append(root)
    roots = np.array(roots + [-7] * (k - len(roots)), np.int32)  # empty slots
    prob = rng.random((h, w)).astype(np.float32)

    area, psum, x0, x1, y0, y1 = [
        np.asarray(v)
        for v in blob_stats_pallas(
            jnp.asarray(labels), jnp.asarray(prob), jnp.asarray(roots),
            interpret=True,
        )
    ]
    big = 1e9
    member = labels[None] == roots[:, None, None]
    np.testing.assert_allclose(area, member.sum((1, 2)).astype(np.float32))
    np.testing.assert_allclose(
        psum, (member * prob[None]).sum((1, 2)), rtol=1e-5
    )
    ix = np.arange(w, dtype=np.float32)
    iy = np.arange(h, dtype=np.float32)
    colp = member.any(1)
    rowp = member.any(2)
    np.testing.assert_allclose(
        x0, np.where(colp, ix[None], big).min(1), rtol=0
    )
    np.testing.assert_allclose(
        x1, np.where(colp, ix[None], -big).max(1), rtol=0
    )
    np.testing.assert_allclose(
        y0, np.where(rowp, iy[None], big).min(1), rtol=0
    )
    np.testing.assert_allclose(
        y1, np.where(rowp, iy[None], -big).max(1), rtol=0
    )


def test_pallas_blob_stats_matches_fused_formulation():
    """On a real CC label map (rendered text scene), the kernel's stats
    equal the [K,H,W] masked-reduction formulation _blob_stats uses."""
    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ppocr_tpu.ops.pallas_kernels import blob_stats_pallas
    from ppocr_tpu.pipeline.fused import _blob_stats, _connected_components

    img = np.full((64, 96), 255, np.uint8)
    cv2.putText(img, "37 41", (4, 40), cv2.FONT_HERSHEY_SIMPLEX, 1.0, 0, 2)
    fg = jnp.asarray(img < 128)
    labels = jax.jit(_connected_components)(fg)
    rng = np.random.default_rng(0)
    prob = jnp.asarray(rng.random((64, 96)).astype(np.float32))

    ref = jax.jit(
        lambda l, p: _blob_stats(l, p, max_boxes=8, use_pallas=False)
    )(labels, prob)
    n = 64 * 96
    import jax.lax as lax

    area = jnp.zeros((n + 1,), jnp.float32).at[labels.reshape(-1)].add(1.0)
    area = area.at[n].set(0.0)
    _, top_idx = lax.top_k(area[:n], 8)
    karea, psum, x0, x1, y0, y1 = blob_stats_pallas(
        labels, prob, top_idx, interpret=True
    )
    np.testing.assert_allclose(np.asarray(karea), np.asarray(ref["area"]))
    np.testing.assert_allclose(
        np.asarray(psum / jnp.maximum(karea, 1.0)),
        np.asarray(ref["score"]),
        rtol=1e-5,
    )
    for got, name in ((x0, "x0"), (x1, "x1"), (y0, "y0"), (y1, "y1")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref[name]))


class TestCheckpointRoundTrip:
    """Round-3 review: npz round-trip structural fidelity."""

    def test_exact_path_no_silent_npz_suffix(self, tmp_path):
        from ppocr_tpu.utils.checkpoint import (
            load_params_npz,
            save_params_npz,
        )

        p = str(tmp_path / "weights_no_ext")
        out = save_params_npz(p, {"a": np.ones(3)})
        assert out == p and os.path.exists(p)
        np.testing.assert_array_equal(load_params_npz(p)["a"], np.ones(3))

    def test_empty_containers_survive(self, tmp_path):
        from ppocr_tpu.utils.checkpoint import (
            load_params_npz,
            save_params_npz,
        )

        tree = {"blocks": [], "head": {"w": np.ones(2)}, "extra": {}}
        p = str(tmp_path / "t.npz")
        save_params_npz(p, tree)
        got = load_params_npz(p)
        assert got["blocks"] == [] and got["extra"] == {}
        np.testing.assert_array_equal(got["head"]["w"], np.ones(2))

    def test_sparse_digit_keys_stay_a_dict(self, tmp_path):
        from ppocr_tpu.utils.checkpoint import (
            load_params_npz,
            save_params_npz,
        )

        tree = {"1": np.ones(1), "3": np.ones(2)}  # digit keys, not 0..n-1
        p = str(tmp_path / "d.npz")
        save_params_npz(p, tree)
        got = load_params_npz(p)
        assert isinstance(got, dict) and set(got) == {"1", "3"}


def test_persistent_cache_second_path_warns_and_keeps_first(tmp_path):
    import warnings

    from ppocr_tpu.utils import xla_cache

    first = xla_cache.enable_persistent_cache()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = xla_cache.enable_persistent_cache(str(tmp_path / "other"))
    assert got == first  # the ACTIVE dir, not the ignored new one
    assert any("already active" in str(x.message) for x in w)
