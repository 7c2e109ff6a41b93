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
    assert canvas[5, 20].tolist() == [0, 0, 255]  # drawn edge pixel


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
