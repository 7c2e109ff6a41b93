"""CTC prefix beam search (ops.ctc.ctc_beam_search) — a decode capability
the reference lacks (it is greedy-only, ocr_rec.cpp:97-128)."""

import numpy as np
import pytest


def _prune(probs, k):
    """Host mirror of ctc_beam_topk_device for test lattices: blank (id 0)
    ships separately and is masked out of the top-k, so every candidate
    slot carries a non-blank symbol (same contract as the device kernel —
    keep in lockstep with ops/ctc.py ctc_beam_topk_device)."""
    blank = probs[..., 0].copy()
    masked = probs.copy()
    masked[..., 0] = -1.0
    idx = np.argsort(-masked, axis=-1, kind="stable")[..., :k].astype(np.int32)
    val = np.take_along_axis(masked, idx, axis=-1)
    return idx, val, blank


class TestBeamSearch:
    def test_beats_greedy_on_split_blank_mass(self):
        """The textbook case: per-step argmax is blank, but the summed path
        mass of 'a' exceeds P(empty). Greedy reads ""; beam must read "a"."""
        from ppocr_tpu.ops.ctc import ctc_beam_search, ctc_greedy_decode_np

        # V = 3: [blank, a, b]; T = 2
        probs = np.array(
            [[[0.4, 0.3, 0.3], [0.4, 0.3, 0.3]]], np.float32
        )
        texts, _ = ctc_greedy_decode_np(probs, ["#", "a", "b"])
        assert texts == [""]

        kept, conf = ctc_beam_search(*_prune(probs, 3), beam_size=8)
        assert kept[0].tolist() == [1]  # "a"
        # P("a") = p(a,-)+p(-,a)+p(a,a) = .12+.12+.09 = .33
        np.testing.assert_allclose(conf[0], 0.33, rtol=1e-5)

    def test_matches_greedy_on_sharp_lattice(self):
        """With near-one-hot per-step distributions there is a single
        dominant alignment, so beam and greedy must agree exactly."""
        from ppocr_tpu.ops.ctc import ctc_beam_search, ctc_greedy_collapse

        rng = np.random.default_rng(0)
        n, t, v = 4, 12, 20
        hard = rng.integers(0, v, (n, t))
        probs = np.full((n, t, v), 0.002, np.float32)
        for i in range(n):
            probs[i, np.arange(t), hard[i]] = 0.9
        probs /= probs.sum(-1, keepdims=True)

        g_kept, _ = ctc_greedy_collapse(probs.argmax(-1), probs.max(-1))
        b_kept, b_conf = ctc_beam_search(*_prune(probs, 5), beam_size=10)
        for gk, bk in zip(g_kept, b_kept):
            assert gk.tolist() == bk.tolist()
        # all-blank rows keep the NaN skip rule
        blank_probs = np.zeros((1, 3, 4), np.float32)
        blank_probs[..., 0] = 1.0
        kept, conf = ctc_beam_search(*_prune(blank_probs, 2), beam_size=4)
        assert kept[0].size == 0 and np.isnan(conf[0])

    def test_repeat_needs_blank_gap(self):
        """'aa' must only be emitted when a blank separates the a-mass;
        an unbroken a...a run collapses to a single 'a'."""
        from ppocr_tpu.ops.ctc import ctc_beam_search

        # a is near-certain at every step: no way to split → "a"
        run = np.zeros((1, 4, 2), np.float32)
        run[..., 1] = 0.97
        run[..., 0] = 0.03
        kept, _ = ctc_beam_search(*_prune(run, 2), beam_size=6)
        assert kept[0].tolist() == [1]

        # a, blank, a → "aa"
        gap = np.array(
            [[[0.02, 0.98], [0.98, 0.02], [0.02, 0.98]]], np.float32
        )
        kept, _ = ctc_beam_search(*_prune(gap, 2), beam_size=6)
        assert kept[0].tolist() == [1, 1]

    def test_device_pruning_roundtrip(self):
        """ctc_beam_topk_device output feeds ctc_beam_search identically to
        the host-pruned lattice."""
        import jax

        from ppocr_tpu.ops.ctc import ctc_beam_search, ctc_beam_topk_device

        rng = np.random.default_rng(3)
        probs = rng.dirichlet(np.ones(30), size=(2, 8)).astype(np.float32)
        idx_d, val_d, blank_d = jax.device_get(
            jax.jit(lambda p: ctc_beam_topk_device(p, 5))(probs)
        )
        kept_d, conf_d = ctc_beam_search(idx_d, val_d, blank_d, beam_size=8)
        kept_h, conf_h = ctc_beam_search(*_prune(probs, 5), beam_size=8)
        for a, b in zip(kept_d, kept_h):
            assert a.tolist() == b.tolist()
        np.testing.assert_allclose(conf_d, conf_h, rtol=1e-5)


class TestEngineBeamDecode:
    def test_beam_engine_reads_digits(self, tmp_path, reference_models):
        """Integration: engine.recognize with decode='beam' reads trained-
        weight digit lines (same inputs as test_trained_weights) and returns
        the same texts greedy does on this easy distribution."""
        import pathlib
        import shutil

        from test_pipeline import small_config

        from ppocr_tpu.pipeline import OCREngine, RecConfig
        from ppocr_tpu.train.synthetic import render_line

        weights = (
            pathlib.Path(__file__).parent.parent
            / "weights"
            / "rec_synthetic_digits.npz"
        )
        if not weights.exists():
            pytest.skip("demo weights not present")

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
        shutil.copy(weights, model_dir / "rec" / "weights.npz")

        rng = np.random.default_rng(123)
        texts = ["314", "0926", "57", "88410"]
        crops = [render_line(t, 48, 128, rng) for t in texts]

        def build(decode):
            cfg = small_config(enable_cls=False)
            cfg.rec = RecConfig(
                batch_num=4,
                img_h=48,
                img_w=128,
                width_buckets=(128,),
                decode=decode,
            )
            return OCREngine(str(model_dir), cfg)

        greedy_texts, greedy_confs, _ = build("greedy").recognize(crops)
        beam_texts, beam_confs, _ = build("beam").recognize(crops)
        assert beam_texts == greedy_texts
        exact = sum(d == t for d, t in zip(beam_texts, texts))
        assert exact >= 3, list(zip(texts, beam_texts, beam_confs))
        assert all(0.0 < c <= 1.0 for d, c in zip(beam_texts, beam_confs) if d)


class TestFusedBeamDecode:
    def test_fused_beam_matches_fused_greedy_on_trained_scene(
        self, tmp_path, reference_models
    ):
        """Fused path with decode='beam': the device ships the pruned
        lattice (+ blank probs) and the host beam search reads the same
        texts greedy does on well-trained digit scenes."""
        from test_e2e_trained import DET_W, REC_W, _cfg

        from ppocr_tpu.pipeline import OCREngine
        from ppocr_tpu.train.synthetic import SyntheticSceneDataset

        if not (DET_W.exists() and REC_W.exists()):
            pytest.skip("bundled trained weights not present")

        import shutil

        md = tmp_path / "models"
        for name in ("det", "cls", "rec"):
            (md / name).mkdir(parents=True)
            shutil.copy(
                reference_models / name / "inference.pdmodel",
                md / name / "inference.pdmodel",
            )
        shutil.copy(
            reference_models / "rec" / "ppocr_keys_v1.txt",
            md / "rec" / "ppocr_keys_v1.txt",
        )
        shutil.copy(DET_W, md / "det" / "weights.npz")
        shutil.copy(REC_W, md / "rec" / "weights.npz")

        ds = SyntheticSceneDataset(seed=99)
        scene, placed = ds.sample_scene()

        def run(decode):
            cfg = _cfg(fast_path=True, fused_max_boxes=8)
            cfg.det.shape_buckets = (96,)
            cfg.rec.decode = decode
            eng = OCREngine(str(md), cfg)
            fused = eng.fused_ocr()
            assert fused.decode == decode
            r = fused.process(scene, 1)
            assert r["success"]
            return [(w["text"], w["box"]) for w in r["words"]]

        greedy = run("greedy")
        beam = run("beam")
        assert [t for t, _ in greedy] == [t for t, _ in beam]
        assert [b for _, b in greedy] == [b for _, b in beam]
        gt = sorted(t for t, _ in placed)
        assert sorted(t for t, _ in beam) == gt
