"""Round-3 fixes: per-request timing on batched paths, fused-path
device-loss recovery, beam top-k blank masking, CLI flag conflicts, and
the fused-by-default serving profile (VERDICT r2 weak #4/#6/#7 + ADVICE)."""

import asyncio
import time

import numpy as np
import pytest

from ppocr_tpu.pipeline import OCREngine, OCRWorker
from ppocr_tpu.pipeline.config import PipelineConfig
from test_pipeline import small_config


class TestServingDefaults:
    def test_serving_profile_defaults_to_fused(self):
        """Bare serving boots the fused fast path (VERDICT r2 #5); the
        header-defaults parity profile stays staged."""
        assert PipelineConfig.serving().fast_path is True
        assert PipelineConfig.defaults().fast_path is False

    def test_cli_flag_conflicts_exit_nonzero(self):
        from ppocr_tpu.cli.service_main import main

        assert main(["--staged", "--fast-path"]) == 2
        # silently ignoring --cross-chip under batching misled (ADVICE r2)
        assert main(["--cross-chip", "--batch-requests", "2"]) == 2
        assert main(["--staged", "--cross-chip"]) == 2


class TestConfigResolution:
    """Flag/config-file precedence (resolve_service_config)."""

    def _resolve(self, argv, tmp_path=None, file_overrides=None):
        import json

        from ppocr_tpu.cli.service_main import (
            build_parser,
            resolve_service_config,
        )

        if file_overrides is not None:
            p = tmp_path / "cfg.json"
            p.write_text(json.dumps(file_overrides))
            argv = argv + ["--config", str(p)]
        return resolve_service_config(build_parser().parse_args(argv))

    def test_batch_requests_sees_config_file_fast_path(self, tmp_path):
        """--batch-requests must act on the FINAL fast_path state: a config
        file that enables the fused path must not silently lose request
        batching (review r3)."""
        cfg, err = self._resolve(
            ["--profile", "defaults", "--batch-requests", "4"],
            tmp_path,
            {"fast_path": True},
        )
        assert err is None
        assert max(cfg.request_batch_buckets) == 4

    def test_config_file_batch_buckets_beat_the_flag(self, tmp_path):
        cfg, err = self._resolve(
            ["--batch-requests", "4"],
            tmp_path,
            {"request_batch_buckets": [1, 2]},
        )
        assert err is None
        assert cfg.request_batch_buckets == (1, 2)

    def test_batch_requests_still_ignored_when_staged(self):
        cfg, err = self._resolve(["--staged", "--batch-requests", "4"])
        assert err is None
        assert cfg.request_batch_buckets == (1,)

    def test_config_file_bucket_lists_are_sorted(self, tmp_path):
        """pick_bucket and the det_fit_cap downscale assume ascending
        buckets; the flag path sorts, so the file path must too."""
        cfg, err = self._resolve(
            [], tmp_path, {"det": {"shape_buckets": [96, 64]}}
        )
        assert err is None
        assert cfg.det.shape_buckets == (64, 96)


class TestBenchErrorContract:
    def test_missing_asset_yields_one_json_error_line(
        self, monkeypatch, capsys
    ):
        """run_bench failing on a missing asset must keep the one-JSON-line
        output contract (scripted consumers parse the single line), not
        die with a traceback (review r3)."""
        import json as _json
        import subprocess
        import types

        import bench

        monkeypatch.setattr(
            subprocess,
            "run",
            lambda *a, **k: types.SimpleNamespace(returncode=0),
        )

        def boom():
            raise FileNotFoundError("cannot read bench image /nope.jpg")

        monkeypatch.setattr(bench, "run_bench", boom)
        rc = bench.main([])
        out = capsys.readouterr().out.strip().splitlines()
        j = _json.loads(out[-1])
        assert rc == 1
        assert j["value"] is None
        assert "cannot read bench image" in j["error"]


class TestBenchRegressionGate:
    """bench.py --check FAILS on regression (VERDICT r2 weak #3: previously
    nothing failed when the fused step or accuracy regressed)."""

    GOOD = {
        "value": 37.0,
        "extra": {"trained_weights_e2e_exact_match": 1.0},
    }

    def _result(self, p50=36.0, onchip=2.8, acc=1.0):
        return {
            "value": p50,
            "extra": {
                "fused_onchip_ms": onchip,
                "trained_weights_e2e_exact_match": acc,
            },
        }

    def test_clean_run_passes(self):
        import bench

        assert bench.check_regressions(self._result(), self.GOOD) == []

    def test_onchip_budget_enforced(self):
        import bench

        fails = bench.check_regressions(self._result(onchip=11.2), self.GOOD)
        assert any("10 ms budget" in f for f in fails)

    def test_p50_regression_enforced(self):
        import bench

        fails = bench.check_regressions(self._result(p50=50.0), self.GOOD)
        assert any("+20%" in f for f in fails)
        assert bench.check_regressions(self._result(p50=43.0), self.GOOD) == []

    def test_p50_gate_tick_normalized(self):
        """When both runs carry a measured tunnel tick, the p50 gate
        compares TICKS, not ms: a slower tunnel phase (33 → 39.4 ms RTT)
        must not fire the gate, while a genuine on-chip regression in the
        same phase must (r5 protocol v3, docs/PERF.md)."""
        import bench

        good = {
            "value": 34.9,
            "extra": {
                "trained_weights_e2e_exact_match": 1.0,
                "tick_ms_est": 33.0,
            },
        }
        # +25% absolute, but the tunnel tick grew +19% — normalized, the
        # regression is only ~4.4% → pass
        res = self._result(p50=43.5)
        res["extra"]["tick_ms_est"] = 39.4
        assert bench.check_regressions(res, good) == []
        # same tick, +43% absolute → genuine regression, must fail
        res = self._result(p50=50.0)
        res["extra"]["tick_ms_est"] = 33.0
        fails = bench.check_regressions(res, good)
        assert any("tick-normalized" in f for f in fails)

    def test_accuracy_regression_enforced(self):
        import bench

        fails = bench.check_regressions(self._result(acc=0.9), self.GOOD)
        assert any("exact-match" in f for f in fails)
        fails = bench.check_regressions(self._result(acc=None), self.GOOD)
        assert any("did not run" in f for f in fails)

    def test_committed_good_file_is_loadable(self):
        import json
        import pathlib

        good = json.load(
            open(pathlib.Path(__file__).parent.parent / "BENCH_GOOD.json")
        )
        assert good["value"] > 0
        assert "extra" in good


class TestBeamTopkBlankMask:
    def test_all_candidate_slots_are_nonblank(self):
        """Blank (id 0) dominates most CTC timesteps; it must not consume
        a top-k slot the host search then skips (ADVICE r2)."""
        from ppocr_tpu.ops.ctc import ctc_beam_topk_device

        rng = np.random.default_rng(0)
        probs = rng.dirichlet(np.ones(12), size=(2, 5)).astype(np.float32)
        probs[..., 0] += 10.0  # blank overwhelmingly dominant
        probs /= probs.sum(-1, keepdims=True)
        idx, val, blank = ctc_beam_topk_device(probs, k=3)
        idx, val, blank = np.asarray(idx), np.asarray(val), np.asarray(blank)
        assert not np.any(idx == 0)
        np.testing.assert_allclose(blank, probs[..., 0], rtol=1e-6)
        # candidates are the true top-3 of the non-blank symbols
        expect = np.argsort(-probs[..., 1:], axis=-1)[..., :3] + 1
        got = np.sort(idx, axis=-1)
        np.testing.assert_array_equal(np.sort(expect, axis=-1), got)


class _RaisingFused:
    def __init__(self, msg):
        self.msg = msg

    def process(self, image, request_id, worker_id=0):
        raise RuntimeError(self.msg)

    def required_variants(self, images, batch_buckets=None):
        return []  # warm-set surface (incremental-warmup guard)


class _FakeFusedEngine:
    def __init__(self, msg="INTERNAL: stream closed: device_unavailable"):
        self.config = PipelineConfig()
        self.config.fast_path = True
        self._fused = _RaisingFused(msg)
        self.random_weights = {}

    def fused_ocr(self):
        return self._fused


IMG = np.full((8, 8, 3), 255, np.uint8)


class TestFusedWorkerDeviceLoss:
    def test_fused_exception_becomes_error_dict(self):
        """The fused branch converts exceptions to error dicts exactly like
        the staged branch, so dispatcher device-loss recovery sees them
        (ADVICE r2 medium)."""
        worker = OCRWorker(_FakeFusedEngine(), worker_id=4)
        r = worker.process(IMG, 9)
        assert r["success"] is False
        assert "device_unavailable" in r["error"]
        assert r["request_id"] == 9 and r["worker_id"] == 4
        assert r["width"] == 8 and r["height"] == 8

    def test_dispatcher_recovers_fused_mode(self):
        """Device loss on the Dispatcher-served fused mode (fast_path with
        request_batch_buckets=(1,)) triggers reload + retry."""
        from ppocr_tpu.serve.executor import Dispatcher

        eng = _FakeFusedEngine()
        eng.reload_calls = 0

        class _OkFused:
            def process(self, image, request_id, worker_id=0):
                return {
                    "request_id": int(request_id),
                    "success": True,
                    "words": [],
                }

            def required_variants(self, images, batch_buckets=None):
                return []

        def reload(warmup=False):
            eng.reload_calls += 1
            eng._fused = _OkFused()

        eng.reload = reload
        disp = Dispatcher(eng, num_workers=1)
        result = asyncio.run(disp.submit(IMG, 3))
        assert eng.reload_calls == 1
        assert result["success"] is True, result
        disp.shutdown()


def _fake_step_factory(delay_s=0.0):
    """Stand-in for FusedOCR._step: right-shaped empty FusedOutputs."""
    from ppocr_tpu.pipeline.fused import FusedOutputs

    def step(det_params, rec_params, cls_params, img, content_hw):
        if delay_s:
            time.sleep(delay_s)
        nb = img.shape[0]
        k, t = 8, 6
        return FusedOutputs(
            boxes=np.zeros((nb, k, 4), np.int32),
            valid=np.zeros((nb, k), bool),
            scores=np.zeros((nb, k), np.float32),
            ctc_idx=np.zeros((nb, k, t), np.int32),
            ctc_prob=np.ones((nb, k, t), np.float32),
            roots=np.zeros((nb, k), np.int32),
            ctc_blank=None,
            quads=np.zeros((nb, k, 4, 2), np.int32),
        )

    return step


@pytest.fixture(scope="module")
def fused_for_timing(reference_models):
    cfg = small_config(enable_cls=False, fast_path=True, fused_max_boxes=8)
    engine = OCREngine(str(reference_models), cfg)
    fused = engine.fused_ocr()
    fused._step = _fake_step_factory(delay_s=0.02)
    return fused


class TestPerRequestTiming:
    def test_batched_groups_get_distinct_times(self, fused_for_timing):
        """Two requests landing in different det-bucket groups must not
        both report the whole multi-group wall time (VERDICT r2 weak #6):
        each is stamped when ITS group's fetch completes. Groups now
        dispatch async and fetch in order (device work overlaps host
        decode), so with a synchronous fake step both delays land in the
        dispatch phase; the per-group stamps must still be distinct and
        ordered, and cover the device time."""
        img_small = np.full((50, 50, 3), 255, np.uint8)
        img_large = np.full((90, 90, 3), 255, np.uint8)
        r1, r2 = fused_for_timing.process_batch(
            [img_small, img_large], [1, 2]
        )
        t1 = r1["processing_time_ms"]
        t2 = r2["processing_time_ms"]
        assert t1 != t2
        # group 2's fetch (and host decode of group 1) completes after
        # group 1's stamp → strictly ordered per-request times
        assert t2 > t1
        assert t2 >= 2 * 20.0 * 0.9  # covers both fake-step delays

    def test_arrival_times_extend_the_clock(self, fused_for_timing):
        """arrival_times measures from queue entry (the batcher's submit),
        not batch start — per-request latency includes queue wait."""
        img = np.full((50, 50, 3), 255, np.uint8)
        early = time.perf_counter() - 0.5
        (r,) = fused_for_timing.process_batch(
            [img], [5], arrival_times=[early]
        )
        assert r["processing_time_ms"] >= 500.0


class TestFusedWidthTiers:
    """Width-tiered fused rec (VERDICT r2 weak #5): the crop canvas cap is
    configurable (fused_width_mult × rec.img_w) and the recognizer runs on
    the narrowest power-of-two slice holding the widest valid crop — wide
    lines keep full resolution up to the cap instead of silently squashing
    at 2×."""

    def test_mult_validation(self):
        from ppocr_tpu.pipeline.fused import width_mult

        cfg = PipelineConfig()
        cfg.fused_width_mult = 4
        assert width_mult(cfg) == 4
        cfg.fused_width_mult = 3
        with pytest.raises(ValueError):
            width_mult(cfg)

    def test_wrapper_geometry_scales_with_mult(self, reference_models):
        cfg = small_config(enable_cls=False, fast_path=True, fused_max_boxes=8)
        cfg.fused_width_mult = 4
        eng = OCREngine(str(reference_models), cfg)
        fused = eng.fused_ocr()
        assert fused.rec_img_w == 4 * cfg.rec.img_w
        assert fused.n_width_tiers == 3

    def test_tier_selection_tracks_content_width(self, reference_models):
        """prep returns tier = #halvings that still hold the widest VALID
        crop: a short line → deepest tier; a wide banner → tier 0."""
        import jax

        from ppocr_tpu.pipeline.fused import build_fused_parts

        cfg = small_config(enable_cls=False, fast_path=True, fused_max_boxes=8)
        cfg.fused_width_mult = 4
        eng = OCREngine(str(reference_models), cfg)
        w_max = 4 * cfg.rec.img_w
        prep, _rec = build_fused_parts(
            cfg.det.thresh,
            cfg.det.box_thresh,
            cfg.det.unclip_ratio,
            cfg.rec.img_h,
            w_max,
            8,
            dtype=eng.dtype,
            n_width_tiers=3,
        )
        import cv2

        def tier_for(img):
            canvas = np.zeros((1, 96, 96, 3), np.uint8)
            canvas[0, : img.shape[0], : img.shape[1]] = img
            out = jax.jit(prep)(
                eng.det_params,
                None,
                canvas,
                np.array([[img.shape[0], img.shape[1]]], np.int32),
            )
            return int(out[-1])

        short = np.full((40, 40, 3), 255, np.uint8)
        cv2.putText(short, "1", (8, 30), cv2.FONT_HERSHEY_SIMPLEX, 1.0, (0, 0, 0), 2)
        wide = np.full((20, 96, 3), 255, np.uint8)
        cv2.line(wide, (2, 10), (94, 10), (0, 0, 0), 6)
        t_short = tier_for(short)
        t_wide = tier_for(wide)
        # stand-in det weights fire densely, so blobs exist in both; the
        # wide strip (aspect ~13:1 ≥ w_max/img_h at this size) must select
        # a wider branch than the compact blob
        assert 0 <= t_wide <= t_short <= 2

    def test_wide_banner_succeeds_end_to_end(self, reference_models):
        """A ~20:1 banner through the fused path with mult 4: processes
        cleanly at full width (no silent squash inside the raised cap)."""
        import cv2

        cfg = small_config(enable_cls=False, fast_path=True, fused_max_boxes=8)
        cfg.fused_width_mult = 4
        cfg.det.shape_buckets = (96,)
        eng = OCREngine(str(reference_models), cfg)
        banner = np.full((24, 480, 3), 255, np.uint8)
        cv2.putText(
            banner,
            "0123456789012345",
            (4, 18),
            cv2.FONT_HERSHEY_SIMPLEX,
            0.6,
            (0, 0, 0),
            2,
        )
        r = eng.fused_ocr().process(banner, 1)
        assert r["success"] is True
        assert r["width"] == 480


class TestCrossChipPerRequestTiming:
    def test_stream_times_are_not_cumulative(self, reference_models):
        """CrossChipFusedOCR.process_stream used to stamp every result with
        time since stream start, so the Nth request reported cumulative
        latency (ADVICE r2). Each item now reports dispatch→fetch."""
        from ppocr_tpu.parallel.pipeline_stage import CrossChipFusedOCR

        cfg = small_config(enable_cls=False, fast_path=True, fused_max_boxes=8)
        engine = OCREngine(str(reference_models), cfg)
        import jax

        devs = jax.devices()
        xc = CrossChipFusedOCR(engine, devs[0], devs[1], max_boxes=8)

        calls = {"n": 0}
        fake = _fake_step_factory()

        def prep(det_params, cls_params, img, chw):
            o = fake(det_params, None, None, img, chw)
            crops = np.zeros((img.shape[0] * 8, 28, 96, 3), np.float32)
            return (
                crops,
                o.boxes,
                o.quads,
                o.valid,
                o.scores,
                o.roots,
                np.int32(0),
            )

        def rec(rec_params, crops, narrow):
            calls["n"] += 1
            time.sleep(0.03 * calls["n"])  # later fetches wait longer
            nb = crops.shape[0]
            return (
                np.zeros((nb, 6), np.int32),
                np.ones((nb, 6), np.float32),
                None,
            )

        xc._prep = prep
        xc._rec = rec
        img = np.full((50, 50, 3), 255, np.uint8)
        results = xc.process_stream([img, img, img], [1, 2, 3])
        times = [r["processing_time_ms"] for r in results]
        assert len(set(times)) == 3
        # every stage-1 dispatch is issued eagerly, so later items start
        # later but all fetches land together: per-request stamping gives
        # strictly DECREASING times, while the old cumulative stamping
        # (shared stream start) gave increasing ones
        assert times[0] > times[1] > times[2]


class TestBenchGateNameChange:
    def test_gate_fallback_fails_check(self):
        """Losing the ascii bundle silently downgraded the gate to digits
        and bypassed the accuracy comparison — a gate-name change vs
        BENCH_GOOD.json is itself a failure (review r3)."""
        import bench

        good = {
            "value": 37.0,
            "extra": {
                "trained_weights_e2e_exact_match": 1.0,
                "trained_gate": "ascii",
            },
        }
        res = {
            "value": 36.0,
            "extra": {
                "fused_onchip_ms": 2.8,
                "trained_weights_e2e_exact_match": 1.0,
                "trained_gate": "digits",
            },
        }
        fails = bench.check_regressions(res, good)
        assert any("gate changed" in f for f in fails)
        res["extra"]["trained_gate"] = "ascii"
        assert bench.check_regressions(res, good) == []
