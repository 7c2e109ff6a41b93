"""Tests for the single-dispatch fused OCR path (pipeline.fused)."""

import cv2
import numpy as np
import pytest

from ppocr_tpu.pipeline import OCREngine, OCRWorker
from ppocr_tpu.pipeline.fused import FusedOCR
from test_pipeline import small_config


@pytest.fixture(scope="module")
def engine(reference_models):
    return OCREngine(
        str(reference_models), small_config(enable_cls=False, fast_path=True)
    )


@pytest.fixture(scope="module")
def fused(engine):
    return engine.fused_ocr()


def synthetic_text_image():
    img = np.full((100, 200, 3), 255, np.uint8)
    cv2.putText(img, "HELLO", (20, 60), cv2.FONT_HERSHEY_SIMPLEX, 1.2, (0, 0, 0), 2)
    return img


class TestFused:
    def test_schema_and_determinism(self, fused, card_image_path):
        img = cv2.imread(str(card_image_path))
        r1 = fused.process(img, 7)
        r2 = fused.process(img, 8)
        assert r1["success"] is True
        assert r1["width"] == 391 and r1["height"] == 178
        assert r1["words"] == r2["words"]
        for w in r1["words"]:
            assert set(w) == {"text", "confidence", "box"}
            assert len(w["box"]) == 4

    def test_boxes_close_to_staged_pipeline(self, engine, fused):
        """On axis-aligned synthetic text, fused boxes must agree with the
        staged parity pipeline (IoU ≥ 0.8 per matched box)."""
        from ppocr_tpu.ops import iou_float, xyxyxyxy2xyxy

        img = synthetic_text_image()
        engine.config.fast_path = False
        staged = OCRWorker(engine, 0).process(img, 1)
        engine.config.fast_path = True
        got = fused.process(img, 1)
        assert len(got["words"]) == len(staged.get("words", []))
        for gw, sw in zip(got["words"], staged["words"]):
            iou = iou_float(xyxyxyxy2xyxy(gw["box"]), xyxyxyxy2xyxy(sw["box"]))
            assert iou >= 0.8, (gw["box"], sw["box"])

    def test_blank_image_no_words(self, fused):
        r = fused.process(np.full((64, 64, 3), 255, np.uint8), 1)
        assert r["success"] is True
        # stand-in det weights may or may not fire on blank input; only the
        # schema/validity plumbing is pinned here
        assert isinstance(r["words"], list)

    def test_oversize_image_downscales_to_bucket_cap(
        self, engine, fused, card_image_path
    ):
        """An image whose det resize exceeds the largest shape bucket must
        downscale to fit (det_fit_cap), not crash on the canvas broadcast
        (regression: `--det-buckets 96` with serving limit_side_len=960
        raised `could not broadcast (192,384,3) into (96,96,3)`)."""
        img = cv2.imread(str(card_image_path))
        old = engine.config.det.limit_side_len
        engine.config.det.limit_side_len = 960  # resize → 192×384 > cap 96
        try:
            r = fused.process(img, 1)
        finally:
            engine.config.det.limit_side_len = old
        assert r["success"] is True
        assert r["width"] == 391 and r["height"] == 178
        for w in r["words"]:  # boxes map back to ORIGINAL image coords
            for x, y in w["box"]:
                assert -5 <= x <= 396 and -5 <= y <= 183

    def test_worker_routes_to_fused(self, engine, card_image_path):
        engine.config.fast_path = True
        w = OCRWorker(engine, worker_id=5)
        r = w.process(cv2.imread(str(card_image_path)), 3)
        assert r["success"] is True and r["worker_id"] == 5
        err = w.process(None, 4)
        assert err["success"] is False
        assert err["error"] == "Empty image data provided"

    def test_reading_order_matches_contour_order(self):
        """Fused emission order (descending blob root) must equal
        cv2.findContours order — the staged/reference word order (the
        reference worker never sorts, ocr_worker.cpp:285-301). Blobs are
        placed so the old y//10 row-bucketing sort would disagree: two
        blobs in the same visual row straddle a 10px boundary with x
        reversed."""
        import jax
        import jax.numpy as jnp

        from ppocr_tpu.pipeline.fused import _blob_stats, _connected_components

        bitmap = np.zeros((64, 128), np.uint8)
        bitmap[8:18, 80:120] = 1  # row 1, right, slightly higher
        bitmap[12:22, 5:45] = 1  # row 1, left, y straddles the 10px bucket
        bitmap[40:52, 10:60] = 1  # row 2
        fg = jnp.asarray(bitmap.astype(bool))
        labels = jax.jit(_connected_components)(fg)
        stats = jax.jit(lambda l: _blob_stats(l, fg.astype(jnp.float32), 8))(labels)
        valid = np.asarray(stats["area"]) > 0
        roots = np.asarray(stats["root"])[valid]
        x0 = np.asarray(stats["x0"])[valid]
        y0 = np.asarray(stats["y0"])[valid]
        fused_order = [
            (int(x0[i]), int(y0[i]))
            for i in np.argsort(-roots, kind="stable")
        ]

        contours, _ = cv2.findContours(
            bitmap * 255, cv2.RETR_LIST, cv2.CHAIN_APPROX_SIMPLE
        )
        ref_order = [
            tuple(int(v) for v in c.reshape(-1, 2).min(axis=0)) for c in contours
        ]
        assert fused_order == ref_order
        # and the old y//10 bucketing would have ordered differently
        bucketed = sorted(fused_order, key=lambda p: (p[1] // 10, p[0]))
        assert bucketed != fused_order

    def test_padding_region_masked(self, engine, fused):
        """Bucket-padding must never spawn or extend blobs: with a content
        extent of (rh, rw) smaller than the canvas, every valid box stays
        inside [0, rw) × [0, rh) even when det activations fire in the
        padded region (ADVICE r1: fg is masked before blob extraction)."""
        import jax

        h = w = engine.config.det.shape_buckets[-1]
        rng = np.random.default_rng(3)
        canvas = rng.integers(0, 255, (1, h, w, 3), np.uint8)
        rh, rw = h // 2, w - 32
        out = jax.device_get(
            fused._step(
                engine.det_params,
                engine.rec_params,
                fused._cls_params(),
                canvas,
                np.array([[rh, rw]], np.int32),
            )
        )
        valid = out.valid[0]
        assert valid.any()  # noise + stand-in weights do fire
        assert (out.boxes[0][valid, 2] <= rw - 1).all()
        assert (out.boxes[0][valid, 3] <= rh - 1).all()


class TestCropSrcMult:
    """fused_crop_src_mult: rec/cls crops sampled from an m×-resolution
    source image (the fused-path fix for det-downscale crop blur —
    staged crops come from the full-resolution source,
    preprocess_op.cpp:95-118)."""

    def test_scaled_grid_samples_same_signal(self):
        """Sampling a linear gradient at scale=2 from its analytically
        2×-resolved rendering equals scale=1 sampling of the base image:
        bilinear interpolation of a linear function is exact, and the
        pixel-center mapping p_src=(p+0.5)·m−0.5 lines the grids up."""
        import jax.numpy as jnp

        from ppocr_tpu.pipeline.fused import _crop_resize_bilinear

        h, w, m = 32, 48, 2

        def f(y, x):  # linear in both axes
            return np.stack(
                [2.0 * x + 3.0 * y, x - y + 10.0, 0.5 * x], axis=-1
            ).astype(np.float32)

        ys, xs = np.mgrid[0:h, 0:w]
        base = jnp.asarray(f(ys, xs))
        ys2, xs2 = np.mgrid[0 : h * m, 0 : w * m]
        hi = jnp.asarray(f((ys2 + 0.5) / m - 0.5, (xs2 + 0.5) / m - 0.5))
        kw = dict(
            x0=4.0, y0=3.0, x1=40.0, y1=25.0, content_w=30.0, out_h=8,
            out_w=32, rot180=jnp.bool_(False),
        )
        lo_s = np.asarray(_crop_resize_bilinear(base, scale=1.0, **kw))
        hi_s = np.asarray(_crop_resize_bilinear(hi, scale=float(m), **kw))
        np.testing.assert_allclose(hi_s, lo_s, atol=1e-3)

    def test_mult2_keeps_geometry_identical(self, engine, card_image_path):
        """Boxes/validity are computed from the det canvas alone, so a
        mult=2 fused pipeline must emit EXACTLY the mult=1 boxes — only
        the crop pixels (hence possibly texts) change."""
        img = cv2.imread(str(card_image_path))
        base = engine.fused_ocr().process(img, 1)
        old = engine.config.fused_crop_src_mult
        engine.config.fused_crop_src_mult = 2
        try:
            hi = FusedOCR(engine, max_boxes=engine.config.fused_max_boxes)
            got = hi.process(img, 1)
        finally:
            engine.config.fused_crop_src_mult = old
        assert got["success"] is True
        assert [w["box"] for w in got["words"]] == [
            w["box"] for w in base["words"]
        ]

    def test_mult2_process_batch_and_warmup_shapes(self, engine):
        """The batched path pads the m× source into its own canvas and the
        warmup precompiles the 6-operand step without error."""
        old = engine.config.fused_crop_src_mult
        engine.config.fused_crop_src_mult = 2
        try:
            hi = FusedOCR(engine, max_boxes=8)
            imgs = [synthetic_text_image(), synthetic_text_image()]
            rs = hi.process_batch(imgs, [4, 5])
        finally:
            engine.config.fused_crop_src_mult = old
        assert [r["request_id"] for r in rs] == [4, 5]
        assert all(r["success"] for r in rs)


class TestFusedCls:
    def test_mirrored_sampler_equals_rot180(self):
        """rot180=True sampling must equal rotating the unrotated crop
        content by 180° (the reference's rotate-then-resize order)."""
        import jax.numpy as jnp

        from ppocr_tpu.pipeline.fused import _crop_resize_bilinear

        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.random((40, 60, 3)).astype(np.float32))
        kw = dict(x0=5.0, y0=4.0, x1=50.0, y1=30.0, content_w=24.0, out_h=8, out_w=32)
        plain = np.asarray(_crop_resize_bilinear(img, rot180=jnp.bool_(False), **kw))
        mirrored = np.asarray(_crop_resize_bilinear(img, rot180=jnp.bool_(True), **kw))
        cw = 24
        np.testing.assert_allclose(
            mirrored[:, :cw], plain[::-1, :cw][:, ::-1], atol=1e-5
        )
        assert mirrored[:, cw:].max() == 0  # padding stays right & black

    def test_fused_with_cls_runs(self, reference_models, card_image_path):
        from ppocr_tpu.pipeline import OCREngine

        eng = OCREngine(
            str(reference_models),
            small_config(enable_cls=True, fast_path=True),
        )
        fused = eng.fused_ocr()
        assert fused.with_cls is True
        r = fused.process(cv2.imread(str(card_image_path)), 1)
        assert r["success"] is True
        r2 = fused.process(cv2.imread(str(card_image_path)), 2)
        assert r["words"] == r2["words"]


class TestBatching:
    def test_process_batch_matches_individual(self, engine, fused):
        imgs = [synthetic_text_image(), cv2.imread("/root/reference/images/card-jd.jpg")]
        engine.config.fast_path = True
        batched = fused.process_batch(imgs, [1, 2], batch_buckets=(1, 2))
        singles = [fused.process(imgs[0], 1), fused.process(imgs[1], 2)]
        for b, s in zip(batched, singles):
            assert b["success"] and s["success"]
            assert b["request_id"] == s["request_id"]
            assert [w["box"] for w in b["words"]] == [w["box"] for w in s["words"]]
            assert [w["text"] for w in b["words"]] == [w["text"] for w in s["words"]]

    def test_batching_dispatcher_serves(self, reference_models, card_image_path):
        import asyncio

        from ppocr_tpu.pipeline import OCREngine
        from ppocr_tpu.serve.batcher import BatchingDispatcher

        cfg = small_config(
            enable_cls=False,
            fast_path=True,
            request_batch_buckets=(1, 2),
            fused_max_boxes=8,
        )
        cfg.det.shape_buckets = (96,)  # keep CPU warmup compile count tiny
        eng = OCREngine(str(reference_models), cfg)
        eng.warmup()
        disp = BatchingDispatcher(eng, num_workers=1, max_wait_ms=10)
        img = cv2.imread(str(card_image_path))

        async def run():
            results = await asyncio.gather(
                *[disp.submit(img, i) for i in range(5)]
            )
            empty = await disp.submit(None, 99)
            return results, empty

        results, empty = asyncio.run(run())
        assert all(r["success"] for r in results)
        assert sorted(r["request_id"] for r in results) == list(range(5))
        words0 = [w["text"] for w in results[0]["words"]]
        assert all([w["text"] for w in r["words"]] == words0 for r in results)
        assert empty["success"] is False
        disp.shutdown()


def test_connected_components_full_width_line():
    """A 1px-tall full-width line must converge to ONE label (regression:
    a fixed 256-iteration cap under-propagated on wide blobs)."""
    import jax
    import jax.numpy as jnp

    from ppocr_tpu.pipeline.fused import _connected_components

    fg = np.zeros((8, 384), bool)
    fg[3, :] = True
    labels = np.asarray(jax.jit(_connected_components)(jnp.asarray(fg)))
    line = labels[3, :]
    assert (line == line[0]).all()
    assert labels[0, 0] == 8 * 384  # background label


class TestSourceCoordFilter:
    """The reference's final ≤4 px side filter runs in SOURCE coordinates
    after rescale (FilterTagDetRes, postprocess_op.cpp:333-362). The fused
    path applies it host-side in _words_from_outputs — a det-coord box of
    3 px is a 12 px source box at ratio 0.25 and must be KEPT (review r3:
    it used to be dropped in-graph in det coords)."""

    def _fake_out(self, fused, x0, y0, x1, y1):
        from ppocr_tpu.pipeline.fused import FusedOutputs

        k, t = fused.max_boxes, 6
        boxes = np.zeros((1, k, 4), np.int32)
        boxes[0, 0] = (x0, y0, x1, y1)
        valid = np.zeros((1, k), bool)
        valid[0, 0] = True
        idx = np.zeros((1, k, t), np.int32)
        idx[0, 0, 0] = 5  # one non-blank timestep → non-NaN confidence
        quads = np.zeros((1, k, 4, 2), np.int32)
        return FusedOutputs(
            boxes=boxes,
            valid=valid,
            scores=np.full((1, k), 0.9, np.float32),
            ctc_idx=idx,
            ctc_prob=np.ones((1, k, t), np.float32),
            roots=np.zeros((1, k), np.int32),
            ctc_blank=None,
            quads=quads,
        )

    def test_small_det_box_kept_when_source_side_large(self, fused):
        out = self._fake_out(fused, 10, 10, 13, 13)  # 3 px det sides
        # ratio 0.25: the 3 px det box is a 12 px source box — kept
        words = fused._words_from_outputs(out, 0, 0.25, 0.25, 400, 400)
        assert len(words) == 1
        assert words[0]["box"][0] == [40, 40]

    def test_small_source_box_dropped_at_ratio_one(self, fused):
        out = self._fake_out(fused, 10, 10, 13, 13)
        # ratio 1: 3 px source sides ≤ 4 → FilterTagDetRes drops it
        words = fused._words_from_outputs(out, 0, 1.0, 1.0, 400, 400)
        assert words == []


class TestFusedDilation:
    def test_dilate2x2_matches_cv2_exactly(self):
        """The even 2×2 kernel's anchor makes ink spread DOWN-RIGHT; an
        anchor flip is a silent 1 px box shift that box-IoU gates can't
        see (review r3)."""
        import jax
        import jax.numpy as jnp

        from ppocr_tpu.pipeline.fused import _dilate2x2

        rng = np.random.default_rng(9)
        for _ in range(6):
            mask = rng.random((40, 56)) < 0.15
            want = (
                cv2.dilate(
                    mask.astype(np.uint8) * 255,
                    cv2.getStructuringElement(cv2.MORPH_RECT, (2, 2)),
                )
                > 0
            )
            got = np.asarray(jax.jit(_dilate2x2)(jnp.asarray(mask)))
            np.testing.assert_array_equal(got, want)

    def test_dilation_matches_staged(self, reference_models):
        """use_dilation=True must behave in the fused graph like the staged
        binarize_np 2×2 cv2.dilate (review r3: it used to be silently
        ignored on the fast path)."""
        from ppocr_tpu.ops import iou_float, xyxyxyxy2xyxy

        cfg = small_config(enable_cls=False, fast_path=True)
        cfg.det.use_dilation = True
        eng = OCREngine(str(reference_models), cfg)
        img = synthetic_text_image()
        eng.config.fast_path = False
        staged = OCRWorker(eng, 0).process(img, 1)
        eng.config.fast_path = True
        got = eng.fused_ocr().process(img, 1)
        assert len(got["words"]) == len(staged.get("words", []))
        for gw, sw in zip(got["words"], staged["words"]):
            iou = iou_float(xyxyxyxy2xyxy(gw["box"]), xyxyxyxy2xyxy(sw["box"]))
            assert iou >= 0.8, (gw["box"], sw["box"])
