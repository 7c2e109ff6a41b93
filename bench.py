"""Benchmark: end-to-end OCR latency on the bundled card image.

Measures the BASELINE.json headline config — the full det→(cls)→rec
pipeline on images/card-jd.jpg with the reference's serving profile — on
whatever accelerator JAX sees (the driver runs this on the real TPU chip).

Prints ONE JSON line:
    {"metric": "e2e_ms_per_image_p50", "value": <ms>, "unit": "ms",
     "vs_baseline": <reference_100ms / value>}

vs_baseline > 1 means faster than the reference's "100 ms-class" headline
claim (README.md:2 of the reference; BASELINE.md).

Regression gate (VERDICT r2 weak #3): ``python bench.py --check`` exits
non-zero when the fused on-chip step exceeds the 10 ms north-star budget,
when trained-weight e2e exact-match drops below the last-known-good value,
or when p50 regresses >20% vs the committed BENCH_GOOD.json.
``--update-good`` rewrites BENCH_GOOD.json from the current run.
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_BASELINE_MS = 100.0  # "100ms级" headline, reference README.md:2

# public per-chip peak matmul throughput (dense bf16, f32 accumulation) for
# MFU accounting; keyed on substrings of jax.devices()[0].device_kind.
# v5e ("v5 lite"): 197 TFLOP/s bf16 (cloud.google.com/tpu/docs/v5e).
_PEAK_BF16_FLOPS = {
    "v5 lite": 197e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v4": 275e12,
    "v6": 918e12,
}


def _peak_flops(device) -> float | None:
    kind = getattr(device, "device_kind", str(device)).lower()
    for key, val in _PEAK_BF16_FLOPS.items():
        if key in kind:
            return val
    return None


def _flops_of(jitted, *args) -> float | None:
    """Analytic FLOP count of one call via XLA's HLO cost analysis
    (VERDICT r3 weak #4); None when the backend doesn't expose it. The
    axon backend returns None from lowered.cost_analysis() but fills it
    after compile() — a cache hit for graphs the bench already ran."""
    try:
        lowered = jitted.lower(*args)
        ca = lowered.cost_analysis()
        if ca is None:
            ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None
MODEL_DIR = os.environ.get("PPOCR_MODEL_DIR", "/root/reference/models")
CARD = os.environ.get(
    "PPOCR_BENCH_IMAGE", "/root/reference/images/card-jd.jpg"
)
ITERS = int(os.environ.get("PPOCR_BENCH_ITERS", "50"))


def _score_scenes(worker, ds, n_scenes, normalize):
    """(exact, norm_exact, total) of rendered lines read back through
    ``worker``: each placed ground-truth line is IoU-matched (>0.2) to a
    detected word, then scored raw and ``normalize``-collapsed."""
    import numpy as np

    total = exact = norm_exact = 0
    for s in range(n_scenes):
        scene, placed = ds.sample_scene()
        r = worker.process(scene, s)
        if not r.get("success"):
            return None, None, 0
        for t, (x0, y0, x1, y1) in placed:
            best, biou = None, 0.2
            for word in r["words"]:
                bx = np.array(word["box"])
                wx0, wy0 = bx.min(0)
                wx1, wy1 = bx.max(0)
                ix0, iy0 = max(x0, wx0), max(y0, wy0)
                ix1, iy1 = min(x1, wx1), min(y1, wy1)
                inter = max(0, ix1 - ix0) * max(0, iy1 - iy0)
                ua = (
                    (x1 - x0) * (y1 - y0)
                    + (wx1 - wx0) * (wy1 - wy0)
                    - inter
                )
                v = inter / ua if ua > 0 else 0.0
                if v > biou:
                    biou, best = v, word
            total += 1
            if best is not None and best["text"] == t:
                exact += 1
            if best is not None and normalize(best["text"]) == normalize(t):
                norm_exact += 1
    return exact, norm_exact, total


def _accuracy_cfg(rec_w_px: int):
    from ppocr_tpu.pipeline.config import DetConfig, PipelineConfig, RecConfig

    return PipelineConfig(
        det=DetConfig(
            limit_type="max",
            limit_side_len=96,
            thresh=0.2,
            box_thresh=0.4,
            unclip_ratio=1.8,
            score_mode="fast",
            shape_buckets=(64, 96),
        ),
        rec=RecConfig(
            batch_num=4,
            img_h=48,
            img_w=rec_w_px,
            width_buckets=(rec_w_px,),
        ),
        enable_cls=False,
        fast_path=False,
        dtype="float32",
    )


def _assemble_bundle(md, det_w, rec_w, keys_file):
    import shutil

    for name in ("det", "cls", "rec"):
        os.makedirs(os.path.join(md, name))
        shutil.copy(
            os.path.join(MODEL_DIR, name, "inference.pdmodel"),
            os.path.join(md, name, "inference.pdmodel"),
        )
    shutil.copy(keys_file, os.path.join(md, "rec", "ppocr_keys_v1.txt"))
    shutil.copy(det_w, os.path.join(md, "det", "weights.npz"))
    shutil.copy(rec_w, os.path.join(md, "rec", "weights.npz"))


def _jumbo_accuracy(n_scenes: int = 34, seeds=(90210, 777, 31337)):
    """(exact_match, homoglyph_normalized_match) of the ~5,000-class jumbo
    bundle (weights/rec_scene_jumbo.npz over weights/jumbo_keys.txt —
    reference-SCALE class counts, VERDICT r2 missing #1), or (None, None)
    while the trained jumbo bundle is absent. Normalization collapses the
    computed render-identical families (weights/jumbo_homoglyphs.txt): at
    this scale DejaVu draws hundreds of codepoints pixel-identically, so
    the normalized number is the real signal — the measured raw ceiling of
    a PERFECT model on this distribution is ~0.79 (same-font pixel-clone
    analysis, docs/PERF.md "jumbo raw ceiling"). Protocol matches the
    ≥200-word gate eval (tests/test_e2e_trained_jumbo.py EVAL_SEEDS)."""
    import tempfile

    from ppocr_tpu.pipeline import OCREngine, OCRWorker
    from ppocr_tpu.train.synthetic import (
        JUMBO_KEYS_FILE,
        homoglyph_normalize,
        jumbo_homoglyph_map,
        text_scene_dataset,
    )

    here = os.path.dirname(os.path.abspath(__file__))
    det_w = os.path.join(here, "weights", "det_synthetic_text.npz")
    rec_w = os.path.join(here, "weights", "rec_scene_jumbo.npz")
    if not (
        os.path.exists(det_w)
        and os.path.exists(rec_w)
        and os.path.exists(JUMBO_KEYS_FILE)
    ):
        return None, None
    fam = jumbo_homoglyph_map()
    with tempfile.TemporaryDirectory() as md:
        _assemble_bundle(md, det_w, rec_w, JUMBO_KEYS_FILE)
        worker = OCRWorker(OCREngine(md, _accuracy_cfg(256)), worker_id=0)
        exact = norm_exact = total = 0
        for seed in seeds:
            e, ne, t = _score_scenes(
                worker,
                text_scene_dataset("jumbo", seed=seed),
                n_scenes,
                lambda t: homoglyph_normalize(t, fam),
            )
            if e is None:
                return None, None
            exact, norm_exact, total = exact + e, norm_exact + ne, total + t
        if total == 0:
            return None, None
        return (
            round(exact / total, 4),
            round(norm_exact / total, 4),
        )


def _trained_accuracy(n_scenes: int = 16):
    """(exact_match, homoglyph_normalized_match, gate_name) of rendered
    lines read back through the staged pipeline with the bundled trained
    det+rec weights (the e2e accuracy loop of tests/test_e2e_trained*.py,
    measured on this chip). Raw exactness counts DejaVu homoglyph flips
    (Sans draws 'l'/'I' as the same bar) as misses; the normalized number
    scores up to train.synthetic.HOMOGLYPHS families and is the stable
    regression signal.

    Prefers the multi-class printable-ASCII weights (94 trained classes
    scattered across the 6,625-way head — VERDICT r2 missing #1); falls
    back to the round-2 digit weights."""
    import tempfile

    from ppocr_tpu.pipeline import OCREngine, OCRWorker
    from ppocr_tpu.train.synthetic import (
        SyntheticSceneDataset,
        homoglyph_normalize,
        text_scene_dataset,
    )

    here = os.path.dirname(os.path.abspath(__file__))
    gate = "ascii"
    det_w = os.path.join(here, "weights", "det_synthetic_text.npz")
    rec_w = os.path.join(here, "weights", "rec_scene_ascii.npz")
    if not (os.path.exists(det_w) and os.path.exists(rec_w)):
        gate = "digits"
        det_w = os.path.join(here, "weights", "det_synthetic_digits.npz")
        rec_w = os.path.join(here, "weights", "rec_scene_digits.npz")
    if not (os.path.exists(det_w) and os.path.exists(rec_w)):
        return None, None, None
    with tempfile.TemporaryDirectory() as md:
        _assemble_bundle(
            md,
            det_w,
            rec_w,
            os.path.join(MODEL_DIR, "rec", "ppocr_keys_v1.txt"),
        )
        rec_w_px = 256 if gate == "ascii" else 160
        worker = OCRWorker(
            OCREngine(md, _accuracy_cfg(rec_w_px)), worker_id=0
        )
        if gate == "ascii":
            ds = text_scene_dataset("ascii", seed=424)
        else:
            ds = SyntheticSceneDataset(seed=424)
        exact, norm_exact, total = _score_scenes(
            worker, ds, n_scenes, homoglyph_normalize
        )
        if total == 0:
            return None, None, gate
        return (
            round(exact / total, 4),
            round(norm_exact / total, 4),
            gate,
        )


def run_bench() -> dict:
    import cv2

    from ppocr_tpu.pipeline import OCREngine, OCRWorker, PipelineConfig
    from ppocr_tpu.utils import enable_persistent_cache

    enable_persistent_cache()
    config = PipelineConfig.serving()  # det 512/0.2/0.4/1.8/fast, rec 28px
    # the serving profile defaults to fused (r3); the bench measures the
    # staged parity path first, then flips to fused below
    config.fast_path = False
    engine = OCREngine(MODEL_DIR, config)
    image = cv2.imread(CARD)
    if image is None:
        raise FileNotFoundError(f"cannot read bench image {CARD}")

    def measure(worker) -> list:
        # warm the exact shapes this workload touches (main thread → lazy
        # compiles are safe; persistent cache makes repeat runs fast)
        for _ in range(3):
            r = worker.process(image, request_id=0)
            if not r.get("success"):
                raise RuntimeError(r.get("error", "pipeline failed"))
        samples = []
        for i in range(ITERS):
            t0 = time.perf_counter()
            r = worker.process(image, request_id=i + 1)
            samples.append((time.perf_counter() - t0) * 1e3)
            assert r["success"], r
        samples.sort()
        return samples

    staged = measure(OCRWorker(engine, worker_id=0))

    # staged throughput with stage overlap: 2 logical workers share the
    # engine; det of request N+1 overlaps rec of request N (device calls
    # release the GIL). The staged LATENCY floor through the tunnel is 2
    # roundtrips (det fetch feeds the host geometry that builds rec's
    # input) — see docs/PERF.md — so overlap is the staged-path lever.
    from concurrent.futures import ThreadPoolExecutor

    staged_workers = [OCRWorker(engine, worker_id=i) for i in range(2)]
    with ThreadPoolExecutor(2) as pool:
        list(pool.map(lambda w: w.process(image, 0), staged_workers))  # warm
        t0 = time.perf_counter()
        n_overlap = 24
        futs = [
            pool.submit(staged_workers[i % 2].process, image, i)
            for i in range(n_overlap)
        ]
        assert all(f.result()["success"] for f in futs)
        staged_qps = n_overlap / (time.perf_counter() - t0)

    engine.config.fast_path = True
    fused = measure(OCRWorker(engine, worker_id=1))

    # throughput: rec crops/sec/chip (BASELINE.json metric) — sustained
    # width-bucketed batches through the recognizer
    rng_crops = [image[30:58, 10 + 3 * i : 154 + 3 * i] for i in range(16)]
    engine.recognize(rng_crops)  # warm
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        engine.recognize(rng_crops)
    crops_per_sec = reps * len(rng_crops) / (time.perf_counter() - t0)

    # pipelined fused throughput (async dispatch, fetch once at the end)
    import jax

    fused_ocr = engine.fused_ocr()
    from ppocr_tpu.ops import det_resize
    from ppocr_tpu.pipeline.config import pick_bucket

    resized, _, _ = det_resize(image, config.det.limit_type, config.det.limit_side_len)
    bh = pick_bucket(config.det.shape_buckets, resized.shape[0])
    bw = pick_bucket(config.det.shape_buckets, resized.shape[1])
    np = __import__("numpy")
    img_padded = np.zeros((1, bh, bw, 3), "uint8")
    img_padded[0, : resized.shape[0], : resized.shape[1]] = resized
    content_hw = np.array([[resized.shape[0], resized.shape[1]]], "int32")
    step = fused_ocr._step
    jax.device_get(
        step(
            engine.det_params,
            engine.rec_params,
            fused_ocr._cls_params(),
            img_padded,
            content_hw,
        )
    )
    t0 = time.perf_counter()
    out = None
    for _ in range(40):
        out = step(
            engine.det_params,
            engine.rec_params,
            fused_ocr._cls_params(),
            img_padded,
            content_hw,
        )
    jax.block_until_ready(out)
    fused_qps = 40 / (time.perf_counter() - t0)

    # tunnel-tick histogram (VERDICT r4 weak #3): per-request e2e time in
    # units of the tunnel RTT, split into dispatch (host prep + enqueue +
    # any synchronous upload) vs fetch (device_get) — identifies WHERE a
    # request pays a second roundtrip when the p99 doubles. Novel content
    # per iteration defeats the transfer path's content dedup.
    tick_samples = []
    for i in range(ITERS):
        v = img_padded.copy()
        v[0, 5, : 64, 2] = i  # unique content, same shape
        t0 = time.perf_counter()
        o = step(
            engine.det_params,
            engine.rec_params,
            fused_ocr._cls_params(),
            v,
            content_hw,
        )
        t1 = time.perf_counter()
        jax.device_get(o)
        t2 = time.perf_counter()
        tick_samples.append(((t1 - t0) * 1e3, (t2 - t1) * 1e3))
    tick_totals = sorted(d + f for d, f in tick_samples)
    tick_ms = statistics.median(tick_totals)  # ≈ 1 RTT on the tunnel
    tick_hist: dict = {}
    for t in tick_totals:
        k = str(max(1, round(t / tick_ms)))
        tick_hist[k] = tick_hist.get(k, 0) + 1
    disp_p99 = sorted(d for d, _ in tick_samples)[
        min(ITERS - 1, int(ITERS * 0.99))
    ]
    fetch_p99 = sorted(f for _, f in tick_samples)[
        min(ITERS - 1, int(ITERS * 0.99))
    ]

    # same protocol with a DISTINCT image per dispatch — the honest
    # novel-upload pipelining number (content-identical uploads are
    # deduped by the transfer path, so the loop above measures dispatch
    # pipelining only; VERDICT r3 next-step #6)
    novel = []
    for i in range(40):
        v = img_padded.copy()
        v[0, 3, : 64, 0] = i  # unique content, same shape
        novel.append(v)
    outs = []
    t0 = time.perf_counter()
    for v in novel:
        outs.append(
            step(
                engine.det_params,
                engine.rec_params,
                fused_ocr._cls_params(),
                v,
                content_hw,
            )
        )
    jax.block_until_ready(outs)
    fused_novel_qps = 40 / (time.perf_counter() - t0)

    # TRUE on-chip fused-step time, immune to the tunnel's replay cache:
    # N-vs-1 dependent in-graph loop, novel args, device_get sync (see
    # docs/PERF.md "Measurement protocol")
    import jax.numpy as jnp

    def _make_loop(n):
        @jax.jit
        def looped(dp, rp, x, c):
            def it(i, acc):
                v = (x + i.astype(jnp.uint8)).astype(jnp.uint8)
                o = step.__wrapped__(dp, rp, None, v, c)
                return acc + o.boxes.astype(jnp.float32).sum() + o.ctc_prob.sum()

            return jax.lax.fori_loop(0, n, it, jnp.float32(0))

        return looped

    # TWO-LOOP-SIZE delta, (T(n_hi) − T(n_lo))/(n_hi − n_lo): both
    # measurements carry the same tunnel RTT + dispatch fixed cost, so the
    # subtraction cancels it symmetrically — the old (T(N) − T(1))/(N−1)
    # form let RTT jitter on the tiny T(1) leak straight into the per-step
    # number (the r4 rec_sat −13% "regression" was exactly this: zero
    # rec-path commits between the two runs). Protocol v3 hardening
    # (docs/PERF.md): the r5 first --update-good attempt read rec_sat 4×
    # low because the hi loop was timed IMMEDIATELY after its own compile
    # (persistent-cache writeback + executable-load polluted ALL trials of
    # one delta side; a standalone re-probe measured a steady ~930 µs/step
    # across four loop sizes). So: (a) one throwaway settle run per loop
    # after compile, (b) lo/hi trials INTERLEAVED so slow drift hits both
    # sides, (c) min-of-5, (d) loop-size gaps large enough that the true
    # delta dwarfs one tunnel tick. fori_loop keeps the compiled graph
    # size independent of n, so large n_hi costs nothing extra to build.
    margs = (engine.det_params, engine.rec_params)

    def _delta_ms(l_lo, l_hi, n_lo, n_hi, call_lo, call_hi, trials=5):
        """Per-step ms via interleaved min-of-`trials` two-size delta."""
        lo_ts, hi_ts = [], []
        for i in range(trials):
            t0 = time.perf_counter()
            jax.device_get(call_lo(l_lo, i))
            lo_ts.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            jax.device_get(call_hi(l_hi, i))
            hi_ts.append(time.perf_counter() - t0)
        return (min(hi_ts) - min(lo_ts)) / (n_hi - n_lo) * 1e3

    n_lo, n_hi = 9, 41
    l_lo, l_hi = _make_loop(n_lo), _make_loop(n_hi)

    def _fused_call(img, chw, salt):
        def call(loop, i):
            v = img.copy()
            v[0, 9, 9, 1] = salt + i
            return loop(*margs, v, chw)

        return call

    jax.device_get(l_lo(*margs, img_padded, content_hw))  # compile
    jax.device_get(l_hi(*margs, img_padded, content_hw))
    jax.device_get(l_lo(*margs, img_padded, content_hw))  # settle
    jax.device_get(l_hi(*margs, img_padded, content_hw))
    onchip_ms = _delta_ms(
        l_lo, l_hi, n_lo, n_hi,
        _fused_call(img_padded, content_hw, 40),
        _fused_call(img_padded, content_hw, 170),
    )

    # --- MFU / roofline + saturated throughput (VERDICT r3 weak #4) ---
    # FLOPs from XLA's own HLO cost analysis of the fused step; MFU = how
    # much of the chip's peak matmul rate the measured on-chip time uses.
    peak = _peak_flops(jax.devices()[0])
    step_flops = _flops_of(
        step, engine.det_params, engine.rec_params, None, img_padded,
        content_hw,
    )
    mfu_pct = (
        round(step_flops / (onchip_ms * 1e-3) / peak * 100, 2)
        if step_flops and peak and onchip_ms > 0
        else None
    )

    # saturated fused step: the SAME dependent-loop protocol at batch 8
    # (amortizes the per-step fixed costs; the honest images/s/chip
    # ceiling of this graph, BASELINE.json "crops/sec per chip" analog)
    sat_b = 8
    img_sat = np.repeat(img_padded, sat_b, axis=0)
    content_sat = np.repeat(content_hw, sat_b, axis=0)
    jax.device_get(l_lo(*margs, img_sat, content_sat))  # compile batched
    jax.device_get(l_hi(*margs, img_sat, content_sat))
    jax.device_get(l_lo(*margs, img_sat, content_sat))  # settle
    jax.device_get(l_hi(*margs, img_sat, content_sat))
    sat_ms = _delta_ms(
        l_lo, l_hi, n_lo, n_hi,
        _fused_call(img_sat, content_sat, 41),
        _fused_call(img_sat, content_sat, 171),
    )
    fused_sat_ips = sat_b / sat_ms * 1e3 if sat_ms > 0 else None
    sat_flops = _flops_of(
        step, engine.det_params, engine.rec_params, None, img_sat,
        content_sat,
    )
    mfu_sat_pct = (
        round(sat_flops / (sat_ms * 1e-3) / peak * 100, 2)
        if sat_flops and peak and sat_ms > 0
        else None
    )

    # saturated recognizer: batch-64 rec forward in a dependent loop —
    # the pure MXU crops/sec/chip ceiling without det/geometry
    from ppocr_tpu.models.rec_svtr import rec_forward

    rec_b, rec_h, rec_w = 64, config.rec.img_h, config.rec.img_w
    crops_sat = (
        np.random.default_rng(0)
        .standard_normal((rec_b, rec_h, rec_w, 3))
        .astype("float32")
    )

    def _make_rec_loop(n):
        @jax.jit
        def looped(rp, x):
            def it(i, acc):
                v = (x + i.astype(jnp.float32) * 1e-3).astype(engine.dtype)
                return acc + rec_forward(rp, v).astype(jnp.float32).sum()

            return jax.lax.fori_loop(0, n, it, jnp.float32(0))

        return looped

    # the rec step is sub-ms, so the loop counts must be large enough for
    # the delta to dwarf one tunnel tick (~33-40 ms): 192 extra steps ≈
    # 180 ms of true delta. Protocol v3: settle runs + interleaved
    # min-of-5 via _delta_ms, same as the fused loops above.
    n_rec_lo, n_rec_hi = 65, 257
    r_lo, r_hi = _make_rec_loop(n_rec_lo), _make_rec_loop(n_rec_hi)

    def _rec_call(salt):
        def call(loop, i):
            v = crops_sat.copy()
            v[0, 0, 0, 0] = salt + i
            return loop(engine.rec_params, v)

        return call

    jax.device_get(r_lo(engine.rec_params, crops_sat))  # compile
    jax.device_get(r_hi(engine.rec_params, crops_sat))
    jax.device_get(r_lo(engine.rec_params, crops_sat))  # settle
    jax.device_get(r_hi(engine.rec_params, crops_sat))
    rec_sat_ms = _delta_ms(
        r_lo, r_hi, n_rec_lo, n_rec_hi, _rec_call(1.0), _rec_call(3.0)
    )
    rec_sat_cps = rec_b / rec_sat_ms * 1e3 if rec_sat_ms > 0 else None
    recf = jax.jit(rec_forward)
    rec_flops = _flops_of(
        recf, engine.rec_params, crops_sat.astype(engine.dtype)
    )
    rec_mfu_pct = (
        round(rec_flops / (rec_sat_ms * 1e-3) / peak * 100, 2)
        if rec_flops and peak and rec_sat_ms > 0
        else None
    )

    # e2e accuracy with the bundled in-repo-trained weights: real OCR on
    # this chip (det finds rendered text lines, rec reads them back);
    # None when the weight bundles are absent
    trained_acc, trained_norm_acc, trained_gate = None, None, None
    try:
        trained_acc, trained_norm_acc, trained_gate = _trained_accuracy()
    except Exception:
        pass
    jumbo_acc, jumbo_norm_acc = None, None
    try:
        jumbo_acc, jumbo_norm_acc = _jumbo_accuracy()
    except Exception:
        pass

    p50 = statistics.median(fused)  # fused single-dispatch = serving mode
    p99 = fused[min(len(fused) - 1, int(len(fused) * 0.99))]
    result = {
        "metric": "e2e_ms_per_image_p50",
        "value": round(p50, 3),
        "unit": "ms",
        "vs_baseline": round(REFERENCE_BASELINE_MS / p50, 3),
        "extra": {
            "p99_ms": round(p99, 3),
            # tunnel-tick accounting: how many requests paid N roundtrips,
            # and whether the extra tick lands in dispatch or fetch
            "e2e_tick_hist": tick_hist,
            "tick_ms_est": round(tick_ms, 1),
            "dispatch_p99_ms": round(disp_p99, 1),
            "fetch_p99_ms": round(fetch_p99, 1),
            "fused_onchip_ms": round(onchip_ms, 3),
            # the BASELINE.md north-star is a per-chip budget; the tunnel
            # adds ~30 ms/dispatch of environment tax on top of it
            "onchip_target_met": bool(onchip_ms <= 10.0),
            "staged_parity_p50_ms": round(statistics.median(staged), 3),
            "staged_overlap_images_per_sec": round(staged_qps, 1),
            "rec_crops_per_sec": round(crops_per_sec, 1),
            "fused_pipelined_images_per_sec": round(fused_qps, 1),
            "fused_pipelined_novel_images_per_sec": round(fused_novel_qps, 1),
            # roofline accounting: XLA-counted FLOPs / measured on-chip
            # time / public per-chip bf16 peak (docs/PERF.md "MFU")
            "fused_step_gflops": (
                round(step_flops / 1e9, 3) if step_flops else None
            ),
            "mfu_pct": mfu_pct,
            "fused_sat_batch": sat_b,
            "fused_sat_ms_per_image": (
                round(sat_ms / sat_b, 3) if fused_sat_ips else None
            ),
            "fused_sat_images_per_sec": (
                round(fused_sat_ips, 1) if fused_sat_ips else None
            ),
            "mfu_sat_pct": mfu_sat_pct,
            "rec_sat_batch": rec_b,
            "rec_sat_crops_per_sec": (
                round(rec_sat_cps, 1) if rec_sat_cps else None
            ),
            "rec_sat_mfu_pct": rec_mfu_pct,
            "peak_tflops_bf16": round(peak / 1e12, 1) if peak else None,
            "iters": ITERS,
            "image": os.path.basename(CARD),
            "profile": "serving(det512, rec 28px, cls off); fused single-dispatch",
            "device": str(__import__("jax").devices()[0]),
            "stand_in_weights": [
                k for k, v in engine.random_weights.items() if v
            ],
            "trained_weights_e2e_exact_match": trained_acc,
            "trained_weights_e2e_homoglyph_norm_match": trained_norm_acc,
            "trained_gate": trained_gate,
            "jumbo_e2e_exact_match": jumbo_acc,
            "jumbo_e2e_homoglyph_norm_match": jumbo_norm_acc,
        },
    }
    return result


GOOD_FILE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_GOOD.json"
)


def check_regressions(result: dict, good: dict) -> list:
    """Failure strings when the run regresses past the committed
    last-known-good (VERDICT r2 weak #3: nothing used to FAIL)."""
    fails = []
    extra = result["extra"]
    if extra["fused_onchip_ms"] > 10.0:
        fails.append(
            f"fused on-chip {extra['fused_onchip_ms']} ms > 10 ms budget"
        )
    if good:
        limit = good["value"] * 1.20
        if result["value"] > limit:
            # the e2e p50 is tunnel-dominated (1 RTT + on-chip step), and
            # the tunnel RTT itself swings between sessions (observed
            # 33 → 39.4 ms "phases"). Normalize by each run's own measured
            # tick before failing: only a regression that survives
            # tick-normalization is the code's fault (docs/PERF.md
            # "protocol v3"). Absolute p50 is still reported verbatim.
            good_tick = good.get("extra", {}).get("tick_ms_est")
            tick = extra.get("tick_ms_est")
            if good_tick and tick:
                norm = result["value"] / tick
                good_norm = good["value"] / good_tick
                if norm > good_norm * 1.20:
                    fails.append(
                        f"p50 {result['value']} ms ({norm:.2f} ticks) > "
                        f"+20% over good {good['value']} ms "
                        f"({good_norm:.2f} ticks), tick-normalized"
                    )
            else:
                fails.append(
                    f"p50 {result['value']} ms > {limit:.1f} ms "
                    f"(+20% over good {good['value']})"
                )
        good_acc = good.get("extra", {}).get("trained_weights_e2e_exact_match")
        acc = extra.get("trained_weights_e2e_exact_match")
        good_gate = good.get("extra", {}).get("trained_gate")
        same_gate = extra.get("trained_gate") == good_gate
        if good_acc is not None:
            if acc is None:
                fails.append("trained-weight accuracy gate did not run")
            elif not same_gate:
                # a silent fallback (e.g. the ascii bundle went missing →
                # digits) must FAIL, not bypass the accuracy comparison
                fails.append(
                    f"accuracy gate changed: {extra.get('trained_gate')} "
                    f"(good: {good_gate}) — weight bundle missing?"
                )
            elif acc < good_acc - 0.02:
                fails.append(
                    f"trained e2e exact-match {acc} < good {good_acc} - 0.02"
                )
        good_norm = good.get("extra", {}).get(
            "trained_weights_e2e_homoglyph_norm_match"
        )
        norm = extra.get("trained_weights_e2e_homoglyph_norm_match")
        if good_norm is not None and norm is not None and same_gate:
            # the homoglyph-normalized number is immune to l/I coin flips,
            # so it gets a tighter band than the raw one
            if norm < good_norm - 0.01:
                fails.append(
                    f"homoglyph-normalized e2e match {norm} < good "
                    f"{good_norm} - 0.01"
                )
        # saturated-throughput regression gates (VERDICT r3 weak #4):
        # the MXU-ceiling numbers may not silently drop >20%
        for key in ("fused_sat_images_per_sec", "rec_sat_crops_per_sec"):
            gv = good.get("extra", {}).get(key)
            cv = extra.get(key)
            if gv is not None:
                if cv is None:
                    fails.append(f"{key} did not run (good: {gv})")
                elif cv < gv * 0.80:
                    fails.append(f"{key} {cv} < good {gv} - 20%")
        good_jumbo = good.get("extra", {}).get(
            "jumbo_e2e_homoglyph_norm_match"
        )
        jumbo = extra.get("jumbo_e2e_homoglyph_norm_match")
        if good_jumbo is not None:
            if jumbo is None:
                fails.append("jumbo accuracy gate did not run")
            elif jumbo < good_jumbo - 0.02:
                fails.append(
                    f"jumbo normalized e2e match {jumbo} < good "
                    f"{good_jumbo} - 0.02"
                )
    return fails


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument(
        "--check",
        action="store_true",
        help="exit non-zero on regression vs BENCH_GOOD.json / the 10 ms "
        "on-chip budget",
    )
    p.add_argument(
        "--update-good",
        action="store_true",
        help="write this run to BENCH_GOOD.json as the new last-known-good",
    )
    args = p.parse_args(argv)

    # the axon tunnel can wedge globally (jax.devices() then hangs in
    # every process, including this one — observed after a client died
    # mid-dispatch); probe it in a killable subprocess so a dead tunnel
    # yields an honest one-line error instead of an eternal hang
    import subprocess

    try:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True,
            timeout=180,
        )
        probe_ok = probe.returncode == 0
    except subprocess.TimeoutExpired:
        probe_ok = False
    if not probe_ok:
        print(
            json.dumps(
                {
                    "metric": "e2e_ms_per_image_p50",
                    "value": None,
                    "unit": "ms",
                    "vs_baseline": None,
                    "error": "device backend unreachable (axon tunnel "
                    "wedged/down): jax.devices() failed or hung >180s "
                    "in a probe subprocess",
                }
            )
        )
        return 2

    try:
        result = run_bench()
    except FileNotFoundError as e:
        # keep the one-JSON-line output contract even when an asset is
        # missing (scripted consumers parse the single line)
        print(
            json.dumps(
                {
                    "metric": "e2e_ms_per_image_p50",
                    "value": None,
                    "unit": "ms",
                    "vs_baseline": None,
                    "error": str(e),
                }
            )
        )
        return 1
    print(json.dumps(result))
    rc = 0
    if args.check:
        # read the PRIOR good before any update — checking against a
        # baseline written by the same invocation would be a tautology
        good = {}
        if os.path.exists(GOOD_FILE):
            good = json.load(open(GOOD_FILE))
        fails = check_regressions(result, good)
        for msg in fails:
            print(f"REGRESSION: {msg}", file=sys.stderr)
        rc = 1 if fails else 0
    if args.update_good and rc == 0:
        with open(GOOD_FILE, "w") as f:
            json.dump(result, f, indent=1)
    return rc


if __name__ == "__main__":
    sys.exit(main())
