"""Device-resident OCR engine: the three jitted model steps + bucketing.

This is the TPU replacement for the reference's per-worker trio of Paddle
predictors (ocr_worker.h:91-93). One engine owns one device-resident copy of
all three models; concurrency comes from batched device steps rather than
model replicas, so N workers do NOT cost N× memory.

Static-shape discipline (XLA compiles per shape):
  * det: jit-cached per resized (H, W) — both /32 multiples from
    ops.det_resize, so the variant count is tiny for a given limit_side_len.
  * cls: fixed (48, 192) crops; batch padded to power-of-two buckets.
  * rec: width padded to config buckets, batch padded to buckets; crops are
    aspect-sorted first exactly like ocr_rec.cpp:36-40 so same-bucket crops
    batch together.

Each step ships uint8 NHWC to the device and fuses cast+normalize into the
model jit; only small decode tensors come back (CTC argmax/max instead of
the full [N,T,6625] softmax — see ops.ctc).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import (
    cast_tree,
    cls_forward,
    convert_cls_params,
    convert_det_params,
    convert_rec_params,
    det_forward,
    rec_forward,
)
from ..ops import crnn_resize, cls_resize, det_resize
from ..ops.ctc import ctc_greedy_collapse, ctc_topk_device
from ..ops.db_postprocess import DBPostProcess
from ..ops.normalize import (
    HALF_MEAN,
    HALF_SCALE,
    IMAGENET_MEAN,
    IMAGENET_SCALE,
    pack_batch,
)
from ..paddle_compat import init_random_params, load_params, load_program
from ..utils import enable_persistent_cache
from .charset import load_charset
from .config import PipelineConfig, batch_buckets, pick_bucket


def _nhwc_normalize(batch_u8, mean, scale):
    x = batch_u8.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(mean, jnp.float32)) * jnp.asarray(scale, jnp.float32)


@dataclass
class StageTimes:
    """Per-stage [preprocess, inference, postprocess] wall-clock ms,
    mirroring the `times` vectors of ocr_det.cpp:168-175 etc. — but kept
    and surfaced instead of discarded (SURVEY.md §5 tracing gap)."""

    preprocess_ms: float = 0.0
    inference_ms: float = 0.0
    postprocess_ms: float = 0.0

    def as_list(self) -> List[float]:
        return [self.preprocess_ms, self.inference_ms, self.postprocess_ms]


class OCREngine:
    """Owns params on device + jitted forward steps for det/cls/rec."""

    def __init__(
        self,
        model_dir: str,
        config: Optional[PipelineConfig] = None,
        device=None,
        mesh=None,
    ):
        """``mesh``: an optional ``jax.sharding.Mesh`` with a "data" axis.
        When given, params are replicated across the mesh and the fused
        serving path shards request batches over "data" — the multi-chip
        replacement for the reference's N-replica worker pool
        (cpu_worker_pool.cpp:43-56; SURVEY §2.4 DP row)."""
        self.config = config or PipelineConfig.serving()
        self.model_dir = model_dir
        enable_persistent_cache()
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            self._param_sharding = NamedSharding(mesh, PartitionSpec())
            self.device = mesh.devices.flat[0]
        else:
            self._param_sharding = None
            self.device = device or jax.devices()[0]
        self.dtype = (
            jnp.bfloat16 if self.config.dtype == "bfloat16" else jnp.float32
        )
        self.post = DBPostProcess(
            thresh=self.config.det.thresh,
            box_thresh=self.config.det.box_thresh,
            unclip_ratio=self.config.det.unclip_ratio,
            score_mode=self.config.det.score_mode,
            use_dilation=self.config.det.use_dilation,
        )
        self.random_weights: Dict[str, bool] = {}
        self._load_params()
        self._build_steps()
        # det shapes known-compiled (warmup + main-thread compiles). Worker
        # threads may only execute these: compiling on a non-main thread
        # deadlocks the TPU tunnel (see warmup docstring).
        self._compiled_det_shapes: set = set()
        self._check_resize_envelope()

    def _check_resize_envelope(self):
        """Warn at construction when the det resize envelope can exceed the
        closed bucket set — such requests only succeed from the main thread
        (ADVICE r1: the silent exact-shape fallback could lazily compile on
        a worker thread and deadlock the TPU tunnel)."""
        import warnings

        det = self.config.det
        if not det.pad_to_buckets:
            return
        if det.limit_type == "min":
            warnings.warn(
                "det limit_type='min' gives an unbounded resize envelope; "
                "requests above shape_buckets[-1] are only served from the "
                "main thread (off-bucket shapes are never lazily compiled "
                "on worker threads)",
                stacklevel=3,
            )
        else:
            envelope = int(round(det.limit_side_len / 32)) * 32
            if envelope > det.shape_buckets[-1]:
                warnings.warn(
                    f"det resize envelope {envelope} exceeds the largest "
                    f"shape bucket {det.shape_buckets[-1]}; oversized "
                    "requests are only served from the main thread",
                    stacklevel=3,
                )

    # -- weights ----------------------------------------------------------

    def _weight_cache_path(self, name: str, source: str) -> str:
        import hashlib

        st = os.stat(source)
        key = hashlib.sha1(
            f"{os.path.abspath(source)}:{st.st_mtime_ns}:{st.st_size}".encode()
        ).hexdigest()[:16]
        base = os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "ppocr-tpu",
            "weights",
        )
        os.makedirs(base, exist_ok=True)
        return os.path.join(base, f"{name}-{key}.npz")

    def _load_one(self, name: str, convert_fn):
        """Load converted weights, preferring: explicit .npz override in the
        model dir → npz cache of a previous convert → pdiparams convert →
        deterministic stand-ins (det/rec .pdiparams are not bundled with
        the reference; SURVEY.md §2.2)."""
        from ..utils.checkpoint import load_params_npz, save_params_npz

        model_path = os.path.join(self.model_dir, name, "inference.pdmodel")
        params_path = os.path.join(self.model_dir, name, "inference.pdiparams")
        npz_override = os.path.join(self.model_dir, name, "weights.npz")

        if os.path.exists(npz_override):
            params = load_params_npz(npz_override)
            self.random_weights[name] = False
        elif os.path.exists(params_path):
            cache = self._weight_cache_path(name, params_path)
            if os.path.exists(cache):
                params = load_params_npz(cache)
            else:
                prog = load_program(model_path)
                params = convert_fn(prog, load_params(prog, params_path))
                save_params_npz(cache, params)
            self.random_weights[name] = False
        else:
            prog = load_program(model_path)
            params = convert_fn(prog, init_random_params(prog, seed=0))
            self.random_weights[name] = True
        if self.dtype == jnp.bfloat16:
            params = cast_tree(params, jnp.bfloat16)
        return jax.device_put(
            params,
            self._param_sharding if self.mesh is not None else self.device,
        )

    def _load_params(self):
        # the charset is part of the bundle and (re)loads WITH the weights:
        # reload() after a consistent on-disk bundle swap must pick up the
        # new keys file, and a same-size charset swap must not silently
        # decode through a stale one (review r3)
        self.charset = load_charset(
            os.path.join(self.model_dir, "rec", "ppocr_keys_v1.txt")
        )
        self.det_params = self._load_one("det", convert_det_params)
        self.cls_params = (
            self._load_one("cls", convert_cls_params)
            if self.config.enable_cls
            else None
        )
        self.rec_params = self._load_one("rec", convert_rec_params)
        # custom-charset bundles (train/finetune.py export convention) carry
        # their own keys file; a head/charset size mismatch would silently
        # garble decodes (or IndexError mid-request), so fail at load
        head = self.rec_params["head"]["fc"]["b"].shape[0]
        if head == len(self.charset) - 1:
            # a use_space_char=False export: head = blank + keys, no
            # appended space class. Every emitted index still maps to the
            # right charset entry (the space row just can never fire), so
            # serve it — with a note, since the reference dict loader
            # always appends space (ocr_rec.h:82-84)
            import warnings

            warnings.warn(
                f"rec head emits {head} classes, one fewer than the "
                f"charset's {len(self.charset)} (blank + keys + space): "
                "treating as a no-space-class export; the space class "
                "will never be emitted",
                stacklevel=3,
            )
        elif head != len(self.charset):
            if self.random_weights["rec"]:
                raise ValueError(
                    f"rec weights are random stand-ins with the reference "
                    f"graph's {head}-way head, but the bundle's charset "
                    f"file defines {len(self.charset)} classes (keys + "
                    "blank + space, ocr_rec.h:82-84) — provide a trained "
                    f"weights.npz matching {self.model_dir}/rec/"
                    "ppocr_keys_v1.txt (train/finetune.py exports one)"
                )
            raise ValueError(
                f"rec head emits {head} classes but the charset file "
                f"defines {len(self.charset)} (keys + blank + space, "
                "ocr_rec.h:82-84) — weights.npz and ppocr_keys_v1.txt in "
                f"{self.model_dir}/rec are from different bundles"
            )

    # -- jitted steps ------------------------------------------------------

    def _pallas_ok(self) -> bool:
        """Use the fused Pallas CTC top-k kernel: single-device TPU paths
        only (under a GSPMD mesh the jnp reductions shard transparently;
        pallas_call does not)."""
        return self.mesh is None and self.device.platform in ("tpu", "axon")

    def _build_steps(self):
        dtype = self.dtype
        use_pallas = self._pallas_ok()

        @jax.jit
        def det_step(params, img_u8):
            x = _nhwc_normalize(img_u8, IMAGENET_MEAN, IMAGENET_SCALE)
            prob = det_forward(params, x.astype(dtype))
            return prob.astype(jnp.float32)

        @jax.jit
        def cls_step(params, imgs_u8, widths):
            x = _nhwc_normalize(imgs_u8, HALF_MEAN, HALF_SCALE)
            col = jnp.arange(imgs_u8.shape[2], dtype=jnp.int32)
            mask = (col[None, :] < widths[:, None]).astype(x.dtype)
            x = x * mask[:, None, :, None]
            probs = cls_forward(params, x.astype(dtype))
            return jnp.argmax(probs, -1).astype(jnp.int32), jnp.max(probs, -1)

        if self.config.rec.decode == "beam":
            from ..ops.ctc import ctc_beam_topk_device

            cand_k = self.config.rec.beam_candidates

            @jax.jit
            def rec_step(params, imgs_u8):
                x = _nhwc_normalize(imgs_u8, HALF_MEAN, HALF_SCALE)
                probs = rec_forward(params, x.astype(dtype))
                return ctc_beam_topk_device(
                    probs.astype(jnp.float32), cand_k
                )

        else:

            @jax.jit
            def rec_step(params, imgs_u8):
                x = _nhwc_normalize(imgs_u8, HALF_MEAN, HALF_SCALE)
                probs = rec_forward(params, x.astype(dtype))
                return ctc_topk_device(probs, use_pallas=use_pallas)

        self._det_step = det_step
        self._cls_step = cls_step
        self._rec_step = rec_step

    # -- public stage APIs (reference: DBDetector/Classifier/CRNNRecognizer
    #    ::Run — same [pre, infer, post] times contract) -------------------

    def detect(
        self, image_bgr: np.ndarray
    ) -> Tuple[List[np.ndarray], StageTimes]:
        """Full DB detection → quad boxes in source coordinates
        (DBDetector::Run behavior, ocr_det.cpp:93-176)."""
        times = StageTimes()
        t0 = time.perf_counter()
        resized, ratio_h, ratio_w = det_resize(
            image_bgr, self.config.det.limit_type, self.config.det.limit_side_len
        )
        rh, rw = resized.shape[:2]
        buckets = self.config.det.shape_buckets
        if (
            self.config.det.pad_to_buckets
            and rh <= buckets[-1]
            and rw <= buckets[-1]
        ):
            # zero-pad up to the closed (H, W) bucket pair; the prob map is
            # cropped back below so postprocess sees the exact resize shape
            bh, bw = pick_bucket(buckets, rh), pick_bucket(buckets, rw)
            img = np.zeros((1, bh, bw, 3), np.uint8)
            img[0, :rh, :rw] = resized
        else:
            # exact-shape fallback: only the main thread may trigger a fresh
            # compile (non-main-thread compiles deadlock the TPU tunnel)
            import threading

            if (rh, rw) not in self._compiled_det_shapes and (
                threading.current_thread() is not threading.main_thread()
            ):
                raise RuntimeError(
                    f"det shape {(rh, rw)} is outside the compiled bucket "
                    f"set (max {buckets[-1]}) and cannot be compiled from a "
                    "worker thread; warm it up on the main thread via "
                    "engine.warmup(det_shapes=[...]) or raise "
                    "det.shape_buckets"
                )
            img = np.ascontiguousarray(resized[None])  # [1,H,W,3] uint8
            self._compiled_det_shapes.add((rh, rw))
        t1 = time.perf_counter()
        prob = np.asarray(self._det_step(self.det_params, img)[0])[:rh, :rw]
        t2 = time.perf_counter()
        boxes = self.post(
            prob, image_bgr.shape[0], image_bgr.shape[1], ratio_h, ratio_w
        )
        t3 = time.perf_counter()
        times.preprocess_ms = (t1 - t0) * 1e3
        times.inference_ms = (t2 - t1) * 1e3
        times.postprocess_ms = (t3 - t2) * 1e3
        return boxes, times

    def classify(
        self, crops: Sequence[np.ndarray]
    ) -> Tuple[List[int], List[float], StageTimes]:
        """Batch orientation classification (Classifier::Run,
        ocr_cls.cpp:23-106): labels ∈ {0,1} + max softmax scores."""
        times = StageTimes()
        cfg = self.config.cls
        _, img_h, img_w = cfg.image_shape
        labels: List[int] = [0] * len(crops)
        scores: List[float] = [0.0] * len(crops)
        buckets = batch_buckets(cfg.batch_num)
        for beg in range(0, len(crops), cfg.batch_num):
            chunk = crops[beg : beg + cfg.batch_num]
            t0 = time.perf_counter()
            resized = [cls_resize(c, cfg.image_shape) for c in chunk]
            widths = [r.shape[1] for r in resized]
            n = pick_bucket(buckets, len(chunk))
            batch = np.zeros((n, img_h, img_w, 3), np.uint8)
            for i, r in enumerate(resized):
                batch[i, :, : r.shape[1]] = r
            w_arr = np.zeros((n,), np.int32)
            w_arr[: len(widths)] = widths
            t1 = time.perf_counter()
            lab, sc = jax.device_get(
                self._cls_step(self.cls_params, batch, w_arr)
            )  # single fetch for both outputs — tunnel roundtrips are ~30 ms
            t2 = time.perf_counter()
            for i in range(len(chunk)):
                labels[beg + i] = int(lab[i])
                scores[beg + i] = float(sc[i])
            times.preprocess_ms += (t1 - t0) * 1e3
            times.inference_ms += (t2 - t1) * 1e3
        return labels, scores, times

    def recognize(
        self, crops: Sequence[np.ndarray]
    ) -> Tuple[List[str], List[float], StageTimes]:
        """Batched CTC recognition (CRNNRecognizer::Run, ocr_rec.cpp:24-135):
        aspect-sorted micro-batches, width-bucketed static shapes, greedy
        decode with the reference's keep/NaN rules. Crops that decode to
        nothing keep text "" / score 0 (the reference leaves the slot
        untouched on NaN)."""
        times = StageTimes()
        cfg = self.config.rec
        n_img = len(crops)
        texts = [""] * n_img
        confs = [0.0] * n_img
        ratios = [c.shape[1] / c.shape[0] for c in crops]
        indices = np.argsort(ratios, kind="stable")
        bbuckets = batch_buckets(cfg.batch_num)

        for beg in range(0, n_img, cfg.batch_num):
            idx = indices[beg : beg + cfg.batch_num]
            t0 = time.perf_counter()
            max_ratio = max([cfg.img_w / cfg.img_h] + [ratios[i] for i in idx])
            needed_w = int(cfg.img_h * max_ratio)
            width = pick_bucket(cfg.width_buckets, needed_w)
            resized = [
                crnn_resize(crops[i], width / cfg.img_h, (3, cfg.img_h, width))
                for i in idx
            ]
            nb = pick_bucket(bbuckets, len(idx))
            batch = pack_batch(resized, width)
            if nb > len(idx):
                batch = np.concatenate(
                    [batch, np.zeros((nb - len(idx),) + batch.shape[1:], np.uint8)]
                )
            t1 = time.perf_counter()
            outs = jax.device_get(
                self._rec_step(self.rec_params, batch)
            )  # single fetch for all outputs
            t2 = time.perf_counter()
            if cfg.decode == "beam":
                from ..ops.ctc import ctc_beam_search

                kept, conf = ctc_beam_search(
                    outs[0][: len(idx)],
                    outs[1][: len(idx)],
                    outs[2][: len(idx)],
                    beam_size=cfg.beam_size,
                )
            else:
                kept, conf = ctc_greedy_collapse(
                    outs[0][: len(idx)], outs[1][: len(idx)]
                )
            for j, i in enumerate(idx):
                if np.isnan(conf[j]):
                    continue  # reference skips NaN results (ocr_rec.cpp:123)
                texts[i] = "".join(self.charset[k] for k in kept[j])
                confs[i] = float(conf[j])
            t3 = time.perf_counter()
            times.preprocess_ms += (t1 - t0) * 1e3
            times.inference_ms += (t2 - t1) * 1e3
            times.postprocess_ms += (t3 - t2) * 1e3
        return texts, confs, times

    # -- fused single-dispatch path ------------------------------------------

    def fused_ocr(self):
        """Lazy engine-owned FusedOCR (single-dispatch det→rec pipeline,
        pipeline.fused) so every worker shares one compiled variant set."""
        if not hasattr(self, "_fused_ocr"):
            from .fused import FusedOCR

            self._fused_ocr = FusedOCR(
                self, max_boxes=self.config.fused_max_boxes
            )
        return self._fused_ocr

    def cross_chip_ocr(self):
        """Lazy engine-owned CrossChipFusedOCR: det/geometry on device 0,
        rec on device 1 (SURVEY §2.4 pipeline-parallel row, servable via
        PipelineConfig.cross_chip / ocr-service --cross-chip)."""
        if not hasattr(self, "_cross_chip_ocr"):
            from ..parallel.pipeline_stage import CrossChipFusedOCR

            devs = (
                list(self.mesh.devices.flat)
                if self.mesh is not None
                else jax.devices()
            )
            if len(devs) < 2:
                raise RuntimeError(
                    "cross_chip staging needs >= 2 visible devices"
                )
            self._cross_chip_ocr = CrossChipFusedOCR(self, devs[0], devs[1])
        return self._cross_chip_ocr

    # -- recovery ----------------------------------------------------------

    def reload(self, warmup: bool = False) -> None:
        """Rebuild device state after a (transient) device failure: re-place
        params with fresh transfers, rebuild the jitted steps, drop the
        fused wrapper and the compiled-shape ledger (SURVEY.md §5: the
        reference has no worker recovery at all — a dead predictor stays
        dead until process restart).

        MUST be called from the main thread when ``warmup`` is true or any
        later compile may result: the TPU tunnel deadlocks on non-main-
        thread compiles. The serving dispatchers call this on the asyncio
        event loop (= main thread) with ``warmup=True`` so worker threads
        only ever execute cached shapes afterwards.
        """
        self._load_params()
        self._build_steps()
        for cached in ("_fused_ocr", "_cross_chip_ocr"):
            if hasattr(self, cached):
                delattr(self, cached)
        self._compiled_det_shapes = set()
        if warmup:
            self.warmup()

    # -- tracing -----------------------------------------------------------

    def profile_trace(self, logdir: str):
        """jax.profiler trace context (SURVEY.md §5: the reference only
        wall-clocks stages; this captures full device timelines viewable in
        TensorBoard/Perfetto)::

            with engine.profile_trace("/tmp/ocr-trace"):
                worker.process(image, 1)
        """
        return jax.profiler.trace(logdir)

    # -- warmup ------------------------------------------------------------

    def warmup(self, det_shapes: Sequence[Tuple[int, int]] = ()) -> float:
        """Pre-compile every bucketed step variant (the reference's analog
        is TensorRT shape-cache files, ocr_det.cpp:58-62). Returns seconds.

        MUST run on the main thread before any worker thread touches the
        engine: the TPU plugin deadlocks on compilation from non-main
        threads, so serving relies on every shape in the closed bucket sets
        being compiled here (executing cached shapes from threads is fine).
        """
        t0 = time.time()
        if not det_shapes:
            if self.config.det.pad_to_buckets:
                det_shapes = [
                    (h, w)
                    for h in self.config.det.shape_buckets
                    for w in self.config.det.shape_buckets
                ]
            else:
                det_shapes = [(192, 384)]
        if self.config.fast_path:
            if getattr(self.config, "cross_chip", False):
                self.cross_chip_ocr().warmup()
            else:
                self.fused_ocr().warmup()
        for h, w in det_shapes:
            np.asarray(self._det_step(self.det_params, np.zeros((1, h, w, 3), np.uint8)))
            self._compiled_det_shapes.add((h, w))
        bb = batch_buckets(self.config.rec.batch_num)
        for n in bb:
            for w in self.config.rec.width_buckets:
                np.asarray(
                    self._rec_step(
                        self.rec_params,
                        np.zeros((n, self.config.rec.img_h, w, 3), np.uint8),
                    )[0]
                )
        if self.cls_params is not None:
            _, h, w = self.config.cls.image_shape
            for n in batch_buckets(self.config.cls.batch_num):
                np.asarray(
                    self._cls_step(
                        self.cls_params,
                        np.zeros((n, h, w, 3), np.uint8),
                        np.zeros((n,), np.int32),
                    )[0]
                )
        return time.time() - t0
