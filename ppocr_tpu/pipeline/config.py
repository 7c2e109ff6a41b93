"""Typed pipeline configuration with the reference's two profiles.

The reference hard-codes hyperparameters in two places: the stage-class
header defaults (ocr_det.h:108-123 etc.) and the serving profile the worker
ctor passes (ocr_worker.cpp:14-63, tuned for "WeChat mini-program
screenshots"). Both are reproduced here as named constructors.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Tuple


@dataclass
class DetConfig:
    limit_type: str = "max"
    limit_side_len: int = 960
    thresh: float = 0.3
    box_thresh: float = 0.5
    unclip_ratio: float = 2.0
    score_mode: str = "slow"
    use_dilation: bool = False
    # Closed compilation-shape set: the resized /32 image is zero-padded up
    # to the next (H, W) bucket pair and the prob map cropped back. Keeps
    # the det jit variant set finite so every shape can be pre-compiled on
    # the main thread (the TPU plugin only compiles there) — the serving
    # analog of the reference's TensorRT dynamic-shape cache.
    pad_to_buckets: bool = True
    shape_buckets: Tuple[int, ...] = (192, 384, 512, 672, 960)


@dataclass
class ClsConfig:
    thresh: float = 0.98
    batch_num: int = 8
    image_shape: Tuple[int, int, int] = (3, 48, 192)  # C, H, W


@dataclass
class RecConfig:
    batch_num: int = 6
    img_h: int = 48
    img_w: int = 320
    # padded-width compilation buckets (multiples of 8 → integer timesteps);
    # a batch uses the smallest bucket ≥ int(img_h · max_wh_ratio)
    width_buckets: Tuple[int, ...] = (320, 448, 640, 896, 1280, 1792)
    # CTC decode: "greedy" (reference parity, ocr_rec.cpp:97-128) or "beam"
    # (prefix beam search — a capability the reference lacks; staged path)
    decode: str = "greedy"
    beam_size: int = 10
    # per-timestep candidate symbols the device prunes the lattice to
    beam_candidates: int = 5


@dataclass
class PipelineConfig:
    det: DetConfig = field(default_factory=DetConfig)
    cls: ClsConfig = field(default_factory=ClsConfig)
    rec: RecConfig = field(default_factory=RecConfig)
    # the reference worker defaults to no orientation classification
    # (ocr_worker.h:57: enable_cls = false)
    enable_cls: bool = False
    # single-dispatch fused det→(cls)→rec pipeline (pipeline.fused): the
    # whole request runs in ONE device call — fastest serving mode for
    # upright text; axis-aligned boxes only. Default for the serving()
    # profile; the defaults() parity profile keeps the staged pipeline.
    fast_path: bool = False
    # cross-request batch-size buckets for the fused path; (1,) disables
    # request batching. Each extra bucket multiplies warmup compiles.
    request_batch_buckets: Tuple[int, ...] = (1,)
    # fused path: top-K blob candidates per image (rec runs B·K crops)
    fused_max_boxes: int = 32
    # fused path: crop-canvas width cap = this × rec.img_w (power of two).
    # The recognizer runs on the narrowest power-of-two slice that fits the
    # batch's widest valid crop (width tiers), so raising the cap adds
    # wide-line capacity (e.g. 4 → ~27:1 aspect in the serving profile)
    # at +1 rec compile per fused variant; lines wider than the cap are
    # horizontally squashed (docs/PARITY.md). Staged-path cap for
    # comparison: width_buckets[-1]/img_h ≈ 46:1.
    fused_width_mult: int = 2
    # fused path: batch-count tiers. The rec forward scales ~linearly in
    # batch above ~4 crops (scripts/profile_rec_scaling.py: b=32 0.85 ms
    # vs b=8 0.27 ms at w=192), but a card image occupies only ~5-10 of
    # the fused_max_boxes=32 crop slots. With n tiers the valid crops are
    # compacted to the front of each image's K slots in-graph and the
    # recognizer runs on the narrowest power-of-two slice (K, K/2, ...,
    # K/2^(n-1)) that holds them — lax.switch executes only the taken
    # branch. 1 disables (rec always runs all K slots). Each extra tier
    # multiplies the rec branches per fused variant (compile time), not
    # the dispatch count. Output parity: word emission order is
    # root-sorted host-side, so slot compaction is invisible.
    fused_batch_tiers: int = 3
    # fused path: crop-source resolution multiplier. 1 (default) samples
    # rec/cls crops from the det-scale canvas — zero extra upload, exact
    # for images the det resize didn't shrink (the serving det512 card
    # workload). m > 1 ships an m×-resolution resize of the SOURCE image
    # alongside the det canvas and samples crops from it, recovering the
    # staged path's crop sharpness where det downscales (wide scenes,
    # det_fit_cap hits) at m²× the image upload bytes + one extra set of
    # compiled variants (docs/PARITY.md "fused crop resolution").
    fused_crop_src_mult: int = 1
    # fused path, experimental: route per-blob bbox/score through the
    # single-pass Pallas VMEM accumulator (ops.pallas_kernels.
    # blob_stats_pallas) instead of the [K,H,W] masked reductions —
    # enable after profiling with scripts/profile_fused.py --blob-kernel
    fused_blob_kernel: bool = False
    # fused path: emit min-area rotated rect quads (device rotating
    # calipers — near-exact cv2.minAreaRect equivalent, docs/PARITY.md)
    # instead of axis-aligned boxes; crops stay the quad's boundingRect —
    # the reference's own crop rule (ocr_worker.cpp:245-259)
    fused_rotated_boxes: bool = False
    # fast-path cross-chip pipeline staging: det/geometry on device 0, rec
    # on device 1 with a d2d crops handoff (parallel.CrossChipFusedOCR);
    # needs >= 2 visible devices
    cross_chip: bool = False
    # crop mode: "bounding" = axis-aligned cv::boundingRect (the worker's
    # actual behavior, ocr_worker.cpp:245-259); "perspective" = the unused
    # GetRotateCropImage path kept as an option (utility.cpp:137-190)
    crop_mode: str = "bounding"
    # compute dtype for the jitted model steps: "bfloat16" | "float32"
    dtype: str = "bfloat16"

    @classmethod
    def defaults(cls) -> "PipelineConfig":
        """Stage-header defaults (det 960/0.3/0.5/2.0/slow, rec 48×320×6)."""
        return cls()

    @classmethod
    def serving(cls) -> "PipelineConfig":
        """The worker's serving profile (ocr_worker.cpp:28-62): det
        512/0.2/0.4/1.8/fast, cls 0.98×8, rec 16×28×192.

        Serves the FUSED single-dispatch path by default — the reference
        also ships its fastest hard-coded profile as the default
        (ocr_worker.cpp:14-63); the staged exact-parity pipeline stays one
        flag away (``fast_path=False`` / ``ocr-service --staged``)."""
        return cls(
            fast_path=True,
            det=DetConfig(
                limit_type="max",
                limit_side_len=512,
                thresh=0.2,
                box_thresh=0.4,
                unclip_ratio=1.8,
                score_mode="fast",
                use_dilation=False,
                shape_buckets=(128, 192, 256, 384, 512),
            ),
            cls=ClsConfig(thresh=0.98, batch_num=8),
            rec=RecConfig(
                batch_num=16,
                img_h=28,
                img_w=192,
                width_buckets=(192, 256, 320, 448, 640, 896, 1280),
            ),
        )


def batch_buckets(max_batch: int) -> List[int]:
    """Power-of-two batch-size buckets up to the configured batch num."""
    out, b = [], 1
    while b < max_batch:
        out.append(b)
        b *= 2
    out.append(max_batch)
    return sorted(set(out))


def pick_bucket(buckets, value: int) -> int:
    """Smallest bucket ≥ value, else the largest bucket."""
    for b in buckets:
        if value <= b:
            return b
    return buckets[-1]
