"""Single-dispatch fused OCR: det → boxes → crops → rec in ONE jit call.

The staged pipeline pays one device dispatch per stage; through a remote
TPU link each dispatch has a fixed RTT (~33 ms on the dev tunnel), so the
det→rec request floor is 2 RTTs regardless of compute. This module moves
the *entire* per-request pipeline on-device:

    uint8 image ─▶ DBNet ─▶ binarize ─▶ connected components (min-label
    propagation) ─▶ per-blob bbox/score via scatters ─▶ top-K blobs ─▶
    unclip-expand ─▶ bilinear crop+resize to rec shape ─▶ SVTR-CTC ─▶
    per-timestep argmax/max ─▶ ONE fetch

Host work shrinks to CTC collapse + JSON assembly (<0.5 ms).

This is the TPU-first redesign of SURVEY.md §7's "hard part": instead of
porting findContours/minAreaRect/Clipper to a kernel, the fast path uses
blob geometry computed on device — axis-aligned boxes by default (exactly
right for the reference's declared workload: upright UI/card text; its own
worker already crops axis-aligned bounding rects, ocr_worker.cpp:245-259),
or min-area rotated quads with ``fused_rotated_boxes`` (device rotating
calipers — a two-stage angle sweep over per-row hull extremes, near-exact
vs cv2.minAreaRect). Known deviations from the parity pipeline, by
design (docs/PARITY.md):

  * score is the blob mean of the probability map (≈ "slow" mode);
  * unclip expands the blob rect by area·ratio/perimeter;
  * rec crops resample the det-scale image by default (no second
    upload); ``fused_crop_src_mult=m`` ships an m×-resolution crop
    source alongside the det canvas, recovering the staged path's crop
    sharpness where det downscales (at m² the image upload bytes);
  * rotated mode: rotating calipers by two-stage angle sweep (0.117°
    resolution), vs cv2.minAreaRect's exact hull-edge enumeration.

CTC decode is greedy or prefix-beam (``rec.decode``); exact cv2-contour
semantics remain available via the staged parity pipeline
(PipelineConfig(fast_path=False), the default).
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..models.det_db import det_forward
from ..models.rec_svtr import rec_forward
from ..ops.ctc import ctc_topk_device
from ..ops.normalize import (
    HALF_MEAN,
    HALF_SCALE,
    IMAGENET_MEAN,
    IMAGENET_SCALE,
)


class FusedOutputs(NamedTuple):
    # every field carries a leading batch axis B (build_fused_step returns
    # the whole request batch); index as field[b, i] for image b, slot i
    boxes: jnp.ndarray  # [B, K, 4] int32 (x0, y0, x1, y1) det-image coords
    valid: jnp.ndarray  # [B, K] bool
    scores: jnp.ndarray  # [B, K] f32 blob-mean det score
    ctc_idx: jnp.ndarray  # [B, K, T] int32 (greedy) | [B, K, T, C] (beam)
    ctc_prob: jnp.ndarray  # [B, K, T] f32 | [B, K, T, C]
    roots: jnp.ndarray  # [B, K] int32 blob root = flat index of the blob's
    # raster-first pixel; descending root order == cv2.findContours
    # emission order (reverse raster), the staged/reference word order
    ctc_blank: jnp.ndarray = None  # [B, K, T] f32 blank prob (beam only)
    quads: jnp.ndarray = None  # [B, K, 4, 2] int32 corner quads (TL,TR,BR,
    # BL before host reordering) — rotated rects in rotated-box mode, the
    # axis box corners otherwise


def _dilate2x2(fg: jnp.ndarray) -> jnp.ndarray:
    """cv2.dilate with a 2×2 MORPH_RECT kernel: the even kernel anchors so
    dst(y,x) = max src[y-1..y, x-1..x] — ink spreads DOWN-RIGHT (verified
    against cv2; binarize_device/binarize_np implement the same window).
    Getting the direction wrong is a silent 1 px box shift."""
    fgp = jnp.pad(fg, ((1, 0), (1, 0)))
    return fgp[1:, 1:] | fgp[1:, :-1] | fgp[:-1, 1:] | fgp[:-1, :-1]


def _connected_components(fg: jnp.ndarray, max_iters: int | None = None) -> jnp.ndarray:
    """8-connected min-label propagation. fg: [H, W] bool → [H, W] int32
    labels (= min flat index of the blob; background = H*W).

    Scan-based: each iteration does a 3×3 neighborhood min (the 8-connected
    hop) followed by *segmented min scans* along rows and columns, which
    resolve entire horizontal/vertical runs at once. A pixel-hop loop needs
    ~blob-diameter iterations (a 300 px text line = 300 passes); run
    propagation converges in the number of geometric "bends" of the most
    serpentine blob — a handful for text. The while_loop exits at
    convergence; the h+w+8 cap bounds compile-time trip count for every
    realistic det map (bends ≪ h+w). The true worst case is O(h·w) bends
    (an adversarial 1-px zigzag snake), which would exit unconverged and
    fragment that blob into several boxes — harmless for OCR (extra
    low-score candidates), so the cap deliberately trades that corner for
    a 100× smaller bound on chip time.
    """
    h, w = fg.shape
    if h * w >= (1 << 30):
        # labels pack a barrier flag into bit 30 (FLAG/VMASK below); a
        # det canvas with h·w ≥ 2^30 would silently corrupt labels
        raise ValueError(
            f"det canvas {h}x{w} has h*w >= 2^30; the packed segmented "
            "scan cannot label it"
        )
    if max_iters is None:
        max_iters = h + w + 8
    big = jnp.int32(h * w)
    init = jnp.where(
        fg,
        (jnp.arange(h * w, dtype=jnp.int32)).reshape(h, w),
        big,
    )
    bg = ~fg

    # Segmented min scan with the barrier flag PACKED into bit 30 of the
    # label lane (labels ≤ h·w, guarded < 2^30 below — every current det
    # bucket is ≤ 960² ≈ 2^20): one int32 array through the scan instead
    # of a (value, flag) pair — halves the scan's memory traffic. The
    # scan itself is HILLIS-STEELE DOUBLING over
    # contiguous pad-shifts rather than lax.associative_scan: the latter's
    # work-efficient odd/even passes are STRIDED slices on the 128-lane
    # minor dim, which the TPU pays dearly for — doubling does log2(n)
    # full-width contiguous ops. Measured on chip at the 192×384 det
    # canvas: CC marginal 0.067 → 0.028 ms, ~2.4× (scripts/profile_cc.py;
    # labels bit-identical).
    FLAG = jnp.int32(1 << 30)
    VMASK = jnp.int32((1 << 30) - 1)
    IDENT = VMASK  # combine identity: value ≥ any label, no barrier
    flag_in = jnp.where(bg, FLAG, 0)

    def seg_comb(a, b):
        # b's span contains a barrier → a cannot reach past it; the
        # combined span's flag is the OR (sticky)
        bv = b & VMASK
        v = jnp.where((b & FLAG) != 0, bv, jnp.minimum(a & VMASK, bv))
        return v | ((a | b) & FLAG)

    def scan_axis(p, axis, reverse):
        n_ax = p.shape[axis]
        d = 1
        while d < n_ax:
            pad = jnp.full(
                (h, d) if axis == 1 else (d, w), IDENT, jnp.int32
            )
            if axis == 1:
                sh = (
                    jnp.concatenate([pad, p[:, : n_ax - d]], axis=1)
                    if not reverse
                    else jnp.concatenate([p[:, d:], pad], axis=1)
                )
            else:
                sh = (
                    jnp.concatenate([pad, p[: n_ax - d, :]], axis=0)
                    if not reverse
                    else jnp.concatenate([p[d:, :], pad], axis=0)
                )
            p = seg_comb(sh, p)
            d *= 2
        return p

    def run_min(labels, axis):
        # invariant: labels == big at background pixels (init and every
        # propagate step re-assert it), so packing is a plain OR
        p = labels | flag_in
        fwd = scan_axis(p, axis, False) & VMASK
        bwd = scan_axis(p, axis, True) & VMASK
        return jnp.where(fg, jnp.minimum(fwd, bwd), big)

    def propagate(labels):
        # min over the 3×3 neighborhood (reduce_window pads with `big`)
        neigh = lax.reduce_window(
            labels,
            big,
            lax.min,
            window_dimensions=(3, 3),
            window_strides=(1, 1),
            padding=[(1, 1), (1, 1)],
        )
        labels = jnp.where(fg, jnp.minimum(labels, neigh), big)
        return run_min(run_min(labels, 1), 0)

    def cond(state):
        labels, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    def body(state):
        labels, _, it = state
        new = propagate(labels)
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = lax.while_loop(
        cond, body, (run_min(run_min(init, 1), 0), jnp.bool_(True), 0)
    )
    return labels


def _blob_stats(
    labels: jnp.ndarray,
    prob: jnp.ndarray,
    max_boxes: int,
    rotated: bool = False,
    use_pallas: bool = False,
):
    """Per-blob area/bbox/score, scatter-free.

    A blob's label is the flat index of its raster-first pixel, so roots are
    self-identifying (labels[p] == p). Selection is two cheap top_k passes:
    (1) the first ``8·max_boxes`` roots in raster order (one top_k over a
    rootness score — no area histogram; the TPU scatter-add histogram this
    replaces cost 0.64 ms, ~80 % of this function, see
    scripts/profile_blob_stats.py), (2) exact per-candidate areas via a
    masked reduction XLA fuses into the comparison (measured ~free), then
    top-``max_boxes`` by area among the candidates. Equal to the old global
    area top-K whenever the map has ≤ 8·max_boxes blobs (every golden/test
    scene); beyond that the candidate set is raster-first — CLOSER to the
    reference, which keeps contours in emission order up to 1000 with no
    area ranking (postprocess_op.cpp:173-184), than a global area sort.
    The 8·max_boxes (=256 at the serving K=32) candidate ceiling is a
    documented deviation from the reference's 1000-contour cap
    (docs/PARITY.md); raise ``fused_max_boxes`` for speckle-dense
    workloads.
    Tie-break matches the old formulation (equal areas → raster-earlier
    root) because candidates are raster-ordered.

    ``use_pallas`` routes the bbox/score pass through the single-VMEM-pass
    accumulator kernel (ops.pallas_kernels.blob_stats_pallas): one sweep
    over (labels, prob) row tiles instead of materializing the [K, H, W]
    membership mask (axis-aligned mode only; TPU single-device paths).

    With ``rotated=True`` also computes each blob's min-area oriented rect
    by DEVICE ROTATING CALIPERS — a two-stage angle sweep over the blob's
    per-row extreme points (see the inline comment; near-exact equivalent
    of cv2.minAreaRect, angle resolution 0.117°, same pixel-center extent
    convention) — as (theta, u0, u1, v0, v1) where (u, v) are coordinates
    in the rotated frame: u = x·cosθ + y·sinθ, v = −x·sinθ + y·cosθ.
    """
    h, w = labels.shape
    n = h * w
    flat = labels.reshape(-1)

    n_cand = min(8 * max_boxes, n)
    iota = jnp.arange(n, dtype=jnp.int32)
    rootness = jnp.where(flat == iota, n - iota, 0)  # >0 iff p is a root
    root_val, root_pos = lax.top_k(rootness, n_cand)  # raster-ascending roots
    root_cand = jnp.where(root_val > 0, root_pos, -1)  # -1 never matches a label
    # exact areas of the candidates: XLA fuses the [R, n] comparison into
    # the reduction (no materialized mask)
    area_cand = jnp.sum(
        (flat[None, :] == root_cand[:, None]).astype(jnp.float32), axis=1
    )
    top_area, sel = lax.top_k(area_cand, max_boxes)
    top_idx = root_cand[sel]

    if use_pallas and not rotated:
        from ..ops.pallas_kernels import blob_stats_pallas

        _karea, psum, x0, x1, y0, y1 = blob_stats_pallas(
            labels, prob, top_idx
        )
        return {
            "area": top_area,
            "score": psum / jnp.maximum(top_area, 1.0),
            "x0": x0,
            "x1": x1,
            "y0": y0,
            "y1": y1,
            "root": top_idx.astype(jnp.int32),
        }

    # [K, H, W] membership masks for the selected roots only
    member = labels[None] == top_idx[:, None, None].astype(jnp.int32)
    big = jnp.float32(1e9)
    # bbox via row/col presence: two [K,H,W]→[K,·] boolean reductions plus
    # O(K·(H+W)) index math — 2 full passes over the mask instead of 4
    mf = member.astype(jnp.float32)
    rowp = jnp.any(member, axis=2)  # [K, H]
    colp = jnp.any(member, axis=1)  # [K, W]
    iy = jnp.arange(h, dtype=jnp.float32)[None, :]
    ix = jnp.arange(w, dtype=jnp.float32)[None, :]
    y0 = jnp.min(jnp.where(rowp, iy, big), axis=1)
    y1 = jnp.max(jnp.where(rowp, iy, -big), axis=1)
    x0 = jnp.min(jnp.where(colp, ix, big), axis=1)
    x1 = jnp.max(jnp.where(colp, ix, -big), axis=1)
    # prob mass as a [K, H·W]×[H·W] matvec — rides the MXU
    psum = jnp.einsum(
        "kp,p->k",
        mf.reshape(max_boxes, -1),
        prob.reshape(-1),
        precision=lax.Precision.HIGHEST,
    )

    stats = {
        "area": top_area,
        "score": psum / jnp.maximum(top_area, 1.0),
        "x0": x0,
        "x1": x1,
        "y0": y0,
        "y1": y1,
        "root": top_idx.astype(jnp.int32),
    }
    if not rotated:
        return stats

    # Rotating calipers as a TWO-STAGE ANGLE SWEEP over each blob's
    # per-row extreme points. hull(blob) == hull({(rowmin_x, y),
    # (rowmax_x, y)}) — every blob pixel is a convex combination of its
    # row's extremes — so min/max projections over these ≤2H points equal
    # the blob's for EVERY angle. Coarse sweep: 48 angles over [0°, 90°);
    # fine sweep: 33 angles over ±1 coarse step around each blob's best
    # (resolution 0.117°). Convention matches cv2.minAreaRect exactly:
    # the rect spans pixel-CENTER extents of the blob's points, no
    # half-pixel support (the staged path wraps cv2.minAreaRect,
    # postprocess_op.cpp:134-168; GetMiniBoxes consumes its sizes as-is).
    # Replaces the round-3/4 PCA second-moment approximation (word-blob
    # IoU p10 0.868 → see docs/PARITY.md table) with near-exact calipers;
    # also CHEAPER: the sweep runs on [K, 2H] points, not [K, H, W] maps.
    ix_row = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    rminx = jnp.min(jnp.where(member, ix_row, big), axis=2)  # [K, H]
    rmaxx = jnp.max(jnp.where(member, ix_row, -big), axis=2)
    ypts = jnp.tile(
        jnp.arange(h, dtype=jnp.float32)[None, :], (max_boxes, 1)
    )
    px = jnp.concatenate([rminx, rmaxx], axis=1)  # [K, 2H]
    py = jnp.concatenate([ypts, ypts], axis=1)
    pv = jnp.concatenate([rowp, rowp], axis=1)  # [K, 2H] point validity

    def sweep(angles):
        """angles [A] (shared) or [A, K] (per-blob) → per-blob best
        (theta, u0, u1, v0, v1) by bounding-rect area."""
        c = jnp.cos(angles)
        s = jnp.sin(angles)
        if angles.ndim == 1:
            c, s = c[:, None], s[:, None]
            ang = jnp.broadcast_to(angles[:, None], (angles.shape[0], max_boxes))
        else:
            ang = angles
        u = px[None] * c[..., None] + py[None] * s[..., None]  # [A, K, 2H]
        v = -px[None] * s[..., None] + py[None] * c[..., None]
        mask = pv[None]
        u0 = jnp.min(jnp.where(mask, u, big), axis=2)  # [A, K]
        u1 = jnp.max(jnp.where(mask, u, -big), axis=2)
        v0 = jnp.min(jnp.where(mask, v, big), axis=2)
        v1 = jnp.max(jnp.where(mask, v, -big), axis=2)
        area = (u1 - u0) * (v1 - v0)
        best = jnp.argmin(area, axis=0)[None]  # [1, K]

        def take(t):
            return jnp.take_along_axis(t, best, axis=0)[0]

        return take(ang), take(u0), take(u1), take(v0), take(v1)

    n_coarse = 48
    coarse_step = jnp.float32(np.pi / 2 / n_coarse)
    coarse = jnp.arange(n_coarse, dtype=jnp.float32) * coarse_step
    theta, *_ = sweep(coarse)
    n_fine = 33
    offs = (
        jnp.arange(n_fine, dtype=jnp.float32) / (n_fine - 1) * 2.0 - 1.0
    ) * coarse_step
    theta, u0, u1, v0, v1 = sweep(theta[None, :] + offs[:, None])
    stats.update({"theta": theta, "u0": u0, "u1": u1, "v0": v0, "v1": v1})
    return stats


def _crop_resize_bilinear(
    img_f32, x0, y0, x1, y1, content_w, out_h, out_w, rot180=None, scale=1.0
):
    """Sample the box region to [out_h, out_w, 3]; columns ≥ content_w are
    black (matching rec's pad-before-normalize). ``rot180`` (scalar bool)
    mirrors the sampling grid — exactly equivalent to cv2.rotate(crop, 180)
    before resizing (the cls label==1 action, ocr_worker.cpp:277-281).

    ``scale`` (static float ≥ 1) reads the pixels from an ``img_f32`` that
    is a *scale×* higher-resolution rendering of the det canvas: the grid
    is computed in det-map coords (where x0..y1 live) and then mapped with
    pixel-center alignment ``p_src = (p_det + 0.5)·scale − 0.5`` — the
    fused-path fix for the det-downscale resolution loss vs the staged
    path's full-resolution host crops (ops.resize.crnn_resize over the
    source image, preprocess_op.cpp:95-118).

    TPU-first formulation: bilinear resampling as TWO interpolation-matrix
    matmuls (rows then columns) instead of 4-tap gathers. The weight matrix
    Ry[o, j] = clamp(1 − |ry[o] − j|, 0, 1) has exactly the two bilinear
    taps per output row (and a single 1 at clamped edges), so the result is
    identical to the gather form — but runs on the MXU. Measured 9.1 ms →
    ~0.2 ms for K=32 crops of 28×384 at det bucket 192×384 (the fused
    step's former hot spot)."""
    bh = y1 - y0 + 1.0
    bw = x1 - x0 + 1.0
    rows = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * bh / out_h - 0.5 + y0
    cols = (
        jnp.arange(out_w, dtype=jnp.float32) + 0.5
    ) * bw / jnp.maximum(content_w, 1.0) - 0.5 + x0
    if rot180 is not None:
        rows = jnp.where(rot180, (y0 + y1) - rows, rows)
        cols = jnp.where(rot180, (x0 + x1) - cols, cols)
    if scale != 1.0:
        rows = (rows + 0.5) * scale - 0.5
        cols = (cols + 0.5) * scale - 0.5

    h, w, _ = img_f32.shape
    ry = jnp.clip(rows, 0.0, h - 1.0)  # [out_h]
    rx = jnp.clip(cols, 0.0, w - 1.0)  # [out_w]
    iy = jnp.arange(h, dtype=jnp.float32)
    ix = jnp.arange(w, dtype=jnp.float32)
    row_w = jnp.clip(1.0 - jnp.abs(ry[:, None] - iy[None, :]), 0.0, 1.0)
    col_w = jnp.clip(1.0 - jnp.abs(ix[:, None] - rx[None, :]), 0.0, 1.0)
    # HIGHEST keeps f32-accurate accumulation on the MXU (weights are
    # two-tap partitions of unity; bf16 single-pass would visibly round
    # 0..255 pixel values)
    tmp = jnp.einsum(
        "oh,hwc->owc", row_w, img_f32, precision=lax.Precision.HIGHEST
    )
    out = jnp.einsum(
        "owc,wx->oxc", tmp, col_w, precision=lax.Precision.HIGHEST
    )
    col_mask = (jnp.arange(out_w) < content_w)[None, :, None]
    return out * col_mask


def build_fused_parts(
    det_thresh: float,
    box_thresh: float,
    unclip_ratio: float,
    rec_img_h: int,
    rec_img_w: int,
    max_boxes: int,
    dtype=jnp.bfloat16,
    cls_shape=None,
    decode: str = "greedy",
    beam_candidates: int = 5,
    rotated: bool = False,
    use_pallas: bool = False,
    n_width_tiers: int = 2,
    blob_kernel: bool = False,
    use_dilation: bool = False,
    crop_src_mult: int = 1,
    n_batch_tiers: int = 1,
):
    """The fused pipeline split at its natural cross-chip boundary:

    ``prep(det_params, cls_params, img_u8, content_hw)`` — det forward,
    blob geometry, (optional in-graph cls) and rec-input crop sampling;
    returns (crops_n [B·K, h, w, 3] normalized, boxes, valid, score,
    roots). With ``crop_src_mult=m > 1``, ``prep`` takes a sixth operand
    ``src_u8 [B, m·H, m·W, 3]`` — the source image resized to m× the det
    content extent — and samples the rec/cls crops from IT instead of the
    det canvas, recovering the resolution the det downscale threw away
    (the staged path crops the full-resolution source,
    preprocess_op.cpp:95-118; docs/PARITY.md "fused crop resolution").

    ``rec(rec_params, crops_n, tier)`` — recognizer forward + CTC top-k.
    ``tier`` is a single int32 encoding BOTH the width tier and (with
    ``n_batch_tiers > 1``) the batch-count tier:
    ``tier = width_tier * n_batch_tiers + batch_tier``. Batch tiers
    compact each image's valid crops to the front of its K slots
    in-graph (stable valid-first argsort of the box coordinates BEFORE
    sampling, so the crop gather itself is free) and run the recognizer
    on the narrowest K/2^b slice that holds every valid crop — the rec
    forward is ~linear in batch above ~4 crops
    (scripts/profile_rec_scaling.py), and a card occupies ~5-10 of the
    32 slots. Word emission order is unaffected: the host sorts by blob
    root (``FusedOCR._words_from_outputs``), not slot index.

    ``build_fused_step`` jits their composition (single-dispatch serving);
    ``parallel.pipeline_stage`` jits each half separately so det/geometry
    runs on one chip and rec on another with a device-to-device crops
    handoff (SURVEY §2.4 pipeline-parallel row).
    """
    if n_batch_tiers < 1 or (max_boxes >> (n_batch_tiers - 1)) < 1:
        raise ValueError(
            f"n_batch_tiers={n_batch_tiers} needs 1 <= n and "
            f"max_boxes >> (n-1) >= 1 (max_boxes={max_boxes})"
        )

    def geometry(prob, content_hw):
        """Per-image: prob map → top-K blob boxes + validity (all [K]).

        ``content_hw`` = (rh, rw), the actual resized extent inside the
        bucket-padded canvas; activations past the image edge are masked out
        before blob extraction (the staged path crops prob[:rh,:rw] —
        engine.detect), so zero-padding cannot spawn phantom blobs."""
        h, w = prob.shape
        rh = content_hw[0].astype(jnp.int32)
        rw = content_hw[1].astype(jnp.int32)
        # uint8 threshold == binarize_device/binarize_np (db_postprocess)
        fg = (prob * 255.0).astype(jnp.uint8) > jnp.uint8(int(det_thresh * 255))
        in_content = (jnp.arange(h, dtype=jnp.int32)[:, None] < rh) & (
            jnp.arange(w, dtype=jnp.int32)[None, :] < rw
        )
        fg = fg & in_content
        if use_dilation:
            # (binarize_np parity; the staged path dilates the content-
            # cropped bitmap, so re-mask to keep dilation from bleeding
            # past the content edge)
            fg = _dilate2x2(fg) & in_content
        labels = _connected_components(fg)
        stats = _blob_stats(
            labels, prob, max_boxes, rotated=rotated, use_pallas=blob_kernel
        )

        if rotated:
            # min-area oriented rect (device rotating calipers — see
            # _blob_stats) in the (u, v) rotated frame
            bw = stats["u1"] - stats["u0"]
            bh = stats["v1"] - stats["v0"]
        else:
            bw = stats["x1"] - stats["x0"] + 1.0
            bh = stats["y1"] - stats["y0"] + 1.0
        ssid = jnp.maximum(bw, bh)
        # unclip: expand by d = area_box·ratio / perimeter of the box
        d = (bw * bh) * unclip_ratio / jnp.maximum(2.0 * (bw + bh), 1.0)
        ebw, ebh = bw + 2.0 * d, bh + 2.0 * d

        # det-map-coord rules only here (contour area/ssid/unclipped-ssid/
        # score — db_postprocess.boxes_from_bitmap parity); the reference's
        # final ≤4 px side filter is in SOURCE coords after rescale
        # (FilterTagDetRes, postprocess_op.cpp:333-362) and is applied
        # host-side in _words_from_outputs, where the ratio is known
        valid = (
            (stats["area"] > 2)
            & (ssid >= 3)
            & (jnp.maximum(ebw, ebh) >= 5)
            & (stats["score"] >= box_thresh)
        )
        rwf = rw.astype(jnp.float32) - 1.0
        rhf = rh.astype(jnp.float32) - 1.0
        if rotated:
            u0, u1 = stats["u0"] - d, stats["u1"] + d
            v0, v1 = stats["v0"] - d, stats["v1"] + d
            c, s = jnp.cos(stats["theta"]), jnp.sin(stats["theta"])
            # corners (u,v) → image coords, clamped to the content extent
            us = jnp.stack([u0, u1, u1, u0], axis=1)  # [K, 4]
            vs = jnp.stack([v0, v0, v1, v1], axis=1)
            qx = jnp.clip(us * c[:, None] - vs * s[:, None], 0.0, rwf)
            qy = jnp.clip(us * s[:, None] + vs * c[:, None], 0.0, rhf)
            quad = jnp.stack([qx, qy], axis=2)  # [K, 4, 2]
            # crop bounds = axis-aligned bbox of the (clamped) quad — the
            # reference's own crop is cv::boundingRect of the rotated quad
            # (ocr_worker.cpp:245-259)
            cx0, cx1 = jnp.min(qx, axis=1), jnp.max(qx, axis=1)
            cy0, cy1 = jnp.min(qy, axis=1), jnp.max(qy, axis=1)
        else:
            ex0, ex1 = stats["x0"] - d, stats["x1"] + d
            ey0, ey1 = stats["y0"] - d, stats["y1"] + d
            # clamp to the content extent, not the padded canvas (the
            # staged path's postprocess clamps to the prob[:rh,:rw] crop)
            cx0 = jnp.clip(ex0, 0.0, rwf)
            cx1 = jnp.clip(ex1, 0.0, rwf)
            cy0 = jnp.clip(ey0, 0.0, rhf)
            cy1 = jnp.clip(ey1, 0.0, rhf)
            quad = jnp.stack(
                [
                    jnp.stack([cx0, cy0], 1),
                    jnp.stack([cx1, cy0], 1),
                    jnp.stack([cx1, cy1], 1),
                    jnp.stack([cx0, cy1], 1),
                ],
                axis=1,
            )  # [K, 4, 2] — the axis box's corners
        return quad, cx0, cy0, cx1, cy1, valid, stats["score"], stats["root"]

    def sample_crops(img, cx0, cy0, cx1, cy1, content_w, out_h, out_w, rot180):
        return jax.vmap(
            lambda a, b, c, dd, cw, rt: _crop_resize_bilinear(
                img,
                a,
                b,
                c,
                dd,
                cw,
                out_h,
                out_w,
                rot180=rt,
                scale=float(crop_src_mult),
            )
        )(cx0, cy0, cx1, cy1, content_w, rot180)

    def prep(det_params, cls_params, img_u8, content_hw, src_u8=None):
        """img_u8: [B, H, W, 3] — B is a native batch (cross-request
        batching); content_hw: [B, 2] int32 (rh, rw) actual resized extents
        inside the padded canvas. det/cls run as one big batch on the MXU
        while the irregular geometry is vmapped per image. ``src_u8``
        (required iff crop_src_mult > 1): the crop_src_mult×-resolution
        crop source [B, m·H, m·W, 3]."""
        if (src_u8 is None) == (crop_src_mult > 1):
            raise ValueError(
                f"crop_src_mult={crop_src_mult} requires src_u8 "
                f"{'present' if crop_src_mult > 1 else 'absent'}"
            )
        imgs = img_u8.astype(jnp.float32)  # [B, H, W, 3] 0..255
        crop_src = src_u8.astype(jnp.float32) if src_u8 is not None else imgs
        nb = imgs.shape[0]
        x = (imgs / 255.0 - jnp.asarray(IMAGENET_MEAN)) * jnp.asarray(
            IMAGENET_SCALE
        )
        prob = det_forward(det_params, x.astype(dtype)).astype(jnp.float32)

        quads, cx0, cy0, cx1, cy1, valid, score, roots = jax.vmap(geometry)(
            prob, content_hw
        )  # [B, K, 4, 2] + [B, K] stats

        if n_batch_tiers > 1:
            # compact valid crops to the front of each image's K slots
            # (stable, so the area-descending top-K order is preserved
            # among valid slots) — BEFORE sampling, so only the [K]
            # coordinate vectors are gathered, never the crop pixels.
            # Host word order is root-sorted, not slot-ordered, so this
            # is output-invisible (_words_from_outputs).
            perm = jnp.argsort(~valid, axis=1, stable=True)  # [B, K]

            def gather(a):
                idx = perm.reshape(perm.shape + (1,) * (a.ndim - 2))
                return jnp.take_along_axis(a, idx, axis=1)

            quads, cx0, cy0, cx1, cy1, valid, score, roots = (
                gather(a)
                for a in (quads, cx0, cy0, cx1, cy1, valid, score, roots)
            )

        ar = (cx1 - cx0 + 1.0) / jnp.maximum(cy1 - cy0 + 1.0, 1.0)
        content_w = jnp.minimum(jnp.ceil(rec_img_h * ar), float(rec_img_w))

        if cls_shape is not None:
            from ..models.cls_mv3 import cls_forward

            ch, cw_max = cls_shape
            cls_content = jnp.minimum(jnp.ceil(ch * ar), float(cw_max))
            no_rot = jnp.zeros_like(valid)
            cls_crops = jax.vmap(
                lambda im, a, b, c, dd, cw, rt: sample_crops(
                    im, a, b, c, dd, cw, ch, cw_max, rt
                )
            )(crop_src, cx0, cy0, cx1, cy1, cls_content, no_rot)
            cls_n = (
                cls_crops.reshape(nb * max_boxes, ch, cw_max, 3) / 255.0
                - jnp.asarray(HALF_MEAN)
            ) * jnp.asarray(HALF_SCALE)
            # cls pads AFTER normalize with 0 (ocr_cls.cpp:52-56)
            col_ok = (
                jnp.arange(cw_max)[None, None, :, None]
                < cls_content.reshape(-1)[:, None, None, None]
            )
            cls_n = cls_n * col_ok
            cls_probs = cls_forward(cls_params, cls_n.astype(dtype))
            rot180 = (jnp.argmax(cls_probs, axis=-1) == 1).reshape(
                nb, max_boxes
            )
        else:
            rot180 = jnp.zeros((nb, max_boxes), jnp.bool_)

        crops = jax.vmap(
            lambda im, a, b, c, dd, cw, rt: sample_crops(
                im, a, b, c, dd, cw, rec_img_h, rec_img_w, rt
            )
        )(crop_src, cx0, cy0, cx1, cy1, content_w, rot180)
        crops_n = (
            crops.reshape(nb * max_boxes, rec_img_h, rec_img_w, 3) / 255.0
            - jnp.asarray(HALF_MEAN)
        ) * jnp.asarray(HALF_SCALE)
        boxes = jnp.stack(
            [jnp.round(cx0), jnp.round(cy0), jnp.round(cx1), jnp.round(cy1)],
            axis=2,
        ).astype(jnp.int32)
        quads_i = jnp.round(quads).astype(jnp.int32)  # [B, K, 4, 2]
        # width-tier index: the narrowest power-of-two slice of the crop
        # canvas that still holds every VALID crop's content — rec then
        # runs at rec_img_w/2^tier, matching the width the staged path's
        # bucket picker would choose (engine.recognize). tier 0 = full
        # canvas; each halving halves rec FLOPs.
        content_valid = jnp.where(valid, content_w, 0.0)
        max_content = jnp.max(content_valid)
        tier = jnp.int32(0)
        for k in range(1, n_width_tiers):
            tier = tier + (max_content <= float(rec_img_w >> k)).astype(
                jnp.int32
            )
        if n_batch_tiers > 1:
            # batch-count tier: the narrowest power-of-two slot slice
            # (K, K/2, …) that holds the fullest image's valid crops —
            # they are compacted to the front of each K block above
            max_valid = jnp.max(jnp.sum(valid, axis=1))
            btier = jnp.int32(0)
            for k in range(1, n_batch_tiers):
                btier = btier + (max_valid <= (max_boxes >> k)).astype(
                    jnp.int32
                )
            tier = tier * n_batch_tiers + btier
        return crops_n.astype(dtype), boxes, quads_i, valid, score, roots, tier

    def _decode_outputs(probs, t_full):
        """probs [N, T, V] → CTC decode operands, tail-padded to t_full with
        pure-blank timesteps (greedy collapse drops blank-id 0; beam search
        multiplies by blank mass 1.0 — both no-ops downstream)."""
        t = probs.shape[1]
        if decode == "beam":
            from ..ops.ctc import ctc_beam_topk_device

            idx, val, blank = ctc_beam_topk_device(probs, beam_candidates)
            pad = ((0, 0), (0, t_full - t), (0, 0))
            idx = jnp.pad(idx, pad)
            val = jnp.pad(val, pad)
            blank = jnp.pad(
                blank, ((0, 0), (0, t_full - t)), constant_values=1.0
            )
            return idx, val, blank
        idx, val = ctc_topk_device(probs, use_pallas=use_pallas)
        idx = jnp.pad(idx, ((0, 0), (0, t_full - t)))  # blank id 0
        val = jnp.pad(val, ((0, 0), (0, t_full - t)), constant_values=1.0)
        return idx, val, None

    def rec(rec_params, crops_n, tier):
        """CTC recognition with width- and batch-count-tiered fast paths:
        the recognizer runs on the narrowest power-of-two width slice
        (rec_img_w/2^kw) that holds every valid crop's content — wide
        lines (banners, long card rows) take the full-width branch with
        NO horizontal squash up to the configured canvas — and (with
        n_batch_tiers > 1) on the narrowest power-of-two slot slice
        (K/2^kb) that holds every image's compacted valid crops.
        ``tier = kw * n_batch_tiers + kb``. lax.switch executes only the
        taken branch on TPU; narrower branches' CTC outputs are padded
        with pure-blank timesteps/slots, so downstream decode is
        unchanged."""
        t_full = jax.eval_shape(
            rec_forward, rec_params, crops_n
        ).shape[1]
        nb = crops_n.shape[0] // max_boxes

        def make_branch(kw, kb):
            kslots = max_boxes >> kb

            def pad_slots(x, cv):
                """[B·kslots, …] → [B·K, …] with pure-blank filler rows."""
                if kslots == max_boxes:
                    return x
                x = x.reshape((nb, kslots) + x.shape[1:])
                pad = [(0, 0), (0, max_boxes - kslots)] + [(0, 0)] * (
                    x.ndim - 2
                )
                x = jnp.pad(x, pad, constant_values=cv)
                return x.reshape((nb * max_boxes,) + x.shape[2:])

            def run(c):
                c = c.reshape(
                    nb, max_boxes, rec_img_h, rec_img_w, 3
                )[:, :kslots, :, : rec_img_w >> kw]
                c = c.reshape(nb * kslots, rec_img_h, rec_img_w >> kw, 3)
                idx, val, blank = _decode_outputs(
                    rec_forward(rec_params, c), t_full
                )
                idx = pad_slots(idx, 0)  # blank id 0
                val = pad_slots(val, 1.0)
                if blank is not None:
                    blank = pad_slots(blank, 1.0)
                return idx, val, blank

            return run

        branches = [
            make_branch(kw, kb)
            for kw in range(n_width_tiers)
            for kb in range(n_batch_tiers)
        ]
        if len(branches) == 1:
            return branches[0](crops_n)
        return lax.switch(tier, branches, crops_n)

    return prep, rec


def build_fused_step(
    det_thresh: float,
    box_thresh: float,
    unclip_ratio: float,
    rec_img_h: int,
    rec_img_w: int,
    max_boxes: int,
    dtype=jnp.bfloat16,
    cls_shape=None,
    decode: str = "greedy",
    beam_candidates: int = 5,
    rotated: bool = False,
    use_pallas: bool = False,
    n_width_tiers: int = 2,
    blob_kernel: bool = False,
    use_dilation: bool = False,
    crop_src_mult: int = 1,
    n_batch_tiers: int = 1,
):
    """Returns jitted ``step(det_params, rec_params, cls_params,
    img_u8[B,H,W,3], content_hw[B,2]) -> FusedOutputs`` (compiled per padded
    det shape) — the single-dispatch composition of :func:`build_fused_parts`.
    With ``crop_src_mult > 1`` the step takes a sixth operand
    ``src_u8 [B, m·H, m·W, 3]`` (the m×-resolution crop source).
    With ``cls_shape=(h, w)`` the step also classifies each crop's
    orientation in-graph and mirrors the rec sampling grid on label==1
    (quirk preserved: the cls score/threshold is never consulted). With
    ``decode="beam"`` the step ships the device-pruned top-k lattice
    (+ blank probs) instead of the greedy argmax."""
    prep, rec = build_fused_parts(
        det_thresh,
        box_thresh,
        unclip_ratio,
        rec_img_h,
        rec_img_w,
        max_boxes,
        dtype=dtype,
        cls_shape=cls_shape,
        decode=decode,
        beam_candidates=beam_candidates,
        rotated=rotated,
        use_pallas=use_pallas,
        n_width_tiers=n_width_tiers,
        blob_kernel=blob_kernel,
        use_dilation=use_dilation,
        crop_src_mult=crop_src_mult,
        n_batch_tiers=n_batch_tiers,
    )

    def _step(det_params, rec_params, cls_params, img_u8, content_hw, src_u8):
        crops_n, boxes, quads, valid, score, roots, tier = prep(
            det_params, cls_params, img_u8, content_hw, src_u8
        )
        idx, val, blank = rec(rec_params, crops_n, tier)
        nb = img_u8.shape[0]
        t = idx.shape[1]
        return FusedOutputs(
            boxes,
            valid,
            score,
            idx.reshape((nb, max_boxes) + idx.shape[1:]),
            val.reshape((nb, max_boxes) + val.shape[1:]),
            roots,
            blank.reshape(nb, max_boxes, t) if blank is not None else None,
            quads,
        )

    if crop_src_mult > 1:
        return jax.jit(_step)

    # mult==1 keeps the historical 5-arg signature (and its compiled
    # variants / persistent-cache entries) unchanged
    @jax.jit
    def step(det_params, rec_params, cls_params, img_u8, content_hw):
        return _step(
            det_params, rec_params, cls_params, img_u8, content_hw, None
        )

    return step


def width_mult(cfg) -> int:
    """Validated fused crop-canvas width multiplier (power of two ≥ 1)."""
    mult = int(getattr(cfg, "fused_width_mult", 2))
    if mult < 1 or (mult & (mult - 1)):
        raise ValueError(f"fused_width_mult must be a power of two: {mult}")
    return mult


def fused_part_kwargs(engine, max_boxes: int) -> dict:
    """Config → :func:`build_fused_parts`/``build_fused_step`` kwargs,
    shared by the single-chip FusedOCR and the cross-chip staged wrapper
    so the two paths cannot drift (review r3: hand-copied plumbing had
    already diverged on use_dilation/blob_kernel). Callers set the
    device-dependent ``use_pallas``/``blob_kernel`` on the result."""
    cfg = engine.config
    mult = width_mult(cfg)
    src_mult = int(getattr(cfg, "fused_crop_src_mult", 1))
    if src_mult < 1:
        raise ValueError(f"fused_crop_src_mult must be >= 1: {src_mult}")
    with_cls = bool(cfg.enable_cls and engine.cls_params is not None)
    return {
        "det_thresh": cfg.det.thresh,
        "box_thresh": cfg.det.box_thresh,
        "unclip_ratio": cfg.det.unclip_ratio,
        "rec_img_h": cfg.rec.img_h,
        "rec_img_w": mult * cfg.rec.img_w,
        "max_boxes": max_boxes,
        "dtype": engine.dtype,
        "cls_shape": (
            (cfg.cls.image_shape[1], cfg.cls.image_shape[2])
            if with_cls
            else None
        ),
        "decode": cfg.rec.decode,
        "beam_candidates": cfg.rec.beam_candidates,
        "rotated": bool(getattr(cfg, "fused_rotated_boxes", False)),
        "n_width_tiers": mult.bit_length(),
        "use_dilation": bool(cfg.det.use_dilation),
        "crop_src_mult": src_mult,
        "n_batch_tiers": int(getattr(cfg, "fused_batch_tiers", 1)),
    }


class FusedOCR:
    """Single-dispatch serving wrapper sharing an OCREngine's params."""

    def __init__(self, engine, max_boxes: int = 32):
        self.engine = engine
        cfg = engine.config
        self.max_boxes = max_boxes
        self.rec_img_h = cfg.rec.img_h
        # crop-canvas width cap = fused_width_mult × base rec width; the
        # recognizer runs on the narrowest power-of-two slice that holds
        # the batch's widest valid crop (width tiers — no silent squash up
        # to the cap; docs/PARITY.md documents behavior past it)
        kw = fused_part_kwargs(engine, max_boxes)
        self.rec_img_w = kw["rec_img_w"]
        self.n_width_tiers = kw["n_width_tiers"]
        self.n_batch_tiers = kw["n_batch_tiers"]
        self.with_cls = kw["cls_shape"] is not None
        self.decode = kw["decode"]
        self.beam_size = cfg.rec.beam_size
        self.rotated = kw["rotated"]
        self.crop_src_mult = kw["crop_src_mult"]
        # compiled variant keys (nb, bh, bw): populated by warmup()/
        # compile_variant() and by every successful process_batch dispatch.
        # Worker threads may only execute keys in this set — compiling on a
        # non-main thread deadlocks the TPU tunnel (OCREngine.warmup), so
        # the serving dispatchers compile missing keys on the event loop
        # first (incremental warmup, serve.executor/batcher).
        self._compiled: set = set()
        self._step = build_fused_step(
            use_pallas=engine._pallas_ok(),
            blob_kernel=bool(
                getattr(cfg, "fused_blob_kernel", False)
                and engine._pallas_ok()
                and not self.rotated
            ),
            **kw,
        )

    def _cls_params(self):
        return self.engine.cls_params if self.with_cls else None

    def _n_data(self) -> int:
        """Data-parallel width: batches shard over the engine mesh's "data"
        axis (the multi-chip replacement for N worker replicas)."""
        mesh = self.engine.mesh
        return int(mesh.shape["data"]) if mesh is not None else 1

    def _pad_bucket(self, nb: int) -> int:
        """Round a batch bucket up to a multiple of the data-axis width so
        the leading axis shards evenly."""
        n = self._n_data()
        return -(-nb // n) * n

    def _place_batch(self, *arrays):
        """Shard batch-leading arrays over "data" when a mesh is configured;
        otherwise hand jit the raw host arrays (single-device placement)."""
        mesh = self.engine.mesh
        if mesh is None:
            return arrays
        from jax.sharding import NamedSharding, PartitionSpec as P

        s = NamedSharding(mesh, P("data"))
        return tuple(jax.device_put(a, s) for a in arrays)

    def _words_from_outputs(self, out, b, ratio_h, ratio_w, src_w, src_h):
        if getattr(self, "decode", "greedy") == "beam":
            from ..ops.ctc import ctc_beam_search

            kept, conf = ctc_beam_search(
                out.ctc_idx[b],
                out.ctc_prob[b],
                out.ctc_blank[b],
                beam_size=self.beam_size,
            )
        else:
            from ..ops.ctc import ctc_greedy_collapse

            kept, conf = ctc_greedy_collapse(out.ctc_idx[b], out.ctc_prob[b])
        words = []
        # Emission order: the reference worker never sorts
        # (ocr_worker.cpp:285-301) — words come out in cv2.findContours
        # order, which is reverse raster order of each contour's first
        # border pixel. The blob root IS that raster position, so
        # descending-root order matches the staged/reference word order.
        order = sorted(
            range(self.max_boxes), key=lambda i: -int(out.roots[b, i])
        )
        rotated = getattr(self, "rotated", False) and out.quads is not None
        for i in order:
            if not out.valid[b, i] or np.isnan(conf[i]):
                continue
            if rotated:
                # rescale each rotated-quad corner (truncating like
                # FilterTagDetRes) and canonicalize the corner order
                from ..ops.db_postprocess import order_points_clockwise

                q = out.quads[b, i].astype(np.int64)
                sx = np.clip((q[:, 0] / ratio_w).astype(np.int64), 0, src_w - 1)
                sy = np.clip((q[:, 1] / ratio_h).astype(np.int64), 0, src_h - 1)
                box = order_points_clockwise(
                    np.stack([sx, sy], axis=1)
                ).tolist()
                # FilterTagDetRes's final filter runs in SOURCE coords on
                # the rescaled quad: sides ≤4 px are dropped
                # (postprocess_op.cpp:333-362)
                p = np.array(box, np.float64)
                rect_w = float(np.linalg.norm(p[0] - p[1]))
                rect_h = float(np.linalg.norm(p[0] - p[3]))
                if rect_w <= 4 or rect_h <= 4:
                    continue
            else:
                x0, y0, x1, y1 = out.boxes[b, i]
                # rescale det-image coords → source coords (truncating like
                # FilterTagDetRes)
                sx0 = int(np.clip(int(x0 / ratio_w), 0, src_w - 1))
                sx1 = int(np.clip(int(x1 / ratio_w), 0, src_w - 1))
                sy0 = int(np.clip(int(y0 / ratio_h), 0, src_h - 1))
                sy1 = int(np.clip(int(y1 / ratio_h), 0, src_h - 1))
                # the reference's ≤4 px side filter, in source coords like
                # FilterTagDetRes (the det-map-coord rules ran in-graph)
                if sx1 - sx0 <= 4 or sy1 - sy0 <= 4:
                    continue
                box = [[sx0, sy0], [sx1, sy0], [sx1, sy1], [sx0, sy1]]
            words.append(
                {
                    "text": "".join(self.engine.charset[k] for k in kept[i]),
                    "confidence": float(conf[i]),
                    "box": [[int(x), int(y)] for x, y in box],
                }
            )
        return words

    def process_batch(
        self,
        images,
        request_ids,
        worker_id: int = 0,
        batch_buckets=None,
        arrival_times=None,
    ):
        """Cross-request batching: N same-bucket images → ONE device call.
        Images are grouped by their det shape bucket; each group pads its
        batch to ``batch_buckets`` so compiled variants stay closed.

        ``processing_time_ms`` is per-request: each response is stamped when
        ITS device group completes, measured from the request's own
        ``arrival_times`` entry (perf_counter seconds; defaults to batch
        entry) — matching the reference's per-request worker timing
        (ocr_worker.cpp:214) rather than the whole multi-group wall time."""
        import time

        from ..ops import det_fit_cap, det_resize
        from .config import pick_bucket

        cfg = self.engine.config
        if batch_buckets is None:
            batch_buckets = cfg.request_batch_buckets
        start = time.perf_counter()
        if arrival_times is None:
            arrival_times = [start] * len(request_ids)
        elif len(arrival_times) != len(request_ids):
            # zip() would silently truncate and fail late with a KeyError
            # after the device work is done
            raise ValueError(
                f"arrival_times has {len(arrival_times)} entries for "
                f"{len(request_ids)} requests"
            )
        arrival = dict(zip(request_ids, arrival_times))
        mult = self.crop_src_mult
        prepped = []  # (group_key, padded_img, src_img, ratios, meta)
        for image, rid in zip(images, request_ids):
            resized, ratio_h, ratio_w = det_resize(
                image, cfg.det.limit_type, cfg.det.limit_side_len
            )
            resized, ratio_h, ratio_w = det_fit_cap(
                resized, ratio_h, ratio_w, cfg.det.shape_buckets[-1]
            )
            rh, rw = resized.shape[:2]
            bh = pick_bucket(cfg.det.shape_buckets, rh)
            bw = pick_bucket(cfg.det.shape_buckets, rw)
            canvas = np.zeros((bh, bw, 3), np.uint8)
            canvas[:rh, :rw] = resized
            src = None
            if mult > 1:
                # the m×-resolution crop source comes straight from the
                # ORIGINAL image (cv2 bilinear, like the staged host crops'
                # source), not from re-upsampling the det-resized canvas
                import cv2

                src = cv2.resize(
                    image, (rw * mult, rh * mult),
                    interpolation=cv2.INTER_LINEAR,
                )
            prepped.append(
                (
                    (bh, bw),
                    canvas,
                    src,
                    (rh, rw),
                    (ratio_h, ratio_w),
                    (rid, image.shape),
                )
            )

        results = {}
        groups: Dict[tuple, list] = {}
        for item in prepped:
            groups.setdefault(item[0], []).append(item)
        # dispatch every group first (jit dispatch is async), then fetch:
        # device work of group n+1 overlaps the fetch + host CTC decode of
        # group n instead of serializing a full RTT per group
        inflight = []  # (chunk, pending device outputs)
        for (bh, bw), items in groups.items():
            stride = self._pad_bucket(pick_bucket(batch_buckets, len(items)))
            for beg in range(0, len(items), stride):
                chunk = items[beg : beg + stride]
                # a trailing partial chunk re-picks its own compiled batch
                # variant instead of padding up to the full stride
                nb = self._pad_bucket(pick_bucket(batch_buckets, len(chunk)))
                batch = np.zeros((nb, bh, bw, 3), np.uint8)
                content_hw = np.zeros((nb, 2), np.int32)  # pad slots: (0,0)
                src_batch = (
                    np.zeros((nb, bh * mult, bw * mult, 3), np.uint8)
                    if mult > 1
                    else None
                )
                for j, (_, canvas, src, (rh, rw), _, _) in enumerate(chunk):
                    batch[j] = canvas
                    content_hw[j] = (rh, rw)
                    if src_batch is not None:
                        src_batch[j, : rh * mult, : rw * mult] = src
                step_args = [batch, content_hw]
                if src_batch is not None:
                    step_args.append(src_batch)
                inflight.append(
                    (
                        chunk,
                        self._step(
                            self.engine.det_params,
                            self.engine.rec_params,
                            self._cls_params(),
                            *self._place_batch(*step_args),
                        ),
                    )
                )
                # a dispatched variant is a compiled variant (keeps the
                # incremental-warmup guard exact; set.add is GIL-atomic)
                self._compiled.add((nb, bh, bw))
        for chunk, pending in inflight:
            out = jax.device_get(pending)  # ONE fetch per device call
            group_done = time.perf_counter()
            for j, (_, _, _, _, (ratio_h, ratio_w), (rid, shape)) in enumerate(
                chunk
            ):
                words = self._words_from_outputs(
                    out, j, ratio_h, ratio_w, shape[1], shape[0]
                )
                results[rid] = {
                    "request_id": int(rid),
                    "width": int(shape[1]),
                    "height": int(shape[0]),
                    "success": True,
                    "processing_time_ms": (group_done - arrival[rid]) * 1e3,
                    "worker_id": worker_id,
                    "words": words,
                }
        return [results[rid] for rid in request_ids]

    def process(self, image_bgr: np.ndarray, request_id: int = 0, worker_id: int = 0) -> Dict:
        return self.process_batch([image_bgr], [request_id], worker_id)[0]

    def variant_keys(self, batch_buckets=None):
        """The closed set of compiled-variant keys (nb, bh, bw) this config
        can dispatch, priority-ordered for incremental warmup: smallest
        batch bucket first (single requests land there), then ascending
        det bucket area (quick compiles first → earliest serve-readiness
        per wall-second)."""
        if batch_buckets is None:
            batch_buckets = self.engine.config.request_batch_buckets
        buckets = self.engine.config.det.shape_buckets
        return [
            (nb, h, w)
            for nb in sorted({self._pad_bucket(b) for b in batch_buckets})
            for h, w in sorted(
                ((h, w) for h in buckets for w in buckets),
                key=lambda hw: (hw[0] * hw[1], hw),
            )
        ]

    def compile_variant(self, key) -> bool:
        """Compile ONE (nb, bh, bw) variant with a zero dummy batch and
        record it. MAIN THREAD ONLY on TPU-tunnel backends. Returns True
        when a compile actually ran (False = already recorded)."""
        if key in self._compiled:
            return False
        nb, h, w = key
        mult = self.crop_src_mult
        img = np.zeros((nb, h, w, 3), np.uint8)
        content = np.tile(np.array([[h, w]], np.int32), (nb, 1))
        step_args = [img, content]
        if mult > 1:
            step_args.append(np.zeros((nb, h * mult, w * mult, 3), np.uint8))
        jax.device_get(
            self._step(
                self.engine.det_params,
                self.engine.rec_params,
                self._cls_params(),
                *self._place_batch(*step_args),
            )
        )
        self._compiled.add(key)
        return True

    def required_variants(self, images, batch_buckets=None):
        """The (nb, bh, bw) keys a ``process_batch(images)`` call will
        dispatch that are NOT yet compiled — the serving dispatchers'
        compile-before-dispatch guard (shape math only, no pixel work;
        mirrors process_batch's det_resize→det_fit_cap→bucket→chunk
        pipeline, pinned equal by tests/test_warmup.py)."""
        from ..ops import det_cap_shape, det_target_shape
        from .config import pick_bucket

        cfg = self.engine.config
        if batch_buckets is None:
            batch_buckets = cfg.request_batch_buckets
        groups: Dict[tuple, int] = {}
        for image in images:
            rh, rw = det_target_shape(
                image.shape[0],
                image.shape[1],
                cfg.det.limit_type,
                cfg.det.limit_side_len,
            )
            rh, rw = det_cap_shape(rh, rw, cfg.det.shape_buckets[-1])
            key = (
                pick_bucket(cfg.det.shape_buckets, rh),
                pick_bucket(cfg.det.shape_buckets, rw),
            )
            groups[key] = groups.get(key, 0) + 1
        need = []
        for (bh, bw), count in groups.items():
            stride = self._pad_bucket(pick_bucket(batch_buckets, count))
            for beg in range(0, count, stride):
                nb = self._pad_bucket(
                    pick_bucket(batch_buckets, min(stride, count - beg))
                )
                k = (nb, bh, bw)
                if k not in self._compiled and k not in need:
                    need.append(k)
        return need

    def warmup(self, batch_buckets=None):
        """Main-thread precompile of every (det bucket pair × batch bucket)
        (tunnel compiles deadlock off the main thread — see
        OCREngine.warmup). Incremental alternative: compile
        ``variant_keys()`` one at a time on the event loop while already
        serving (serve.service.incremental_warmup)."""
        for key in self.variant_keys(batch_buckets):
            self.compile_variant(key)
