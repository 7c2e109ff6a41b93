"""Pallas TPU kernels for the decode hot path.

``ctc_topk`` fuses the greedy-CTC reduction — per-timestep argmax AND max
over the 6,625-way class axis — into one VMEM pass on the VPU, instead of
two separate 26 KB/row reductions. The class axis is padded to a lane
multiple; timesteps tile the sublane axis.

Falls back to the jnp implementation off-TPU (Pallas interpret mode is for
tests only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _ctc_topk_kernel(probs_ref, idx_ref, val_ref, *, valid_v: int):
    """probs_ref: [R, Vp] f32 → idx_ref [R, 1] i32, val_ref [R, 1] f32."""
    block = probs_ref[:]
    r, vp = block.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (r, vp), dimension=1)
    masked = jnp.where(col < valid_v, block, -jnp.inf)
    val = jnp.max(masked, axis=1, keepdims=True)
    # argmax in the same pass: first column index achieving the max. A NaN
    # row makes `masked == val` false everywhere (NaN != NaN); clamp the
    # no-hit sentinel vp into range so the host charset join degrades like
    # jnp.argmax (in-range garbage) instead of an IndexError
    hit = jnp.where(masked == val, col, vp)
    idx = jnp.minimum(jnp.min(hit, axis=1, keepdims=True), valid_v - 1)
    idx_ref[:] = idx.astype(jnp.int32)
    val_ref[:] = val


@functools.partial(jax.jit, static_argnames=("interpret",))
def ctc_topk_pallas(probs: jnp.ndarray, interpret: bool = False):
    """[N, T, V] probabilities → ([N, T] int32 argmax, [N, T] f32 max)."""
    n, t, v = probs.shape
    rows = n * t
    rows_p = _round_up(rows, SUBLANES)
    vp = _round_up(v, LANES)
    flat = probs.reshape(rows, v).astype(jnp.float32)
    flat = jnp.pad(flat, ((0, rows_p - rows), (0, vp - v)))

    grid = (rows_p // SUBLANES,)
    idx, val = pl.pallas_call(
        functools.partial(_ctc_topk_kernel, valid_v=v),
        grid=grid,
        in_specs=[
            pl.BlockSpec((SUBLANES, vp), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((SUBLANES, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows_p, 1), jnp.int32),
            jax.ShapeDtypeStruct((rows_p, 1), jnp.float32),
        ),
        interpret=interpret,
    )(flat)
    return (
        idx[:rows, 0].reshape(n, t),
        val[:rows, 0].reshape(n, t),
    )


def on_tpu() -> bool:
    return jax.devices()[0].platform in ("tpu", "axon")


def _blob_stats_kernel(
    roots_ref, labels_ref, prob_ref, out_ref, *, tile_h: int
):
    """One row-tile pass of fused per-root blob statistics.

    Layout-native formulation: roots live on SUBLANES ([KP, 1] column,
    padded slots -1 which no label equals) so each image row ([1, W] on
    lanes) broadcasts against them to a [KP, W] membership plane with no
    cross-layout reshapes; the row loop is a static unroll of tile_h.

    labels_ref/prob_ref: [tile_h, W]. out_ref: [KP, 8] f32 accumulator —
    cols: 0 area, 1 prob mass, 2 x0(min), 3 x1(max), 4 y0(min), 5 y1(max).
    Grid steps run sequentially on TPU so read-modify-write accumulation
    across tiles is safe."""
    i = pl.program_id(0)
    big = jnp.float32(1e9)

    @pl.when(i == 0)
    def _():
        kp = out_ref.shape[0]
        # column-wise init (no jnp .at scatter — unsupported in Pallas TC)
        col = jax.lax.broadcasted_iota(jnp.int32, (kp, 8), 1)
        init = jnp.where((col == 2) | (col == 4), big, 0.0)
        init = jnp.where((col == 3) | (col == 5), -big, init)
        out_ref[:] = init

    roots_col = roots_ref[:, 0:1]  # [KP, 1] int32 (sublane layout)
    lab = labels_ref[:]  # [tile_h, W] int32
    pr = prob_ref[:]  # [tile_h, W] f32
    kp = roots_col.shape[0]
    w = lab.shape[1]
    ix = jax.lax.broadcasted_iota(jnp.int32, (kp, w), 1).astype(jnp.float32)
    area = jnp.zeros((kp, 1), jnp.float32)
    psum = jnp.zeros((kp, 1), jnp.float32)
    colp = jnp.zeros((kp, w), jnp.float32)
    y0 = jnp.full((kp, 1), big, jnp.float32)
    y1 = jnp.full((kp, 1), -big, jnp.float32)
    base_y = jnp.float32(tile_h) * i.astype(jnp.float32)
    for r in range(tile_h):
        m = (lab[r : r + 1, :] == roots_col).astype(jnp.float32)  # [KP, W]
        area += jnp.sum(m, axis=1, keepdims=True)
        psum += jnp.sum(m * pr[r : r + 1, :], axis=1, keepdims=True)
        colp = jnp.maximum(colp, m)
        present = jnp.max(m, axis=1, keepdims=True)  # [KP, 1]
        yval = base_y + jnp.float32(r)
        y0 = jnp.minimum(y0, jnp.where(present > 0, yval, big))
        y1 = jnp.maximum(y1, jnp.where(present > 0, yval, -big))
    x0 = jnp.min(jnp.where(colp > 0, ix, big), axis=1, keepdims=True)
    x1 = jnp.max(jnp.where(colp > 0, ix, -big), axis=1, keepdims=True)

    out_ref[:, 0:1] += area
    out_ref[:, 1:2] += psum
    out_ref[:, 2:3] = jnp.minimum(out_ref[:, 2:3], x0)
    out_ref[:, 3:4] = jnp.maximum(out_ref[:, 3:4], x1)
    out_ref[:, 4:5] = jnp.minimum(out_ref[:, 4:5], y0)
    out_ref[:, 5:6] = jnp.maximum(out_ref[:, 5:6], y1)


@functools.partial(jax.jit, static_argnames=("interpret", "tile_h"))
def blob_stats_pallas(
    labels: jnp.ndarray,
    prob: jnp.ndarray,
    roots: jnp.ndarray,
    interpret: bool = False,
    tile_h: int = 32,
):
    """Fused per-root area/prob-mass/bbox in ONE pass over the label map.

    labels: [H, W] int32 blob labels; prob: [H, W] f32; roots: [K] int32
    selected blob roots. Returns (area[K], psum[K], x0[K], x1[K], y0[K],
    y1[K]) f32 — x0/y0 are +1e9 and x1/y1 -1e9 for roots with no pixels
    (same sentinels as the masked-reduction formulation in
    pipeline.fused._blob_stats, whose [K, H, W] mask this kernel never
    materializes: each row tile's membership lives only in VMEM)."""
    h, w = labels.shape
    (k,) = roots.shape
    kp = _round_up(k, LANES)
    hp = _round_up(h, tile_h)
    wp = _round_up(w, LANES)
    # pad labels with -2 (matches no root; padded root slots are -1)
    labels_p = jnp.pad(
        labels.astype(jnp.int32),
        ((0, hp - h), (0, wp - w)),
        constant_values=-2,
    )
    prob_p = jnp.pad(prob.astype(jnp.float32), ((0, hp - h), (0, wp - w)))
    roots_p = jnp.pad(
        roots.astype(jnp.int32), (0, kp - k), constant_values=-1
    )[:, None]  # [KP, 1] — roots on sublanes (see kernel docstring)

    grid = (hp // tile_h,)
    out = pl.pallas_call(
        functools.partial(_blob_stats_kernel, tile_h=tile_h),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (kp, 1), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_h, wp), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_h, wp), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (kp, 8), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((kp, 8), jnp.float32),
        interpret=interpret,
    )(roots_p, labels_p, prob_p)
    return (
        out[:k, 0],
        out[:k, 1],
        out[:k, 2],
        out[:k, 3],
        out[:k, 4],
        out[:k, 5],
    )
