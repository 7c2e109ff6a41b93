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
    # argmax in the same pass: first column index achieving the max
    hit = jnp.where(masked == val, col, vp)
    idx = jnp.min(hit, axis=1, keepdims=True)
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

    roots_ref: [SUBLANES, KP] i32 (row 0 holds the roots; padded slots are
    -1, which no label equals). labels_ref/prob_ref: [tile_h, W]. out_ref:
    [8, KP] f32 accumulator — rows: 0 area, 1 prob mass, 2 x0(min),
    3 x1(max), 4 y0(min), 5 y1(max); grid steps run sequentially on TPU so
    read-modify-write accumulation across tiles is safe."""
    i = pl.program_id(0)
    big = jnp.float32(1e9)

    @pl.when(i == 0)
    def _():
        kp = out_ref.shape[1]
        init = jnp.zeros((8, kp), jnp.float32)
        init = init.at[2].set(big).at[4].set(big)
        init = init.at[3].set(-big).at[5].set(-big)
        out_ref[:] = init

    lab = labels_ref[:]  # [tile_h, W] int32
    pr = prob_ref[:]  # [tile_h, W] f32
    roots = roots_ref[0]  # [KP] int32
    # [KP, tile_h, W] membership — the tile-local slice of the [K, H, W]
    # mask the XLA formulation materializes in full
    member = (lab[None, :, :] == roots[:, None, None]).astype(jnp.float32)
    area = jnp.sum(member, axis=(1, 2))
    psum = jnp.sum(member * pr[None, :, :], axis=(1, 2))
    colp = jnp.max(member, axis=1)  # [KP, W] column presence
    rowp = jnp.max(member, axis=2)  # [KP, tile_h] row presence
    kp, w = colp.shape
    ix = jax.lax.broadcasted_iota(jnp.float32, (kp, w), 1)
    x0 = jnp.min(jnp.where(colp > 0, ix, big), axis=1)
    x1 = jnp.max(jnp.where(colp > 0, ix, -big), axis=1)
    iy = (
        jax.lax.broadcasted_iota(jnp.float32, (kp, tile_h), 1)
        + jnp.float32(tile_h) * i.astype(jnp.float32)
    )
    y0 = jnp.min(jnp.where(rowp > 0, iy, big), axis=1)
    y1 = jnp.max(jnp.where(rowp > 0, iy, -big), axis=1)

    out_ref[0, :] += area
    out_ref[1, :] += psum
    out_ref[2, :] = jnp.minimum(out_ref[2, :], x0)
    out_ref[3, :] = jnp.maximum(out_ref[3, :], x1)
    out_ref[4, :] = jnp.minimum(out_ref[4, :], y0)
    out_ref[5, :] = jnp.maximum(out_ref[5, :], y1)


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
    roots_p = jnp.full((SUBLANES, kp), -1, jnp.int32)
    roots_p = roots_p.at[0, :k].set(roots.astype(jnp.int32))

    grid = (hp // tile_h,)
    out = pl.pallas_call(
        functools.partial(_blob_stats_kernel, tile_h=tile_h),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (SUBLANES, kp), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_h, wp), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_h, wp), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (8, kp), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8, kp), jnp.float32),
        interpret=interpret,
    )(roots_p, labels_p, prob_p)
    return (
        out[0, :k],
        out[1, :k],
        out[2, :k],
        out[3, :k],
        out[4, :k],
        out[5, :k],
    )
