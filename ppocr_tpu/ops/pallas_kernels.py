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
