"""Shared neural-net primitives for the hand-written PP-OCR models.

TPU-first conventions:
  * **NHWC** activations / **HWIO** weights — feature dim on the 128-lane
    axis, XLA's preferred conv layout on TPU (the parity-oriented graph
    executor in paddle_compat keeps Paddle's NCHW instead).
  * All params live in nested dicts of jnp arrays (plain pytrees — compose
    with jit/grad/pjit directly).
  * Convs always set ``preferred_element_type=float32`` so bf16 weights
    accumulate in f32 on the MXU.

Functional equivalents of the reference's Paddle-runtime layers; activation
definitions follow the exported graphs (hard_swish/hard_sigmoid with
Paddle's constants, see executor.py).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    stride: Tuple[int, int] = (1, 1),
    padding="SAME",
    groups: int = 1,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """NHWC conv. ``padding`` is an int pair ((ph, ph), (pw, pw)) or 'SAME'."""
    if isinstance(padding, (tuple, list)):
        padding = [tuple(p) for p in padding]
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


def conv_p(x, p: Dict, stride=(1, 1), padding="SAME", groups: int = 1):
    return conv2d(x, p["w"], stride, padding, groups, p.get("b"))


def conv_transpose2x2(x: jnp.ndarray, w: jnp.ndarray, bias=None) -> jnp.ndarray:
    """Stride-2 2×2 transposed conv (the DB head upsampler).

    With k=2, s=2, p=0 the windows don't overlap, so the op is exactly
    one matmul + pixel shuffle — a single MXU contraction instead of a
    dilated conv. ``w`` is (C_in, 2, 2, C_out):
    ``y[n, 2h+a, 2w+b, o] = Σc x[n,h,w,c] · w[c,a,b,o]``.
    """
    n, h, wd, c = x.shape
    cout = w.shape[-1]
    # f32 MXU accumulation + f32 bias add like conv2d/linear in this
    # module (review r3: this one silently accumulated in bf16)
    t = jnp.tensordot(
        x, w, axes=[[3], [0]], preferred_element_type=jnp.float32
    )  # [n, h, w, 2, 2, cout]
    t = t.transpose(0, 1, 3, 2, 4, 5)
    out = t.reshape(n, 2 * h, 2 * wd, cout)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def batch_norm(x: jnp.ndarray, p: Dict, eps: float = 1e-5) -> jnp.ndarray:
    """Inference BN over the channel (last) axis; params are folded into a
    single scale/shift at call time so XLA fuses it into the adjacent conv."""
    inv = p["scale"] * lax.rsqrt(p["var"] + eps)
    return (x * inv + (p["bias"] - p["mean"] * inv)).astype(x.dtype)


def layer_norm(x: jnp.ndarray, p: Dict, eps: float = 1e-5) -> jnp.ndarray:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return ((x - mu) * lax.rsqrt(var + eps) * p["scale"] + p["bias"]).astype(x.dtype)


def lab(x: jnp.ndarray, p: Dict) -> jnp.ndarray:
    """PP-LCNetV3 'learnable affine block': scalar x·s + b (exported as the
    elementwise_mul/add pairs wrapping every conv in the det/rec graphs)."""
    return x * p["s"] + p["b"]


def hard_swish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.clip(x + 3.0, 0.0, 6.0) * (1.0 / 6.0)


def hard_sigmoid(x: jnp.ndarray, slope: float = 1.0 / 6.0, offset: float = 0.5):
    """Paddle's nn.Hardsigmoid uses slope 1/6 (the exported graphs carry
    slope≈0.1666667)."""
    return jnp.clip(slope * x + offset, 0.0, 1.0)


def swish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(x)


def se_module(x: jnp.ndarray, p: Dict, slope: float = 0.2) -> jnp.ndarray:
    """Squeeze-excite: global avg pool → 1×1 conv + relu → 1×1 conv +
    hard_sigmoid → channel scale.

    ``slope`` is the hard_sigmoid slope — the exported graphs mix 0.2
    (cls backbone, det FPN) and 1/6 (det/rec backbones).
    """
    s = jnp.mean(x, axis=(1, 2), keepdims=True)
    s = conv2d(s, p["conv1"]["w"], bias=p["conv1"]["b"])
    s = jax.nn.relu(s)
    s = conv2d(s, p["conv2"]["w"], bias=p["conv2"]["b"])
    s = hard_sigmoid(s, slope=slope)
    return x * s


def linear(x: jnp.ndarray, p: Dict) -> jnp.ndarray:
    out = jnp.matmul(x, p["w"], preferred_element_type=jnp.float32)
    if "b" in p:
        out = out + p["b"]
    return out.astype(x.dtype)


def cast_tree(params, dtype):
    """Cast every float leaf of a param tree to ``dtype`` (e.g. bf16)."""
    return jax.tree.map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a,
        params,
    )
