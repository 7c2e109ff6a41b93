"""PP-OCRv4 mobile recognizer: PP-LCNetV3 backbone + SVTR encoder + CTC head.

Hand-written NHWC JAX implementation of
/root/reference/models/rec/inference.pdmodel (the v4 student multihead with
svtr-type ctc_encoder — SURVEY.md §2.2). Constants transcribed from the
exported graph: mixed (h,w) strides that reduce height to 3 while keeping
width/4 timesteps, a 480→(1,T)-pooled feature, two 8-head dim-120 SVTR
global-mix blocks, and a 6625-way CTC projection.

Input:  [N, 48, W, 3] normalized crop batch (W static per width bucket).
Output: [N, W//8, 6625] per-timestep class probabilities (post-softmax).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .layers import (
    batch_norm,
    conv2d,
    hard_swish,
    lab,
    layer_norm,
    linear,
    se_module,
    swish,
)

# (c_in, c_out, dw_kernel, stride(h,w), has_se)
REC_BLOCKS: List[Tuple[int, int, int, Tuple[int, int], bool]] = [
    (16, 32, 3, (1, 1), False),
    (32, 64, 3, (1, 1), False),
    (64, 64, 3, (1, 1), False),
    (64, 128, 3, (2, 1), False),
    (128, 128, 3, (1, 1), False),
    (128, 240, 3, (1, 2), False),
    (240, 240, 5, (1, 1), False),
    (240, 240, 5, (1, 1), False),
    (240, 240, 5, (1, 1), False),
    (240, 240, 5, (1, 1), False),
    (240, 480, 5, (2, 1), True),
    (480, 480, 5, (1, 1), True),
    (480, 480, 5, (2, 1), False),
    (480, 480, 5, (1, 1), False),
]
REC_DIM = 120  # SVTR embedding dim
REC_HEADS = 8
REC_MLP_RATIO = 2
REC_NUM_CLASSES = 6625  # 6623-char dict + blank '#' + trailing space


def _lcnet_conv(x, p, k, stride, groups):
    """conv + bias + LAB + hard_swish + LAB (every rec backbone conv,
    including strided depthwise ones, carries the activation)."""
    pad = ((k // 2, k // 2), (k // 2, k // 2))
    x = conv2d(x, p["w"], stride, pad, groups, p["b"])
    x = lab(x, p["lab1"])
    x = hard_swish(x)
    return lab(x, p["lab2"])


def rec_backbone(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    p = params["stem"]
    x = conv2d(x, p["w"], (2, 2), ((1, 1), (1, 1)))
    x = batch_norm(x, p["bn"])
    for cfg, bp in zip(REC_BLOCKS, params["blocks"]):
        cin, cout, k, s, has_se = cfg
        x = _lcnet_conv(x, bp["dw"], k, s, groups=cin)
        if has_se:
            x = se_module(x, bp["se"], slope=1.0 / 6.0)
        x = _lcnet_conv(x, bp["pw"], 1, (1, 1), groups=1)
    return x  # [N, 3, W/4, 480]


def _conv_bn_swish(x, p, kw: int):
    """1×kw conv + BN + swish — the svtr encoder's conv units."""
    pad = ((0, 0), (kw // 2, kw // 2))
    return swish(batch_norm(conv2d(x, p["w"], (1, 1), pad), p["bn"]))


def svtr_block(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """Pre-norm global-mix block (rec_svtrnet.py Block semantics):
    x += attn(LN(x)); x += mlp(LN(x)). 8 heads, head_dim 15, scale 15^-½."""
    n, t, d = x.shape
    h = REC_HEADS
    hd = d // h

    y = layer_norm(x, p["norm1"])
    qkv = linear(y, p["qkv"]).reshape(n, t, 3, h, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0] * (hd**-0.5), qkv[1], qkv[2]
    attn = jnp.matmul(q, k.transpose(0, 1, 3, 2), preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    y = jnp.matmul(attn, v, preferred_element_type=jnp.float32).astype(x.dtype)
    y = y.transpose(0, 2, 1, 3).reshape(n, t, d)
    x = x + linear(y, p["proj"])

    y = layer_norm(x, p["norm2"])
    y = linear(swish(linear(y, p["fc1"])), p["fc2"])
    return x + y


def rec_neck_head_logits(params: Dict, feat: jnp.ndarray) -> jnp.ndarray:
    """avg-pool to 1×T, SVTR encoder branch, concat with pooled features,
    project to the charset (the exported 'ctc_encoder' + student CTC head).
    Returns pre-softmax logits (training wants these; serving softmaxes)."""
    n, hh, ww, c = feat.shape
    # avg pool k=(3,2) s=(3,2): height → 1, width halves → T = W/8.
    # Feature height is 3 for 48-px crops and 2 for the serving profile's
    # 28-px crops; Paddle clips the k=3 window to the input (exclusive
    # mean), so both cases equal a full-height mean.
    assert hh <= 3, f"unexpected rec feature height {hh}"
    pooled = feat.reshape(n, 1, hh, ww // 2, 2, c).mean(axis=(2, 4))  # [N,1,T,480]

    y = _conv_bn_swish(pooled, params["conv1"], kw=3)  # 480→60
    y = _conv_bn_swish(y, params["conv2"], kw=1)  # 60→120
    t = y.shape[2]
    y = y.reshape(n, t, REC_DIM)  # [N,1,T,120] → [N,T,120]
    for bp in params["blocks"]:
        y = svtr_block(bp, y)
    y = layer_norm(y, params["norm"], eps=1e-6)
    y = y.reshape(n, 1, t, REC_DIM)
    y = _conv_bn_swish(y, params["conv3"], kw=1)  # 120→480

    z = jnp.concatenate([pooled, y], axis=-1)  # [N,1,T,960] (pooled first)
    z = _conv_bn_swish(z, params["conv4"], kw=3)  # 960→60
    z = _conv_bn_swish(z, params["conv1x1"], kw=1)  # 60→120
    z = z.reshape(n, t, REC_DIM)
    return linear(z, params["fc"]).astype(jnp.float32)


def rec_neck_head(params: Dict, feat: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.softmax(rec_neck_head_logits(params, feat), axis=-1)


def rec_forward(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """[N,48,W,3] normalized → [N, W//8, 6625] probabilities."""
    feat = rec_backbone(params["backbone"], x)
    return rec_neck_head(params["head"], feat)


def rec_forward_logits(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """Training-path forward: [N,48,W,3] → [N, W//8, 6625] logits."""
    feat = rec_backbone(params["backbone"], x)
    return rec_neck_head_logits(params["head"], feat)


# ---------------------------------------------------------------------------
# parameter construction


def init_rec_params(seed: int = 0) -> Dict:
    rng = np.random.default_rng(seed)

    def lconv(k, cin, cout, groups=1):
        fan = k * k * (cin // groups)
        return {
            "w": rng.normal(0, (2.0 / fan) ** 0.5, (k, k, cin // groups, cout)).astype(
                np.float32
            ),
            "b": np.zeros((cout,), np.float32),
            "lab1": {"s": np.ones((1,), np.float32), "b": np.zeros((1,), np.float32)},
            "lab2": {"s": np.ones((1,), np.float32), "b": np.zeros((1,), np.float32)},
        }

    def bn(c):
        return {
            "scale": np.ones((c,), np.float32),
            "bias": np.zeros((c,), np.float32),
            "mean": np.zeros((c,), np.float32),
            "var": np.ones((c,), np.float32),
        }

    def cbn(kh, kw, cin, cout):
        fan = kh * kw * cin
        return {
            "w": rng.normal(0, (2.0 / fan) ** 0.5, (kh, kw, cin, cout)).astype(
                np.float32
            ),
            "bn": bn(cout),
        }

    def se(c):
        mid = c // 4
        return {
            "conv1": {
                "w": rng.normal(0, 0.05, (1, 1, c, mid)).astype(np.float32),
                "b": np.zeros((mid,), np.float32),
            },
            "conv2": {
                "w": rng.normal(0, 0.05, (1, 1, mid, c)).astype(np.float32),
                "b": np.zeros((c,), np.float32),
            },
        }

    def fc(cin, cout):
        return {
            "w": rng.normal(0, cin**-0.5, (cin, cout)).astype(np.float32),
            "b": np.zeros((cout,), np.float32),
        }

    def ln(c):
        return {"scale": np.ones((c,), np.float32), "bias": np.zeros((c,), np.float32)}

    backbone = {
        "stem": {
            "w": rng.normal(0, (2.0 / 27) ** 0.5, (3, 3, 3, 16)).astype(np.float32),
            "bn": bn(16),
        },
        "blocks": [],
    }
    for cin, cout, k, s, has_se in REC_BLOCKS:
        blk = {"dw": lconv(k, cin, cin, groups=cin), "pw": lconv(1, cin, cout)}
        if has_se:
            blk["se"] = se(cin)
        backbone["blocks"].append(blk)

    d = REC_DIM
    head = {
        "conv1": cbn(1, 3, 480, 60),
        "conv2": cbn(1, 1, 60, d),
        "blocks": [
            {
                "norm1": ln(d),
                "qkv": fc(d, 3 * d),
                "proj": fc(d, d),
                "norm2": ln(d),
                "fc1": fc(d, REC_MLP_RATIO * d),
                "fc2": fc(REC_MLP_RATIO * d, d),
            }
            for _ in range(2)
        ],
        "norm": ln(d),
        "conv3": cbn(1, 1, d, 480),
        "conv4": cbn(1, 3, 960, 60),
        "conv1x1": cbn(1, 1, 60, d),
        "fc": fc(d, REC_NUM_CLASSES),
    }
    return {"backbone": backbone, "head": head}
