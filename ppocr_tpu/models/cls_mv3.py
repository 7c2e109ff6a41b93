"""Text-orientation classifier: MobileNetV3-small ×0.35 + 2-class head.

Hand-written NHWC JAX implementation of
/root/reference/models/cls/inference.pdmodel (ch_ppocr_mobile_v2.0_cls,
SURVEY.md §2.2). Block table transcribed from the exported graph — note the
(2,1) strides that downsample height only, keeping text-line width.

Input:  [N, 48, 192, 3] normalized crop.
Output: [N, 2] softmax over {0°, 180°} (consumed like ocr_cls.cpp:90-99).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .layers import batch_norm, conv2d, hard_swish, linear, se_module

# (c_in, c_exp, c_out, dw_k, stride(h,w), se, act)  act: "relu" | "hswish"
CLS_BLOCKS: List[Tuple[int, int, int, int, Tuple[int, int], bool, str]] = [
    (8, 8, 8, 3, (2, 1), True, "relu"),
    (8, 24, 8, 3, (2, 1), False, "relu"),
    (8, 32, 8, 3, (1, 1), False, "relu"),
    (8, 32, 16, 5, (2, 1), True, "hswish"),
    (16, 88, 16, 5, (1, 1), True, "hswish"),
    (16, 88, 16, 5, (1, 1), True, "hswish"),
    (16, 40, 16, 5, (1, 1), True, "hswish"),
    (16, 48, 16, 5, (1, 1), True, "hswish"),
    (16, 104, 32, 5, (2, 1), True, "hswish"),
    (32, 200, 32, 5, (1, 1), True, "hswish"),
    (32, 200, 32, 5, (1, 1), True, "hswish"),
]
CLS_LAST_CH = 200
CLS_NUM_CLASSES = 2


def _act(name: str, x):
    return jax.nn.relu(x) if name == "relu" else hard_swish(x)


def _conv_bn(x, p, k=1, stride=(1, 1), groups=1, act=None):
    pad = ((k // 2, k // 2), (k // 2, k // 2))
    x = batch_norm(conv2d(x, p["w"], stride, pad, groups), p["bn"])
    return _act(act, x) if act else x


def cls_forward(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """[N,48,192,3] normalized → [N,2] probabilities."""
    x = _conv_bn(x, params["stem"], k=3, stride=(2, 2), act="hswish")
    for cfg, bp in zip(CLS_BLOCKS, params["blocks"]):
        cin, cexp, cout, k, s, has_se, act = cfg
        y = _conv_bn(x, bp["expand"], k=1, act=act)
        y = _conv_bn(y, bp["dw"], k=k, stride=s, groups=cexp, act=act)
        if has_se:
            y = se_module(y, bp["se"])
        y = _conv_bn(y, bp["project"], k=1)
        x = x + y if (cin == cout and s == (1, 1)) else y
    x = _conv_bn(x, params["last_conv"], k=1, act="hswish")
    # head: 2×2 max pool → global avg pool → FC → softmax
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))
    x = jnp.mean(x, axis=(1, 2))
    logits = linear(x, params["fc"]).astype(jnp.float32)
    return jax.nn.softmax(logits, axis=-1)


def init_cls_params(seed: int = 0) -> Dict:
    """Random init with the exported graph's exact shapes (tests / fallback;
    real weights come from convert.convert_cls_params)."""
    rng = np.random.default_rng(seed)

    def conv(k, cin, cout, groups=1):
        fan = k * k * (cin // groups)
        return {
            "w": rng.normal(0, (2.0 / fan) ** 0.5, (k, k, cin // groups, cout)).astype(
                np.float32
            ),
            "bn": {
                "scale": np.ones((cout,), np.float32),
                "bias": np.zeros((cout,), np.float32),
                "mean": np.zeros((cout,), np.float32),
                "var": np.ones((cout,), np.float32),
            },
        }

    def se(c):
        mid = c // 4
        return {
            "conv1": {
                "w": rng.normal(0, 0.1, (1, 1, c, mid)).astype(np.float32),
                "b": np.zeros((mid,), np.float32),
            },
            "conv2": {
                "w": rng.normal(0, 0.1, (1, 1, mid, c)).astype(np.float32),
                "b": np.zeros((c,), np.float32),
            },
        }

    blocks = []
    for cin, cexp, cout, k, s, has_se, act in CLS_BLOCKS:
        blk = {
            "expand": conv(1, cin, cexp),
            "dw": conv(k, cexp, cexp, groups=cexp),
            "project": conv(1, cexp, cout),
        }
        if has_se:
            blk["se"] = se(cexp)
        blocks.append(blk)
    return {
        "stem": conv(3, 3, 8),
        "blocks": blocks,
        "last_conv": conv(1, 32, CLS_LAST_CH),
        "fc": {
            "w": rng.normal(0, 0.05, (CLS_LAST_CH, CLS_NUM_CLASSES)).astype(np.float32),
            "b": np.zeros((CLS_NUM_CLASSES,), np.float32),
        },
    }
