"""PP-OCRv4 mobile text detector: PP-LCNet backbone + RSE-FPN + DB head.

Hand-written NHWC JAX implementation of the network in
/root/reference/models/det/inference.pdmodel (PP-LCNetV3-style backbone with
learnable-affine blocks, channel-pruned RSE-FPN, differentiable-binarization
head ending in sigmoid — SURVEY.md §2.2). Architecture constants below are
transcribed from the exported graph (scripts/dump_arch.py), including the
pruned FPN reduction widths.

Input:  [N, H, W, 3] normalized image (H, W multiples of 32).
Output: [N, H, W] text probability map in [0, 1].
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .layers import (
    batch_norm,
    conv2d,
    conv_transpose2x2,
    hard_swish,
    lab,
    se_module,
)

# (c_in, c_out, dw_kernel, stride, has_se); dw activation only when stride==1
DET_BLOCKS: List[Tuple[int, int, int, int, bool]] = [
    (16, 32, 3, 1, False),
    (32, 48, 3, 2, False),
    (48, 48, 3, 1, False),  # → FPN tap c2 (/4, 48ch)
    (48, 96, 3, 2, False),
    (96, 96, 3, 1, False),  # → FPN tap c3 (/8, 96ch)
    (96, 192, 3, 2, False),
    (192, 192, 5, 1, False),
    (192, 192, 5, 1, False),
    (192, 192, 5, 1, False),
    (192, 192, 5, 1, False),  # → FPN tap c4 (/16, 192ch)
    (192, 384, 5, 2, True),
    (384, 384, 5, 1, True),
    (384, 384, 5, 1, False),
    (384, 384, 5, 1, False),  # → FPN tap c5 (/32, 384ch)
]
DET_TAPS = (2, 4, 9, 13)
FPN_IN_CHANNELS = (48, 96, 192, 384)
# channel-pruned widths of the FPN reduction convs (from the exported graph)
FPN_REDUCED = (12, 18, 42, 360)
FPN_CH = 96
FPN_OUT_CH = 24
SE_REDUCTION = 4


def _lcnet_conv(x, p: Dict, k: int, stride: int, groups: int, act: bool):
    """conv + bias + LAB, optionally followed by hard_swish + LAB — the
    PP-LCNetV3 conv unit as exported (graph wraps every conv this way)."""
    pad = ((k // 2, k // 2), (k // 2, k // 2))
    x = conv2d(x, p["w"], (stride, stride), pad, groups, p["b"])
    x = lab(x, p["lab1"])
    if act:
        x = hard_swish(x)
        x = lab(x, p["lab2"])
    return x


def det_backbone(params: Dict, x: jnp.ndarray) -> List[jnp.ndarray]:
    """Stem + 14 depthwise-separable blocks; returns the 4 FPN taps."""
    p = params["stem"]
    x = conv2d(x, p["w"], (2, 2), ((1, 1), (1, 1)))
    x = batch_norm(x, p["bn"])
    taps = []
    for i, (cin, cout, k, s, has_se) in enumerate(DET_BLOCKS):
        bp = params["blocks"][i]
        x = _lcnet_conv(x, bp["dw"], k, s, groups=cin, act=(s == 1))
        if has_se:
            # backbone SEs use hard_sigmoid slope 1/6 (FPN ones use 0.2)
            x = se_module(x, bp["se"], slope=1.0 / 6.0)
        x = _lcnet_conv(x, bp["pw"], 1, 1, groups=1, act=True)
        if i in DET_TAPS:
            taps.append(x)
    return taps


def rse_fpn(params: Dict, taps: List[jnp.ndarray]) -> jnp.ndarray:
    """Residual squeeze-excite FPN (db_fpn.py RSE-FPN re-designed for NHWC):
    per-level channel reduction → 1×1 to 96 with SE residual → top-down adds
    → 3×3 to 24 with SE residual → upsample all to /4 → concat(=96ch)."""

    def rse(x, p, k):
        pad = ((k // 2, k // 2), (k // 2, k // 2))
        y = conv2d(x, p["conv"]["w"], (1, 1), pad)
        return se_module(y, p["se"]) + y

    # per-level: pruned reduction conv (with bias), then RSE to FPN_CH
    ins = []
    for i, t in enumerate(taps):
        r = conv2d(t, params["reduce"][i]["w"], bias=params["reduce"][i]["b"])
        ins.append(r)
    feats = [rse(ins[i], params["rse_in"][i], k=1) for i in range(4)]

    def up2(x):
        return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)

    # top-down pathway (deepest /32 → /4)
    feats[2] = feats[2] + up2(feats[3])
    feats[1] = feats[1] + up2(feats[2])
    feats[0] = feats[0] + up2(feats[1])

    outs = [rse(feats[i], params["rse_out"][i], k=3) for i in range(4)]
    h, w = outs[0].shape[1], outs[0].shape[2]
    scaled = [
        jnp.repeat(jnp.repeat(outs[i], 2**i, axis=1), 2**i, axis=2)
        for i in range(3, 0, -1)
    ] + [outs[0]]
    return jnp.concatenate(scaled, axis=-1)  # [N, H/4, W/4, 96]


def db_head(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """binarize branch: 3×3 conv + BN + relu → ×2 transposed conv + BN +
    relu → ×2 transposed conv → sigmoid (ocr_det.cpp consumes only this
    probability map; the training-time threshold branch is not exported)."""
    x = conv2d(x, params["conv"]["w"], (1, 1), ((1, 1), (1, 1)))
    x = jax.nn.relu(batch_norm(x, params["conv"]["bn"]))
    x = conv_transpose2x2(x, params["up1"]["w"], params["up1"]["b"])
    x = jax.nn.relu(batch_norm(x, params["up1"]["bn"]))
    x = conv_transpose2x2(x, params["up2"]["w"], params["up2"]["b"])
    return jax.nn.sigmoid(x.astype(jnp.float32))[..., 0]


def det_forward(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """[N,H,W,3] normalized → [N,H,W] probability map."""
    taps = det_backbone(params["backbone"], x)
    fused = rse_fpn(params["fpn"], taps)
    return db_head(params["head"], fused)


# ---------------------------------------------------------------------------
# parameter construction


def _conv_init(rng, k, cin, cout, groups=1, bias=True, lab2=False):
    fan_in = k * k * (cin // groups)
    p = {
        "w": rng.normal(0, (2.0 / fan_in) ** 0.5, (k, k, cin // groups, cout)).astype(
            np.float32
        ),
        "b": np.zeros((cout,), np.float32),
        "lab1": {"s": np.ones((1,), np.float32), "b": np.zeros((1,), np.float32)},
    }
    if lab2:
        p["lab2"] = {"s": np.ones((1,), np.float32), "b": np.zeros((1,), np.float32)}
    if not bias:
        del p["b"]
    return p


def _bn_init(c):
    return {
        "scale": np.ones((c,), np.float32),
        "bias": np.zeros((c,), np.float32),
        "mean": np.zeros((c,), np.float32),
        "var": np.ones((c,), np.float32),
    }


def _se_init(rng, c, reduction=SE_REDUCTION):
    mid = c // reduction
    return {
        "conv1": {
            "w": rng.normal(0, (2.0 / c) ** 0.5, (1, 1, c, mid)).astype(np.float32),
            "b": np.zeros((mid,), np.float32),
        },
        "conv2": {
            "w": rng.normal(0, (2.0 / mid) ** 0.5, (1, 1, mid, c)).astype(np.float32),
            "b": np.zeros((c,), np.float32),
        },
    }


def init_det_params(seed: int = 0) -> Dict:
    """Deterministic random init with the exact shapes of the exported graph
    (stand-in until converted real weights are supplied; also the starting
    point for training)."""
    rng = np.random.default_rng(seed)
    backbone = {
        "stem": {
            "w": rng.normal(0, (2.0 / 27) ** 0.5, (3, 3, 3, 16)).astype(np.float32),
            "bn": _bn_init(16),
        },
        "blocks": [],
    }
    for cin, cout, k, s, has_se in DET_BLOCKS:
        blk = {
            "dw": _conv_init(rng, k, cin, cin, groups=cin, lab2=(s == 1)),
            "pw": _conv_init(rng, 1, cin, cout, lab2=True),
        }
        if has_se:
            blk["se"] = _se_init(rng, cin)
        backbone["blocks"].append(blk)

    fpn = {
        "reduce": [
            {
                "w": rng.normal(0, (2.0 / c) ** 0.5, (1, 1, c, r)).astype(np.float32),
                "b": np.zeros((r,), np.float32),
            }
            for c, r in zip(FPN_IN_CHANNELS, FPN_REDUCED)
        ],
        "rse_in": [
            {
                "conv": {
                    "w": rng.normal(0, (2.0 / r) ** 0.5, (1, 1, r, FPN_CH)).astype(
                        np.float32
                    )
                },
                "se": _se_init(rng, FPN_CH),
            }
            for r in FPN_REDUCED
        ],
        "rse_out": [
            {
                "conv": {
                    "w": rng.normal(
                        0, (2.0 / (9 * FPN_CH)) ** 0.5, (3, 3, FPN_CH, FPN_OUT_CH)
                    ).astype(np.float32)
                },
                "se": _se_init(rng, FPN_OUT_CH),
            }
            for _ in range(4)
        ],
    }
    head = {
        "conv": {
            "w": rng.normal(0, (2.0 / (9 * 96)) ** 0.5, (3, 3, 96, 24)).astype(
                np.float32
            ),
            "bn": _bn_init(24),
        },
        "up1": {
            "w": rng.normal(0, 0.2, (24, 2, 2, 24)).astype(np.float32),
            "b": np.zeros((24,), np.float32),
            "bn": _bn_init(24),
        },
        "up2": {
            "w": rng.normal(0, 0.2, (24, 2, 2, 1)).astype(np.float32),
            "b": np.zeros((1,), np.float32),
        },
    }
    return {"backbone": backbone, "fpn": fpn, "head": head}
