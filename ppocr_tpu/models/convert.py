"""Convert Paddle graph weights into the hand-written models' pytrees.

Walks the exported op graph in execution order, consuming parameter-carrying
ops into a token stream, and binds each token to the corresponding slot in
the structured NHWC param trees of det_db / cls_mv3 / rec_svtr. Binding is
validated by token KIND and by full-stream consumption (``assert_done``):
an op-sequence drift between the graph and the transcribed architecture
tables fails loudly here. Shape drift with an unchanged op sequence is NOT
checked at bind time — it is caught by the executor-vs-handwritten parity
tests (tests/test_models.py), which run both against the same graphs.

Weight layout transforms:
  conv  OIHW → HWIO          depthwise (C,1,k,k) → (k,k,1,C)
  convT (Cin,Cout,2,2) → (Cin,2,2,Cout)   (see layers.conv_transpose2x2)
  matmul weights are already (in, out) — unchanged.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from ..paddle_compat.program import ProgramDesc
from .cls_mv3 import CLS_BLOCKS
from .det_db import DET_BLOCKS
from .rec_svtr import REC_BLOCKS


class _Tokens:
    """Sequential reader over parameter-carrying ops of a program."""

    def __init__(self, program: ProgramDesc, params: Dict[str, np.ndarray]):
        self.params = params
        pset = set(params.keys())
        self.stream: List[Tuple[str, object]] = []
        for op in program.main_block.ops:
            t = op.type
            if t in ("conv2d", "depthwise_conv2d", "conv2d_transpose"):
                self.stream.append((t, op.input("Filter")[0]))
            elif t == "batch_norm":
                self.stream.append(
                    (
                        "bn",
                        (
                            op.input("Scale")[0],
                            op.input("Bias")[0],
                            op.input("Mean")[0],
                            op.input("Variance")[0],
                        ),
                    )
                )
            elif t == "layer_norm":
                self.stream.append(("ln", (op.input("Scale")[0], op.input("Bias")[0])))
            elif t == "matmul_v2":
                y = op.input("Y")[0]
                if y in pset:
                    self.stream.append(("matmul", y))
            elif t in ("elementwise_add", "elementwise_mul"):
                names = op.input("X") + op.input("Y")
                pnames = [n for n in names if n in pset]
                if pnames:
                    kind = "add" if t == "elementwise_add" else "mul"
                    self.stream.append((kind, pnames[0]))
        self.i = 0

    def take(self, kind: str) -> np.ndarray:
        got_kind, name = self.stream[self.i]
        if got_kind != kind:
            raise ValueError(
                f"token {self.i}: expected {kind}, got {got_kind} ({name})"
            )
        self.i += 1
        if kind == "bn":
            s, b, m, v = name
            return {
                "scale": self.params[s],
                "bias": self.params[b],
                "mean": self.params[m],
                "var": self.params[v],
            }
        if kind == "ln":
            s, b = name
            return {"scale": self.params[s], "bias": self.params[b]}
        return self.params[name]

    def conv(self, kind="conv2d") -> np.ndarray:
        w = self.take(kind)
        return np.ascontiguousarray(w.transpose(2, 3, 1, 0))  # OIHW → HWIO

    def lab(self) -> Dict:
        return {"s": self.take("mul"), "b": self.take("add")}

    def done(self) -> bool:
        return self.i == len(self.stream)

    def assert_done(self):
        if not self.done():
            raise ValueError(
                f"unconsumed tokens from {self.i}: "
                f"{self.stream[self.i:self.i+5]}"
            )


def _se(tk: _Tokens) -> Dict:
    return {
        "conv1": {"w": tk.conv(), "b": tk.take("add")},
        "conv2": {"w": tk.conv(), "b": tk.take("add")},
    }


def _lcnet_conv(tk: _Tokens, kind: str, act: bool) -> Dict:
    p = {"w": tk.conv(kind), "b": tk.take("add"), "lab1": tk.lab()}
    if act:
        p["lab2"] = tk.lab()
    return p


def convert_det_params(program: ProgramDesc, paddle_params: Dict) -> Dict:
    tk = _Tokens(program, paddle_params)
    backbone = {"stem": {"w": tk.conv(), "bn": tk.take("bn")}, "blocks": []}
    for cin, cout, k, s, has_se in DET_BLOCKS:
        blk = {"dw": _lcnet_conv(tk, "depthwise_conv2d", act=(s == 1))}
        if has_se:
            blk["se"] = _se(tk)
        blk["pw"] = _lcnet_conv(tk, "conv2d", act=True)
        backbone["blocks"].append(blk)

    fpn = {"reduce": [], "rse_in": [None] * 4, "rse_out": [None] * 4}
    for _ in range(4):
        fpn["reduce"].append({"w": tk.conv(), "b": tk.take("add")})
    for lvl in (3, 2, 1, 0):  # graph emits deepest level first
        fpn["rse_in"][lvl] = {"conv": {"w": tk.conv()}, "se": _se(tk)}
    for lvl in (3, 2, 1, 0):
        fpn["rse_out"][lvl] = {"conv": {"w": tk.conv()}, "se": _se(tk)}

    head = {
        "conv": {"w": tk.conv(), "bn": tk.take("bn")},
        "up1": {
            "w": np.ascontiguousarray(
                tk.take("conv2d_transpose").transpose(0, 2, 3, 1)
            ),
            "b": tk.take("add"),
            "bn": tk.take("bn"),
        },
        "up2": {
            "w": np.ascontiguousarray(
                tk.take("conv2d_transpose").transpose(0, 2, 3, 1)
            ),
            "b": tk.take("add"),
        },
    }
    tk.assert_done()
    return {"backbone": backbone, "fpn": fpn, "head": head}


def convert_cls_params(program: ProgramDesc, paddle_params: Dict) -> Dict:
    tk = _Tokens(program, paddle_params)

    def conv_bn(kind="conv2d"):
        return {"w": tk.conv(kind), "bn": tk.take("bn")}

    out = {"stem": conv_bn(), "blocks": []}
    for cin, cexp, cout, k, s, has_se, act in CLS_BLOCKS:
        blk = {"expand": conv_bn(), "dw": conv_bn("depthwise_conv2d")}
        if has_se:
            blk["se"] = _se(tk)
        blk["project"] = conv_bn()
        out["blocks"].append(blk)
    out["last_conv"] = conv_bn()
    out["fc"] = {"w": tk.take("matmul"), "b": tk.take("add")}
    tk.assert_done()
    return out


def convert_rec_params(program: ProgramDesc, paddle_params: Dict) -> Dict:
    tk = _Tokens(program, paddle_params)
    backbone = {"stem": {"w": tk.conv(), "bn": tk.take("bn")}, "blocks": []}
    for cin, cout, k, s, has_se in REC_BLOCKS:
        blk = {"dw": _lcnet_conv(tk, "depthwise_conv2d", act=True)}
        if has_se:
            blk["se"] = _se(tk)
        blk["pw"] = _lcnet_conv(tk, "conv2d", act=True)
        backbone["blocks"].append(blk)

    def conv_bn():
        return {"w": tk.conv(), "bn": tk.take("bn")}

    def fc():
        return {"w": tk.take("matmul"), "b": tk.take("add")}

    head = {"conv1": conv_bn(), "conv2": conv_bn(), "blocks": []}
    for _ in range(2):
        head["blocks"].append(
            {
                "norm1": tk.take("ln"),
                "qkv": fc(),
                "proj": fc(),
                "norm2": tk.take("ln"),
                "fc1": fc(),
                "fc2": fc(),
            }
        )
    head["norm"] = tk.take("ln")
    head["conv3"] = conv_bn()
    head["conv4"] = conv_bn()
    head["conv1x1"] = conv_bn()
    head["fc"] = fc()
    tk.assert_done()
    return {"backbone": backbone, "head": head}
