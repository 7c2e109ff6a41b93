"""Decode Paddle ``ProgramDesc`` graphs (``inference.pdmodel``) to Python.

Schema follows paddle/fluid/framework/framework.proto (public). Only the
fields the PP-OCR det/cls/rec graphs actually use are decoded. This replaces
the vendored 51 KLoC paddle_inference headers the reference links against
(see SURVEY.md L1; /root/reference/include/paddle_inference/).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

from .protobuf import (
    as_double,
    as_float,
    as_signed64,
    iter_fields,
    packed_varints,
)

# VarType.Type enum (framework.proto)
VT_BOOL = 0
VT_INT16 = 1
VT_INT32 = 2
VT_INT64 = 3
VT_FP16 = 4
VT_FP32 = 5
VT_FP64 = 6
VT_LOD_TENSOR = 7
VT_UINT8 = 20
VT_INT8 = 21
VT_BF16 = 22

DTYPE_NAMES = {
    VT_BOOL: "bool",
    VT_INT16: "int16",
    VT_INT32: "int32",
    VT_INT64: "int64",
    VT_FP16: "float16",
    VT_FP32: "float32",
    VT_FP64: "float64",
    VT_UINT8: "uint8",
    VT_INT8: "int8",
    VT_BF16: "bfloat16",
}

# OpDesc.Attr.AttrType enum
AT_INT = 0
AT_FLOAT = 1
AT_STRING = 2
AT_INTS = 3
AT_FLOATS = 4
AT_STRINGS = 5
AT_BOOLEAN = 6
AT_BOOLEANS = 7
AT_BLOCK = 8
AT_LONG = 9
AT_BLOCKS = 10
AT_LONGS = 11
AT_FLOAT64S = 12
AT_VAR = 13
AT_VARS = 14
AT_FLOAT64 = 15
AT_SCALAR = 16
AT_SCALARS = 17


@dataclass
class TensorDesc:
    dtype: int = VT_FP32
    dims: List[int] = field(default_factory=list)

    @property
    def dtype_name(self) -> str:
        return DTYPE_NAMES.get(self.dtype, f"vt{self.dtype}")


@dataclass
class VarDesc:
    name: str = ""
    vtype: int = VT_LOD_TENSOR
    tensor: Optional[TensorDesc] = None
    persistable: bool = False


# sentinel for attr types the decoder does not handle (VAR/VARS/SCALAR(S));
# OpDesc.attr raises on access so they cannot masquerade as defaults
UNSUPPORTED_ATTR = object()


@dataclass
class OpDesc:
    type: str = ""
    inputs: Dict[str, List[str]] = field(default_factory=dict)
    outputs: Dict[str, List[str]] = field(default_factory=dict)
    attrs: Dict[str, object] = field(default_factory=dict)

    def input(self, key: str) -> List[str]:
        return self.inputs.get(key, [])

    def output(self, key: str) -> List[str]:
        return self.outputs.get(key, [])

    def attr(self, key: str, default=None):
        val = self.attrs.get(key, default)
        if val is UNSUPPORTED_ATTR:
            # fail loudly: an attr of an un-decoded type (VAR/SCALAR/…)
            # must not silently become the caller's default — that flips
            # op semantics with no error (review r3)
            raise NotImplementedError(
                f"op '{self.type}' attr '{key}' uses an attr type this "
                "decoder does not support (VAR/VARS/SCALAR(S))"
            )
        return val


@dataclass
class BlockDesc:
    idx: int = 0
    parent_idx: int = -1
    vars: Dict[str, VarDesc] = field(default_factory=dict)
    var_order: List[str] = field(default_factory=list)
    ops: List[OpDesc] = field(default_factory=list)


@dataclass
class ProgramDesc:
    blocks: List[BlockDesc] = field(default_factory=list)
    version: int = 0

    @property
    def main_block(self) -> BlockDesc:
        return self.blocks[0]

    def persistable_vars(self) -> List[VarDesc]:
        """Persistable tensors saved in the combined params file.

        feed (9) / fetch (10) / RAW (17) vars are marked persistable in the
        program but are never serialized by save_combine.
        """
        blk = self.main_block
        return [
            blk.vars[n]
            for n in blk.var_order
            if blk.vars[n].persistable and blk.vars[n].vtype not in (9, 10, 17)
        ]

    def feed_names(self) -> List[str]:
        """Feed targets ordered by the ops' 'col' attr — the authoritative
        slot index (file order usually agrees, but is not the contract)."""
        feeds = [op for op in self.main_block.ops if op.type == "feed"]
        feeds.sort(key=lambda op: int(op.attr("col", 0)))
        return [op.output("Out")[0] for op in feeds]

    def fetch_names(self) -> List[str]:
        fetches = [op for op in self.main_block.ops if op.type == "fetch"]
        fetches.sort(key=lambda op: int(op.attr("col", 0)))
        return [op.input("X")[0] for op in fetches]


def _parse_tensor_desc(buf: bytes) -> TensorDesc:
    td = TensorDesc()
    for f, w, v in iter_fields(buf):
        if f == 1:  # data_type
            td.dtype = v
        elif f == 2:  # dims (int64, may be packed or repeated)
            if w == 2:
                td.dims.extend(packed_varints(v))
            else:
                td.dims.append(as_signed64(v))
    return td


def _parse_var_type(buf: bytes) -> (int, Optional[TensorDesc]):
    vtype, tensor = VT_LOD_TENSOR, None
    for f, w, v in iter_fields(buf):
        if f == 1:  # type
            vtype = v
        elif f == 3:  # lod_tensor: LoDTensorDesc{ tensor=1, lod_level=2 }
            for f2, _, v2 in iter_fields(v):
                if f2 == 1:
                    tensor = _parse_tensor_desc(v2)
        elif f == 2:  # selected_rows TensorDesc
            tensor = _parse_tensor_desc(v)
    return vtype, tensor


def _parse_var(buf: bytes) -> VarDesc:
    var = VarDesc()
    for f, _, v in iter_fields(buf):
        if f == 1:
            var.name = v.decode("utf-8")
        elif f == 2:
            var.vtype, var.tensor = _parse_var_type(v)
        elif f == 3:
            var.persistable = bool(v)
    return var


def _parse_op_var(buf: bytes) -> (str, List[str]):
    param, args = "", []
    for f, _, v in iter_fields(buf):
        if f == 1:
            param = v.decode("utf-8")
        elif f == 2:
            args.append(v.decode("utf-8"))
    return param, args


def _parse_attr(buf: bytes) -> (str, object):
    name, atype = "", None
    ints: List[int] = []
    floats: List[float] = []
    strings: List[str] = []
    bools: List[bool] = []
    longs: List[int] = []
    f64s: List[float] = []
    scalar_i = scalar_f = scalar_s = scalar_b = None
    block_idx = None
    scalar_l = None
    for f, w, v in iter_fields(buf):
        if f == 1:
            name = v.decode("utf-8")
        elif f == 2:
            atype = v
        elif f == 3:
            scalar_i = as_signed64(v)
        elif f == 4:
            scalar_f = as_float(v)
        elif f == 5:
            scalar_s = v.decode("utf-8", "replace")
        elif f == 6:
            ints.extend(packed_varints(v) if w == 2 else [as_signed64(v)])
        elif f == 7:
            if w == 2:
                floats.extend(
                    as_float(int.from_bytes(v[i : i + 4], "little"))
                    for i in range(0, len(v), 4)
                )
            else:
                floats.append(as_float(v))
        elif f == 8:
            strings.append(v.decode("utf-8", "replace"))
        elif f == 10:
            scalar_b = bool(v)
        elif f == 11:
            bools.extend(bool(x) for x in (packed_varints(v) if w == 2 else [v]))
        elif f == 12:
            block_idx = v
        elif f == 13:
            scalar_l = as_signed64(v)
        elif f == 15:
            longs.extend(packed_varints(v) if w == 2 else [as_signed64(v)])
        elif f == 16:
            if w == 2:
                f64s.extend(
                    as_double(int.from_bytes(v[i : i + 8], "little"))
                    for i in range(0, len(v), 8)
                )
            else:
                f64s.append(as_double(v))
        elif f == 17:
            scalar_f = as_double(v)

    if atype == AT_INT:
        return name, scalar_i
    if atype == AT_FLOAT or atype == AT_FLOAT64:
        return name, scalar_f
    if atype == AT_STRING:
        return name, scalar_s
    if atype == AT_INTS:
        return name, ints
    if atype == AT_FLOATS:
        return name, floats
    if atype == AT_STRINGS:
        return name, strings
    if atype == AT_BOOLEAN:
        return name, scalar_b
    if atype == AT_BOOLEANS:
        return name, bools
    if atype == AT_BLOCK:
        return name, block_idx
    if atype == AT_LONG:
        return name, scalar_l
    if atype == AT_LONGS:
        return name, longs
    if atype == AT_FLOAT64S:
        return name, f64s
    # VAR/VARS/SCALAR(S) unused by PP-OCR graphs; marked so OpDesc.attr
    # raises on access instead of shadowing the caller's default
    return name, UNSUPPORTED_ATTR


def _parse_op(buf: bytes) -> OpDesc:
    op = OpDesc()
    for f, _, v in iter_fields(buf):
        if f == 1:
            p, args = _parse_op_var(v)
            op.inputs[p] = args
        elif f == 2:
            p, args = _parse_op_var(v)
            op.outputs[p] = args
        elif f == 3:
            op.type = v.decode("utf-8")
        elif f == 4:
            name, val = _parse_attr(v)
            op.attrs[name] = val
    return op


def _parse_block(buf: bytes) -> BlockDesc:
    blk = BlockDesc()
    for f, _, v in iter_fields(buf):
        if f == 1:
            blk.idx = v
        elif f == 2:
            blk.parent_idx = v
        elif f == 3:
            var = _parse_var(v)
            blk.vars[var.name] = var
            blk.var_order.append(var.name)
        elif f == 4:
            blk.ops.append(_parse_op(v))
    return blk


def parse_program(data: bytes) -> ProgramDesc:
    prog = ProgramDesc()
    for f, _, v in iter_fields(data):
        if f == 1:
            prog.blocks.append(_parse_block(v))
        elif f == 4:  # Version { version = 1 }
            for f2, _, v2 in iter_fields(v):
                if f2 == 1:
                    prog.version = as_signed64(v2)
    if not prog.blocks:
        raise ValueError("no blocks decoded — not a ProgramDesc?")
    return prog


def load_program(path: str) -> ProgramDesc:
    with open(path, "rb") as f:
        return parse_program(f.read())
