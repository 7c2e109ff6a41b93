"""Read Paddle combined parameter files (``inference.pdiparams``).

Format (paddle SaveCombine / framework::SerializeToStream), one record per
persistable variable, concatenated in the program's persistable-var order:

    uint32  lod_version      (0)
    uint64  lod_level        (0 for parameters)
      [per level: uint64 nbytes + raw lod data — absent when lod_level==0]
    uint32  tensor_version   (0)
    int32   proto_len
    bytes   VarType.TensorDesc proto  (data_type=1, dims=2)
    bytes   raw tensor data  (prod(dims) * sizeof(dtype))

The reference loads this through paddle_infer::Config::SetModel
(/root/reference/src/ocr_det.cpp:34-39); here it becomes numpy arrays that
feed JAX pytrees.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

from .program import DTYPE_NAMES, ProgramDesc
from .protobuf import iter_fields, packed_varints, as_signed64

_NP_DTYPES = {
    "bool": np.bool_,
    "int16": np.int16,
    "int32": np.int32,
    "int64": np.int64,
    "float16": np.float16,
    "float32": np.float32,
    "float64": np.float64,
    "uint8": np.uint8,
    "int8": np.int8,
}


def _read_tensor(buf: bytes, pos: int) -> Tuple[np.ndarray, int]:
    (lod_version,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    if lod_version != 0:
        raise ValueError(f"unsupported LoD version {lod_version}")
    (lod_level,) = struct.unpack_from("<Q", buf, pos)
    pos += 8
    for _ in range(lod_level):
        (nbytes,) = struct.unpack_from("<Q", buf, pos)
        pos += 8 + nbytes
    (tensor_version,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    if tensor_version != 0:
        raise ValueError(f"unsupported tensor version {tensor_version}")
    (proto_len,) = struct.unpack_from("<i", buf, pos)
    pos += 4
    desc = buf[pos : pos + proto_len]
    pos += proto_len

    dtype_id, dims = 5, []
    for f, w, v in iter_fields(desc):
        if f == 1:
            dtype_id = v
        elif f == 2:
            dims.extend(packed_varints(v) if w == 2 else [as_signed64(v)])
    np_dtype = _NP_DTYPES[DTYPE_NAMES[dtype_id]]
    count = int(np.prod(dims)) if dims else 1
    nbytes = count * np.dtype(np_dtype).itemsize
    arr = np.frombuffer(buf[pos : pos + nbytes], dtype=np_dtype).reshape(dims)
    pos += nbytes
    return arr, pos


def read_combined_params(path: str) -> List[np.ndarray]:
    """Parse every tensor record in a ``.pdiparams`` file, in file order."""
    with open(path, "rb") as f:
        buf = f.read()
    out, pos = [], 0
    while pos < len(buf):
        arr, pos = _read_tensor(buf, pos)
        out.append(arr)
    return out


def load_params(program: ProgramDesc, params_path: str) -> Dict[str, np.ndarray]:
    """Map file tensors to var names using the program's persistable vars.

    Paddle writes combined params in ``sorted(var.name)`` order
    (paddle.static.io: get_program_persistable_vars + sort). We verify the
    shape sequence and fall back to program declaration order if sorted order
    mismatches.
    """
    tensors = read_combined_params(params_path)
    pvars = program.persistable_vars()
    if len(tensors) != len(pvars):
        raise ValueError(
            f"param count mismatch: file has {len(tensors)}, "
            f"program declares {len(pvars)} persistable vars"
        )

    def shapes_match(ordering) -> bool:
        for var, arr in zip(ordering, tensors):
            want = [d for d in (var.tensor.dims if var.tensor else [])]
            if list(arr.shape) != [d for d in want if d >= 0] and want:
                if list(arr.shape) != want:
                    return False
        return True

    by_name = sorted(pvars, key=lambda v: v.name)
    for ordering in (by_name, pvars):
        if shapes_match(ordering):
            return {v.name: t for v, t in zip(ordering, tensors)}
    raise ValueError("could not align param file tensors with program vars by shape")
