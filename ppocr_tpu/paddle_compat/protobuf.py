"""Minimal protobuf wire-format reader (no generated code, no protoc).

Paddle inference artifacts (`inference.pdmodel`) are serialized
``paddle.framework.proto.ProgramDesc`` messages. We do not ship Paddle or its
proto schema; instead this module implements just enough of the protobuf wire
format (varint / 64-bit / length-delimited / 32-bit) to let
:mod:`ppocr_tpu.paddle_compat.program` decode the handful of message types the
PP-OCR graphs use.

Reference: the graphs consumed by /root/reference/src/ocr_det.cpp:23-91 (and
cls/rec equivalents) via paddle_infer::CreatePredictor; here they are decoded
in pure Python.
"""

from __future__ import annotations

import struct
from typing import Iterator, Tuple

WIRE_VARINT = 0
WIRE_64BIT = 1
WIRE_LEN = 2
WIRE_32BIT = 5


def read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    """Decode a base-128 varint at ``pos``; returns (value, new_pos)."""
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long / corrupt buffer")


def iter_fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Iterate (field_number, wire_type, raw_value) over a message buffer.

    LEN fields yield ``bytes``; VARINT yields ``int``; 64/32-bit yield the raw
    little-endian integer (callers reinterpret as double/float if needed).
    """
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = read_varint(buf, pos)
        field, wire = key >> 3, key & 0x7
        if wire == WIRE_VARINT:
            val, pos = read_varint(buf, pos)
        elif wire == WIRE_64BIT:
            val = int.from_bytes(buf[pos : pos + 8], "little")
            pos += 8
        elif wire == WIRE_LEN:
            ln, pos = read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wire == WIRE_32BIT:
            val = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire} at {pos}")
        yield field, wire, val


def as_float(raw: int) -> float:
    return struct.unpack("<f", raw.to_bytes(4, "little"))[0]


def as_double(raw: int) -> float:
    return struct.unpack("<d", raw.to_bytes(8, "little"))[0]


def as_signed64(v: int) -> int:
    """Protobuf int64/int32 varints are two's-complement in 64 bits."""
    return v - (1 << 64) if v >= (1 << 63) else v


def packed_varints(raw: bytes) -> list:
    out = []
    pos = 0
    while pos < len(raw):
        v, pos = read_varint(raw, pos)
        out.append(as_signed64(v))
    return out
