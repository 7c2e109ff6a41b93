"""Character dictionary handling for the CTC recognizer.

Reproduces CRNNRecognizer's dict construction (ocr_rec.h:82-84 /
ocr_rec.cpp ctor): read lines, insert blank "#" at index 0, append a single
space — yielding 6,625 classes for the bundled 6,623-line
ppocr_keys_v1.txt.
"""

from __future__ import annotations

from typing import List


def load_charset(path: str) -> List[str]:
    with open(path, "rb") as f:
        raw = f.read().decode("utf-8")
    lines = raw.split("\n")
    if lines and lines[-1] == "":
        lines = lines[:-1]
    labels = [line.rstrip("\r") for line in lines]
    return ["#"] + labels + [" "]
