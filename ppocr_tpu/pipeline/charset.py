"""Character dictionary handling for the CTC recognizer.

Reproduces CRNNRecognizer's dict construction (ocr_rec.h:82-84 /
ocr_rec.cpp ctor): read lines, insert blank "#" at index 0, append a single
space — yielding 6,625 classes for the bundled 6,623-line
ppocr_keys_v1.txt.

Documented deviations from the reference's byte-opaque std::getline
reader (harmless-bug fixes per the repo parity rules):

* trailing ``\r`` is stripped, so a CRLF-authored dict does not leak a
  carriage return into every recognized label (the reference emits it);
* the file must be valid UTF-8 — the reference would serve undecodable
  legacy encodings (GBK etc.) as opaque byte strings, which this JSON
  service could not serialize anyway, so a bad encoding fails at load
  with a clear UnicodeDecodeError instead of mid-request.
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
