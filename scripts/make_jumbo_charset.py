"""Generate the pinned jumbo-charset artifacts from the DejaVu fonts:

    python scripts/make_jumbo_charset.py

writes
  * ``weights/jumbo_keys.txt``       — ~5,000-char charset body (one char
    per line, ppocr_keys_v1.txt convention: the loader adds blank '#' at 0
    and a trailing space, ocr_rec.h:82-84);
  * ``weights/jumbo_homoglyphs.txt`` — one pixel-identical render family
    per line (representative first), plus the curated near-identical
    HOMOGLYPHS merged in.

Both are deterministic functions of the fonts; regenerating on the same
box is a no-op diff. The jumbo charset exists to exercise CTC decoding,
charset indexing and inter-class confusion at the REFERENCE's class-count
scale (6,623-entry dict) — its CJK bulk has no coverable font here, so the
jumbo charset is a different ~5,000 codepoints served through the
custom-charset bundle path (train/finetune.py export convention).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ppocr_tpu.train.synthetic import (  # noqa: E402
    JUMBO_HOMOGLYPHS_FILE,
    JUMBO_KEYS_FILE,
    build_jumbo_alphabet,
    render_glyph_families,
)


def main() -> int:
    alpha = build_jumbo_alphabet()
    fams = render_glyph_families(alpha)
    with open(JUMBO_KEYS_FILE, "w", encoding="utf-8") as f:
        for c in alpha:
            f.write(c + "\n")
    with open(JUMBO_HOMOGLYPHS_FILE, "w", encoding="utf-8") as f:
        for fam in fams:
            f.write(fam + "\n")
    in_fams = sum(len(f) for f in fams)
    print(
        f"jumbo charset: {len(alpha)} chars -> {JUMBO_KEYS_FILE}\n"
        f"families: {len(fams)} multi-member ({in_fams} chars; "
        f"{len(alpha) - in_fams + len(fams)} distinguishable classes) "
        f"-> {JUMBO_HOMOGLYPHS_FILE}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
