"""End-to-end multi-class accuracy gates (VERDICT r2 missing #1).

Round 2's trained-weight gates were digit-only: 10 of the 6,625 CTC classes
had ever seen supervision, so charset indexing at scale, inter-class
confusion behavior, and the wide-softmax path were untested with trained
weights. These gates use weights trained on the PIL/DejaVu synthetic stack
(scripts/train_synthetic_{det,rec}.py --alphabet ascii|full):

  * det: one text detector trained on full-alphabet scenes (class-agnostic);
  * rec: printable-ASCII (94 classes + space) and full DejaVu-coverable
    (~218 classes) recognizers — both trained against the FULL 6,625-way
    head, with class indices scattered across it ('0'→26, '~'→4128,
    'a'→4544, …) so an off-by-one anywhere in charset indexing garbles
    text instead of passing silently.

Reference parity targets: the 6,623-entry dict + blank/space insertion
(ocr_rec.h:82-84), greedy CTC keep rules (ocr_rec.cpp:97-128).
"""

import pathlib
import shutil

import numpy as np
import pytest

from ppocr_tpu.pipeline import OCREngine, OCRWorker
from ppocr_tpu.pipeline.config import DetConfig, PipelineConfig, RecConfig
from ppocr_tpu.train.synthetic import text_scene_dataset

WEIGHTS = pathlib.Path(__file__).parent.parent / "weights"
DET_W = WEIGHTS / "det_synthetic_text.npz"
REC_ASCII_W = WEIGHTS / "rec_scene_ascii.npz"
REC_FULL_W = WEIGHTS / "rec_scene_full.npz"

needs_ascii = pytest.mark.skipif(
    not (DET_W.exists() and REC_ASCII_W.exists()),
    reason="bundled ascii trained weights not present",
)
needs_full = pytest.mark.skipif(
    not (DET_W.exists() and REC_FULL_W.exists()),
    reason="bundled full-charset trained weights not present",
)


def _cfg(**kw):
    return PipelineConfig(
        det=DetConfig(
            limit_type="max",
            limit_side_len=96,
            thresh=0.2,
            box_thresh=0.4,
            unclip_ratio=1.8,
            score_mode="fast",
            shape_buckets=(64, 96),
        ),
        rec=RecConfig(batch_num=4, img_h=48, img_w=256, width_buckets=(256,)),
        enable_cls=False,
        dtype="float32",
        **kw,
    )


def _model_dir(tmp_path_factory, reference_models, rec_weights):
    md = tmp_path_factory.mktemp("trained_text_models")
    for name in ("det", "cls", "rec"):
        (md / name).mkdir()
        shutil.copy(
            reference_models / name / "inference.pdmodel",
            md / name / "inference.pdmodel",
        )
    shutil.copy(
        reference_models / "rec" / "ppocr_keys_v1.txt",
        md / "rec" / "ppocr_keys_v1.txt",
    )
    shutil.copy(DET_W, md / "det" / "weights.npz")
    shutil.copy(rec_weights, md / "rec" / "weights.npz")
    return md


@pytest.fixture(scope="module")
def ascii_model_dir(tmp_path_factory, reference_models):
    if not (DET_W.exists() and REC_ASCII_W.exists()):
        pytest.skip("ascii weights absent")
    return _model_dir(tmp_path_factory, reference_models, REC_ASCII_W)


@pytest.fixture(scope="module")
def full_model_dir(tmp_path_factory, reference_models):
    if not (DET_W.exists() and REC_FULL_W.exists()):
        pytest.skip("full weights absent")
    return _model_dir(tmp_path_factory, reference_models, REC_FULL_W)


def _score(worker, mode, n_scenes, seed):
    """(exact, total, det_found, det_gt) over held-out rendered scenes
    drawn from the SAME canonical distribution the weights trained on
    (train.synthetic.text_scene_dataset) at held-out seeds."""
    ds = text_scene_dataset(mode, seed=seed)
    total = exact = det_found = det_gt = 0
    misses = []
    for s in range(n_scenes):
        scene, placed = ds.sample_scene()
        r = worker.process(scene, s)
        assert r["success"] is True
        det_gt += len(placed)
        det_found += len(r["words"])
        for t, (x0, y0, x1, y1) in placed:
            best, biou = None, 0.2
            for word in r["words"]:
                bx = np.array(word["box"])
                wx0, wy0 = bx.min(0)
                wx1, wy1 = bx.max(0)
                ix0, iy0 = max(x0, wx0), max(y0, wy0)
                ix1, iy1 = min(x1, wx1), min(y1, wy1)
                inter = max(0, ix1 - ix0) * max(0, iy1 - iy0)
                ua = (x1 - x0) * (y1 - y0) + (wx1 - wx0) * (wy1 - wy0) - inter
                v = inter / ua if ua > 0 else 0.0
                if v > biou:
                    biou, best = v, word
            total += 1
            if best is not None and best["text"] == t:
                exact += 1
            else:
                misses.append((t, best["text"] if best else None))
    return exact, total, det_found, det_gt, misses


@needs_ascii
class TestAsciiGates:
    def test_staged_pipeline_reads_ascii(self, ascii_model_dir):
        """≥95% exact line match over held-out printable-ASCII scenes
        through the staged parity path (det → boundingRect crop → rec)."""
        eng = OCREngine(str(ascii_model_dir), _cfg())
        assert eng.random_weights == {"det": False, "rec": False}
        exact, total, det_found, det_gt, misses = _score(
            OCRWorker(eng, 0), "ascii", 14, 31337
        )
        assert det_found >= det_gt - 1, (det_found, det_gt)
        assert total >= 20
        assert exact / total >= 0.95, f"{exact}/{total}; misses: {misses}"

    def test_fused_pipeline_reads_ascii(self, ascii_model_dir):
        """Same gate through the single-dispatch fused path."""
        cfg = _cfg(fast_path=True, fused_max_boxes=8)
        cfg.det.shape_buckets = (96,)
        eng = OCREngine(str(ascii_model_dir), cfg)
        exact, total, det_found, det_gt, misses = _score(
            OCRWorker(eng, 0), "ascii", 14, 31337
        )
        assert det_found >= det_gt - 1, (det_found, det_gt)
        assert exact / total >= 0.95, f"{exact}/{total}; misses: {misses}"

    def test_wide_head_indices_actually_used(self, ascii_model_dir):
        """The decoded classes span the head far beyond the digit block —
        the regression this file exists to catch (index arithmetic above
        class ~35 was previously never exercised with trained weights)."""
        eng = OCREngine(str(ascii_model_dir), _cfg())
        worker = OCRWorker(eng, 0)
        ds = text_scene_dataset("ascii", seed=99)
        char_to_idx = {c: i for i, c in enumerate(eng.charset)}
        seen = set()
        for s in range(6):
            scene, _ = ds.sample_scene()
            r = worker.process(scene, s)
            for w in r["words"]:
                seen.update(char_to_idx[c] for c in w["text"] if c in char_to_idx)
        assert max(seen, default=0) > 4000, sorted(seen)[-5:]


@needs_ascii
class TestWideLineGate:
    def test_wide_banner_reads_exactly_with_raised_cap(self, ascii_model_dir):
        """A ~24-char banner whose crop aspect (~13:1) exceeds the default
        fused cap (2× → ≈10.7:1 at img_w 256) must read back exactly with
        fused_width_mult=4 — the no-squash proof for the raised width tier
        (VERDICT r2 weak #5). The staged path (bucketed width, cap 1024)
        reads it too; the two must agree."""
        from PIL import Image, ImageDraw

        from ppocr_tpu.train.synthetic import PILTextRenderer

        # no O/0, l/1/I pairs: glyph-ambiguous chars would test the font,
        # not the width cap
        text = "W4ke5Tur8em"
        r = PILTextRenderer(sizes=(24,))
        font = r._fonts[(r.paths[0], 24)]
        dx0, dy0, dx1, dy1 = r.measure(text, font)
        tw, th = dx1 - dx0, dy1 - dy0
        img = Image.new("RGB", (tw + 12, th + 8), (255, 255, 255))
        ImageDraw.Draw(img).text(
            (6 - dx0, 4 - dy0), text, font=font, fill=(0, 0, 0)
        )
        banner = np.asarray(img)
        # the banner fits inside the det limit → NO det downscale, so the
        # fused crop (sampled from the det-scale canvas — PARITY.md) keeps
        # full glyph resolution and the test isolates the WIDTH CAP:
        # with rec.img_w = 96 the default 2× cap is 192 px (aspect 4),
        # below this crop's aspect; mult 4 (384 px) holds it un-squashed
        aspect = banner.shape[1] / banner.shape[0]
        assert 4.0 < aspect < 8.0, aspect

        def wide_cfg(**kw):
            cfg = _cfg(**kw)
            cfg.det.limit_side_len = 192
            cfg.det.shape_buckets = (64, 192)
            cfg.rec.img_w = 96
            return cfg

        cfg_staged = wide_cfg()
        cfg_staged.rec.width_buckets = (96, 192, 256)
        staged = OCRWorker(
            OCREngine(str(ascii_model_dir), cfg_staged), 0
        ).process(banner, 1)
        staged_texts = [w["text"] for w in staged["words"]]

        cfg_wide = wide_cfg(fast_path=True, fused_max_boxes=8)
        cfg_wide.fused_width_mult = 4
        fused = OCRWorker(
            OCREngine(str(ascii_model_dir), cfg_wide), 0
        ).process(banner, 2)
        fused_texts = [w["text"] for w in fused["words"]]

        assert staged_texts == [text], staged_texts
        assert fused_texts == [text], fused_texts


# misreads inside a DejaVu homoglyph family are irreducible from pixels
# alone, so the full-charset gates score both raw exactness and exactness
# up to homoglyphs (families defined once in train.synthetic.HOMOGLYPHS)
from ppocr_tpu.train.synthetic import homoglyph_normalize as _homo


@needs_full
class TestFullCharsetGates:
    def test_staged_pipeline_reads_full_charset(self, full_model_dir):
        """~218-class alphabet (ASCII + Greek/Cyrillic/Latin-1/symbols):
        ≥75% raw exact and ≥82% homoglyph-normalized exact line match.
        (Measured at pinning: 22/27 raw; misses were l↔I, ō↔ǒ, and a det
        merge of two adjacent lines — glyph-ambiguity dominated.)"""
        eng = OCREngine(str(full_model_dir), _cfg())
        exact, total, det_found, det_gt, misses = _score(
            OCRWorker(eng, 0), "full", 14, 4242
        )
        assert det_found >= det_gt - 2, (det_found, det_gt)
        assert total >= 20
        assert exact / total >= 0.75, f"{exact}/{total}; misses: {misses}"
        norm_exact = exact + sum(
            1 for t, p in misses if p is not None and _homo(t) == _homo(p)
        )
        assert norm_exact / total >= 0.82, (
            f"{norm_exact}/{total} normalized; misses: {misses}"
        )

    def test_fused_pipeline_reads_full_charset(self, full_model_dir):
        cfg = _cfg(fast_path=True, fused_max_boxes=8)
        cfg.det.shape_buckets = (96,)
        eng = OCREngine(str(full_model_dir), cfg)
        exact, total, det_found, det_gt, misses = _score(
            OCRWorker(eng, 0), "full", 14, 4242
        )
        assert det_found >= det_gt - 2, (det_found, det_gt)
        assert exact / total >= 0.75, f"{exact}/{total}; misses: {misses}"
        norm_exact = exact + sum(
            1 for t, p in misses if p is not None and _homo(t) == _homo(p)
        )
        assert norm_exact / total >= 0.82, (
            f"{norm_exact}/{total} normalized; misses: {misses}"
        )
