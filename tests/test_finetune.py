"""Recognizer fine-tuning recipe (train.finetune): label-file loader,
charset tools, CTC-head surgery, checkpoint rotation, serving bundle."""

import os

import numpy as np
import pytest

from ppocr_tpu.train.finetune import (
    FinetuneDataset,
    build_charset,
    charset_classes,
    read_label_file,
    reinit_ctc_head,
    write_charset,
)


@pytest.fixture(scope="module")
def crop_dir(tmp_path_factory):
    """Tiny labeled dataset: rendered lines over a 6-char alphabet."""
    import cv2

    from ppocr_tpu.train.synthetic import render_line

    root = tmp_path_factory.mktemp("ft_data")
    rng = np.random.default_rng(5)
    texts = ["AB1", "C2A", "31C", "BBA2", "1A", "C3"]
    lines = []
    for i, t in enumerate(texts):
        img = render_line(t, 48, 96, rng)
        cv2.imwrite(str(root / f"crop_{i}.png"), img)
        lines.append(f"crop_{i}.png\t{t}")
    (root / "rec_gt.txt").write_text("\n".join(lines) + "\n")
    return root, texts


class TestCharsetTools:
    def test_build_and_write_roundtrip(self, tmp_path):
        from ppocr_tpu.pipeline.charset import load_charset

        chars = build_charset(["AB1", "C2A", " spaced "])
        assert chars == ["1", "2", "A", "B", "C", "a", "c", "d", "e", "p", "s"]
        path = tmp_path / "keys.txt"
        write_charset(path, chars)
        classes = load_charset(str(path))
        assert classes == charset_classes(chars)
        assert classes[0] == "#" and classes[-1] == " "

    def test_read_label_file_rejects_untabbed(self, tmp_path):
        p = tmp_path / "bad.txt"
        p.write_text("img.png no tab here\n")
        with pytest.raises(ValueError):
            read_label_file(str(p))

    def test_reinit_ctc_head(self):
        from ppocr_tpu.models.rec_svtr import init_rec_params

        params = init_rec_params(seed=0)
        new = reinit_ctc_head(params, 9, seed=1)
        assert new["head"]["fc"]["w"].shape == (120, 9)
        assert new["head"]["fc"]["b"].shape == (9,)
        # everything else is shared, and the original is untouched
        assert new["backbone"] is params["backbone"]
        assert params["head"]["fc"]["w"].shape[1] != 9


class TestDataset:
    def test_loads_and_batches(self, crop_dir):
        root, texts = crop_dir
        ds = FinetuneDataset(str(root / "rec_gt.txt"), img_h=48, img_w=96)
        assert len(ds) == len(texts)
        assert ds.classes[0] == "#" and ds.classes[-1] == " "
        b = ds.batch(4)
        assert b["images"].shape == (4, 48, 96, 3)
        assert b["labels"].shape == b["label_paddings"].shape == (4, ds.max_len)
        # labels decode back through the classes list
        row = b["labels"][0][b["label_paddings"][0] == 0.0]
        assert all(ds.classes[i] in "ABC123" for i in row)

    def test_oov_labels_skipped_with_fixed_charset(self, crop_dir):
        root, texts = crop_dir
        ds = FinetuneDataset(
            str(root / "rec_gt.txt"),
            classes=charset_classes(["A", "B", "1"]),
            img_h=48,
            img_w=96,
        )
        assert ds.skipped > 0
        assert all(set(t) <= {"A", "B", "1"} for t in ds.texts)


class TestFinetuneLoop:
    def test_finetune_exports_serving_bundle(self, crop_dir, tmp_path):
        from ppocr_tpu.pipeline.charset import load_charset
        from ppocr_tpu.train.finetune import finetune_rec
        from ppocr_tpu.utils.checkpoint import load_params_npz

        root, _ = crop_dir
        out = tmp_path / "ft_out"
        weights = finetune_rec(
            str(root / "rec_gt.txt"),
            str(out),
            steps=3,
            batch_size=4,
            img_h=48,
            img_w=96,
            ckpt_every=1,
            ckpt_keep=2,
            log_every=0,
        )
        assert os.path.exists(weights)
        params = load_params_npz(weights)
        classes = load_charset(str(out / "ppocr_keys_v1.txt"))
        # head surgery matched the bundle charset (6 chars + blank + space)
        assert params["head"]["fc"]["b"].shape[0] == len(classes) == 8
        # checkpoint rotation kept only the last 2
        kept = sorted(os.listdir(out / "ckpts"))
        assert kept == ["step_2", "step_3"]

    def test_warm_start_from_existing_weights(self, crop_dir, tmp_path):
        """Warm-starting from the bundled digit weights re-inits only the
        head (charset differs) and still steps."""
        import pathlib

        from ppocr_tpu.train.finetune import finetune_rec

        bundle = (
            pathlib.Path(__file__).parent.parent
            / "weights"
            / "rec_synthetic_digits.npz"
        )
        if not bundle.exists():
            pytest.skip("demo weights not present")
        root, _ = crop_dir
        out = tmp_path / "ft_warm"
        weights = finetune_rec(
            str(root / "rec_gt.txt"),
            str(out),
            init_weights=str(bundle),
            steps=2,
            batch_size=4,
            img_h=48,
            img_w=96,
            log_every=0,
        )
        assert os.path.exists(weights)

    def test_exported_bundle_serves_through_engine(
        self, crop_dir, tmp_path, reference_models
    ):
        """Close the loop: the finetune-exported custom-charset bundle
        (weights.npz + its own keys file) loads into OCREngine and drives
        CTC decode over the surgically-sized head — every decoded char
        comes from the bundle's 8-class charset, none from the reference
        dict (the custom-charset serving path the jumbo gates rely on)."""
        import shutil

        import cv2

        from ppocr_tpu.pipeline import OCREngine
        from ppocr_tpu.pipeline.config import (
            DetConfig,
            PipelineConfig,
            RecConfig,
        )
        from ppocr_tpu.train.finetune import finetune_rec

        root, _ = crop_dir
        out = tmp_path / "ft_bundle"
        weights = finetune_rec(
            str(root / "rec_gt.txt"),
            str(out),
            steps=3,
            batch_size=4,
            img_h=48,
            img_w=96,
            log_every=0,
        )
        md = tmp_path / "models"
        for name in ("det", "cls", "rec"):
            (md / name).mkdir(parents=True)
            shutil.copy(
                reference_models / name / "inference.pdmodel",
                md / name / "inference.pdmodel",
            )
        shutil.copy(weights, md / "rec" / "weights.npz")
        shutil.copy(out / "ppocr_keys_v1.txt", md / "rec" / "ppocr_keys_v1.txt")
        cfg = PipelineConfig(
            det=DetConfig(shape_buckets=(64,), limit_side_len=64),
            rec=RecConfig(batch_num=4, img_h=48, img_w=96, width_buckets=(96,)),
            enable_cls=False,
            dtype="float32",
        )
        eng = OCREngine(str(md), cfg)
        assert len(eng.charset) == 8  # '#' + 6 trained chars + ' '
        assert eng.random_weights["rec"] is False
        crops = [
            cv2.imread(str(root / f"crop_{i}.png")) for i in range(3)
        ]
        texts, confs, _ = eng.recognize(crops)
        allowed = set(eng.charset)
        for t in texts:
            assert set(t) <= allowed
        # a 3-step model decodes *something* through the tiny head
        # deterministically; exact content is not the point here
        texts2, confs2, _ = eng.recognize(crops)
        assert texts == texts2 and confs == confs2


class TestReviewFixes:
    """Round-3 review: label hygiene, checkpoint rotation, validation."""

    def test_crlf_label_files_parse_clean(self, tmp_path):
        p = tmp_path / "crlf.txt"
        p.write_bytes(b"a.png\tABC\r\nb.png\t12\r\n")
        entries = read_label_file(str(p))
        assert entries == [("a.png", "ABC"), ("b.png", "12")]

    def test_hash_label_is_oov_not_blank(self, crop_dir):
        """'#' is the blank class at index 0; a label containing it must be
        skipped as OOV, not silently encoded as CTC blank."""
        import cv2

        from ppocr_tpu.train.synthetic import render_line

        root, _ = crop_dir
        img = render_line("1", 48, 96, np.random.default_rng(0))
        cv2.imwrite(str(root / "hash.png"), img)
        label = root / "hash_gt.txt"
        label.write_text("hash.png\t#1\ncrop_0.png\tAB1\n")
        ds = FinetuneDataset(
            str(label),
            classes=charset_classes(["1", "A", "B"]),
            img_h=48,
            img_w=96,
        )
        assert ds.skipped == 1
        assert ds.texts == ["AB1"]

    def test_skipped_sample_missing_image_does_not_abort(self, crop_dir):
        """OOV/over-long samples skip BEFORE image decode, so a missing
        image on a to-be-skipped line must not abort the load."""
        root, _ = crop_dir
        label = root / "missing_gt.txt"
        label.write_text("gone.png\tZZZ\ncrop_0.png\tAB1\n")
        ds = FinetuneDataset(
            str(label),
            classes=charset_classes(["1", "A", "B"]),
            img_h=48,
            img_w=96,
        )
        assert ds.skipped == 1 and len(ds) == 1

    def test_rotate_cleans_orbax_temp_dirs(self, tmp_path):
        from ppocr_tpu.train.finetune import _rotate_checkpoints

        ck = tmp_path / "ckpts"
        ck.mkdir()
        for d in ("step_1", "step_2", "step_3",
                  "step_4.orbax-checkpoint-tmp-99"):
            (ck / d).mkdir()
        _rotate_checkpoints(str(ck), keep=2)
        assert sorted(p.name for p in ck.iterdir()) == ["step_2", "step_3"]
        # keep=0 keeps none (used to silently keep everything)
        _rotate_checkpoints(str(ck), keep=0)
        assert list(ck.iterdir()) == []

    def test_shape_constraints_fail_fast(self, crop_dir, tmp_path):
        from ppocr_tpu.train.finetune import finetune_rec

        root, _ = crop_dir
        with pytest.raises(ValueError, match="img_h=64"):
            finetune_rec(str(root / "rec_gt.txt"), str(tmp_path / "o1"),
                         steps=1, img_h=64, img_w=96)
        with pytest.raises(ValueError, match="img_w=100"):
            finetune_rec(str(root / "rec_gt.txt"), str(tmp_path / "o2"),
                         steps=1, img_h=48, img_w=100)
