"""Recognizer fine-tuning recipe (beyond the reference, inference-only).

Everything needed to adapt the recognizer to a custom font/charset from a
directory of labeled crops:

  * **data loader** — PaddleOCR ``rec_gt``-style label files
    (``relative/path.png\\ttext`` per line) with serving-exact preprocessing
    (``crnn_resize`` + pad-before-normalize, preprocess_op.cpp:95-118);
  * **charset tools** — build/write charset files in the
    ``ppocr_keys_v1.txt`` convention (one char per line; blank ``#`` at 0
    and trailing space are added by the loader, ocr_rec.h:82-84);
  * **head surgery** — re-initialize the 120→V CTC projection when the
    fine-tune charset differs from the checkpoint's;
  * **train loop** — CTC over a device mesh with cosine LR decay and orbax
    checkpoint rotation, exporting a serving bundle (``weights.npz`` +
    ``ppocr_keys_v1.txt``) that ``OCREngine`` loads directly.
"""

from __future__ import annotations

import os
import shutil
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


# -- charset tools ----------------------------------------------------------


def read_label_file(path: str) -> List[Tuple[str, str]]:
    """Parse a PaddleOCR-style rec label file: ``img_path<TAB>text``."""
    out = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            # strip \r too: a CRLF-authored file would otherwise leave a
            # trailing \r on every text — OOV-skipping every sample under
            # a fixed charset, or training a spurious \r class without one
            line = line.rstrip("\r\n")
            if not line:
                continue
            img, _, text = line.partition("\t")
            if not _:
                raise ValueError(f"label line without TAB: {line!r}")
            out.append((img, text))
    return out


def build_charset(texts: Sequence[str]) -> List[str]:
    """Sorted unique characters of the corpus (excluding space, which the
    loader appends as the final class — ocr_rec.h:84)."""
    chars = set()
    for t in texts:
        chars.update(t)
    chars.discard(" ")
    return sorted(chars)


def write_charset(path: str, chars: Sequence[str]) -> None:
    """Write a charset file in the ppocr_keys_v1.txt convention."""
    with open(path, "w", encoding="utf-8") as f:
        for c in chars:
            f.write(c + "\n")


def charset_classes(chars: Sequence[str]) -> List[str]:
    """Decode classes for a charset file body: blank + chars + space
    (mirrors pipeline.charset.load_charset)."""
    return ["#"] + list(chars) + [" "]


def reinit_ctc_head(params: Dict, n_classes: int, seed: int = 0) -> Dict:
    """Replace the final 120→V CTC projection (head.fc) for a new charset;
    every other weight is kept (the transferable representation)."""
    import copy

    rng = np.random.default_rng(seed)
    params = copy.copy(params)
    params["head"] = copy.copy(params["head"])
    d = params["head"]["fc"]["w"].shape[0]
    params["head"]["fc"] = {
        "w": (rng.normal(0, d**-0.5, (d, n_classes))).astype(np.float32),
        "b": np.zeros((n_classes,), np.float32),
    }
    return params


# -- data -------------------------------------------------------------------


class FinetuneDataset:
    """In-memory labeled-crop dataset with serving-exact preprocessing."""

    def __init__(
        self,
        label_file: str,
        image_root: Optional[str] = None,
        classes: Optional[Sequence[str]] = None,
        img_h: int = 48,
        img_w: int = 320,
        max_len: Optional[int] = None,
        seed: int = 0,
    ):
        import cv2

        from ..ops.resize import crnn_resize

        root = image_root or os.path.dirname(os.path.abspath(label_file))
        entries = read_label_file(label_file)
        if classes is None:
            classes = charset_classes(build_charset([t for _, t in entries]))
        self.classes = list(classes)
        self.char_to_idx = {c: i for i, c in enumerate(self.classes)}
        self.img_h, self.img_w = img_h, img_w
        self.max_len = max_len or max((len(t) for _, t in entries), default=1)
        self.rng = np.random.default_rng(seed)

        self.images: List[np.ndarray] = []
        self.texts: List[str] = []
        skipped = 0
        for rel, text in entries:
            # cheap skip checks BEFORE image decode: a to-be-skipped
            # sample must not abort the load on its missing image, and
            # "#" is the blank class at index 0 — a label containing it
            # would silently encode as CTC blank, so it is OOV unless the
            # charset file itself defines a '#' line (then it sits at a
            # non-zero index too and the earliest match below wins)
            oov = any(
                c not in self.char_to_idx or self.char_to_idx[c] == 0
                for c in text
            )
            if oov or len(text) > self.max_len:
                skipped += 1  # OOV chars / blank literal / over-long label
                continue
            p = rel if os.path.isabs(rel) else os.path.join(root, rel)
            img = cv2.imread(p)
            if img is None:
                raise FileNotFoundError(f"cannot read crop {p}")
            self.images.append(
                crnn_resize(img, img_w / img_h, (3, img_h, img_w))
            )
            self.texts.append(text)
        self.skipped = skipped
        if not self.images:
            raise ValueError(f"no usable samples in {label_file}")

    def __len__(self) -> int:
        return len(self.images)

    def batch(self, batch_size: int) -> Dict[str, np.ndarray]:
        idx = self.rng.integers(0, len(self.images), size=batch_size)
        images = np.stack([self.images[i] for i in idx])
        x = (images.astype(np.float32) / 255.0 - 0.5) * 2.0
        labels = np.zeros((batch_size, self.max_len), np.int32)
        pad = np.ones((batch_size, self.max_len), np.float32)
        for row, i in enumerate(idx):
            for j, ch in enumerate(self.texts[i]):
                labels[row, j] = self.char_to_idx[ch]
                pad[row, j] = 0.0
        return {"images": x, "labels": labels, "label_paddings": pad}


# -- train loop -------------------------------------------------------------


def _rotate_checkpoints(ckpt_dir: str, keep: int) -> None:
    steps = []
    for d in os.listdir(ckpt_dir):
        if not d.startswith("step_"):
            continue
        suffix = d.split("_", 1)[1]
        if suffix.isdigit():
            steps.append(int(suffix))
        else:
            # orbax async-save temp dirs (step_N.orbax-checkpoint-tmp-*)
            # left by a killed run: clean them up instead of crashing
            # every later rotation on int() (review r3)
            shutil.rmtree(os.path.join(ckpt_dir, d), ignore_errors=True)
    steps.sort()
    drop = steps if keep <= 0 else steps[:-keep]
    for s in drop:
        shutil.rmtree(os.path.join(ckpt_dir, f"step_{s}"))


def finetune_rec(
    label_file: str,
    out_dir: str,
    image_root: Optional[str] = None,
    init_weights: Optional[str] = None,
    charset_file: Optional[str] = None,
    steps: int = 1000,
    batch_size: int = 32,
    learning_rate: float = 5e-4,
    img_h: int = 48,
    img_w: int = 320,
    mesh=None,
    ckpt_every: int = 0,
    ckpt_keep: int = 2,
    log_every: int = 100,
    seed: int = 0,
) -> str:
    """Fine-tune the recognizer on a labeled-crop directory; exports a
    serving bundle (weights.npz + ppocr_keys_v1.txt) under ``out_dir`` that
    drops into ``<model_dir>/rec/``. Returns the weights path."""
    import jax
    import optax

    from ..models.rec_svtr import init_rec_params
    from ..parallel import make_mesh
    from ..pipeline.charset import load_charset
    from ..utils.checkpoint import (
        load_params_npz,
        save_params_npz,
        save_train_state,
    )
    from .trainer import make_train_step

    # the recognizer's hard shape constraints (rec_neck_head_logits pools
    # to feature height ≤3 and halves the width axis): fail fast with an
    # actionable message instead of a mid-trace assert (review r3)
    if img_h > 48:
        raise ValueError(
            f"img_h={img_h}: the recognizer supports heights ≤ 48 "
            "(feature height after the /16 backbone stride must be ≤ 3)"
        )
    if img_w % 8 != 0:
        raise ValueError(
            f"img_w={img_w}: must be a multiple of 8 (the neck halves the "
            "/4-strided width axis)"
        )

    if charset_file:
        classes = load_charset(charset_file)
        chars = classes[1:-1]
    else:
        classes = None
        chars = None

    ds = FinetuneDataset(
        label_file,
        image_root=image_root,
        classes=classes,
        img_h=img_h,
        img_w=img_w,
        seed=seed,
    )
    if chars is None:
        chars = ds.classes[1:-1]
    n_classes = len(ds.classes)
    if ds.skipped:
        # silent data loss misleads: a restrictive charset can drop most
        # of the corpus with training still "succeeding" (review r3)
        print(
            f"finetune: skipped {ds.skipped} of "
            f"{ds.skipped + len(ds)} samples (OOV/over-long labels); "
            f"training on {len(ds)}",
            flush=True,
        )

    params = (
        load_params_npz(init_weights)
        if init_weights
        else init_rec_params(seed=seed)
    )
    v_have = np.asarray(params["head"]["fc"]["b"]).shape[0]
    if v_have != n_classes:
        params = reinit_ctc_head(params, n_classes, seed=seed)

    mesh = mesh or make_mesh(1)
    schedule = optax.cosine_decay_schedule(learning_rate, steps, alpha=0.02)
    _, init_fn, step_fn = make_train_step(mesh, learning_rate=schedule)
    state = init_fn(params)

    os.makedirs(out_dir, exist_ok=True)
    ckpt_dir = os.path.join(out_dir, "ckpts")
    last_loss = float("nan")
    for step in range(1, steps + 1):
        state, loss = step_fn(state, ds.batch(batch_size))
        if log_every and (step % log_every == 0 or step == 1):
            last_loss = float(loss)
            print(f"finetune step {step:5d}  loss {last_loss:8.3f}", flush=True)
        if ckpt_every and step % ckpt_every == 0:
            os.makedirs(ckpt_dir, exist_ok=True)
            save_train_state(ckpt_dir, state, step=step)
            _rotate_checkpoints(ckpt_dir, ckpt_keep)

    weights_path = os.path.join(out_dir, "weights.npz")
    save_params_npz(weights_path, jax.device_get(state.params))
    write_charset(os.path.join(out_dir, "ppocr_keys_v1.txt"), chars)
    return weights_path
