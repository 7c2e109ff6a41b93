"""Train the recognizer on synthetic digit lines — end-to-end validation
of the training stack (and demo weights for the pipeline).

    python scripts/train_synthetic_rec.py --steps 1500 --out /tmp/rec_weights.npz

Copy the output npz to <model_dir>/rec/weights.npz to serve it.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--img-h", type=int, default=48)
    p.add_argument("--img-w", type=int, default=192)
    p.add_argument(
        "--scene-crops",
        action="store_true",
        help="train on detector-scene crops (unclip margins + crnn_resize, "
        "the distribution the det stage feeds rec end to end) instead of "
        "direct line renders",
    )
    p.add_argument(
        "--aug-rotate",
        type=float,
        default=0.0,
        help="scene-crops mode: random crop rotation in +-degrees",
    )
    p.add_argument(
        "--hard-frac",
        type=float,
        default=0.0,
        help="oversample near-homoglyph chars (l/I/1, O/0 ...): fraction "
        "of sampled lines that get one such char injected. Training-only "
        "knob; the eval/gate distribution is unchanged",
    )
    p.add_argument(
        "--alphabet",
        choices=["digits", "ascii", "full", "jumbo"],
        default="digits",
        help="digits = cv2 Hershey digit lines (round-2 demo weights); "
        "ascii = PIL/DejaVu printable-ASCII (94 classes); full = ascii + "
        "DejaVu-coverable reference-charset symbols (~218 classes) — both "
        "trained against the full 6,625-way CTC head; jumbo = every "
        "DejaVu-drawable char (~5,000 classes, reference-SCALE) against a "
        "surgically-resized head + the pinned weights/jumbo_keys.txt "
        "custom charset (finetune-recipe bundle convention)",
    )
    p.add_argument("--max-len", type=int, default=None)
    p.add_argument("--eval-batches", type=int, default=1)
    p.add_argument(
        "--init-weights",
        default=None,
        help="warm-start from an npz bundle (backbone transfer; the CTC "
        "head is re-initialized whenever its size differs from the "
        "target charset — train/finetune.py reinit_ctc_head)",
    )
    p.add_argument("--out", default="/tmp/rec_synthetic.npz")
    p.add_argument(
        "--save-every",
        type=int,
        default=0,
        help="checkpoint the params to --out every N steps (0 = only at "
        "the end) so a long run interrupted mid-flight still yields "
        "servable weights",
    )
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")


    from ppocr_tpu.models import init_rec_params
    from ppocr_tpu.parallel import make_mesh
    from ppocr_tpu.pipeline.charset import load_charset
    from ppocr_tpu.train import make_train_step
    from ppocr_tpu.train.synthetic import SyntheticRecDataset
    from ppocr_tpu.train.trainer import ctc_train_loss
    from ppocr_tpu.utils import enable_persistent_cache
    from ppocr_tpu.utils.checkpoint import save_params_npz
    from ppocr_tpu.ops.ctc import ctc_greedy_decode_np
    from ppocr_tpu.models import rec_forward

    enable_persistent_cache()
    if args.alphabet == "jumbo":
        # reference-SCALE custom charset (~5,000 classes): surgically-sized
        # head + the pinned weights/jumbo_keys.txt bundle convention
        if not args.scene_crops:
            p.error("--alphabet jumbo requires --scene-crops (PIL renderer)")
        from ppocr_tpu.train.finetune import charset_classes
        from ppocr_tpu.train.synthetic import jumbo_alphabet

        charset = charset_classes(list(jumbo_alphabet()))
    else:
        charset = load_charset("/root/reference/models/rec/ppocr_keys_v1.txt")
    def make_scenes():
        kw = {"max_len": args.max_len} if args.max_len else {}
        if args.hard_frac > 0:
            # oversample near-homoglyph chars (training only — the
            # eval/gate datasets keep the canonical distribution). jumbo
            # mode uses the computed cross-font confusable set (~570
            # chars); the curated ascii HOMOGLYPHS otherwise.
            kw["hard_frac"] = args.hard_frac
            if args.alphabet == "jumbo":
                from ppocr_tpu.train.synthetic import jumbo_hard_chars

                kw["hard_chars"] = jumbo_hard_chars()
            else:
                from ppocr_tpu.train.synthetic import HOMOGLYPHS

                kw["hard_chars"] = "".join(
                    c for fam in HOMOGLYPHS for c in fam
                )
        if args.alphabet != "digits":
            from ppocr_tpu.train.synthetic import text_scene_dataset

            return text_scene_dataset(args.alphabet, seed=7, **kw)
        from ppocr_tpu.train.synthetic import SyntheticSceneDataset

        return SyntheticSceneDataset(seed=7, **kw)

    if args.scene_crops:
        from ppocr_tpu.train.synthetic import SceneCropRecDataset

        ds = SceneCropRecDataset(
            charset,
            make_scenes(),
            img_h=args.img_h,
            img_w=args.img_w,
            aug_rotate_deg=args.aug_rotate,
        )
    else:
        if args.alphabet != "digits":
            from ppocr_tpu.train.synthetic import dejavu_alphabet

            alphabet = dejavu_alphabet(ascii_only=args.alphabet == "ascii")
        else:
            alphabet = "0123456789"
        ds = SyntheticRecDataset(
            charset, alphabet=alphabet, img_h=args.img_h, img_w=args.img_w
        )

    import optax

    mesh = make_mesh(1)
    # cosine decay to ~0 sharpens late-stage character accuracy
    schedule = optax.cosine_decay_schedule(args.lr, args.steps, alpha=0.02)
    _, init_fn, step_fn = make_train_step(mesh, learning_rate=schedule)
    if args.init_weights:
        from ppocr_tpu.utils.checkpoint import load_params_npz

        params = load_params_npz(args.init_weights)
    else:
        params = init_rec_params(seed=0)
    if len(charset) != np.asarray(params["head"]["fc"]["b"]).shape[0]:
        from ppocr_tpu.train.finetune import reinit_ctc_head

        params = reinit_ctc_head(params, len(charset), seed=0)
    state = init_fn(params)

    from ppocr_tpu.train.trainer import BatchPrefetcher

    prefetch = BatchPrefetcher(lambda: ds.batch(args.batch)[0])
    t0 = time.time()
    for step in range(1, args.steps + 1):
        batch = prefetch.next()
        state, loss = step_fn(state, batch)
        if step % 100 == 0 or step == 1:
            print(
                f"step {step:5d}  loss {float(loss):8.3f}  "
                f"({(time.time()-t0):.0f}s)",
                flush=True,
            )
        if args.save_every and step % args.save_every == 0:
            save_params_npz(args.out, state.params)
            print(f"  checkpointed -> {args.out} (step {step})", flush=True)

    prefetch.close()
    # evaluate greedy decode on fresh samples
    import jax.numpy as jnp

    from ppocr_tpu.train.trainer import normalize_rec_images

    fwd = jax.jit(lambda p, x: rec_forward(p, normalize_rec_images(x)))
    exact = total = 0
    samples = []
    for _ in range(args.eval_batches):
        eval_batch, texts = ds.batch(64)
        probs = np.asarray(
            fwd(state.params, jnp.asarray(eval_batch["images"]))
        )
        decoded, conf = ctc_greedy_decode_np(probs, charset)
        exact += sum(d == t for d, t in zip(decoded, texts))
        total += len(texts)
        samples = list(zip(decoded, texts))[:8]
    print(f"eval: {exact}/{total} exact line matches; samples:")
    for d, t in samples:
        print(f"  gt={t!r:12} pred={d!r}")

    save_params_npz(args.out, state.params)
    print(f"saved weights to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
