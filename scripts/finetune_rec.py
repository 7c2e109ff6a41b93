"""Fine-tune the recognizer on a labeled crop directory.

    python scripts/finetune_rec.py --label-file data/rec_gt.txt \
        --init weights/rec_scene_digits.npz --steps 2000 --out /tmp/ft

Label file format (PaddleOCR rec_gt): ``relative/path.png<TAB>text`` per
line. Exports a serving bundle (weights.npz + ppocr_keys_v1.txt) under
--out; copy both into <model_dir>/rec/ to serve.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--label-file", required=True)
    p.add_argument("--image-root", default=None)
    p.add_argument("--init", default=None, help="starting weights.npz (else random init)")
    p.add_argument("--charset", default=None, help="fixed charset file (else built from labels)")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--img-h", type=int, default=48)
    p.add_argument("--img-w", type=int, default=320)
    p.add_argument("--ckpt-every", type=int, default=0, help="orbax checkpoint interval (0 = off)")
    p.add_argument("--ckpt-keep", type=int, default=2)
    p.add_argument("--out", required=True)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ppocr_tpu.train.finetune import finetune_rec
    from ppocr_tpu.utils import enable_persistent_cache

    enable_persistent_cache()
    path = finetune_rec(
        args.label_file,
        args.out,
        image_root=args.image_root,
        init_weights=args.init,
        charset_file=args.charset,
        steps=args.steps,
        batch_size=args.batch,
        learning_rate=args.lr,
        img_h=args.img_h,
        img_w=args.img_w,
        ckpt_every=args.ckpt_every,
        ckpt_keep=args.ckpt_keep,
    )
    print(f"exported serving bundle: {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
