"""Train the DB detector on synthetic digit scenes — closes the detector
half of the training loop (scripts/train_synthetic_rec.py is the rec half)
and produces demo weights that *find* rendered text for the end-to-end
real-text golden (VERDICT r1 #3).

    python scripts/train_synthetic_det.py --steps 2000 --out /tmp/det.npz

Copy the output npz to <model_dir>/det/weights.npz to serve it.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rect_iou(a, b):
    ix0, iy0 = max(a[0], b[0]), max(a[1], b[1])
    ix1, iy1 = min(a[2], b[2]), min(a[3], b[3])
    iw, ih = max(0.0, ix1 - ix0), max(0.0, iy1 - iy0)
    inter = iw * ih
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua if ua > 0 else 0.0


def evaluate(params, ds, n_scenes, *, thresh, box_thresh, unclip):
    """Detection recall/precision at IoU 0.3 over held-out scenes, through
    the real serving postprocess (DBPostProcess host path)."""
    import jax
    import jax.numpy as jnp

    from ppocr_tpu.models import det_forward
    from ppocr_tpu.ops.db_postprocess import DBPostProcess

    post = DBPostProcess(
        thresh=thresh, box_thresh=box_thresh, unclip_ratio=unclip,
        score_mode="fast",
    )
    fwd = jax.jit(det_forward)
    dh, dw = ds.det_hw
    sh, sw = ds.src_hw
    tp = fp = fn = 0
    for _ in range(n_scenes):
        batch, scenes = ds.det_batch(1)
        prob = np.asarray(fwd(params, jnp.asarray(batch["images"])))[0]
        boxes = post(prob, sh, sw, dh / sh, dw / sw)
        pred = [
            (q[:, 0].min(), q[:, 1].min(), q[:, 0].max(), q[:, 1].max())
            for q in boxes
        ]
        gts = [b for _, b in scenes[0][1]]
        matched = set()
        for p in pred:
            best, best_iou = None, 0.3
            for gi, g in enumerate(gts):
                if gi in matched:
                    continue
                v = rect_iou(p, g)
                if v > best_iou:
                    best, best_iou = gi, v
            if best is None:
                fp += 1
            else:
                matched.add(best)
                tp += 1
        fn += len(gts) - len(matched)
    recall = tp / max(tp + fn, 1)
    precision = tp / max(tp + fp, 1)
    return recall, precision


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--det-h", type=int, default=96)
    p.add_argument("--det-w", type=int, default=96)
    p.add_argument("--src-h", type=int, default=192)
    p.add_argument("--src-w", type=int, default=192)
    p.add_argument("--eval-scenes", type=int, default=32)
    p.add_argument(
        "--alphabet",
        choices=["digits", "ascii", "full", "jumbo"],
        default="digits",
        help="digits = cv2 Hershey digit lines (round-2 demo weights); "
        "ascii = PIL/DejaVu printable-ASCII lines (94 classes); full = "
        "ascii + the DejaVu-coverable reference-charset symbols "
        "(~218 classes); jumbo = every DejaVu-drawable char (~5,000 "
        "classes — det is class-agnostic, this just widens the glyph-"
        "shape distribution)",
    )
    p.add_argument("--max-len", type=int, default=None,
                   help="max chars per rendered line (default: 5 digits, 6 otherwise)")
    p.add_argument("--out", default="/tmp/det_synthetic.npz")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ppocr_tpu.models.det_db import init_det_params
    from ppocr_tpu.parallel import make_mesh
    from ppocr_tpu.train import make_det_train_step
    from ppocr_tpu.train.synthetic import SyntheticSceneDataset
    from ppocr_tpu.utils import enable_persistent_cache
    from ppocr_tpu.utils.checkpoint import save_params_npz

    enable_persistent_cache()

    def make_ds(seed):
        kw = dict(
            src_hw=(args.src_h, args.src_w),
            det_hw=(args.det_h, args.det_w),
        )
        if args.alphabet != "digits":
            from ppocr_tpu.train.synthetic import text_scene_dataset

            if args.max_len:
                kw["max_len"] = args.max_len
            return text_scene_dataset(args.alphabet, seed=seed, **kw)
        if args.max_len:
            kw["max_len"] = args.max_len
        return SyntheticSceneDataset(seed=seed, **kw)

    ds = make_ds(0)

    mesh = make_mesh(1)
    _, init_fn, step_fn = make_det_train_step(mesh, learning_rate=args.lr)
    state = init_fn(init_det_params(seed=0))

    from ppocr_tpu.train.trainer import BatchPrefetcher

    prefetch = BatchPrefetcher(lambda: ds.det_batch(args.batch)[0])
    t0 = time.time()
    for step in range(1, args.steps + 1):
        batch = prefetch.next()
        state, loss = step_fn(state, batch)
        if step % 100 == 0 or step == 1:
            print(
                f"step {step:5d}  loss {float(loss):8.4f}  "
                f"({(time.time()-t0):.0f}s)",
                flush=True,
            )

    prefetch.close()
    params = jax.device_get(state.params)
    eval_ds = make_ds(777)
    recall, precision = evaluate(
        params, eval_ds, args.eval_scenes,
        thresh=0.2, box_thresh=0.4, unclip=1.8,
    )
    print(f"eval over {args.eval_scenes} scenes: "
          f"recall {recall:.3f}  precision {precision:.3f}")

    save_params_npz(args.out, params)
    print(f"saved weights to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
