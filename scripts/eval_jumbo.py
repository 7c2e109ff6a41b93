"""Held-out jumbo e2e scorer — the gate's exact protocol, standalone.

Reuses tests/test_e2e_trained_jumbo.py's scoring (same held-out seeds,
scene counts, and IoU matching) so a candidate bundle can be compared
against the committed one BEFORE replacing it:

    python scripts/eval_jumbo.py --rec /tmp/rec_jumbo_r5.npz
    python scripts/eval_jumbo.py            # committed bundle
    python scripts/eval_jumbo.py --fused    # fused path (crop_src_mult=2)

Runs on the JAX default platform; pass --cpu to force the hermetic CPU
path (same as the test suite).
"""

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--rec", default="weights/rec_scene_jumbo.npz")
    p.add_argument("--det", default="weights/det_synthetic_text.npz")
    p.add_argument("--model-dir", default="/root/reference/models")
    p.add_argument("--fused", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--scenes", type=int, default=0,
                   help="override scenes/seed (default: the gate's 34)")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from ppocr_tpu.utils.xla_cache import enable_persistent_cache

    enable_persistent_cache()

    import test_e2e_trained_jumbo as gate  # the gate module IS the protocol
    from ppocr_tpu.pipeline import OCREngine, OCRWorker

    md = tempfile.mkdtemp(prefix="jumbo_eval_")
    for name in ("det", "cls", "rec"):
        os.makedirs(os.path.join(md, name), exist_ok=True)
        shutil.copy(
            os.path.join(args.model_dir, name, "inference.pdmodel"),
            os.path.join(md, name, "inference.pdmodel"),
        )
    shutil.copy(gate.JUMBO_KEYS_FILE, os.path.join(md, "rec", "ppocr_keys_v1.txt"))
    shutil.copy(args.det, os.path.join(md, "det", "weights.npz"))
    shutil.copy(args.rec, os.path.join(md, "rec", "weights.npz"))

    if args.fused:
        cfg = gate._cfg(fast_path=True, fused_max_boxes=8, fused_crop_src_mult=2)
        cfg.det.shape_buckets = (96,)
    else:
        cfg = gate._cfg()
    eng = OCREngine(md, cfg)
    assert eng.random_weights == {"det": False, "rec": False}
    kw = {"n_scenes": args.scenes} if args.scenes else {}
    exact, norm, total, det_found, det_gt, misses = gate._score(
        OCRWorker(eng, 0), **kw
    )
    print(json.dumps({
        "rec": args.rec,
        "path": "fused" if args.fused else "staged",
        "raw": round(exact / total, 4),
        "normalized": round(norm / total, 4),
        "exact": exact,
        "norm_exact": norm,
        "total": total,
        "det_found": det_found,
        "det_gt": det_gt,
        "misses": ["%s -> %s" % m for m in misses][:40],
    }, ensure_ascii=False))
    shutil.rmtree(md, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
