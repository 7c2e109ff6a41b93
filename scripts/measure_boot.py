"""Time-to-serving measurement (VERDICT r4 missing #4).

The reference cold-starts in seconds (model load then serve,
/root/reference/src/ocr_det.cpp:23-91, ocr_service_main.cpp:124-129); on
this stack a service boot must compile (or cache-load) every closed-set
shape variant through the axon tunnel, so boot cost is a first-class
number. This script boots `ocr-service` in a subprocess and measures:

  t_socket_s       — service socket accepting connections
  t_first_ok_s     — first successful `recognize` response (the
                     "first-request-ready" number; with
                     ``--warmup incremental`` the compile-before-dispatch
                     guard makes this ≈ one variant compile/load, not the
                     whole set)
  t_all_ready_s    — every serving variant compiled/loaded
                     (warmup_progress.compiled == total for incremental;
                     == t_first_ok for full warmup, which blocks the
                     socket until done)

    python scripts/measure_boot.py --mode incremental
    python scripts/measure_boot.py --mode full
    python scripts/measure_boot.py --mode full --cold   # wipe XLA cache

Prints one JSON line. ``--cold`` moves the persistent XLA cache dir aside
before boot (restored afterwards) so the run measures true first-ever
compiles instead of cache hits.
"""

import argparse
import base64
import json
import os
import shutil
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def default_cache_dir() -> str:
    return os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "ppocr-tpu",
        "xla",
    )


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["incremental", "full", "off"],
                   default="incremental")
    p.add_argument("--model-dir", default="/root/reference/models")
    p.add_argument("--image", default="/root/reference/images/card-jd.jpg")
    p.add_argument("--socket", default="/tmp/ocr_boot_measure.sock")
    p.add_argument("--batch-requests", type=int, default=4)
    p.add_argument("--det-buckets", default=None,
                   help="comma list forwarded to --det-buckets (default: "
                        "the full serving set)")
    p.add_argument("--cold", action="store_true",
                   help="move the persistent XLA cache aside (restored on "
                        "exit) to measure first-ever compiles")
    p.add_argument("--timeout", type=float, default=5400.0,
                   help="per-phase ceiling in seconds")
    p.add_argument("--extra", default="",
                   help="extra ocr-service args, space-separated")
    args = p.parse_args()

    cache_dir = default_cache_dir()
    stash = None
    if args.cold and os.path.isdir(cache_dir):
        stash = cache_dir + ".boot_stash"
        if os.path.exists(stash):
            shutil.rmtree(stash)
        os.rename(cache_dir, stash)

    cmd = [
        sys.executable, "-m", "ppocr_tpu.cli.service_main",
        "--model-dir", args.model_dir,
        "--pipe-name", args.socket,
        "--warmup", args.mode,
        "--batch-requests", str(args.batch_requests),
    ]
    if args.det_buckets:
        cmd += ["--det-buckets", args.det_buckets]
    if args.extra:
        cmd += args.extra.split()

    with open(args.image, "rb") as f:
        img_b64 = base64.b64encode(f.read()).decode()

    if os.path.exists(args.socket):
        os.unlink(args.socket)
    logf = open("/tmp/boot_measure_service.log", "wb")
    t0 = time.perf_counter()
    proc = subprocess.Popen(cmd, stdout=logf, stderr=subprocess.STDOUT)

    from ppocr_tpu.serve.client import OCRIPCClient

    result = {
        "mode": args.mode,
        "cold": bool(args.cold),
        "batch_requests": args.batch_requests,
        "det_buckets": args.det_buckets or "default",
    }
    try:
        # phase 1: socket up
        t_socket = None
        while time.perf_counter() - t0 < args.timeout:
            if proc.poll() is not None:
                raise RuntimeError(
                    f"service exited rc={proc.returncode} before socket; "
                    "see /tmp/boot_measure_service.log"
                )
            c = OCRIPCClient(args.socket, timeout_ms=2000)
            if c.connect():
                t_socket = time.perf_counter() - t0
                c.disconnect()
                break
            time.sleep(0.25)
        result["t_socket_s"] = round(t_socket, 1) if t_socket else None

        # phase 2: first successful recognize (generous per-request
        # timeout — with incremental warmup the request itself triggers
        # the compile-before-dispatch guard)
        cli = OCRIPCClient(args.socket, timeout_ms=int(args.timeout * 1000))
        t_first = None
        failures = 0
        deadline = t0 + args.timeout
        while time.perf_counter() < deadline:
            if proc.poll() is not None:
                raise RuntimeError("service died mid-measure")
            try:
                r = cli.send_request(
                    {"command": "recognize", "image_data": img_b64}
                )
            except Exception:
                time.sleep(0.5)
                continue
            if r.get("success"):
                t_first = time.perf_counter() - t0
                result["first_words"] = len(r.get("words", []))
                break
            # incremental warmup never fails a request for an unwarmed
            # variant (compile-before-dispatch guard), so repeated
            # failures are a real error — don't spin on them
            failures += 1
            result["last_error"] = r.get("error")
            if failures >= 20:
                raise RuntimeError(f"recognize keeps failing: {r.get('error')}")
            time.sleep(0.5)
        result["t_first_ok_s"] = round(t_first, 1) if t_first else None

        # phase 3: all variants ready (incremental surfaces progress in
        # status; full/off are ready at first-ok by construction)
        t_all = t_first
        if args.mode == "incremental":
            while time.perf_counter() < deadline:
                try:
                    s = cli.send_request({"command": "status"})
                    st = s.get("status")
                    if isinstance(st, str):
                        st = json.loads(st)
                    wp = (st or {}).get("warmup_progress")
                except Exception:
                    time.sleep(1.0)
                    continue
                if wp is None or wp.get("compiled", 0) >= wp.get("total", 0):
                    t_all = time.perf_counter() - t0
                    result["variants"] = (wp or {}).get("total")
                    break
                time.sleep(2.0)
        result["t_all_ready_s"] = round(t_all, 1) if t_all else None
        cli.disconnect()
    finally:
        proc.send_signal(signal.SIGINT)
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait()
        logf.close()
        if stash is not None:
            # cold run wrote fresh entries into a new cache_dir; keep the
            # union (stash entries win nothing — they're content-addressed)
            if os.path.isdir(cache_dir):
                for name in os.listdir(stash):
                    dst = os.path.join(cache_dir, name)
                    if not os.path.exists(dst):
                        os.rename(os.path.join(stash, name), dst)
                shutil.rmtree(stash, ignore_errors=True)
            else:
                os.rename(stash, cache_dir)

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
