"""Soak/load test against a live OCR service (ROADMAP robustness item).

Drives sustained concurrent load over the Unix-socket protocol and tracks
latency percentiles, QPS, error counts, and the service's RSS growth
(the axon tunnel leaks host RSS proportional to bytes transferred —
documented environment bug, CLAUDE.md).

    # terminal 1
    python -m ppocr_tpu.cli.service_main --model-dir ... --fast-path
    # terminal 2
    python scripts/soak.py --duration 120 --concurrency 4 \
        --pid $(pgrep -f service_main | head -1)

Prints one JSON summary line.
"""

import argparse
import base64
import json
import os
import statistics
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_kb(pid: int) -> int:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1])
    except OSError:
        pass
    return -1


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--socket", default="/tmp/ocr_service.sock")
    p.add_argument("--image", default="/root/reference/images/card-jd.jpg")
    p.add_argument("--duration", type=float, default=60.0)
    p.add_argument("--concurrency", type=int, default=4)
    p.add_argument("--timeout", type=float, default=30000.0)
    p.add_argument("--pid", type=int, default=0, help="service pid for RSS tracking")
    p.add_argument(
        "--vary-images",
        action="store_true",
        help="perturb one pixel per request (defeats content-dedup caches)",
    )
    args = p.parse_args()

    import cv2
    import numpy as np

    from ppocr_tpu.serve.client import OCRIPCClient

    base_img = cv2.imread(args.image)
    if base_img is None:
        print(json.dumps({"error": f"cannot read {args.image}"}))
        return 1

    rss_start = rss_kb(args.pid) if args.pid else -1
    latencies, errors, lock = [], [0], threading.Lock()
    stop_at = time.time() + args.duration

    def worker(tid: int):
        client = OCRIPCClient(args.socket, timeout_ms=args.timeout)
        client.connect()
        rng = np.random.default_rng(tid)
        i = 0
        while time.time() < stop_at:
            img = base_img
            if args.vary_images:
                img = base_img.copy()
                img[
                    int(rng.integers(0, img.shape[0])),
                    int(rng.integers(0, img.shape[1])),
                ] = rng.integers(0, 255, 3)
            ok, buf = cv2.imencode(".jpg", img)
            payload = {
                "command": "recognize",
                "image_data": base64.b64encode(buf.tobytes()).decode(),
            }
            t0 = time.perf_counter()
            try:
                resp = client.send_request(payload)
                dt = (time.perf_counter() - t0) * 1e3
                with lock:
                    if resp.get("success"):
                        latencies.append(dt)
                    else:
                        errors[0] += 1
            except Exception:
                with lock:
                    errors[0] += 1
            i += 1
        client.disconnect()

    t0 = time.time()
    threads = [
        threading.Thread(target=worker, args=(t,), daemon=True)
        for t in range(args.concurrency)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0

    rss_end = rss_kb(args.pid) if args.pid else -1
    lat = sorted(latencies)
    n = len(lat)
    summary = {
        "requests_ok": n,
        "errors": errors[0],
        "duration_s": round(wall, 1),
        "qps": round(n / wall, 2) if wall > 0 else 0,
        "p50_ms": round(statistics.median(lat), 1) if n else None,
        "p99_ms": round(lat[min(n - 1, int(n * 0.99))], 1) if n else None,
        "max_ms": round(lat[-1], 1) if n else None,
        "concurrency": args.concurrency,
        "rss_start_kb": rss_start,
        "rss_end_kb": rss_end,
        "rss_growth_kb_per_req": round((rss_end - rss_start) / max(n, 1), 1)
        if rss_start > 0
        else None,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
