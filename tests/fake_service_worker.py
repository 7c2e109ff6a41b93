"""Hermetic stand-in for ppocr_tpu.cli.service_main used by the balancer /
supervisor tests: speaks the NDJSON protocol on --socket without loading
any engine. Supports recognize/status/shutdown and --recycle-after N
(graceful exit code 3), mirroring the real service's lifecycle contract."""

import argparse
import asyncio
import json
import os
import sys


async def amain(args) -> int:
    total = {"n": 0, "ok": 0}
    recycled = asyncio.Event()
    stopped = asyncio.Event()

    async def handle(reader, writer):
        while True:
            line = await reader.readline()
            if not line:
                break
            try:
                req = json.loads(line)
            except Exception:
                resp = {"success": False, "error": "Invalid JSON"}
            else:
                cmd = req.get("command")
                if cmd == "status":
                    resp = {
                        "success": True,
                        "status": json.dumps(
                            {
                                "running": True,
                                "total_requests": total["n"],
                                "successful_requests": total["ok"],
                                "average_processing_time_ms": 5.0,
                                "failed_requests": total["n"] - total["ok"],
                                "timed_out_requests": 0,
                                "worker_tag": args.tag,
                            }
                        ),
                    }
                elif cmd == "shutdown":
                    resp = {
                        "success": True,
                        "message": "Shutdown command received, stopping service...",
                    }
                    stopped.set()
                else:
                    if args.delay_ms:
                        await asyncio.sleep(args.delay_ms / 1000.0)
                    total["n"] += 1
                    total["ok"] += 1
                    resp = {
                        "request_id": total["n"],
                        "success": True,
                        "worker_tag": args.tag,
                        "words": [],
                    }
            writer.write((json.dumps(resp) + "\n").encode())
            await writer.drain()
            if stopped.is_set():
                break
            if args.recycle_after and total["n"] >= args.recycle_after:
                recycled.set()
                break
        writer.close()

    if args.boot_delay_ms:  # simulate a slow engine warmup
        await asyncio.sleep(args.boot_delay_ms / 1000.0)
    if os.path.exists(args.socket):
        os.unlink(args.socket)
    server = await asyncio.start_unix_server(handle, path=args.socket)
    waiters = [
        asyncio.ensure_future(stopped.wait()),
        asyncio.ensure_future(recycled.wait()),
    ]
    await asyncio.wait(waiters, return_when=asyncio.FIRST_COMPLETED)
    server.close()
    await server.wait_closed()
    return 3 if recycled.is_set() and not stopped.is_set() else 0


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--socket", required=True)
    p.add_argument("--tag", default="w")
    p.add_argument("--recycle-after", type=int, default=0)
    p.add_argument("--delay-ms", type=float, default=0.0)
    p.add_argument("--boot-delay-ms", type=float, default=0.0)
    # swallow the real service flags the supervisor passes through
    args, _unknown = p.parse_known_args()
    return asyncio.run(amain(args))


if __name__ == "__main__":
    sys.exit(main())
