"""ocr-service: start the OCR IPC service.

Flag-compatible with the reference service CLI (ocr_service_main.cpp:89-110
— defaults ./models, pipe ocr_service, gpu-workers 0, cpu-workers 1), plus
TPU-era extras (--profile, --dtype, --no-warmup). Ctrl-C stops the service
cleanly (the reference's ConsoleHandler); a status line is printed every
30 s like the reference's status loop (ocr_service_main.cpp:134-148).

Usage:
    python -m ppocr_tpu.cli.service_main --model-dir ./models \
        --socket /tmp/ocr_service.sock --cpu-workers 4
"""

from __future__ import annotations

import argparse
import asyncio
import signal
import sys

from .common import resolve_socket_path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="ocr-service",
        description="TPU-native PP-OCR IPC service",
        # abbreviations are forbidden: the supervisor strips flags from
        # worker argv by EXACT name ('--processes', '--socket',
        # '--recycle-after'); an accepted abbreviation like '--proc 4'
        # would survive the strip and make every worker re-spawn its own
        # supervisor (a fork bomb)
        allow_abbrev=False,
    )
    p.add_argument("--model-dir", default="./models", help="model directory (det/ cls/ rec/)")
    p.add_argument(
        "--socket",
        "--pipe-name",
        dest="socket",
        default="/tmp/ocr_service.sock",
        help=r"unix socket path (reference pipe names \\.\pipe\NAME are mapped to /tmp/NAME.sock)",
    )
    p.add_argument("--gpu-workers", type=int, default=0, help="accepted for flag parity; >0 selects the device pool")
    p.add_argument("--cpu-workers", type=int, default=1, help="number of logical workers")
    p.add_argument("--profile", choices=["serving", "defaults"], default="serving")
    p.add_argument("--dtype", choices=["bfloat16", "float32"], default="bfloat16")
    p.add_argument(
        "--cls",
        action="store_true",
        help="enable orientation classification (off by default, like the reference)",
    )
    p.add_argument(
        "--fast-path",
        action="store_true",
        help="single-dispatch fused det→(cls)→rec pipeline (the default "
        "for --profile serving since round 3; kept for compatibility)",
    )
    p.add_argument(
        "--staged",
        action="store_true",
        help="serve the staged exact-parity pipeline (det → cv2 contours → "
        "crop → rec, one dispatch per stage) instead of the default fused "
        "single-dispatch path; slower through a per-dispatch-taxed link "
        "but bit-exact cv2/Clipper postprocess semantics",
    )
    p.add_argument("--no-warmup", action="store_true", help="skip bucket pre-compilation")
    p.add_argument(
        "--warmup",
        choices=["auto", "full", "incremental", "off"],
        default="auto",
        help="variant pre-compilation strategy: full = compile every "
        "variant before accepting connections (reference-style "
        "load-then-serve, tens of minutes on a cold tunnel cache for the "
        "full serving set); incremental = start serving IMMEDIATELY and "
        "compile the fused variant set one at a time on the event loop "
        "between requests (a request for an uncompiled variant compiles "
        "it on demand, jumping the queue); auto (default) = incremental "
        "for fused single/mesh profiles, full for --staged/--cross-chip; "
        "off = no precompilation (same on-demand guard). --no-warmup is "
        "an alias for off",
    )
    p.add_argument("--status-interval", type=float, default=30.0)
    p.add_argument(
        "--batch-requests",
        type=int,
        default=1,
        help="fast-path only: coalesce up to N concurrent requests into one "
        "device call (adds warmup compiles per batch bucket)",
    )
    p.add_argument(
        "--batch-buckets",
        choices=["pow2", "single"],
        default="pow2",
        help="batch-size compile buckets for --batch-requests N: pow2 = "
        "1,2,4,...,N (lowest per-request compute, N x warmup compiles); "
        "single = N only (partial batches pad up — ~3x faster cold boot, "
        "padding is cheap on-chip)",
    )
    p.add_argument(
        "--det-buckets",
        default=None,
        help="comma-separated det compilation shape buckets (e.g. 192,384,512); "
        "fewer buckets = faster cold-start warmup, more input padding",
    )
    p.add_argument(
        "--rec-decode",
        choices=["greedy", "beam"],
        default="greedy",
        help="CTC decode for the staged path: greedy (reference parity) or "
        "prefix beam search (recovers labelings greedy misses)",
    )
    p.add_argument(
        "--beam-size", type=int, default=10, help="beam width for --rec-decode beam"
    )
    p.add_argument(
        "--max-boxes",
        type=int,
        default=None,
        help="fast-path only: top-K blob candidates per image (default 32); "
        "lower = less padded rec compute per request",
    )
    p.add_argument(
        "--cross-chip",
        action="store_true",
        help="fast-path only: stage det/geometry on device 0 and rec on "
        "device 1 with a device-to-device crops handoff (needs >= 2 chips)",
    )
    p.add_argument(
        "--rotated-boxes",
        action="store_true",
        help="fast-path only: emit min-area rotated rect quads "
        "(closed-form minAreaRect approximation on device) instead of "
        "axis-aligned boxes",
    )
    p.add_argument(
        "--crop-src-mult",
        type=int,
        default=None,
        help="fast-path only: sample rec/cls crops from an N×-resolution "
        "resize of the source image instead of the det-scale canvas "
        "(default 1). Recovers staged-path crop sharpness when det "
        "downscales (large inputs, small --det-buckets) at N² the image "
        "upload bytes per request",
    )
    p.add_argument(
        "--mesh",
        type=int,
        default=1,
        help="shard fused request batches over the data axis of an N-device "
        "mesh (params replicated; the multi-chip replacement for N worker "
        "replicas). Pair with --batch-requests >= N so batches fill shards.",
    )
    p.add_argument(
        "--request-timeout",
        type=float,
        default=30000.0,
        help="per-request wall-clock ceiling in ms; 0 disables it "
        "(reference clients honor --timeout; the service enforces it too "
        "so a wedged request cannot pin a connection forever)",
    )
    p.add_argument(
        "--system-info",
        action="store_true",
        help="print worker sizing advice and exit (getWorkerRecommendation analog)",
    )
    p.add_argument(
        "--processes",
        type=int,
        default=1,
        help="multi-process serving: N worker service processes behind a "
        "request-level balancer on the public socket (the GIL-proof "
        "replacement for the reference's N worker threads). Workers boot "
        "sequentially; warm boots hit the persistent XLA cache.",
    )
    p.add_argument(
        "--recycle-after",
        type=int,
        default=0,
        help="self-recycle the service process after N recognize requests "
        "(graceful drain, exit code 3). Bounds the per-process RSS growth "
        "of the axon host-transfer leak; under --processes > 1 the "
        "supervisor restarts recycled workers automatically.",
    )
    p.add_argument(
        "--boot-timeout",
        type=float,
        default=3600.0,
        help="--processes mode: seconds to wait for each worker's socket "
        "(first-ever boots compile for many minutes through the tunnel)",
    )
    p.add_argument(
        "--platform",
        default=None,
        help="force the JAX platform (e.g. cpu). Needed because this "
        "environment ignores the JAX_PLATFORMS env var once a plugin "
        "registers — jax.config is the only reliable switch",
    )
    p.add_argument(
        "--config",
        default=None,
        help="JSON file with PipelineConfig field overrides applied on top "
        "of --profile (nested keys mirror the dataclasses, e.g. "
        '{"det": {"shape_buckets": [64, 96]}, "rec": {"img_w": 256}})',
    )
    return p


def apply_config_overrides(config, data: dict):
    """Recursively apply a JSON override dict onto the nested dataclass
    config (lists become tuples to match the bucket fields; *bucket* lists
    are sorted ascending — pick_bucket and the det_fit_cap downscale both
    assume it, and the flag path sorts for the same reason)."""
    for k, v in data.items():
        if not hasattr(config, k):
            raise ValueError(f"unknown config field: {k}")
        cur = getattr(config, k)
        if isinstance(v, dict):
            apply_config_overrides(cur, v)
        elif isinstance(v, list):
            setattr(config, k, tuple(sorted(v) if "buckets" in k else v))
        else:
            setattr(config, k, v)


def batch_bucket_list(max_batch: int, mode: str = "pow2") -> tuple:
    """Compile-bucket list for cross-request batching: "pow2" = 1,2,4,…,N;
    "single" = (N,) — partial batches pad up, trading a little on-chip
    padding compute for ~N/log2(N)× fewer cold-boot compiles."""
    if mode == "single":
        return (max_batch,)
    bb, b = [], 1
    while b < max_batch:
        bb.append(b)
        b *= 2
    return tuple(bb + [max_batch])


def resolve_service_config(args):
    """Flags → profile + overrides → validated PipelineConfig.

    Returns (config, None) or (None, exit_code). Split from _amain so the
    flag/file precedence rules are testable without booting a service."""
    from ..pipeline import PipelineConfig

    config = (
        PipelineConfig.serving()
        if args.profile == "serving"
        else PipelineConfig.defaults()
    )
    config.dtype = args.dtype
    config.enable_cls = bool(args.cls)
    # serving profile defaults to the fused path (VERDICT r2 #5); --staged
    # selects the exact-parity staged pipeline, --fast-path forces fused
    # for the defaults profile
    if args.staged and args.fast_path:
        print("--staged and --fast-path are mutually exclusive", flush=True)
        return None, 2
    if args.staged:
        config.fast_path = False
    elif args.fast_path:
        config.fast_path = True
    if args.det_buckets:
        config.det.shape_buckets = tuple(
            sorted(int(v) for v in args.det_buckets.split(","))
        )
    if args.max_boxes:
        config.fused_max_boxes = args.max_boxes
    if args.crop_src_mult is not None:
        if args.crop_src_mult < 1:
            print("--crop-src-mult must be >= 1", flush=True)
            return None, 2
        config.fused_crop_src_mult = args.crop_src_mult
    config.fused_rotated_boxes = bool(args.rotated_boxes)
    config.cross_chip = bool(args.cross_chip)
    config.rec.decode = args.rec_decode
    config.rec.beam_size = args.beam_size
    if args.config:
        # config file wins over flags (applied last): the precise typed
        # surface for fields the flag set doesn't reach
        import json as _json

        apply_config_overrides(config, _json.load(open(args.config)))
    # --batch-requests is evaluated on the FINAL fast_path state (a config
    # file may be what enables the fused path); an explicit
    # request_batch_buckets from the file still wins over the flag
    if (
        args.batch_requests > 1
        and config.fast_path
        and config.request_batch_buckets == (1,)
    ):
        config.request_batch_buckets = batch_bucket_list(
            args.batch_requests, args.batch_buckets
        )

    # feature-combination invariants checked on the FINAL config state —
    # after the config-file overrides, which could otherwise reintroduce
    # exactly the combinations these guards exist to reject
    if config.cross_chip and not config.fast_path:
        print("--cross-chip requires the fused path (drop --staged)", flush=True)
        return None, 2
    if config.cross_chip and max(config.request_batch_buckets or (1,)) > 1:
        # the batching dispatcher serves the single-chip fused step; a
        # silently ignored --cross-chip would mislead (ADVICE r2)
        print(
            "--cross-chip is incompatible with --batch-requests > 1 "
            "(cross-request batching uses the single-chip fused step)",
            flush=True,
        )
        return None, 2
    return config, None


async def _amain(args) -> int:
    from ..serve import OCRIPCService

    config, err = resolve_service_config(args)
    if err is not None:
        return err

    print(f"Loading models from {args.model_dir} ...", flush=True)
    engine = None
    if args.mesh > 1:
        if not config.fast_path:
            print(
                "--mesh requires the fused path (the staged parity "
                "pipeline is single-device — drop --staged)",
                flush=True,
            )
            return 2
        import jax

        from ..parallel import make_mesh
        from ..pipeline import OCREngine

        n_dev = len(jax.devices())
        if n_dev < args.mesh:
            print(f"--mesh {args.mesh}: only {n_dev} devices visible", flush=True)
            return 2
        mesh = make_mesh(args.mesh, model=1)
        engine = OCREngine(args.model_dir, config, mesh=mesh)
        print(
            f"Data-parallel fused serving over {args.mesh} devices",
            flush=True,
        )
    service = OCRIPCService(
        model_dir=args.model_dir,
        socket_path=resolve_socket_path(args.socket),
        cpu_workers=args.cpu_workers,
        gpu_workers=args.gpu_workers,
        config=config,
        engine=engine,
        request_timeout_ms=args.request_timeout,
        recycle_after=args.recycle_after,
    )
    for name, is_random in service.engine.random_weights.items():
        if is_random:
            print(
                f"WARNING: {name} weights not found (inference.pdiparams); "
                "using deterministic stand-in weights",
                flush=True,
            )
    warmup_mode = "off" if args.no_warmup else args.warmup
    if warmup_mode == "auto":
        warmup_mode = (
            "incremental"
            if config.fast_path and not getattr(config, "cross_chip", False)
            else "full"
        )
    elif warmup_mode == "incremental" and (
        not config.fast_path or getattr(config, "cross_chip", False)
    ):
        print(
            "--warmup incremental requires the fused single/mesh path "
            "(drop --staged/--cross-chip or use --warmup full)",
            flush=True,
        )
        return 2
    if warmup_mode == "full":
        secs = service.engine.warmup()
        print(f"Warmup compiled all shape buckets in {secs:.1f}s", flush=True)

    await service.start_async()
    print(
        f"OCR service listening on {service.socket_path} "
        f"({service.num_workers} workers)",
        flush=True,
    )

    warmup_task = None
    if warmup_mode == "incremental":
        n = len(service.engine.fused_ocr().variant_keys())
        print(
            f"Incremental warmup: serving now; compiling {n} fused "
            "variants in the background (status shows warmup_progress)",
            flush=True,
        )

        async def _warm():
            secs = await service.incremental_warmup()
            print(
                f"Incremental warmup finished: {n} variants in {secs:.1f}s",
                flush=True,
            )

        warmup_task = asyncio.get_running_loop().create_task(_warm())

    loop = asyncio.get_running_loop()
    for sig in (signal.SIGINT, signal.SIGTERM):
        loop.add_signal_handler(sig, lambda: asyncio.ensure_future(service.stop_async()))

    async def status_loop():
        while service.running:
            await asyncio.sleep(args.status_interval)
            if service.running:
                print(f"[status] {service.get_status_info()}", flush=True)

    status_task = asyncio.get_running_loop().create_task(status_loop())
    await service._stopped.wait()
    status_task.cancel()
    if warmup_task is not None:
        warmup_task.cancel()
    if service.recycled:
        print(
            f"Service recycled after {service.total_requests} requests.",
            flush=True,
        )
        return 3  # balancer.RECYCLE_EXIT_CODE — supervisor relaunches
    print("Service stopped.", flush=True)
    return 0


def _strip_flag(argv, flag, has_value=True):
    out, skip = [], 0
    for a in argv:
        if skip:
            skip -= 1
            continue
        if a == flag:
            skip = 1 if has_value else 0
            continue
        if a.startswith(flag + "="):
            continue
        out.append(a)
    return out


async def _supervisor_main(args, argv) -> int:
    """--processes N: spawn N worker services + the request balancer
    (serve.balancer) on the public socket."""
    import signal

    from ..serve.balancer import ServiceSupervisor

    worker_args = _strip_flag(_strip_flag(list(argv), "--processes"), "--socket")
    worker_args = _strip_flag(worker_args, "--pipe-name")
    # the SUPERVISOR owns recycling in multi-process mode (rolling
    # rotation, replacement-first); workers must not self-recycle
    worker_args = _strip_flag(worker_args, "--recycle-after")
    sup = ServiceSupervisor(
        resolve_socket_path(args.socket),
        args.processes,
        worker_args,
        boot_timeout=args.boot_timeout,
        recycle_after=args.recycle_after,
    )
    loop = asyncio.get_running_loop()
    for sig in (signal.SIGINT, signal.SIGTERM):
        loop.add_signal_handler(
            sig, lambda: asyncio.ensure_future(sup.stop_async())
        )
    print(
        f"Starting {args.processes} worker processes "
        f"(recycle after {args.recycle_after or 'never'})...",
        flush=True,
    )
    await sup.start_async()
    print(
        f"OCR balancer listening on {sup.socket_path} "
        f"({args.processes} worker processes)",
        flush=True,
    )
    mon = loop.create_task(sup.monitor())
    await sup.balancer._stopped.wait()
    mon.cancel()
    await sup.stop_async()
    print("Service stopped.", flush=True)
    return 0


def main(argv=None) -> int:
    import sys as _sys

    raw_argv = list(argv) if argv is not None else _sys.argv[1:]
    args = build_parser().parse_args(raw_argv)
    if args.platform:
        import os as _os

        _os.environ["JAX_PLATFORMS"] = args.platform
        import jax as _jax

        _jax.config.update("jax_platforms", args.platform)
    if args.system_info:
        from ..pipeline import worker_recommendation

        print(worker_recommendation(enable_cls=args.cls).pretty())
        return 0
    try:
        if args.processes > 1:
            return asyncio.run(_supervisor_main(args, raw_argv))
        return asyncio.run(_amain(args))
    except KeyboardInterrupt:
        return 0


if __name__ == "__main__":
    sys.exit(main())
