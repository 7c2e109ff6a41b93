"""IPC protocol tests against a live service over the Unix socket —
coverage the reference never had (SURVEY.md §4: "IPC layer is untested")."""

import base64
import json
import socket
import threading
import time

import numpy as np
import pytest

from ppocr_tpu.serve import OCRIPCClient, OCRIPCService
from test_pipeline import small_config

SOCKET = "/tmp/ppocr_tpu_test.sock"


@pytest.fixture(scope="module")
def service(reference_models):
    svc = OCRIPCService(
        model_dir=str(reference_models),
        socket_path=SOCKET,
        cpu_workers=2,
        config=small_config(),
    )
    # compile every shape bucket on the MAIN thread — the TPU plugin cannot
    # compile from worker threads (see OCREngine.warmup docstring)
    svc.engine.warmup()
    ready = threading.Event()
    t = threading.Thread(target=svc.run_blocking, args=(ready,), daemon=True)
    t.start()
    assert ready.wait(timeout=60)
    yield svc
    if svc.running and svc._loop is not None:
        import asyncio

        asyncio.run_coroutine_threadsafe(svc.stop_async(), svc._loop)
    t.join(timeout=10)


@pytest.fixture()
def client(service):
    c = OCRIPCClient(SOCKET, timeout_ms=60000)
    assert c.connect()
    yield c
    c.disconnect()


class TestProtocol:
    def test_recognize_inline_base64(self, client, card_image_path):
        r = client.recognize_image(str(card_image_path))  # <600 KB → inlined
        assert r["success"] is True
        assert r["width"] == 391 and r["height"] == 178
        assert "words" in r and isinstance(r["words"], list)
        assert "request_id" in r and "worker_id" in r

    def test_recognize_by_path(self, client, card_image_path):
        r = client.send_request(
            {"command": "recognize", "image_path": str(card_image_path)}
        )
        assert r["success"] is True

    def test_recognize_missing_image(self, client):
        r = client.send_request({"command": "recognize"})
        assert r["success"] is False
        assert r["error"] == "Missing image_path or image_data"

    def test_recognize_bad_path(self, client):
        r = client.send_request(
            {"command": "recognize", "image_path": "/nonexistent.jpg"}
        )
        assert r["success"] is False
        assert r["error"].startswith("Failed to load image from path:")

    def test_recognize_bad_base64(self, client):
        r = client.send_request(
            {"command": "recognize", "image_data": "!!!notbase64!!!"}
        )
        assert r["success"] is False
        assert r["error"] == "Failed to decode base64 image data"

    def test_base64_not_an_image(self, client):
        bogus = base64.b64encode(b"hello world").decode()
        r = client.send_request({"command": "recognize", "image_data": bogus})
        assert r["success"] is False

    def test_status_counts_requests(self, client, card_image_path):
        before = json.loads(client.get_service_status()["status"])
        client.recognize_image(str(card_image_path))
        after_raw = client.get_service_status()
        assert after_raw["success"] is True
        after = json.loads(after_raw["status"])
        assert after["running"] is True
        assert after["total_requests"] == before["total_requests"] + 1
        # the reference's successful_requests counter is stuck at 0
        # (latent bug, SURVEY.md §5) — ours must actually count
        assert after["successful_requests"] == before["successful_requests"] + 1
        assert after["average_processing_time_ms"] > 0

    def test_unknown_command(self, client):
        r = client.send_request({"command": "fly"})
        assert r == {"success": False, "error": "Unknown command: fly"}

    def test_invalid_json(self, client):
        client._sock.sendall(b"this is not json\n")
        line = client._file.readline()
        r = json.loads(line)
        assert r["success"] is False and r["error"].startswith("Invalid JSON:")

    def test_oversized_message_guarded(self, service):
        s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        s.connect(SOCKET)
        s.settimeout(30)
        payload = b'{"command":"recognize","image_data":"' + b"A" * (1100 * 1024) + b'"}\n'
        s.sendall(payload)
        f = s.makefile("rb")
        r = json.loads(f.readline())
        assert r["success"] is False
        assert r["error"] == (
            "Data too large for buffer (max 1MB). "
            "Consider using file path transmission."
        )
        s.close()

    def test_oversize_boundary_matches_reference(self, service):
        """The reference rejects at bytes_read == buffer-1: a payload of
        exactly 1,048,575 bytes errors; one byte less is processed
        (ocr_ipc_service.cpp:222)."""

        def probe(payload_len):
            s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            s.connect(SOCKET)
            s.settimeout(30)
            s.sendall(b"x" * payload_len + b"\n")
            f = s.makefile("rb")
            r = json.loads(f.readline())
            s.close()
            return r["error"]

        assert probe(1048575).startswith("Data too large")
        # one byte under the boundary reaches the JSON parser instead
        assert probe(1048574).startswith("Invalid JSON")

    def test_concurrent_clients(self, service, card_image_path):
        results = []

        def worker():
            c = OCRIPCClient(SOCKET, timeout_ms=120000)
            assert c.connect()
            results.append(c.recognize_image(str(card_image_path)))
            c.disconnect()

        threads = [threading.Thread(target=worker) for _ in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert len(results) == 3
        assert all(r["success"] for r in results)
        assert len({r["request_id"] for r in results}) == 3


class TestShutdown:
    def test_shutdown_replies_then_stops(self, reference_models):
        sock = "/tmp/ppocr_tpu_shutdown_test.sock"
        svc = OCRIPCService(
            model_dir=str(reference_models),
            socket_path=sock,
            cpu_workers=1,
            config=small_config(),
        )
        svc.engine.warmup()
        ready = threading.Event()
        t = threading.Thread(target=svc.run_blocking, args=(ready,), daemon=True)
        t.start()
        assert ready.wait(timeout=60)
        c = OCRIPCClient(sock, timeout_ms=30000)
        assert c.connect()
        r = c.send_shutdown_command()
        assert r["success"] is True
        assert r["message"] == "Shutdown command received, stopping service..."
        c.disconnect()
        t.join(timeout=10)
        assert not t.is_alive()
        assert svc.running is False


def test_client_cli_visualize(service, card_image_path, tmp_path):
    """ocr-client --visualize writes a box-overlay image next to printing
    the JSON (Utility::VisualizeBboxes analog)."""
    import cv2

    from ppocr_tpu.cli.client_main import main as client_main

    out = tmp_path / "vis.png"
    rc = client_main(
        [str(card_image_path), "--socket", SOCKET, "--visualize", str(out)]
    )
    assert rc == 0
    vis = cv2.imread(str(out))
    src = cv2.imread(str(card_image_path))
    assert vis is not None and vis.shape == src.shape


def test_pipe_name_mapping():
    r"""Reference-style \\.\pipe\NAME arguments map to /tmp/NAME.sock
    (ocr_service_main.cpp's default pipe name keeps working)."""
    from ppocr_tpu.cli.common import resolve_socket_path

    assert (
        resolve_socket_path(r"\\.\pipe\ocr_service") == "/tmp/ocr_service.sock"
    )
    assert resolve_socket_path("/run/x.sock") == "/run/x.sock"


def test_chunked_request_frames(service, card_image_path):
    """The NDJSON reader must tolerate a request arriving in arbitrary
    byte-sized chunks (TCP-style partial writes)."""
    import json
    import socket
    import time

    payload = (
        json.dumps(
            {"command": "recognize", "image_path": str(card_image_path)}
        ).encode()
        + b"\n"
    )
    s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    s.settimeout(60)
    s.connect(SOCKET)
    try:
        for i in range(0, len(payload), 7):
            s.sendall(payload[i : i + 7])
            time.sleep(0.001)
        buf = b""
        while not buf.endswith(b"\n"):
            chunk = s.recv(65536)
            assert chunk, "connection closed early"
            buf += chunk
        resp = json.loads(buf)
        assert resp["success"] is True
    finally:
        s.close()


def test_two_requests_one_connection(service, card_image_path):
    """Multiple newline-framed commands over a single connection (the
    reference's per-message loop, ocr_ipc_service.cpp:203-241)."""
    import json
    import socket

    s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    s.settimeout(60)
    s.connect(SOCKET)
    f = s.makefile("rwb")
    try:
        for expect_cmd in ("status", "status"):
            f.write(json.dumps({"command": expect_cmd}).encode() + b"\n")
            f.flush()
            resp = json.loads(f.readline())
            assert resp["success"] is True
    finally:
        s.close()


class TestClientResilience:
    """Round-3 review: reconnect-after-recycle, timeout desync, empty-file
    transport fallback."""

    def test_client_reconnects_after_connection_loss(self, service):
        c = OCRIPCClient(SOCKET, timeout_ms=60000)
        assert c.connect()
        r1 = c.get_service_status()
        assert r1["success"] is True
        # simulate the server side closing (recycle): kill our socket
        c._sock.shutdown(socket.SHUT_RDWR)
        with pytest.raises(ConnectionError):
            c.get_service_status()
        # the dead connection was torn down — the next call reconnects
        r2 = c.get_service_status()
        assert r2["success"] is True
        c.disconnect()

    def test_empty_file_falls_back_to_path(self, tmp_path):
        """The reference requires file_size > 0 to inline
        (ocr_ipc_client.cpp:148-150); empty files ship as image_path."""
        p = tmp_path / "empty.png"
        p.write_bytes(b"")
        c = OCRIPCClient("/tmp/nonexistent-client-test.sock", timeout_ms=1)
        sent = {}
        c.send_request = lambda req: sent.update(req) or {"success": False}
        c.recognize_image(str(p))
        assert "image_path" in sent and "image_data" not in sent

    def test_vanished_file_falls_back_to_path(self, tmp_path, monkeypatch):
        """A file that stats OK but fails to open (deleted in between)
        ships as image_path like the reference's empty-base64 fallback
        (ocr_ipc_client.cpp:166-169), instead of raising OSError."""
        import builtins

        p = tmp_path / "gone.png"
        p.write_bytes(b"x" * 100)
        real_open = builtins.open

        def flaky_open(path, *a, **k):
            if str(path) == str(p):
                raise OSError("deleted between stat and open")
            return real_open(path, *a, **k)

        monkeypatch.setattr(builtins, "open", flaky_open)
        c = OCRIPCClient("/tmp/nonexistent-client-test.sock", timeout_ms=1)
        sent = {}
        c.send_request = lambda req: sent.update(req) or {"success": False}
        c.recognize_image(str(p))
        assert "image_path" in sent and "image_data" not in sent
