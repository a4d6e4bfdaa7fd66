"""HTTP serving front-end: checkpoint -> always-on zero-shot classifier.

Production shape of cli/infer.py: a threading HTTP server (stdlib only — no
extra deps in the image) whose request threads decode videos GIL-free and
block on the MicroBatcher; a single worker thread coalesces concurrent
requests into one device dispatch (the serving forward amortizes ~1.5x from
bs16 to bs128 and is compute-walled at large batch, see
PERF_ROOFLINE_EVAL.json / ROADMAP "serving batch scaling").

Endpoints:
  POST /classify   {"videos": ["/path/a.mp4", ...]}           -> results[]
                   (or {"video": "/path/a.mp4"} -> one result)
  GET  /healthz    liveness + model identity
  GET  /stats      request/batch/dispatch counters + latency percentiles

Trust model: /classify takes FILESYSTEM PATHS and decodes them with the
serving process's privileges, so a client can probe file existence and read
any video the process can. The default bind is loopback (127.0.0.1), where
the client already has that access. When exposing beyond loopback
(--host 0.0.0.0), set `data_root`: paths whose realpath falls outside it are
rejected with 400 before touching the filesystem.

Start:  python -m zeroshotvideoclassification_tpu.cli.serve \
            --weights run/checkpoint.npz --classes "a" "b" --port 8000
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from zeroshotvideoclassification_tpu.serve.batcher import MicroBatcher
from zeroshotvideoclassification_tpu.serve.engine import InferenceEngine


class ZeroShotService:
    """Engine + batcher + counters; the handler delegates here."""

    def __init__(self, engine: InferenceEngine, max_wait_s: float = 0.01,
                 data_root: Optional[str] = None):
        self.engine = engine
        self.batcher = MicroBatcher(
            self._process, max_batch=engine.max_batch, max_wait_s=max_wait_s)
        self._lock = threading.Lock()
        self.n_http = 0
        self.data_root = (os.path.realpath(data_root)
                          if data_root is not None else None)

    def _process(self, paths):
        return self.engine.classify(paths)

    def path_allowed(self, path: str) -> bool:
        """data_root confinement (module docstring trust model); always True
        when no root is configured."""
        if self.data_root is None:
            return True
        real = os.path.realpath(path)
        return real == self.data_root or real.startswith(
            self.data_root + os.sep)

    def classify(self, paths):
        futs = [self.batcher.submit(p) for p in paths]
        return [f.result(timeout=600) for f in futs]

    def stats(self) -> dict:
        return {"http_requests": self.n_http,
                "batcher": self.batcher.stats(),
                "engine": self.engine.stats()}

    def close(self):
        self.batcher.shutdown()


def make_handler(service: ZeroShotService):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def do_GET(self):
            with service._lock:
                service.n_http += 1
            if self.path == "/healthz":
                self._send(200, {"status": "ok",
                                 "network": service.engine.config.network,
                                 "classes": len(service.engine.class_names)})
            elif self.path == "/stats":
                self._send(200, service.stats())
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            with service._lock:
                service.n_http += 1
            if self.path != "/classify":
                self._send(404, {"error": f"unknown path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                paths = req.get("videos")
                if paths is None and "video" in req:
                    paths = [req["video"]]
                if not isinstance(paths, list) or not paths:
                    self._send(400, {"error": "need 'videos': [paths] or "
                                              "'video': path"})
                    return
                paths = [str(p) for p in paths]
                denied = [p for p in paths
                          if not service.path_allowed(p)]
                if denied:
                    self._send(400, {"error": "path outside --data_root",
                                     "paths": denied})
                    return
                results = service.classify(paths)
                self._send(200, {"results": results} if "videos" in req
                           else results[0])
            except Exception as e:  # noqa: BLE001 — serving must not die
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve_forever(engine: InferenceEngine, host: str = "127.0.0.1",
                  port: int = 8000, max_wait_s: float = 0.01,
                  ready_event: Optional[threading.Event] = None,
                  data_root: Optional[str] = None):
    """Blocking server loop; returns the (server, service) pair via
    start_server for embedding/tests."""
    server, service = start_server(engine, host, port, max_wait_s,
                                   data_root=data_root)
    if ready_event is not None:
        ready_event.set()
    try:
        server.serve_forever()
    finally:
        service.close()


def start_server(engine: InferenceEngine, host: str = "127.0.0.1",
                 port: int = 0, max_wait_s: float = 0.01,
                 data_root: Optional[str] = None):
    """Non-blocking: bind (port 0 = ephemeral), run the accept loop on a
    daemon thread, return (server, service). Tests and notebooks use this."""
    service = ZeroShotService(engine, max_wait_s=max_wait_s,
                              data_root=data_root)
    server = ThreadingHTTPServer((host, port), make_handler(service))
    th = threading.Thread(target=server.serve_forever, daemon=True)
    th.start()
    return server, service
