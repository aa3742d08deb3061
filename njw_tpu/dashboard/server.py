"""stdlib HTTP dashboard server (REST role of the reference's
localhost:5000 API, ref: WorkloadContext.tsx:151-155)."""
from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

_STATIC_DIR = os.path.join(os.path.dirname(__file__), "static")


class DashboardServer:
    """Serves /api/results, /api/workloads (typed JSON matching
    njw_tpu.bench.BenchmarkResult) and the static UI."""

    def __init__(self, results_path: str, host: str = "127.0.0.1",
                 port: int = 5000):
        self.results_path = results_path
        self.host = host
        self.port = port
        self._httpd: Optional[ThreadingHTTPServer] = None
        self._thread: Optional[threading.Thread] = None

    def _load(self) -> list:
        if not os.path.exists(self.results_path):
            return []
        with open(self.results_path) as fh:
            return json.load(fh)

    def _handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _json(self, payload, code=200):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/api/results":
                    self._json(server._load())
                elif self.path == "/api/workloads":
                    rows = server._load()
                    self._json(sorted({r["workload"] for r in rows}))
                elif self.path in ("/", "/index.html"):
                    path = os.path.join(_STATIC_DIR, "index.html")
                    with open(path, "rb") as fh:
                        body = fh.read()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self._json({"error": "not found"}, 404)

        return Handler

    def start(self) -> "DashboardServer":
        self._httpd = ThreadingHTTPServer((self.host, self.port),
                                          self._handler())
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self):
        if self._httpd:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None

    @property
    def url(self) -> str:
        return f"http://{self.host}:{self.port}"


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(prog="njw_tpu.dashboard")
    p.add_argument("--results", default="benchmark_results/results.json")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=5000)
    args = p.parse_args(argv)
    server = DashboardServer(args.results, args.host, args.port).start()
    print(f"dashboard at {server.url} (ctrl-c to stop)")
    try:
        server._thread.join()
    except KeyboardInterrupt:
        server.stop()
    return 0
