"""Deterministic loopback HTTP server for exercising the HTTP
enrichment operators end-to-end (driver-side daemon; executors reach
it over 127.0.0.1 in local mode)."""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_server: ThreadingHTTPServer | None = None
_lock = threading.Lock()


class _EchoHandler(BaseHTTPRequestHandler):
    """GET /x -> 200 'x'; POST /x body b -> 200 'x|b'; /err/<code> -> error."""

    def _payload(self) -> tuple[int, str]:
        from urllib.parse import unquote_plus

        path = unquote_plus(self.path.lstrip("/"))
        if path.startswith("err/"):
            return int(path.split("/", 1)[1]), "error"
        return 200, path

    def do_GET(self):  # noqa: N802 (stdlib naming)
        code, body = self._payload()
        data = body.encode("utf-8")
        self.send_response(code)
        self.send_header("Content-Type", "text/plain; charset=utf-8")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_POST(self):  # noqa: N802
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length).decode("utf-8", errors="replace")
        code, path_part = self._payload()
        data = f"{path_part}|{body}".encode()
        self.send_response(code)
        self.send_header("Content-Type", "text/plain; charset=utf-8")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *args):  # silence request logging
        pass


def ensure_echo_server() -> int:
    """Start (once) the echo server on an ephemeral port; returns the port."""
    global _server
    with _lock:
        if _server is None:
            _server = ThreadingHTTPServer(("127.0.0.1", 0), _EchoHandler)
            t = threading.Thread(target=_server.serve_forever, daemon=True)
            t.start()
        return _server.server_address[1]
