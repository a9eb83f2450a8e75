"""A1 HTTP health surface — the reference's Express app re-derived on stdlib.

The reference boots an Express app whose single route is a static health
check (/root/reference/src/app.ts:23-25):

    app.get("/info", (_, res) => res.status(200).json({ status: "OK" }))

listening on config.SERVER_PORT (src/utils/configReader.ts). This module
serves the same contract with no third-party deps:

- ``GET /info``   -> 200 ``{"status": "OK"}``  (byte-for-byte parity)
- ``GET /status`` -> 200 ``{"status": "OK", "lease": ...}`` — the engine's
  useful health surface: the provider callable is polled per request, so a
  long-running `main.py --serve-port` run exposes the live resume lease and
  per-batch metrics without touching the streaming thread.
- anything else   -> 404 ``{"status": "Not Found"}``

Runs in a daemon thread (ThreadingHTTPServer) so it never blocks or outlives
the driver; on a cluster this runs on the driver node, matching where the
reference's Express process lives relative to its Mongo/EventHub workers.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional


class HealthServer:
    """Tiny driver-side health endpoint.

    Parameters
    ----------
    port: TCP port; 0 picks a free one (read it back from ``.port``).
    status_provider: optional zero-arg callable returning a JSON-serializable
        dict merged into the ``/status`` payload (e.g. the pipeline's
        ``current_lease``). Exceptions in the provider degrade to
        ``{"provider_error": str(e)}`` rather than failing the health check —
        a wedged provider must not make the service look dead.
    host: bind address. The library default is loopback (safe for tests and
        embedded use); the ``main.py --serve-host`` service entrypoint
        defaults to ``0.0.0.0`` for parity with the reference's
        ``app.listen(port)`` (Express binds all interfaces), so external
        liveness probes can reach the driver.
    """

    def __init__(self, port: int = 0,
                 status_provider: Optional[Callable[[], dict]] = None,
                 host: str = "127.0.0.1"):
        self._provider = status_provider
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet; the driver log is stdout JSON
                pass

            def _send(self, code: int, payload: dict):
                body = json.dumps(payload, default=str).encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                path = self.path.split("?", 1)[0].rstrip("/") or "/"
                if path == "/info":
                    self._send(200, {"status": "OK"})
                elif path == "/status":
                    payload = {"status": "OK"}
                    if outer._provider is not None:
                        try:
                            payload.update(outer._provider() or {})
                        except Exception as e:  # degrade, don't flap
                            payload["provider_error"] = str(e)
                    self._send(200, payload)
                else:
                    self._send(404, {"status": "Not Found"})

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._server.daemon_threads = True
        self._thread: Optional[threading.Thread] = None

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    def start(self) -> "HealthServer":
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="cdc-health", daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    def __enter__(self) -> "HealthServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
