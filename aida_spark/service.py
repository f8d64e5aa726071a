"""S10: minimal HTTP disambiguation service over the Spark pipeline.

The reference exposes disambiguation over REST
(``service/web/RequestProcessor.java:76,463-466,519-590``: POST text,
receive the mention->entity assignments as JSON). This module closes
that last SURVEY §2 surface with the Python stdlib only — no web
framework exists in this container, and the service is explicitly a
thin adapter: all real work happens in :func:`aida_spark.api.
disambiguate_texts`, i.e. the full Spark pipeline.

Design notes:
- ONE SparkSession, shared across requests (the reference likewise
  serves from one warmed-up engine; Spark drivers are not per-request
  objects). Requests are handled on the server's thread pool but the
  Spark work itself serializes per call — this surface is for the
  "one document, right now" use, not corpus throughput; point batch
  work at ``AidaPipeline.run``.
- Endpoints:
    GET  /health              -> {"status": "ok"}
    POST /disambiguate        body {"text": "..."} or {"texts": [...]}
                              -> {"results": [[assignment, ...], ...]}
  with assignment = {"mention", "entity", "score", "char_offset"}
  (LINKED mentions only — O5 OOKBE cleanup applies, see api.py).
- ``port=0`` binds an ephemeral port (tests); ``serve(...)`` returns
  the started server — call ``.shutdown()`` + ``.server_close()`` when
  done, or use it as a context manager via ``contextlib.closing``.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession

from .api import disambiguate_texts
from .pipeline import PipelineConfig

__all__ = ["serve"]


def serve(
    spark: SparkSession,
    kb_tables: dict,
    host: str = "127.0.0.1",
    port: int = 8080,
    config: PipelineConfig | None = None,
) -> ThreadingHTTPServer:
    """Start the disambiguation HTTP server on a daemon thread and
    return it (already serving). The caller owns shutdown."""
    # one pipeline config for the server's lifetime; Spark calls are
    # serialized so concurrent POSTs don't interleave half-built jobs
    spark_lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args) -> None:  # quiet by default
            pass

        def _json(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self) -> None:
            if self.path == "/health":
                self._json(200, {"status": "ok"})
            else:
                self._json(404, {"error": f"no such path {self.path}"})

        def do_POST(self) -> None:
            if self.path != "/disambiguate":
                self._json(404, {"error": f"no such path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                if not isinstance(req, dict):
                    # valid JSON that is not an object ([], "x", 42)
                    # would otherwise TypeError at req["text"] and drop
                    # the connection instead of returning 400 (ADVICE r5)
                    raise ValueError("request body must be a JSON object")
                texts = (
                    req["texts"]
                    if "texts" in req
                    else [req["text"]]
                )
                if not isinstance(texts, list) or not all(
                    isinstance(t, str) for t in texts
                ):
                    raise ValueError("texts must be strings")
            except (KeyError, ValueError, json.JSONDecodeError) as exc:
                self._json(400, {"error": f"bad request: {exc}"})
                return
            with spark_lock:
                results = disambiguate_texts(spark, texts, kb_tables, config)
            self._json(200, {"results": results})

    server = ThreadingHTTPServer((host, port), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server
