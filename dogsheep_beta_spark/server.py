"""Minimal HTTP serving mode — the literal counterpart of the
reference's route registration (reference dogsheep_beta/__init__.py:
261-263 registers ``/-/beta`` via Datasette's ``register_routes``).

The engine's page layer already produces the complete beta.html
document (``page.beta_page``, golden-tested against the reference's
BeautifulSoup assertions); this module only puts a socket in front of
it, with the stdlib ``http.server`` — no web framework, matching the
repo's no-extra-dependency stance.

One SparkSession, one loaded index, one FTS build serve EVERY request
(the reference's one-index-many-queries lifecycle): the caller passes
them in, the handler closes over them.  ``ThreadingHTTPServer`` +
Spark's thread-safe job submission means concurrent requests simply
become concurrent Spark jobs; per-request work is the compiled page
plan (persisted filtered set, broadcast hydration joins), so request
latency is the same as one ``beta_page`` call.
"""

from __future__ import annotations

from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

ROUTES = ("/-/beta", "/")  # reference path + a convenience root alias


def make_handler(spark, index_df, fts, rules=None, template_debug=False):
    """A BaseHTTPRequestHandler subclass closed over the loaded index."""
    from dogsheep_beta_spark.page import beta_page

    class BetaHandler(BaseHTTPRequestHandler):
        server_version = "dogsheep-beta-spark"

        def do_GET(self):  # noqa: N802 (stdlib naming)
            u = urlparse(self.path)
            if u.path not in ROUTES:
                self._respond(404, "not found\n", "text/plain")
                return
            # first value wins per key, like Datasette's request.args
            args = {k: v[0] for k, v in parse_qs(u.query).items()}
            try:
                html = beta_page(
                    spark, index_df, fts, args, rules, template_debug
                )
            except Exception as e:  # surface, don't kill the server
                self._respond(500, f"error: {e}\n", "text/plain")
                return
            self._respond(200, html, "text/html; charset=utf-8")

        def _respond(self, code: int, body: str, ctype: str) -> None:
            data = body.encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return BetaHandler


def make_server(
    spark,
    index_df,
    fts,
    rules=None,
    host: str = "127.0.0.1",
    port: int = 8001,
    template_debug: bool = False,
) -> ThreadingHTTPServer:
    """Bound-but-not-running server (port 0 → ephemeral, for tests);
    call ``serve_forever()`` / ``shutdown()`` on the result."""
    handler = make_handler(spark, index_df, fts, rules, template_debug)
    return ThreadingHTTPServer((host, port), handler)
