"""Resident HTTP search server over a loaded :class:`HybridQueryEngine`.

The reference has no serving story at all (its query path is a batch
script, ``Tool/rank_chunks_optimized.py``); this is the deployment-shaped
endpoint for the TPU build: load the index + encoder + (optionally cached)
device-BM25 matrix ONCE, then answer queries over HTTP. One process per
chip; front with any standard load balancer for more.

Protocol (JSON over HTTP/1.1, stdlib-only on both ends):

- ``GET  /healthz``  -> ``{"ok": true, "docs": N}`` (live count: base +
  delta adds - tombstones)
- ``GET  /statz``    -> freshness-layer sizes + device-BM25 phase
  timings/certificate stats
- ``POST /search``   body ``{"queries": ["..."], "k": 10,
  "hybrid": true, "rerank_top": 0}`` -> ``{"results": [[hit, ...], ...]}``
  where hit = ``{chunk_id, score, dense_rank, lexical_rank
  [, rerank_score]}``.
- ``POST /add``      body ``{"chunk_ids": ["..."], "texts": ["..."]}``
  -> ``{"added": N, "docs": total}`` — serve-time freshness: new docs are
  embedded into the device-resident delta index and searchable on the
  NEXT request, no restart (engine.add_documents).
- ``POST /remove``   body ``{"chunk_ids": ["..."]}``
  -> ``{"removed": N, "docs": total}`` — tombstones, effective
  immediately (engine.remove_documents).
- ``POST /compact``  body ``{}`` -> ``{"ok": true, "docs": N}`` — fold
  delta + tombstones into the persisted layout (journaled crash-safe
  staged commit) and reload; the call blocks while it runs.

Requests are served on a single thread: device dispatch already pipelines
inside ``engine.search`` (all programs dispatched before any fetch), and
serializing requests is the correct backpressure for one chip — concurrent
jit dispatch from multiple threads would interleave into the SAME device
queue anyway. Batch queries client-side for throughput (the engine's QPS
comes from batched encode/top-k, see BASELINE.md serve rows).
"""
from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, HTTPServer

from ..core.logging import get_logger

logger = get_logger("server")

_MAX_BODY = 64 << 20  # reject absurd request bodies before reading them
_MAX_ITEMS = 8192  # per-request query/add cap: one request must not be
# able to occupy the single serving thread for minutes


def _hit_dict(h) -> dict:
    d = {
        "chunk_id": h.chunk_id,
        "score": h.score,
        "dense_rank": h.dense_rank,
        "lexical_rank": h.lexical_rank,
    }
    if h.rerank_score is not None:
        d["rerank_score"] = h.rerank_score
    return d


def make_server(engine, host: str = "127.0.0.1", port: int = 8080
                ) -> HTTPServer:
    """Build (not start) the HTTP server; ``.serve_forever()`` to run.

    Port 0 binds an ephemeral port (tests); the bound address is
    ``server.server_address``.
    """

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"  # keep-alive; Content-Length is
        # sent on every reply, so framing is always explicit
        # Requests serialize on ONE thread: a client that stalls mid-
        # request (never sends the request line, or undershoots its own
        # Content-Length) must not wedge the service — time out its socket
        # and move on
        timeout = 60

        # stdlib logs every request to stderr by default; route to our
        # namespaced logger at debug level instead
        def log_message(self, fmt, *args):  # noqa: N802 (stdlib name)
            logger.debug("%s %s", self.address_string(), fmt % args)

        def _reply(self, code: int, obj: dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        @staticmethod
        def _live_docs() -> int:
            # LIVE document count: base index + serve-time delta adds
            # - tombstoned rows (freshness pushes must be visible here)
            docs = int(engine.index.size)
            if engine._delta is not None:
                docs += int(engine._delta.n)
            return docs - len(engine._dead)

        def do_GET(self):  # noqa: N802
            if self.path == "/healthz":
                self._reply(200, {"ok": True, "docs": self._live_docs()})
            elif self.path == "/statz":
                # ops view: freshness-layer sizes + device-BM25 phase
                # timings/certificate stats (index/bm25_tpu.py::stats)
                self._reply(200, {
                    "docs": self._live_docs(),
                    "base_docs": int(engine.index.size),
                    "delta_docs": (int(engine._delta.n)
                                   if engine._delta is not None else 0),
                    "tombstones": len(engine._dead),
                    "device_bm25": (dict(engine._device_bm25.stats)
                                    if engine._device_bm25 is not None
                                    else None),
                })
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        @staticmethod
        def _str_list(req, key):
            v = req.get(key)
            if (not isinstance(v, list) or not v
                    or not all(isinstance(s, str) for s in v)):
                raise ValueError(
                    f"{key} must be a non-empty list of strings")
            if len(v) > _MAX_ITEMS:
                raise ValueError(
                    f"{key} has {len(v)} items (cap {_MAX_ITEMS}); "
                    "split into multiple requests")
            return v

        def _handle(self, req: dict) -> dict:
            if self.path == "/search":
                results = engine.search(
                    self._str_list(req, "queries"),
                    k=int(req.get("k", 10)),
                    hybrid=bool(req.get("hybrid", True)),
                    rerank_top=int(req.get("rerank_top", 0)),
                )
                return {"results": [
                    [_hit_dict(h) for h in hits] for hits in results
                ]}
            if self.path == "/add":
                ids = self._str_list(req, "chunk_ids")
                texts = self._str_list(req, "texts")
                if len(ids) != len(texts):
                    raise ValueError("chunk_ids and texts length mismatch")
                engine.add_documents(ids, texts)
                return {"added": len(ids), "docs": self._live_docs()}
            if self.path == "/remove":
                n = engine.remove_documents(self._str_list(req, "chunk_ids"))
                return {"removed": n, "docs": self._live_docs()}
            if self.path == "/compact":
                engine.compact()
                return {"ok": True, "docs": self._live_docs()}
            raise LookupError(self.path)

        def do_POST(self):  # noqa: N802
            try:
                n = int(self.headers.get("Content-Length", 0))
                if n < 0 or n > _MAX_BODY:
                    # reject without reading; the unread body poisons the
                    # connection, so don't reuse it
                    self.close_connection = True
                    self._reply(413, {"error": "bad body size"})
                    return
                req = json.loads(self.rfile.read(n) or b"{}")
                self._reply(200, self._handle(req))
            except LookupError:
                self._reply(404, {"error": f"unknown path {self.path}"})
            except (ValueError, KeyError, TypeError) as exc:
                self._reply(400, {"error": str(exc)})
            except Exception as exc:  # engine failure -> 500, keep serving
                logger.exception("%s failed", self.path)
                self._reply(500, {"error": f"{type(exc).__name__}: {exc}"})

    srv = HTTPServer((host, port), Handler)
    logger.info("search server on http://%s:%d (docs=%d)",
                *srv.server_address, engine.index.size)
    return srv
