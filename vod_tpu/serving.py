"""Thin cross-process search server (optional tooling; NOT the training path).

Parity: reference `vod_search/faiss_search/server.py` (FastAPI app with
`/search` + `/fast-search` base64-numpy endpoints) and `SearchMaster`'s
spawn+ping lifecycle (`base.py:83-200`). In vod-tpu the training loop never
talks HTTP — indexes live in HBM — but external tooling (eval dashboards,
interactive debugging) can still query a running engine through this stdlib
HTTP wrapper.

Usage:
    server = SearchServer(engines, weights={"dense": 1.0})
    with server:                       # spawns a daemon thread, pings ready
        out = SearchHttpClient(server.url).search(vector=..., top_k=10)
"""

from __future__ import annotations

import json
import threading
import typing as typ
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax.numpy as jnp
import numpy as np

from vod_tpu.search.base import SearchQueries
from vod_tpu.search.hybrid import HybridEngines, hybrid_search
from vod_tpu.search.io import decode_payload, encode_payload
from vod_tpu.types.retrieval import RetrievalBatch


def free_port() -> int:
    """Parity: `vod_search/socket.py:4`."""
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


class SearchServer:
    """Serve a HybridEngines bundle over HTTP on a daemon thread."""

    def __init__(
        self,
        engines: HybridEngines,
        *,
        weights: typ.Optional[dict[str, float]] = None,
        host: str = "127.0.0.1",
        port: typ.Optional[int] = None,
    ):
        self.engines = engines
        self.weights = weights
        self.host = host
        self.port = port or free_port()
        self._httpd: typ.Optional[ThreadingHTTPServer] = None
        self._thread: typ.Optional[threading.Thread] = None

    @property
    def url(self) -> str:
        return f"http://{self.host}:{self.port}"

    def _handle_search(self, payload: dict) -> dict:
        data = decode_payload(payload)
        top_k = int(data.pop("top_k", 10))
        sq = SearchQueries(
            **{
                k: jnp.asarray(v)
                for k, v in data.items()
                if k in SearchQueries.__dataclass_fields__ and v is not None
            }
        )
        merged, raw = hybrid_search(self.engines, sq, top_k, self.weights)
        out = {
            "scores": np.asarray(merged.scores),
            "indices": np.asarray(merged.indices),
        }
        if merged.labels is not None:
            out["labels"] = np.asarray(merged.labels)
        for name, v in raw.items():
            out[f"raw_{name}"] = np.asarray(v)
        return encode_payload(out)

    def __enter__(self) -> "SearchServer":
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a: typ.Any) -> None:  # silence
                pass

            def do_GET(self) -> None:  # /ping readiness probe (`base.py:170`)
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b'{"ok": true}')

            def do_POST(self) -> None:
                length = int(self.headers["Content-Length"])
                payload = json.loads(self.rfile.read(length))
                try:
                    out = outer._handle_search(payload)
                    body = json.dumps(out).encode()
                    self.send_response(200)
                except Exception as exc:  # noqa: BLE001
                    body = json.dumps({"error": repr(exc)}).encode()
                    self.send_response(500)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._httpd = ThreadingHTTPServer((self.host, self.port), Handler)
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc: typ.Any) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd = None


class SearchHttpClient:
    """Minimal client (parity: `FaissClient.search`, `client.py:64`)."""

    def __init__(self, url: str):
        self.url = url

    def ping(self) -> bool:
        try:
            with urllib.request.urlopen(self.url + "/ping", timeout=5) as r:
                return r.status == 200
        except Exception:
            return False

    def search(
        self,
        *,
        vector: typ.Optional[np.ndarray] = None,
        terms: typ.Optional[np.ndarray] = None,
        section_ids: typ.Optional[np.ndarray] = None,
        subset_ids: typ.Optional[np.ndarray] = None,
        top_k: int = 10,
    ) -> RetrievalBatch:
        payload = encode_payload(
            {
                "vector": vector,
                "terms": terms,
                "section_ids": section_ids,
                "subset_ids": subset_ids,
            }
        )
        payload["top_k"] = top_k
        req = urllib.request.Request(
            self.url + "/search",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            out = decode_payload(json.loads(r.read()))
        if "error" in out:
            raise RuntimeError(out["error"])
        return RetrievalBatch(
            scores=out["scores"],
            indices=out["indices"],
            labels=out.get("labels"),
            meta={k[4:]: v for k, v in out.items() if k.startswith("raw_")},
        )
