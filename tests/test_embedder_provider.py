"""OpenAICompatibleEmbedder against an in-process OpenAI-shaped HTTP
server — the r6 closure of the embedder-provider seam (reference
src/transform/embedder.py:60-95). The server embeds with the same
HashEmbedder the engine defaults to, so responses are deterministic and
the Spark path's output is byte-comparable to the local provider's."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from etl_pdf_pipepline_spark.retrieval.embedder import (
    HashEmbedder,
    OpenAICompatibleEmbedder,
    embed_dataframe,
    embed_query,
)

_HASH = HashEmbedder(dim=16)


class _Handler(BaseHTTPRequestHandler):
    fail_next: list[int] = []  # status codes to emit before succeeding
    require_auth = False
    calls: list[int] = []

    def do_POST(self):  # noqa: N802 (http.server API)
        if self.path != "/v1/embeddings":
            self.send_error(404)
            return
        if self.require_auth and self.headers.get("Authorization") != "Bearer sk-test":
            self.send_error(401, "bad api key")
            return
        if _Handler.fail_next:
            self.send_error(_Handler.fail_next.pop(0))
            return
        n = int(self.headers["Content-Length"])
        req = json.loads(self.rfile.read(n))
        texts = req["input"]
        _Handler.calls.append(len(texts))
        vecs = _HASH.embed_batch(texts)
        body = json.dumps(
            {
                "object": "list",
                "model": req["model"],
                # reversed order on purpose: clients must sort by index
                "data": [
                    {"object": "embedding", "index": i, "embedding": v}
                    for i, v in reversed(list(enumerate(vecs)))
                ],
            }
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture(scope="module")
def endpoint():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/v1"
    srv.shutdown()


def test_matches_local_provider_and_sorts_by_index(endpoint):
    emb = OpenAICompatibleEmbedder(endpoint, dim=16)
    texts = ["alpha beta", "gamma", ""]
    assert emb.embed_batch(texts) == _HASH.embed_batch(texts)


def test_retries_on_429_then_succeeds(endpoint):
    _Handler.fail_next = [429, 503]
    emb = OpenAICompatibleEmbedder(endpoint, dim=16)
    assert emb.embed_batch(["hello"]) == _HASH.embed_batch(["hello"])


def test_fails_fast_on_4xx(endpoint):
    _Handler.require_auth = True
    try:
        with pytest.raises(RuntimeError, match="HTTP 401"):
            OpenAICompatibleEmbedder(endpoint, dim=16).embed_batch(["x"])
        # with the key set (env read at call time, reference convention)
        import os

        os.environ["TEST_EMB_KEY"] = "sk-test"
        emb = OpenAICompatibleEmbedder(endpoint, dim=16, api_key_env="TEST_EMB_KEY")
        assert emb.embed_batch(["x"]) == _HASH.embed_batch(["x"])
    finally:
        _Handler.require_auth = False


def test_spark_embed_dataframe_through_http(endpoint, spark):
    """The production shape: executors call the endpoint per Arrow batch;
    output must equal the local HashEmbedder path exactly."""
    df = spark.createDataFrame(
        [(i, f"doc number {i} text") for i in range(17)], "id long, text string"
    )
    _Handler.calls.clear()
    via_http = embed_dataframe(
        df, "text", OpenAICompatibleEmbedder(endpoint, dim=16), batch_size=5
    )
    local = embed_dataframe(df, "text", HashEmbedder(dim=16), batch_size=5)
    got = {r.id: r.embedding for r in via_http.collect()}
    want = {r.id: r.embedding for r in local.collect()}
    assert got == want
    assert sum(_Handler.calls) == 17 and max(_Handler.calls) <= 5


def test_embed_query_via_http(endpoint):
    q = "what is bm25"
    assert embed_query(q, OpenAICompatibleEmbedder(endpoint, dim=16)) == _HASH.embed_batch([q])[0]
