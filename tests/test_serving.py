"""Serving wrapper: HTTP round trip against an in-process engine."""
import numpy as np
import jax.numpy as jnp

from vod_tpu.search import HybridEngines, build_dense_index
from vod_tpu.search.io import decode_payload, encode_payload
from vod_tpu.serving import SearchHttpClient, SearchServer


def test_payload_roundtrip() -> None:
    x = np.random.default_rng(0).normal(size=(3, 4)).astype("float32")
    p = encode_payload({"vector": x, "top_k": 5, "none": None})
    assert "none" not in p
    d = decode_payload(p)
    assert np.allclose(d["vector"], x) and d["top_k"] == 5


def test_search_server_roundtrip() -> None:
    rng = np.random.default_rng(1)
    corpus = rng.normal(size=(200, 16)).astype("float32")
    engines = HybridEngines(dense=build_dense_index(jnp.asarray(corpus), dtype="float32"))
    with SearchServer(engines) as server:
        client = SearchHttpClient(server.url)
        assert client.ping()
        q = corpus[:2] + 0.01
        out = client.search(vector=q, top_k=5)
        assert out.indices.shape == (2, 5)
        assert out.indices[0, 0] == 0 and out.indices[1, 0] == 1  # self-retrieval
        assert "dense" in out.meta
