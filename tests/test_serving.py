"""Serving wrapper: HTTP round trip against an in-process engine."""
import pytest
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


@pytest.mark.slow
def test_search_server_hybrid_lookup_subset_and_errors() -> None:
    """Deeper serving coverage: hybrid dense+sparse over HTTP, lookup payloads
    (gold section_ids -> labels), subset filtering, concurrent clients, and
    server-side error propagation."""
    import concurrent.futures
    import urllib.error

    import pytest

    from vod_tpu.search import build_sparse_index

    rng = np.random.default_rng(2)
    n, d = 300, 16
    corpus = rng.normal(size=(n, d)).astype("float32")
    subsets = (np.arange(n) % 3).astype("int32")
    doc_terms = [[int(t) for t in rng.integers(0, 32, size=5)] for i in range(n)]
    engines = HybridEngines(
        dense=build_dense_index(
            jnp.asarray(corpus), subset_ids=jnp.asarray(subsets), dtype="float32"
        ),
        sparse=build_sparse_index(doc_terms, n_terms=64, max_postings=32),
    )
    with SearchServer(engines, weights={"dense": 1.0, "sparse": 0.5}) as server:
        client = SearchHttpClient(server.url)

        # hybrid: both engines contribute raw scores aligned to merged ids
        q = corpus[:2] + 0.01
        terms = np.asarray([doc_terms[0][:4], doc_terms[1][:4]], dtype=np.int32)
        out = client.search(vector=q, terms=terms, top_k=8)
        assert set(out.meta) == {"dense", "sparse"}
        assert out.meta["dense"].shape == out.scores.shape

        # lookup payload: gold ids surface with labels > 0 even if low-scoring
        gold = np.asarray([[42], [7]], dtype=np.int32)
        out = client.search(vector=q, section_ids=gold, top_k=8)
        assert out.labels is not None
        for i, g in enumerate([42, 7]):
            row = out.indices[i].tolist()
            assert g in row
            assert out.labels[i][row.index(g)] > 0

        # subset filtering over the wire
        allowed = np.asarray([[1, -1], [-1, -1]], dtype=np.int32)
        out = client.search(vector=q, subset_ids=allowed, top_k=8)
        for x in out.indices[0]:
            if x >= 0:
                assert subsets[x] == 1
        assert np.all(out.indices[1] >= 0)

        # concurrent clients against the ThreadingHTTPServer
        def one(i: int):
            qq = corpus[i : i + 2] + 0.01
            return client.search(vector=qq, top_k=5).indices[0, 0]

        with concurrent.futures.ThreadPoolExecutor(4) as ex:
            firsts = list(ex.map(one, range(8)))
        assert firsts == list(range(8))  # self-retrieval per query

        # malformed payload -> structured 500, client raises
        with pytest.raises((RuntimeError, urllib.error.HTTPError)):
            client.search(top_k=5)  # no engine matches an empty query


def test_microbatcher_coalesces_and_matches_direct() -> None:
    """Concurrent single-row submissions ride one padded dispatch; per-request
    results equal the direct (unbatched) computation; incompatible keys split."""
    import concurrent.futures
    import threading

    from vod_tpu.serving import MicroBatcher, _bucket

    assert [_bucket(n, 64) for n in (1, 2, 3, 5, 64, 100)] == [1, 2, 4, 8, 64, 64]

    calls: list[tuple[int, int]] = []  # (rows, top_k)
    lock = threading.Lock()

    def fake_search(arrays, top_k):
        with lock:
            calls.append((arrays["vector"].shape[0], top_k))
        v = arrays["vector"]
        return {"sum": v.sum(axis=1), "ids": np.arange(v.shape[0])}

    mb = MicroBatcher(fake_search, max_batch=16, window_ms=50.0)
    try:
        rng = np.random.default_rng(0)
        reqs = [rng.normal(size=(1, 8)).astype("float32") for _ in range(8)]
        with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
            outs = list(ex.map(lambda v: mb.submit({"vector": v}, 10), reqs))
        # per-request rows are exactly that request's (padding discarded)
        for v, out in zip(reqs, outs):
            assert out["sum"].shape == (1,)
            assert np.allclose(out["sum"], v.sum(axis=1), atol=1e-6)
        # coalesced: strictly fewer dispatches than requests, all top_k=10,
        # every dispatch power-of-two padded
        assert mb.dispatches < 8 and mb.requests == 8
        assert all(k == 10 for _, k in calls)
        assert all(r & (r - 1) == 0 for r, _ in calls)
        # a different top_k never shares a dispatch
        out_a = ex_out = None
        with concurrent.futures.ThreadPoolExecutor(max_workers=2) as ex:
            f1 = ex.submit(mb.submit, {"vector": reqs[0]}, 10)
            f2 = ex.submit(mb.submit, {"vector": reqs[1]}, 5)
            out_a, ex_out = f1.result(), f2.result()
        assert {k for _, k in calls} == {10, 5}
        # oversized requests bypass the batcher's queue but still count in
        # the observability stats (one request, one dispatch)
        before_d, before_r = mb.dispatches, mb.requests
        big = mb.submit({"vector": rng.normal(size=(32, 8)).astype("float32")}, 10)
        assert big["sum"].shape == (32,)
        assert mb.dispatches == before_d + 1 and mb.requests == before_r + 1
    finally:
        mb.close()


def test_microbatcher_close_fails_pending_and_rejects_new() -> None:
    """close() must fail (not strand) waiters still in the queue, and reject
    submissions afterwards."""
    import concurrent.futures
    import threading

    from vod_tpu.serving import MicroBatcher

    release = threading.Event()

    def slow_search(arrays, top_k):
        release.wait(timeout=10)  # hold the worker so the next request queues
        return {"sum": arrays["vector"].sum(axis=1)}

    mb = MicroBatcher(slow_search, max_batch=1, window_ms=1.0)
    v = np.zeros((1, 4), "float32")
    with concurrent.futures.ThreadPoolExecutor(max_workers=2) as ex:
        f1 = ex.submit(mb.submit, {"vector": v}, 10)  # worker blocks in search
        import time as _t

        _t.sleep(0.1)
        f2 = ex.submit(mb.submit, {"vector": v}, 10)  # sits in the queue
        _t.sleep(0.1)
        mb._stop.set()  # stop the worker loop before releasing it
        release.set()
        assert f1.result(timeout=10)["sum"].shape == (1,)  # in-flight completes
        mb.close()  # drains the queue: f2 fails instead of hanging forever
        with pytest.raises(RuntimeError, match="batcher closed"):
            f2.result(timeout=10)
    with pytest.raises(RuntimeError, match="batcher closed"):
        mb.submit({"vector": v}, 10)


def test_microbatcher_propagates_errors() -> None:
    from vod_tpu.serving import MicroBatcher

    def boom(arrays, top_k):
        raise ValueError("engine exploded")

    mb = MicroBatcher(boom, max_batch=4, window_ms=1.0)
    try:
        with pytest.raises(ValueError, match="engine exploded"):
            mb.submit({"vector": np.zeros((1, 4), "float32")}, 10)
    finally:
        mb.close()


def test_search_server_batched_equals_direct() -> None:
    """SearchServer(batch_window_ms>0): concurrent HTTP clients get identical
    results to the unbatched server, over fewer device dispatches."""
    import concurrent.futures

    rng = np.random.default_rng(3)
    corpus = rng.normal(size=(200, 16)).astype("float32")
    engines = HybridEngines(dense=build_dense_index(jnp.asarray(corpus), dtype="float32"))
    qs = [corpus[i : i + 1] + 0.01 for i in range(6)]
    with SearchServer(engines) as direct_srv:
        direct = [SearchHttpClient(direct_srv.url).search(vector=q, top_k=5) for q in qs]
    with SearchServer(engines, batch_window_ms=50.0, max_batch=16) as srv:
        client = SearchHttpClient(srv.url)
        with concurrent.futures.ThreadPoolExecutor(max_workers=6) as ex:
            outs = list(ex.map(lambda q: client.search(vector=q, top_k=5), qs))
        assert srv._batcher is not None and srv._batcher.dispatches < 6
    for d, b in zip(direct, outs):
        assert np.array_equal(d.indices, b.indices)
        assert np.allclose(d.scores, b.scores, atol=1e-5)


def test_search_server_stats_endpoint() -> None:
    import json as _json
    import urllib.request

    rng = np.random.default_rng(4)
    corpus = rng.normal(size=(100, 8)).astype("float32")
    engines = HybridEngines(dense=build_dense_index(jnp.asarray(corpus), dtype="float32"))
    with SearchServer(engines, batch_window_ms=1.0) as srv:
        SearchHttpClient(srv.url).search(vector=corpus[:1], top_k=3)
        with urllib.request.urlopen(srv.url + "/stats", timeout=5) as r:
            stats = _json.loads(r.read())
    assert stats["batching"] is True
    assert stats["requests"] == 1 and stats["dispatches"] == 1


def test_search_server_warmup_precompiles_buckets() -> None:
    """warmup() drives the jitted dispatch at every padded bucket size, so the
    first real request per bucket hits a cached compile; results unaffected."""
    rng = np.random.default_rng(5)
    corpus = rng.normal(size=(150, 8)).astype("float32")
    engines = HybridEngines(dense=build_dense_index(jnp.asarray(corpus), dtype="float32"))
    with SearchServer(engines, batch_window_ms=1.0, max_batch=8) as srv:
        srv.warmup({"vector": corpus[:1]}, top_k=5)
        # one jitted fn per top_k; jax caches the (1,2,4,8)-row avals inside
        assert list(srv._jit_cache) == [5]
        out = SearchHttpClient(srv.url).search(vector=corpus[3:4] + 0.01, top_k=5)
        exact = np.argsort(-(corpus[3:4] + 0.01) @ corpus.T, axis=-1)[:, :5]
        assert np.array_equal(out.indices, exact)
