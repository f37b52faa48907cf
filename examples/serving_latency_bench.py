"""Per-request serving latency (p50/p99) through SearchServer + MicroBatcher.

Parity: the reference's serving story is per-request HTTP search in the
collate hot path (`/root/reference/src/vod_search/faiss_search/server.py:77`);
all bench.py QPS numbers are block-amortized. This measures what a SINGLE
client request experiences at the 8.8M serving operating point (the
keep_codes=False pca128->pca256 codec, bench.py's serving line), with the
MicroBatcher coalescing concurrent singles onto one device dispatch
(`batch_window_ms>0`) vs dispatch-per-request (`batch_window_ms=0`).

Environment note: this machine reaches the TPU through a remote-execution
tunnel with a fixed ~25-30 ms dispatch RTT, which dominates single-query
latency here; on a directly-attached TPU-VM the device compute is the ~2-4 ms
measured by the marginal-block method. Both components are reported.

Usage (real TPU):  python examples/serving_latency_bench.py [--n 1000000]
"""

import argparse
import concurrent.futures
import functools
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

from vod_tpu.ops import pq as pq_ops
from vod_tpu.search import SearchQueries
from vod_tpu.search.dense import PQIndex
from vod_tpu.search.hybrid import HybridEngines
from vod_tpu.serving import SearchHttpClient, SearchServer

D, K = 768, 10


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def build_serving_index(n: int):
    """The bench.py serving codec at `n` rows (device-generated corpus)."""
    slab = min(n, 1_105_920)
    n_slabs = -(-n // slab)
    n_pad = n_slabs * slab
    spec = jnp.asarray(np.exp(-np.arange(D) / 35.0).astype(np.float32))
    basis, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(99), (D, D)))
    basis = basis.astype(jnp.float32)

    # spec/basis ride as jit ARGUMENTS (remote relay ships closed-over
    # literals at ~100 s/MB per compile; see bench.py NOTE)
    @jax.jit
    def gen_slab(key, spec, basis):
        z = jax.random.normal(key, (slab, D), dtype=jnp.float32) * spec
        x = z @ basis
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    keys = [jax.random.PRNGKey(1000 + i) for i in range(n_slabs)]
    train = gen_slab(keys[0], spec, basis)[:262_144]
    proj_c, _ = pq_ops.train_projection(train, 128)
    cs = train @ proj_c
    scale_c = jnp.maximum(jnp.max(jnp.abs(cs), axis=0, keepdims=True), 1e-8) / 127.0
    proj_r, _ = pq_ops.train_projection(train, 256)
    rs = train @ proj_r
    scale_r = jnp.maximum(jnp.max(jnp.abs(rs), axis=0, keepdims=True), 1e-8) / 127.0
    q_src = np.asarray(train[:256])
    del train, cs, rs

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def fill(coarse, refine, key, row0, spec, basis, proj_c, scale_c, proj_r, scale_r):
        x = gen_slab(key, spec, basis)
        c = jnp.clip(jnp.round((x @ proj_c) / scale_c), -127, 127).astype(jnp.int8)
        r = jnp.clip(jnp.round((x @ proj_r) / scale_r), -127, 127).astype(jnp.int8)
        return (
            jax.lax.dynamic_update_slice(coarse, c, (row0, 0)),
            jax.lax.dynamic_update_slice(refine, r, (row0, 0)),
        )

    coarse = jnp.zeros((n_pad, 128), jnp.int8)
    refine = jnp.zeros((n_pad, 256), jnp.int8)
    for i, kk in enumerate(keys):
        coarse, refine = fill(coarse, refine, kk, jnp.int32(i * slab),
                              spec, basis, proj_c, scale_c, proj_r, scale_r)
    coarse.block_until_ready()
    index = PQIndex(
        codebooks=jnp.zeros((1, 1, 1), jnp.float32), codes=None,
        coarse_codes=coarse, coarse_scale=scale_c, proj=proj_c,
        refine_codes=refine, refine_scale=scale_r, refine_proj=proj_r,
        n_real=n, k_factor=16, approx_recall=0.95,
        # the fused Pallas coarse kernel at the measured-roofline tile: the
        # B=64 dispatch drops from ~2.5 ms (scan) to ~1.2-1.7 ms, so the
        # per-request latency floor is the relay RTT, not the kernel
        kernel="fused", fused_bins=2048, fused_tile=16384,
    )
    return index, q_src


def percentile_ms(walls, p):
    return round(float(np.percentile(np.asarray(walls) * 1000, p)), 1)


def run_clients(url, q_pool, n_requests, n_clients):
    client = SearchHttpClient(url)
    walls = []
    lock = __import__("threading").Lock()

    def one(i):
        v = q_pool[i % len(q_pool)][None] + 1e-4 * np.float32(i)
        t0 = time.time()
        client.search(vector=v, top_k=K)
        w = time.time() - t0
        with lock:
            walls.append(w)

    with concurrent.futures.ThreadPoolExecutor(max_workers=n_clients) as ex:
        list(ex.map(one, range(n_requests)))
    return walls


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8_841_823)
    ap.add_argument("--requests", type=int, default=128)
    ap.add_argument("--clients", type=int, default=16)
    # coalescing window: size it to the dispatch cost, not below the host's
    # request-arrival jitter — a too-small window fragments batches (measured
    # on this 1-core host: 4 ms -> 2.4 rows/dispatch, 25 ms -> full buckets)
    ap.add_argument("--window_ms", type=float, default=25.0)
    args = ap.parse_args()

    log(f"building serving index at n={args.n}")
    t0 = time.time()
    index, q_pool = build_serving_index(args.n)
    log(f"built in {time.time()-t0:.0f}s")
    engines = HybridEngines(dense=index)

    out = {"n": args.n, "requests": args.requests, "clients": args.clients}
    for label, window in (("uncoalesced", 0.0), ("coalesced", args.window_ms)):
        with SearchServer(engines, batch_window_ms=window, max_batch=16) as srv:
            # pre-compile every padded bucket through the server's own jitted
            # dispatch — without this the first request per bucket pays a full
            # TPU compile inside its measured latency
            log(f"{label}: warming buckets")
            srv.warmup({"vector": q_pool[:1]}, top_k=K,
                       batch_sizes=(1, 2, 4, 8, 16))
            # sequential singles: pure per-request latency floor
            seq = run_clients(srv.url, q_pool, 32, 1)
            # concurrent singles: what a loaded server delivers per request
            conc = run_clients(srv.url, q_pool, args.requests, args.clients)
            b = srv._batcher
            out[label] = {
                "seq_p50_ms": percentile_ms(seq, 50),
                "conc_p50_ms": percentile_ms(conc, 50),
                "conc_p99_ms": percentile_ms(conc, 99),
                "dispatches": (b.dispatches if b else None),
                "requests": (b.requests if b else None),
            }
            log(f"{label}: seq p50={out[label]['seq_p50_ms']}ms "
                f"conc p50={out[label]['conc_p50_ms']}ms p99={out[label]['conc_p99_ms']}ms "
                f"dispatches={out[label]['dispatches']}")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
