"""Served-QPS uplift from micro-batching: concurrent clients, batching on/off.

Each unbatched request pays a full device dispatch (plus the fixed dispatch
RTT); with `batch_window_ms > 0` concurrent requests coalesce onto ONE
dispatch (see `vod_tpu.serving.MicroBatcher`). This measures wall-clock QPS
at the HTTP boundary for single-row requests from N concurrent clients.

Run: python examples/serving_batch_bench.py [--n 200000] [--clients 16]
"""

import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import concurrent.futures
import time

import jax.numpy as jnp
import numpy as np

from vod_tpu.search import HybridEngines, build_dense_index
from vod_tpu.serving import SearchHttpClient, SearchServer
from vod_tpu.utils import Arguantic


class Args(Arguantic):
    n: int = 200_000
    d: int = 256
    clients: int = 16
    requests: int = 128
    window_ms: float = 5.0


def run(engines, args, window_ms: float) -> tuple[float, int]:
    rng = np.random.default_rng(0)
    qs = [rng.normal(size=(1, args.d)).astype("float32") for _ in range(args.requests)]
    with SearchServer(engines, batch_window_ms=window_ms, max_batch=64) as srv:
        client = SearchHttpClient(srv.url)
        # warm wave at the same concurrency so every bucket shape the batcher
        # will form (1/2/4/8/16...) is compiled before the timed wave
        with concurrent.futures.ThreadPoolExecutor(max_workers=args.clients) as ex:
            list(ex.map(lambda q: client.search(vector=q, top_k=10), qs))
        base = srv._batcher.dispatches if srv._batcher else 0
        t0 = time.time()
        with concurrent.futures.ThreadPoolExecutor(max_workers=args.clients) as ex:
            list(ex.map(lambda q: client.search(vector=q, top_k=10), qs))
        wall = time.time() - t0
        dispatches = (srv._batcher.dispatches - base) if srv._batcher else args.requests
    return args.requests / wall, dispatches


def main() -> None:
    args = Args.parse()
    rng = np.random.default_rng(1)
    corpus = rng.normal(size=(args.n, args.d)).astype("float32")
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    engines = HybridEngines(dense=build_dense_index(jnp.asarray(corpus), dtype="bfloat16"))

    qps_off, _ = run(engines, args, window_ms=0.0)
    qps_on, dispatches = run(engines, args, window_ms=args.window_ms)
    print(
        f"unbatched: {qps_off:,.0f} QPS | batched({args.window_ms}ms window): "
        f"{qps_on:,.0f} QPS ({dispatches} dispatches for {args.requests} requests, "
        f"x{qps_on / max(qps_off, 1e-9):.1f})"
    )


if __name__ == "__main__":
    main()
