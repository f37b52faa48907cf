"""Flat dense index: build + query + self-benchmark.

Parity: reference `examples/search/faiss.py` — build a faiss index over vectors,
spawn the server, query, print ms/batch. Here there is no server: the index is a
device array and search is one jitted call.

Run: python examples/search_flat.py [--n 100000] [--d 256] [--topk 10]
"""

import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import time

import jax
import jax.numpy as jnp
import numpy as np

from vod_tpu.search import SearchQueries, build_dense_index
from vod_tpu.search.dense import dense_search
from vod_tpu.utils import Arguantic


class Args(Arguantic):
    n: int = 100_000
    d: int = 256
    batch: int = 32
    topk: int = 10


def main() -> None:
    args = Args.parse()
    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(args.n, args.d)).astype("float32")
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    q = corpus[rng.choice(args.n, args.batch)] + 0.1 * rng.normal(size=(args.batch, args.d)).astype("float32")

    t0 = time.time()
    index = build_dense_index(jnp.asarray(corpus), dtype="bfloat16")
    jax.block_until_ready(index.vectors)
    print(f"built flat bf16 index over {args.n} x {args.d} in {time.time()-t0:.2f}s")

    sfn = jax.jit(lambda ix, qv: dense_search(ix, SearchQueries(vector=qv), top_k=args.topk))
    qj = jnp.asarray(q)
    out = sfn(index, qj)
    _ = np.asarray(out.scores)  # force
    t0 = time.time()
    out = sfn(index, qj + 1e-4)
    _ = np.asarray(out.scores)
    print(f"search: {(time.time()-t0)*1000:.2f} ms/batch of {args.batch}")

    exact = np.argsort(-(q @ corpus.T), axis=-1)[:, : args.topk]
    got = np.asarray(out.indices)
    recall = np.mean([len(set(got[i]) & set(exact[i])) / args.topk for i in range(args.batch)])
    print(f"recall@{args.topk} vs exact: {recall:.3f}")
    print("top-5 ids of query 0:", got[0][:5].tolist())


if __name__ == "__main__":
    main()
