"""Sparse BM25 self-benchmark: analyzer -> postings -> device scoring, ms/batch.

Parity: reference `examples/search/es.py` / `qdrant.py` self-benchmarks (spin the
engine, query, print ms/batch) — here the "engine" is device arrays and the
analyzer is the in-tree C++ library.

Run: python examples/search_sparse_bench.py [--n_docs 50000] [--batch 64]
"""

import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import time

import jax
import jax.numpy as jnp
import numpy as np

from vod_tpu.native import analyze_texts, build_postings, native_available
from vod_tpu.search import SearchQueries, sparse_search
from vod_tpu.search.sparse import SparseIndex
from vod_tpu.utils import Arguantic

WORDS = (
    "paris tokyo berlin rome madrid london capital city france japan germany "
    "italy spain england river mountain museum bridge king queen north south "
    "history ancient modern train airport harbor castle market festival"
).split()


class Args(Arguantic):
    n_docs: int = 50_000
    batch: int = 64
    top_k: int = 10
    vocab_bits: int = 16


def main() -> None:
    args = Args.parse()
    rng = np.random.default_rng(0)
    vocab = 1 << args.vocab_bits
    docs = [
        " ".join(rng.choice(WORDS, size=rng.integers(8, 24)))
        for _ in range(args.n_docs)
    ]
    t0 = time.time()
    ids, counts = analyze_texts(docs, vocab_size=vocab, max_terms=32)
    t_analyze = time.time() - t0
    t0 = time.time()
    docs_arr, imps_arr = build_postings(ids, counts, n_terms=vocab, max_postings=1024)
    t_postings = time.time() - t0
    print(
        f"native={native_available()}: analyzed {args.n_docs} docs in {t_analyze:.2f}s, "
        f"postings in {t_postings:.2f}s"
    )
    index = SparseIndex(
        postings_docs=jnp.asarray(docs_arr),
        postings_impacts=jnp.asarray(imps_arr),
        n_docs=args.n_docs,
    )
    q_text = [" ".join(rng.choice(WORDS, size=4)) for _ in range(args.batch)]
    q_ids, _ = analyze_texts(q_text, vocab_size=vocab, max_terms=8)
    sfn = jax.jit(lambda ix, t: sparse_search(ix, SearchQueries(terms=t), top_k=args.top_k))
    out = sfn(index, jnp.asarray(q_ids))
    _ = np.asarray(out.scores)
    t0 = time.time()
    out = sfn(index, jnp.asarray(q_ids + 0))
    _ = np.asarray(out.scores)
    print(f"BM25 search: {(time.time()-t0)*1000:.2f} ms/batch of {args.batch}")
    print("top ids q0:", np.asarray(out.indices)[0].tolist())
    print("q0:", q_text[0], "->", docs[int(np.asarray(out.indices)[0, 0])][:80])


if __name__ == "__main__":
    main()
