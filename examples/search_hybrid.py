"""Hybrid dense + BM25 + lookup search with subset filtering, fused + sampled.

Parity: reference `examples/search/es.py` / `qdrant.py` / hybrid composition —
but all engines live on-device and the merge + priority sampling run in the same
jitted program.

Run: python examples/search_hybrid.py
"""

import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import os

import jax

# honor an explicit JAX_PLATFORMS=cpu request: the axon TPU plugin's
# sitecustomize overrides jax_platforms to "axon,cpu", so the env var alone
# blocks forever on the relay when the chip is busy/down (round-3 finding)
if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from vod_tpu.native import analyze_texts, build_postings
from vod_tpu.search import (
    HybridEngines,
    SearchQueries,
    build_dense_index,
    hybrid_search_and_sample,
)
from vod_tpu.search.sparse import SparseIndex

DOCS = [
    "paris is the capital of france",
    "tokyo is the capital of japan",
    "berlin is the capital of germany",
    "the eiffel tower is in paris",
    "mount fuji is near tokyo",
    "the brandenburg gate is in berlin",
]


def main() -> None:
    rng = np.random.default_rng(0)
    n, d = len(DOCS), 64
    vocab = 1 << 14

    # dense: random embeddings stand in for an encoder
    emb = rng.normal(size=(n, d)).astype("float32")
    dense = build_dense_index(jnp.asarray(emb), subset_ids=jnp.arange(n) % 2, dtype="float32")

    # sparse: the C++ analyzer -> BM25 impact postings
    ids, counts = analyze_texts(DOCS, vocab_size=vocab, max_terms=32)
    docs_arr, imps_arr = build_postings(ids, counts, n_terms=vocab, max_postings=8)
    sparse = SparseIndex(
        postings_docs=jnp.asarray(docs_arr), postings_impacts=jnp.asarray(imps_arr), n_docs=n
    )

    engines = HybridEngines(dense=dense, sparse=sparse)
    q_terms, _ = analyze_texts(["capital of france", "mountain near tokyo"], vocab_size=vocab, max_terms=8)
    queries = SearchQueries(
        vector=jnp.asarray(rng.normal(size=(2, d)).astype("float32")),
        terms=jnp.asarray(q_terms),
        section_ids=jnp.asarray([[0, -1], [4, -1]], dtype="int32"),  # gold ids
    )

    sampled, merged = jax.jit(
        lambda k: hybrid_search_and_sample(
            k, engines, queries, prefetch=6, total=4, max_pos_sections=1,
            weights={"dense": 0.5, "sparse": 1.0},
        )
    )(jax.random.PRNGKey(0))

    print("merged ids:      ", np.asarray(merged.indices))
    print("merged scores:   ", np.round(np.asarray(merged.scores), 3))
    print("merged labels:   ", np.asarray(merged.labels))
    print("sampled ids:     ", np.asarray(sampled.batch.indices))
    print("sampled labels:  ", np.asarray(sampled.batch.labels))
    print("log weights:     ", np.round(np.asarray(sampled.log_weights), 3))
    for qi in range(2):
        top = int(np.asarray(merged.indices)[qi, 0])
        print(f"query {qi}: top section = {DOCS[top]!r}")


if __name__ == "__main__":
    main()
