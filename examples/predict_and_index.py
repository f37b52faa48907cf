"""Embedding pipeline: encoder -> corpus embeddings -> index -> query.

Parity: reference `examples/features/predict.py` (compute_vectors into a
tensorstore, then build an index) — here the embeddings stay on device and feed
`build_dense_index` directly; the tensorstore spill path is exercised via
`cached_embeddings`.

Run: python examples/predict_and_index.py
"""

import sys, pathlib, tempfile

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

from vod_tpu.models import Ranker, RetrievalGradients, TransformerEncoderConfig, VodPoolerConfig
from vod_tpu.runtime import DeviceCorpus
from vod_tpu.runtime.predict import cached_embeddings, compute_embeddings
from vod_tpu.search import SearchQueries, build_dense_index
from vod_tpu.search.dense import dense_search
from vod_tpu.types import RealmBatch


def main() -> None:
    rng = np.random.default_rng(0)
    n, ls, vocab = 512, 16, 1000
    cfg = TransformerEncoderConfig(
        vocab_size=vocab, hidden_size=64, num_layers=2, num_heads=2, intermediate_size=128,
        pooler=VodPoolerConfig(agg_method="mean", output_norm="l2"),
    )
    model = Ranker(cfg=cfg, gradients=RetrievalGradients())
    corpus = DeviceCorpus(
        input_ids=jnp.asarray(rng.integers(1, vocab, (n, ls)).astype("int32")),
        attention_mask=jnp.ones((n, ls), "int32"),
    )
    params = model.init(
        jax.random.PRNGKey(0), corpus.input_ids[:1], corpus.attention_mask[:1],
        method=Ranker.encode_field,
    )
    encode = lambda p, i, m: model.apply(p, i, m, method=Ranker.encode_field)

    emb = compute_embeddings(encode, params, corpus, chunk=128)
    print(f"embeddings: {emb.shape} {emb.dtype}")

    with tempfile.TemporaryDirectory() as cache_dir:
        emb2 = cached_embeddings(
            encode, params, corpus, cache_dir=cache_dir, dataset_fingerprint="demo", chunk=128
        )
        emb3 = cached_embeddings(  # second call: served from the tensorstore cache
            encode, params, corpus, cache_dir=cache_dir, dataset_fingerprint="demo", chunk=128
        )
        print("cache roundtrip max diff:", float(jnp.max(jnp.abs(emb2 - emb3))))

    index = build_dense_index(emb, dtype="bfloat16")
    out = dense_search(index, SearchQueries(vector=emb[:4]), top_k=5)
    print("self-query top-5 (row i should retrieve itself first):")
    print(np.asarray(out.indices))


if __name__ == "__main__":
    main()
