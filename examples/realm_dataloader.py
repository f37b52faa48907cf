"""The full REALM data path: text -> tokenize -> device collate -> RealmBatch.

Parity: reference `examples/features/dataloader.py` — the end-to-end CPU
integration demo (spin engines, build a RealmDataloader, print the first batch).
Here the engines are on-device and the collate is one jitted program.

Run: python examples/realm_dataloader.py
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

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tests"))
from helpers import tiny_tokenizer  # offline WordPiece tokenizer

from vod_tpu.configs.dataloaders import DataLoaderConfig
from vod_tpu.data.corpus import tokenize_corpus
from vod_tpu.dataloaders import RealmDataloader
from vod_tpu.runtime import DeviceCorpus, device_collate
from vod_tpu.search import HybridEngines, build_dense_index, build_sparse_index

SECTIONS = [
    {"id": "s0", "content": "paris is the capital of france", "title": "france"},
    {"id": "s1", "content": "tokyo is the capital of japan", "title": "japan"},
    {"id": "s2", "content": "berlin is the capital of germany", "title": "germany"},
    {"id": "s3", "content": "rome is the capital of italy", "title": "italy"},
]
QUERIES = [
    {"id": "q0", "query": "what is the capital of france", "answers": ["paris"],
     "answer_scores": [1.0], "retrieval_ids": ["s0"], "retrieval_scores": [1.0], "subset_ids": []},
    {"id": "q1", "query": "what is the capital of japan", "answers": ["tokyo"],
     "answer_scores": [1.0], "retrieval_ids": ["s1"], "retrieval_scores": [1.0], "subset_ids": []},
]


def main() -> None:
    tok = tiny_tokenizer()
    enc = tokenize_corpus(SECTIONS, tok, max_length=16, with_sparse_terms=True)
    corpus = DeviceCorpus(
        input_ids=jnp.asarray(enc["input_ids"]),
        attention_mask=jnp.asarray(enc["attention_mask"]),
        subset_ids=jnp.asarray(enc["subset_ids"]),
    )
    sparse = build_sparse_index(
        [enc["terms"][i, : enc["term_counts"][i]].tolist() for i in range(len(SECTIONS))],
        n_terms=1 << 18, max_postings=8,
    )
    rng = np.random.default_rng(0)
    dense = build_dense_index(jnp.asarray(rng.normal(size=(4, 32)).astype("float32")), dtype="float32")
    engines = HybridEngines(dense=dense, sparse=sparse)

    dl = RealmDataloader(
        QUERIES, tok, config=DataLoaderConfig(batch_size=2, shuffle=False),
        id_map=enc["id_map"], subset_id_map=enc["subset_id_map"],
        max_length=12, with_answers=True, with_sparse_terms=True,
    )
    qb = next(iter(dl.epoch(0)))
    batch, sampled = device_collate(
        jax.random.PRNGKey(0), engines, corpus, qb,
        query_vectors=jnp.asarray(rng.normal(size=(2, 32)).astype("float32")),
        prefetch=6, n_sections=3, max_pos_sections=1, with_lm=True,
    )
    print("RealmBatch:")
    for name in ["query__input_ids", "section__input_ids", "section__score",
                 "section__relevance", "section__idx", "section__log_weight", "lm__input_ids"]:
        v = getattr(batch, name)
        print(f"  {name:24s} {tuple(v.shape)}")
    print("section scores:\n", np.round(np.asarray(batch.section__score), 3))
    print("relevance:\n", np.asarray(batch.section__relevance))
    print("retrieved for q0:", [
        tok.decode([t for t in np.asarray(corpus.input_ids[i]) if t > 4])
        for i in np.asarray(batch.section__idx)[0]
    ])


if __name__ == "__main__":
    main()
