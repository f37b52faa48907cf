"""Data-layer tests: rosetta adapters (mirrors reference
`vod_datasets/tests/test_adapters.py` parametrized row fixtures), isolation,
sectioning, analyzer, corpus tokenization, configs, utils."""

import numpy as np
import pytest

from tests.helpers import tiny_tokenizer
from vod_tpu.data.rosetta.adapters import (
    AliasedQueryAdapter,
    AliasedSectionAdapter,
    IdentityQueryAdapter,
    McqaQueryAdapter,
    SquadQueryWithContextsAdapter,
    TextToTextQueryAdapter,
    TriviaQaQueryAdapter,
    find_adapter,
    transform,
)
from vod_tpu.data.rosetta.models import QueryModel, SectionModel


@pytest.mark.parametrize(
    "row,adapter,expect",
    [
        (
            {"question": "what is the capital of france", "choices": ["paris", "rome"], "answer": 0},
            McqaQueryAdapter,
            {"answers": ["paris", "rome"], "answer_scores": [1.0, 0.0]},
        ),
        (
            {"question": "capital of italy", "options": ["paris", "rome"], "answer": "B"},
            McqaQueryAdapter,
            {"answer_scores": [0.0, 1.0]},
        ),
        (
            {"question": "who", "answer": {"value": "x", "aliases": ["y", "x"]}},
            TriviaQaQueryAdapter,
            {"answers": ["x", "y"]},
        ),
        (
            {"source": "translate: hello", "target": "bonjour"},
            TextToTextQueryAdapter,
            {"answers": ["bonjour"]},
        ),
        (
            {"question": "q1", "answer": "a1", "qid": 7},
            AliasedQueryAdapter,
            {"id": "7", "answers": ["a1"]},
        ),
    ],
)
def test_query_adapters(row, adapter, expect) -> None:
    found = find_adapter(row, "queries")
    assert found is adapter, (found, adapter)
    out = adapter.translate_row(row)
    assert isinstance(out, QueryModel)
    for k, v in expect.items():
        assert getattr(out, k) == v


def test_section_adapters() -> None:
    row = {"passage": "some text here", "doc_id": 42, "heading": "t"}
    adapter = find_adapter(row, "sections")
    assert adapter is AliasedSectionAdapter
    out = adapter.translate_row(row)
    assert isinstance(out, SectionModel)
    assert out.id == "42" and out.title == "t"

    row2 = {"id": "s1", "content": "direct"}
    assert find_adapter(row2, "sections").translate_row(row2).content == "direct"


def test_squad_isolation_roundtrip() -> None:
    """Parity with reference test_isolate: split q+contexts into shards, re-link."""
    rows = [
        {"question": "capital of france", "context": "paris is the capital of france", "answers": {"text": ["paris"]}},
        {"question": "capital of japan", "context": "tokyo is the capital of japan", "answers": {"text": ["tokyo"]}},
        {"question": "france capital again", "context": "paris is the capital of france", "answers": {"text": ["paris"]}},
    ]
    assert find_adapter(rows[0], "queries_with_context") is SquadQueryWithContextsAdapter
    translated = [SquadQueryWithContextsAdapter.translate_row(r).model_dump() for r in rows]

    from vod_tpu.data.preprocessing import isolate_qa_and_sections

    queries, sections = isolate_qa_and_sections(translated)
    assert len(sections) == 2  # duplicate context deduped
    sec_ids = {s["id"] for s in sections}
    for q in queries:
        assert set(q["retrieval_ids"]) <= sec_ids
        assert q["subset_ids"] == q["retrieval_ids"]
    # same context -> same section id
    assert queries[0]["retrieval_ids"] == queries[2]["retrieval_ids"]


def test_fixed_length_sectionizer() -> None:
    from vod_tpu.data.sectioning import FixedLengthSectionizer, SentenceSectionizer

    tok = tiny_tokenizer()
    text = " ".join(["the quick brown fox jumps over the lazy dog"] * 10)
    sec = FixedLengthSectionizer(tok, section_length=20, stride=10)
    parts = sec(text)
    assert len(parts) > 2
    assert parts[1].startswith("(...) ")
    assert parts[0].endswith(" (...)")
    # every part re-tokenizes within budget (+ellipsis allowance)
    for p in parts:
        n = len(tok(p, add_special_tokens=False)["input_ids"])
        assert n <= 20 + 2

    sent = SentenceSectionizer()
    assert sent("a b. c d. ") == ["a b", "c d"]


def test_analyzer_and_postings_native_matches_python() -> None:
    from vod_tpu.native import analyze_texts, native_available
    import vod_tpu.native.loader as loader

    texts = ["The quick brown fox", "a dog and a fox", "unrelated words entirely"]
    ids, counts = analyze_texts(texts, vocab_size=1 << 16, max_terms=16)
    assert counts.tolist() == [3, 2, 3]  # stopwords dropped
    py = [loader._py_analyze(t, 1 << 16, 2, True, 16) for t in texts]
    for i in range(3):
        assert ids[i, : counts[i]].tolist() == py[i]

    docs, imps = loader.build_postings(ids, counts, n_terms=1 << 16, max_postings=4)
    fox = py[0][2]
    fox_docs = set(docs[fox][docs[fox] >= 0].tolist())
    assert fox_docs == {0, 1}
    assert np.all(imps[fox][docs[fox] >= 0] > 0)


def test_corpus_tokenization_and_query_resolution() -> None:
    from vod_tpu.data.corpus import tokenize_corpus, tokenize_queries

    tok = tiny_tokenizer()
    sections = [
        {"id": "s0", "content": "paris is the capital of france", "title": "france", "subset_id": "fr"},
        {"id": "s1", "content": "tokyo is the capital of japan", "title": "japan", "subset_id": "jp"},
    ]
    corpus = tokenize_corpus(sections, tok, max_length=16, with_sparse_terms=True)
    assert corpus["input_ids"].shape == (2, 16)
    assert corpus["subset_ids"].tolist() == [0, 1]
    assert corpus["terms"].shape[0] == 2

    queries = [
        {
            "id": "q0",
            "query": "what is the capital of france",
            "answers": ["paris", "rome"],
            "answer_scores": [1.0, 0.0],
            "retrieval_ids": ["s0"],
            "retrieval_scores": [1.0],
            "subset_ids": ["fr"],
        }
    ]
    qenc = tokenize_queries(
        queries, tok, max_length=16, id_map=corpus["id_map"],
        subset_id_map=corpus["subset_id_map"], with_answers=True,
    )
    assert qenc["section_ids"][0, 0] == 0
    assert qenc["subset_ids"][0, 0] == 0
    # best answer (argmax score) tokenized
    assert qenc["answer_ids"].shape[0] == 1
    paris_id = tok.convert_tokens_to_ids("paris")
    assert paris_id in qenc["answer_ids"][0].tolist()


def test_realm_dataloader_batches() -> None:
    from vod_tpu.configs.dataloaders import DataLoaderConfig
    from vod_tpu.dataloaders import RealmDataloader

    tok = tiny_tokenizer()
    rows = [
        {"id": f"q{i}", "query": f"tok{i % 8} question", "answers": ["a"], "answer_scores": [1.0],
         "retrieval_ids": [], "retrieval_scores": [], "subset_ids": []}
        for i in range(10)
    ]
    dl = RealmDataloader(rows, tok, config=DataLoaderConfig(batch_size=4), max_length=8)
    batches = list(dl.epoch(seed=0))
    assert len(batches) == 2 == len(dl)
    assert batches[0].input_ids.shape == (4, 8)
    assert batches[0].section_ids.shape == (4, 4)


def test_config_diff_algebra_and_faiss_translation() -> None:
    from vod_tpu.configs import DenseFactoryConfig, SearchFactoryDefaults

    defaults = SearchFactoryDefaults()
    hybrid = defaults.realize({"dense": {"codec": "pq", "n_subquantizers": 16}, "sparse": None})
    assert hybrid.dense.codec == "pq" and hybrid.dense.n_subquantizers == 16
    assert hybrid.sparse is None
    assert defaults.dense.codec == "flat"  # defaults untouched

    # IVF…,PQ… maps to the cell-pruned ivfpq codec (the reference's default
    # factory shape); PQ without an IVF stage keeps the exhaustive codec.
    c = DenseFactoryConfig.from_faiss_factory("OPQ32_512,IVFauto,PQ32x8", train_size=1_000_000)
    assert c.codec == "ivfpq" and c.n_subquantizers == 32 and c.train_size == 1_000_000
    assert DenseFactoryConfig.from_faiss_factory("Flat").dtype == "float32"
    assert DenseFactoryConfig.from_faiss_factory("IVFauto,Flat").codec == "ivf"

    c2 = c + {"n_candidates": 4096}
    assert c2.n_candidates == 4096 and c2.codec == "ivfpq"


def test_fingerprints_and_template_and_schedule() -> None:
    from vod_tpu.utils import Template, fingerprint, fingerprint_params

    t = Template("{{ title }} | {{ content }}")
    assert t.input_vars == {"title", "content"}
    assert t.render({"title": "a", "content": "b"}) == "a | b"
    import pickle

    t2 = pickle.loads(pickle.dumps(t))
    assert t2.render({"title": "x", "content": "y"}) == "x | y"

    a = {"w": np.arange(4.0), "b": {"x": np.ones(2)}}
    b = {"w": np.arange(4.0), "b": {"x": np.ones(2)}}
    assert fingerprint_params(a) == fingerprint_params(b)
    b["w"] = b["w"] + 1
    assert fingerprint_params(a) != fingerprint_params(b)
    assert fingerprint({"k": 1}) != fingerprint({"k": 2})


def test_sparse_engine_from_analyzer_end_to_end() -> None:
    """Full sparse path: analyze -> postings -> device BM25 search finds the doc."""
    import jax.numpy as jnp

    from vod_tpu.native import analyze_texts, build_postings
    from vod_tpu.search import SearchQueries, sparse_search
    from vod_tpu.search.sparse import SparseIndex

    docs_text = [
        "paris is the capital city of france",
        "tokyo is the capital city of japan",
        "the quick brown fox jumps over the lazy dog",
    ]
    vocab = 1 << 14
    ids, counts = analyze_texts(docs_text, vocab_size=vocab, max_terms=32)
    docs_arr, imps_arr = build_postings(ids, counts, n_terms=vocab, max_postings=8)
    index = SparseIndex(
        postings_docs=jnp.asarray(docs_arr),
        postings_impacts=jnp.asarray(imps_arr),
        n_docs=3,
    )
    q_ids, q_counts = analyze_texts(["capital of france"], vocab_size=vocab, max_terms=8)
    out = sparse_search(index, SearchQueries(terms=jnp.asarray(q_ids)), top_k=3)
    top = np.asarray(out.indices)[0]
    assert top[0] == 0  # france doc wins
    scores = np.asarray(out.scores)[0]
    assert scores[0] > scores[1] > -np.inf  # japan doc shares 'capital'


def test_loggers_and_chrono(tmp_path) -> None:
    from vod_tpu.runtime.logging import CSVLogger, JSONLLogger, MultiLogger, flatten_metrics
    from vod_tpu.utils.chrono import BlockTimer, Chrono

    flat = flatten_metrics({"a": 1, "b": {"c": 2.5, "d": {"e": 3}}, "skip": "text"})
    assert flat == {"a": 1.0, "b/c": 2.5, "b/d/e": 3.0}

    lg = MultiLogger(JSONLLogger(tmp_path / "m.jsonl"), CSVLogger(tmp_path / "m.csv"))
    lg(1, {"loss": 0.5})
    lg(2, {"loss": 0.25, "mrr": 0.9})
    import json

    lines = [json.loads(l) for l in (tmp_path / "m.jsonl").read_text().splitlines()]
    assert lines[1]["mrr"] == 0.9
    assert "mrr" in (tmp_path / "m.csv").read_text().splitlines()[0]

    ch = Chrono()
    diag = {}
    with BlockTimer("stage_time", diag):
        ch.start()
        ch.stop()
    assert diag["stage_time"] >= 0
    assert ch.get_avg_lap_time() >= 0


def test_analyzer_unicode_lowercase_parity() -> None:
    """Non-ASCII uppercase text hashes to the same term ids in the native C++
    and pure-Python analyzers (full-Unicode lowercasing happens host-side)."""
    from vod_tpu.native import loader

    texts = ["ÉDUCATION Nationale Française", "МОСКВА и Река", "Großstraße ÜBER"]
    native_ids, native_counts = loader.analyze_texts(texts, use_stopwords=False)
    lowered = [t.lower() for t in texts]
    # the pure-python path, forced
    py_ids = np.full_like(native_ids, -1)
    py_counts = np.zeros_like(native_counts)
    for i, t in enumerate(lowered):
        ids = loader._py_analyze(t, 1 << 18, 2, False, native_ids.shape[1])
        py_counts[i] = len(ids)
        py_ids[i, : len(ids)] = ids
    if loader.native_available():
        assert np.array_equal(native_counts, py_counts)
        assert np.array_equal(native_ids, py_ids)
    else:  # no g++: both paths are the python one — trivially equal
        assert np.array_equal(native_ids, py_ids)


def test_stopwords_33_language_parity() -> None:
    """Every language in the reference's map (`es_body.py:32`) resolves to a
    stopword list (ja/zh intentionally empty — segmenting-analyzer de-scope)."""
    from vod_tpu.native.stopwords import LANGUAGES_MAP, STOPWORDS, normalize_language

    assert len(LANGUAGES_MAP) == 31
    for code, name in LANGUAGES_MAP.items():
        assert normalize_language(code) == name
        assert name in STOPWORDS, name
    # filtering actually removes a french stopword by hashed id
    from vod_tpu.native.loader import analyze_texts, fnv1a_id

    ids, counts = analyze_texts(["le chat est sur la table"], language="fr", use_stopwords=False)
    kept = set(ids[0, : counts[0]].tolist())
    assert fnv1a_id("le", 1 << 18) not in kept
    assert fnv1a_id("chat", 1 << 18) in kept


def test_beir_loader_local_directory() -> None:
    """The BeIR loader's qrels -> retrieval_ids logic, proven offline on a
    vendored BeIR-format fixture (parity: reference `loaders/beir.py:233`)."""
    import pathlib

    from vod_tpu.data.loaders.beir import BeirDatasetLoader

    root = str(pathlib.Path(__file__).parent / "fixtures" / "beir_tiny")
    sections = BeirDatasetLoader("sections")(subsets=[root])
    assert [s["id"] for s in sections] == ["d1", "d2", "d3", "d4", "d5"]
    assert sections[0]["title"] == "France"
    assert sections[3]["title"] is None  # empty title -> None

    queries = BeirDatasetLoader("queries")(subsets=[root], split="test")
    by_id = {q["id"]: q for q in queries}
    assert set(by_id) == {"q1", "q2", "q3"}  # q4 has no qrels -> dropped
    assert by_id["q1"]["retrieval_ids"] == ["d1", "d5"]
    assert by_id["q3"]["retrieval_scores"] == [2.0]

    # and the rows flow through the rosetta/query pipeline end-to-end
    from vod_tpu.data.interface import load_queries, load_sections
    from vod_tpu.configs.datasets import QueriesDatasetConfig, SectionsDatasetConfig

    qcfg = QueriesDatasetConfig(
        identifier="beir-tiny", name_or_path=BeirDatasetLoader("queries"),
        subsets=[root], split="test", link="beir-tiny-sections",
    )
    scfg = SectionsDatasetConfig(
        identifier="beir-tiny-sections", name_or_path=BeirDatasetLoader("sections"),
        subsets=[root],
    )
    qs = load_queries(qcfg)
    ss = load_sections(scfg)
    assert len(qs) == 3 and len(ss) == 5
    assert qs[0]["retrieval_ids"] == ["d1", "d5"]
