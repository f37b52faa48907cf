"""Callbacks, export, pretty printers."""
import numpy as np
import jax.numpy as jnp

from vod_tpu.runtime.callbacks import Callback, ExportModule, PprintBatch, call_callbacks, load_export
from vod_tpu.utils.pretty import pprint_batch, pprint_metrics, pprint_params, pprint_retrieval_batch


def test_export_module_roundtrip(tmp_path) -> None:
    params = {"params": {"encoder": {"w": jnp.ones((2, 2))}, "lm": {"w": jnp.zeros((2,))}}}
    cb = ExportModule(tmp_path / "export", submodules=["encoder"])
    cb.on_fit_end(params=params, config={"a": 1})
    restored = load_export(tmp_path / "export", {"params": {"encoder": {"w": jnp.zeros((2, 2))}}})
    assert np.allclose(np.asarray(restored["params"]["encoder"]["w"]), 1.0)
    assert (tmp_path / "export" / "config.json").exists()


def test_callback_hooks_and_pprint(capsys) -> None:
    calls = []

    class Rec(Callback):
        def on_train_batch_end(self, **kw):
            calls.append(kw["step"])

    call_callbacks([Rec()], "on_train_batch_end", step=3)
    assert calls == [3]

    from vod_tpu.types import RealmBatch

    batch = RealmBatch(
        query__input_ids=jnp.zeros((2, 4), "int32"),
        query__attention_mask=jnp.ones((2, 4), "int32"),
        section__input_ids=jnp.zeros((4, 6), "int32"),
        section__attention_mask=jnp.ones((4, 6), "int32"),
        section__relevance=jnp.zeros((2, 2)),
        section__idx=jnp.zeros((2, 2), "int32"),
        section__score=jnp.zeros((2, 2)),
        section__sparse=jnp.zeros((2, 2)),
    )
    PprintBatch().on_train_batch_start(batch=batch)
    pprint_metrics({"mrr": 0.5})
    pprint_params({"encoder": {"w": np.ones((3, 4))}})
    out = capsys.readouterr().out
    assert "query__input_ids" in out and "mrr" in out and "12" in out


def test_pprint_retrieval_batch(capsys) -> None:
    from tests.helpers import tiny_tokenizer
    from vod_tpu.types import RealmBatch

    tok = tiny_tokenizer()
    enc = tok(["the quick fox", "paris france"], max_length=6, truncation=True,
              padding="max_length", return_tensors="np")
    sec = tok(["paris is the capital", "tokyo japan", "berlin germany", "rome italy"],
              max_length=8, truncation=True, padding="max_length", return_tensors="np")
    batch = RealmBatch(
        query__input_ids=jnp.asarray(enc["input_ids"].astype("int32")),
        query__attention_mask=jnp.asarray(enc["attention_mask"].astype("int32")),
        section__input_ids=jnp.asarray(sec["input_ids"].astype("int32")),
        section__attention_mask=jnp.asarray(sec["attention_mask"].astype("int32")),
        section__relevance=jnp.zeros((2, 2)),
        section__idx=jnp.zeros((2, 2), "int32"),
        section__score=jnp.asarray([[1.0, 0.5], [0.2, 0.9]]),
        section__sparse=jnp.zeros((2, 2)),
    )
    pprint_retrieval_batch(batch, tok)
    out = capsys.readouterr().out
    assert "query[0]" in out and "#0" in out


def test_tracker_logger_offline_fallback(tmp_path) -> None:
    """TrackerLogger (W&B-shaped) falls back to run-dir artifacts offline."""
    import json as _json

    from vod_tpu.runtime.logging import TrackerLogger

    t = TrackerLogger(tmp_path / "run", config={"lr": 1e-3}, run_name="r1")
    t.log(1, {"loss": 0.5, "nested": {"mrr": 0.7}})
    t.log(2, {"loss": 0.4})
    t.log_text("first_batch", "<b>hi</b>", step=1)
    t.finish()
    cfg = _json.loads((tmp_path / "run" / "config.json").read_text())
    assert cfg["lr"] == 1e-3
    lines = [_json.loads(x) for x in (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()]
    assert lines[0] == {"step": 1, "loss": 0.5, "nested/mrr": 0.7}
    assert (tmp_path / "run" / "first_batch_1.html").read_text() == "<b>hi</b>"


def test_render_retrieval_batch_html() -> None:
    from vod_tpu.utils.pretty import render_retrieval_batch_html

    class Tok:
        def decode(self, ids, **kw):
            return " ".join(f"w{t}" for t in ids)

    class B:
        query__input_ids = np.asarray([[5, 6, 0]])
        section__input_ids = np.asarray([[[7, 8], [9, 0]]])
        section__score = np.asarray([[1.5, -np.inf]])
        section__relevance = np.asarray([[1.0, 0.0]])

    html = render_retrieval_batch_html(B(), Tok())
    assert "w5 w6" in html and "w7 w8" in html and "+1.500" in html


def test_export_module_upload_fsspec(tmp_path) -> None:
    """upload_to= puts the export dir at an fsspec URL at fit end (parity:
    the reference's gcs upload, `callbacks/export_module.py:23`; local fs
    stands in for the bucket here)."""
    params = {"params": {"encoder": {"w": jnp.ones((2, 2))}}}
    remote = tmp_path / "remote"
    cb = ExportModule(tmp_path / "export", upload_to=f"file://{remote}")
    cb.on_fit_end(params=params, config={"a": 1})
    up = remote / "export"
    assert (up / "config.json").exists() and (up / "params").is_dir()
    restored = load_export(up, {"params": {"encoder": {"w": jnp.zeros((2, 2))}}})
    assert np.allclose(np.asarray(restored["params"]["encoder"]["w"]), 1.0)


def test_format_helpers() -> None:
    from vod_tpu.utils.pretty import human_format_bytes, human_format_nb, repr_array

    assert human_format_nb(1_234_567) == "1.23M"
    assert human_format_nb(999) == "999.00"
    assert human_format_bytes(3 << 20, "MB") == "3.00 MB"
    s = repr_array(jnp.zeros((4, 8), dtype=jnp.bfloat16))
    assert "[4, 8]" in s and "bfloat16" in s


def test_pprint_batch_stats_and_config(capsys) -> None:
    from vod_tpu.utils.pretty import pprint_config

    b = type("B", (), {})()
    b.x = np.asarray([[1.0, 2.0], [3.0, np.inf]])
    b.names = ["a", "b"]
    b.flag = True

    pprint_batch(b, header="b")
    out = capsys.readouterr().out
    assert "x" in out and "(2, 2)" in out
    # stats column: finite min/mean/max + non-finite count
    assert "min=1" in out and "1 non-finite" in out

    pprint_config({"model": {"hidden": 8, "api_key": "SECRET"}, "lr": 1e-3}, header="cfg")
    out = capsys.readouterr().out
    assert "hidden" in out and "SECRET" not in out
