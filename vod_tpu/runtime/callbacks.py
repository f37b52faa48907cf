"""Training callbacks.

Parity: reference `vod_ops/callbacks/` — `Callback:5` base (fit/train/val x
start/end/batch hooks invoked by `fabric.call`), `ExportModule:23` (export
submodules + tokenizer in a reusable format at fit end), `PprintBatch`
(pretty-print + log the first batch).
"""

from __future__ import annotations

import json
import pathlib
import typing as typ


class Callback:
    """Hook points mirroring the reference's Callback ABC (`callbacks/base.py:5`)."""

    def on_fit_start(self, **kw: typ.Any) -> None: ...

    def on_fit_end(self, **kw: typ.Any) -> None: ...

    def on_train_batch_start(self, **kw: typ.Any) -> None: ...

    def on_train_batch_end(self, **kw: typ.Any) -> None: ...

    def on_validation_start(self, **kw: typ.Any) -> None: ...

    def on_validation_end(self, **kw: typ.Any) -> None: ...


def call_callbacks(callbacks: typ.Sequence[Callback], hook: str, **kw: typ.Any) -> None:
    """Invoke a hook on every callback (parity: `fabric.call`)."""
    for cb in callbacks:
        getattr(cb, hook)(**kw)


class ExportModule(Callback):
    """Export params (orbax) + tokenizer + config at fit end.

    Parity: `ExportModule` (`callbacks/export_module.py:23`) — the reference
    exports HF-format submodules and optionally uploads to gcs; here the export
    is an orbax params dir + tokenizer files + a config.json, which
    `load_export` restores.
    """

    def __init__(
        self,
        output_dir: str | pathlib.Path,
        submodules: typ.Optional[list[str]] = None,
        upload_to: typ.Optional[str] = None,
    ):
        self.output_dir = pathlib.Path(output_dir)
        self.submodules = submodules
        # remote destination (any fsspec URL — gs://, s3://, file://; parity:
        # the reference's gcs upload, `callbacks/export_module.py:23`)
        self.upload_to = upload_to

    def on_fit_end(self, *, params: typ.Any = None, tokenizer: typ.Any = None, config: typ.Any = None, **kw: typ.Any) -> None:
        import orbax.checkpoint as ocp

        self.output_dir.mkdir(parents=True, exist_ok=True)
        export = params
        if self.submodules and isinstance(params, dict):
            inner = params.get("params", params)
            export = {"params": {k: v for k, v in inner.items() if k in self.submodules}}
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save((self.output_dir / "params").absolute(), export, force=True)
        if tokenizer is not None and hasattr(tokenizer, "save_pretrained"):
            tokenizer.save_pretrained(str(self.output_dir / "tokenizer"))
        if config is not None:
            cfg = config.model_dump_json() if hasattr(config, "model_dump_json") else json.dumps(config)
            (self.output_dir / "config.json").write_text(cfg)
        if self.upload_to:
            self.upload(self.upload_to)

    def upload(self, url: str) -> None:
        """Recursively put the export dir at an fsspec URL (gs://bucket/path,
        s3://..., file:///...). Parity: the reference uploads the export to a
        gcs bucket at fit end."""
        import fsspec

        fs, root = fsspec.core.url_to_fs(url)
        # fsspec's dir-into-dir heuristics depend on whether the target
        # exists; pin the layout to <url>/<export-dir-name>/** explicitly
        dest = f"{root.rstrip('/')}/{self.output_dir.name}"
        fs.makedirs(dest, exist_ok=True)
        fs.put(f"{self.output_dir}/", dest, recursive=True)


def load_export(output_dir: str | pathlib.Path, params_like: typ.Any) -> typ.Any:
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(
            (pathlib.Path(output_dir) / "params").absolute(),
            args=ocp.args.PyTreeRestore(item=params_like),
        )


class PprintBatch(Callback):
    """Pretty-print the first batch (parity: `callbacks/pprint_batch.py`)."""

    def __init__(self, printer: typ.Optional[typ.Callable[[typ.Any], None]] = None):
        self.printer = printer
        self._done = False

    def on_train_batch_start(self, *, batch: typ.Any = None, **kw: typ.Any) -> None:
        if self._done or batch is None:
            return
        self._done = True
        if self.printer is not None:
            self.printer(batch)
        else:
            from vod_tpu.utils.pretty import pprint_batch

            pprint_batch(batch)
