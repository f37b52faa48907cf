"""Lazy vector access + tensorstore-backed stores.

Parity: reference `src/vod_types/lazy_array.py` — `LazyArray:16` /
`TensorStoreLazyArray:87` / `as_lazy_array:136` unify in-memory ndarrays,
tensorstore handles and store specs behind one `__getitem__`; and
`vod_tools/ts_factory/ts_factory.py:30` — `TensorStoreFactory`, a serializable
spec for zarr stores on disk (`instantiate:54` writes `factory.json` alongside).
"""

from __future__ import annotations

import json
import pathlib
import typing as typ

import numpy as np


class LazyArray:
    """Lazy row access to a 2-d vector store (ndarray / tensorstore / factory)."""

    def __init__(self, source: typ.Any):
        self._source = source

    @property
    def shape(self) -> tuple[int, ...]:
        return tuple(self._resolved().shape)

    def _resolved(self) -> typ.Any:
        src = self._source
        if isinstance(src, TensorStoreFactory):
            src = self._source = src.open()
        return src

    def __len__(self) -> int:
        return int(self.shape[0])

    def __getitem__(self, item: typ.Any) -> np.ndarray:
        src = self._resolved()
        if isinstance(src, np.ndarray):
            return src[item]
        if hasattr(src, "read"):  # tensorstore
            return np.asarray(src[item].read().result())
        return np.asarray(src[item])

    def to_numpy(self) -> np.ndarray:
        return self[:]


def as_lazy_array(x: typ.Any) -> LazyArray:
    """Wrap anything row-indexable (parity: `as_lazy_array:136`)."""
    if isinstance(x, LazyArray):
        return x
    return LazyArray(x)


class TensorStoreFactory:
    """A serializable spec for a zarr-on-file store (parity: `ts_factory.py:30`)."""

    def __init__(self, path: str | pathlib.Path, shape: tuple[int, ...], dtype: str = "float32", chunk_rows: int = 1024):
        self.path = str(path)
        self.shape = tuple(int(s) for s in shape)
        self.dtype = dtype
        self.chunk_rows = int(chunk_rows)

    def spec(self, create: bool = False) -> dict:
        dtype_map = {"float32": "<f4", "float16": "<f2", "int32": "<i4", "uint8": "|u1"}
        spec: dict = {
            "driver": "zarr",
            "kvstore": {"driver": "file", "path": self.path},
        }
        if create:
            spec["metadata"] = {
                "shape": list(self.shape),
                "dtype": dtype_map[self.dtype],
                "chunks": [min(self.chunk_rows, self.shape[0])] + list(self.shape[1:]),
            }
            spec["create"] = True
            spec["delete_existing"] = True
        return spec

    def instantiate(self) -> typ.Any:
        """Create the store on disk + write `factory.json` (parity: `:54`)."""
        import tensorstore as ts

        store = ts.open(self.spec(create=True)).result()
        meta = pathlib.Path(self.path) / "factory.json"
        meta.parent.mkdir(parents=True, exist_ok=True)
        meta.write_text(json.dumps(self.to_json()))
        return store

    def open(self) -> typ.Any:
        import tensorstore as ts

        return ts.open(self.spec(create=False)).result()

    def exists(self) -> bool:
        return (pathlib.Path(self.path) / "factory.json").exists()

    def to_json(self) -> dict:
        return {"path": self.path, "shape": list(self.shape), "dtype": self.dtype, "chunk_rows": self.chunk_rows}

    @classmethod
    def from_json(cls, d: typ.Mapping) -> "TensorStoreFactory":
        return cls(d["path"], tuple(d["shape"]), d["dtype"], d.get("chunk_rows", 1024))

    @classmethod
    def from_path(cls, path: str | pathlib.Path) -> "TensorStoreFactory":
        meta = json.loads((pathlib.Path(path) / "factory.json").read_text())
        return cls.from_json(meta)
