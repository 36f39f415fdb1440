"""Append-only HDF5 writer with crash-safe atomic commit.

Same output contract as the reference writer (reference: atlas_patch/utils/h5.py:
18-97): datasets grow along an unlimited first axis in fixed chunk rows; all
writes land in a hidden temp file that is atomically renamed onto the target on
close, so readers only ever observe absent or complete files. Dict-valued
attributes are JSON-encoded; None becomes the string "None".
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any, Mapping, Optional

import h5py
import numpy as np


def _encode_attr(value: Any) -> Any:
    if isinstance(value, dict):
        return json.dumps(value)
    if value is None:
        return "None"
    return value


class H5AppendWriter:
    """Incremental writer: stage in `.name.tmp.<uuid>`, publish via os.replace."""

    def __init__(self, path: str, chunk_rows: int = 8192) -> None:
        self.path = path
        self.chunk_rows = int(chunk_rows)
        self._target_path = os.path.abspath(path)
        dir_name = os.path.dirname(self._target_path) or "."
        base_name = os.path.basename(self._target_path)
        self._tmp_path: str | None = os.path.join(
            dir_name, f".{base_name}.tmp.{uuid.uuid4().hex}"
        )
        self._f = h5py.File(self._tmp_path, "w")
        self._closed = False

    def _ensure_dataset(
        self, key: str, sample: np.ndarray, attrs: Optional[Mapping[str, Any]]
    ) -> None:
        if key in self._f:
            return
        row_shape = sample.shape[1:]
        dset = self._f.create_dataset(
            key,
            shape=(0,) + row_shape,
            maxshape=(None,) + row_shape,
            chunks=(max(1, self.chunk_rows),) + row_shape,
            dtype=sample.dtype,
        )
        if attrs:
            for a_k, a_v in attrs.items():
                dset.attrs[a_k] = _encode_attr(a_v)

    def append(
        self,
        assets: Mapping[str, np.ndarray],
        attributes: Optional[Mapping[str, Mapping[str, Any]]] = None,
    ) -> None:
        for key, val in assets.items():
            self._ensure_dataset(key, val, attributes.get(key) if attributes else None)
            n = int(val.shape[0])
            if n == 0:
                continue
            dset = self._f[key]
            cur = int(dset.shape[0])
            dset.resize(cur + n, axis=0)
            dset[cur : cur + n] = val

    def update_file_attrs(self, file_attrs: Mapping[str, Any]) -> None:
        for a_k, a_v in file_attrs.items():
            self._f.attrs[a_k] = _encode_attr(a_v)

    def close(self) -> None:
        if self._closed:
            return
        try:
            self._f.close()
        finally:
            if self._tmp_path is not None:
                os.replace(self._tmp_path, self._target_path)
                self._tmp_path = None
            self._closed = True

    def abort(self) -> None:
        """Discard all staged writes; the target path is left untouched."""
        if self._closed:
            return
        try:
            self._f.close()
        finally:
            if self._tmp_path and os.path.exists(self._tmp_path):
                try:
                    os.remove(self._tmp_path)
                except OSError:
                    pass
            self._closed = True
