"""Self-contained safetensors read/write.

Implemented directly against the format spec (8-byte LE header length +
JSON header + packed buffers) so we can handle bf16/fp8 via ml_dtypes
without torch, stream-read individual tensors, and write the reference's
metadata headers (modelspec / ot_* keys — reference:
modules/modelSaver/mixin/DtypeModelSaverMixin.py:63-96).
"""

from __future__ import annotations

import json
import mmap
import os
import struct
from typing import Iterator

import ml_dtypes
import numpy as np

_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "BF16": ml_dtypes.bfloat16,
    "F8_E4M3": ml_dtypes.float8_e4m3fn,
    "F8_E5M2": ml_dtypes.float8_e5m2,
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
    "U16": np.uint16,
    "U32": np.uint32,
    "U64": np.uint64,
}
_DTYPE_NAMES = {np.dtype(v): k for k, v in _DTYPES.items()}


def _dtype_name(dtype) -> str:
    return _DTYPE_NAMES[np.dtype(dtype)]


class SafetensorsFile:
    """Random-access reader over an mmapped safetensors file."""

    def __init__(self, path: str):
        self.path = path
        self._file = open(path, "rb")
        self._mm = mmap.mmap(self._file.fileno(), 0, access=mmap.ACCESS_READ)
        (header_len,) = struct.unpack("<Q", self._mm[:8])
        header = json.loads(self._mm[8:8 + header_len].decode("utf-8"))
        self.metadata: dict = header.pop("__metadata__", {})
        self._entries = header
        self._data_start = 8 + header_len

    def keys(self) -> list[str]:
        return list(self._entries.keys())

    def shape(self, key: str) -> tuple[int, ...]:
        return tuple(self._entries[key]["shape"])

    def dtype(self, key: str):
        return np.dtype(_DTYPES[self._entries[key]["dtype"]])

    def tensor(self, key: str) -> np.ndarray:
        entry = self._entries[key]
        start, end = entry["data_offsets"]
        buf = self._mm[self._data_start + start:self._data_start + end]
        arr = np.frombuffer(buf, dtype=_DTYPES[entry["dtype"]])
        return arr.reshape(entry["shape"])

    def items(self) -> Iterator[tuple[str, np.ndarray]]:
        for key in self._entries:
            yield key, self.tensor(key)

    def close(self):
        self._mm.close()
        self._file.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def load_safetensors(path: str) -> dict[str, np.ndarray]:
    with SafetensorsFile(path) as f:
        return {k: np.array(f.tensor(k)) for k in f.keys()}


def load_metadata(path: str) -> dict:
    with SafetensorsFile(path) as f:
        return dict(f.metadata)


def save_safetensors(
        path: str,
        tensors: dict[str, np.ndarray],
        metadata: dict[str, str] | None = None,
):
    """Write a safetensors file. Tensors must be numpy (ml_dtypes ok)."""
    header: dict = {}
    if metadata:
        header["__metadata__"] = {str(k): str(v) for k, v in metadata.items()}
    offset = 0
    ordered = list(tensors.items())
    for name, arr in ordered:
        arr = np.ascontiguousarray(arr)
        nbytes = arr.nbytes
        header[name] = {
            "dtype": _dtype_name(arr.dtype),
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + nbytes],
        }
        offset += nbytes

    header_bytes = json.dumps(header, separators=(",", ":")).encode("utf-8")
    # pad header to 8-byte alignment (spec recommendation)
    pad = (8 - len(header_bytes) % 8) % 8
    header_bytes += b" " * pad

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(header_bytes)))
        f.write(header_bytes)
        for _, arr in ordered:
            f.write(np.ascontiguousarray(arr).tobytes())
