"""Binary token dataset (.bin tokens + .idx document sizes), memory-mapped.

Reference parity: the Megatron indexed dataset consumed by
`gpt_dataset.py` / `blendable_dataset.py` (token bins + index files built by
helpers.cpp). Our format: <prefix>.bin = flat little-endian token array;
<prefix>.idx = numpy .npy of int32 document sizes + a small JSON header.
"""

from __future__ import annotations

import json
import os
from typing import Iterable, List, Sequence

import numpy as np

_MAGIC = "NEMO_TPU_IDX_V1"

_DTYPES = {"uint16": np.uint16, "int32": np.int32, "uint32": np.uint32}


class IndexedDatasetWriter:
    def __init__(self, prefix: str, dtype: str = "int32"):
        self.prefix = prefix
        self.dtype = dtype
        self._bin = open(prefix + ".bin", "wb")
        self._sizes: List[int] = []

    def add_document(self, tokens: Sequence[int]) -> None:
        arr = np.asarray(tokens, _DTYPES[self.dtype])
        self._bin.write(arr.tobytes())
        self._sizes.append(len(arr))

    def finalize(self) -> None:
        self._bin.close()
        header = {"magic": _MAGIC, "dtype": self.dtype, "num_docs": len(self._sizes)}
        with open(self.prefix + ".idx", "wb") as f:
            hdr = json.dumps(header).encode()
            f.write(len(hdr).to_bytes(8, "little"))
            f.write(hdr)
            np.asarray(self._sizes, np.int32).tofile(f)


class IndexedDataset:
    """Memory-mapped reader: dataset[i] → int32 token array of document i."""

    def __init__(self, prefix: str):
        with open(prefix + ".idx", "rb") as f:
            n = int.from_bytes(f.read(8), "little")
            header = json.loads(f.read(n).decode())
            if header["magic"] != _MAGIC:
                raise ValueError("bad .idx magic")
            self.sizes = np.fromfile(f, np.int32, header["num_docs"])
        self.dtype = _DTYPES[header["dtype"]]
        self.offsets = np.concatenate([[0], np.cumsum(self.sizes.astype(np.int64))])
        self.tokens = np.memmap(prefix + ".bin", dtype=self.dtype, mode="r")

    def __len__(self) -> int:
        return len(self.sizes)

    def __getitem__(self, i: int) -> np.ndarray:
        return np.asarray(self.tokens[self.offsets[i] : self.offsets[i + 1]], np.int32)

    @property
    def total_tokens(self) -> int:
        return int(self.offsets[-1])
