"""Document store: stored JSON per document.

Parity with searchlite-core `index/docstore.rs`: per-doc record is a
u32 LE length + JSON bytes, with an optional per-doc compression flag
and a 32 MiB per-document cap in both directions. The reference uses
zstd; we use zlib (stdlib) — flagged in the segment meta so mixed
builds fail loudly rather than decode garbage.
"""

from __future__ import annotations

import json
import zlib
from typing import Any, BinaryIO

from searchlite_tpu.errors import StorageError

MAX_DOCSTORE_BYTES = 32 * 1024 * 1024


class DocStoreWriter:
    def __init__(self, fileobj: BinaryIO, compress: bool = False):
        self._file = fileobj
        self._compress = compress
        self._offsets: list[int] = []
        self._pos = 0

    def add_document(self, doc: dict) -> None:
        data = json.dumps(doc, separators=(",", ":"), ensure_ascii=False).encode()
        if self._compress:
            data = zlib.compress(data)
        if len(data) > MAX_DOCSTORE_BYTES:
            raise StorageError(
                f"document of {len(data)} bytes exceeds docstore cap")
        self._offsets.append(self._pos)
        self._file.write(len(data).to_bytes(4, "little"))
        self._file.write(data)
        self._pos += 4 + len(data)

    @property
    def offsets(self) -> list[int]:
        return self._offsets


class DocStoreReader:
    def __init__(self, data: bytes, offsets: list[int], compress: bool = False):
        self._data = data
        self._offsets = offsets
        self._compress = compress

    def get(self, ordinal: int) -> dict[str, Any]:
        if ordinal < 0 or ordinal >= len(self._offsets):
            raise StorageError(f"doc ordinal {ordinal} out of range")
        off = self._offsets[ordinal]
        if off + 4 > len(self._data):
            raise StorageError("corrupt docstore: truncated header")
        length = int.from_bytes(self._data[off:off + 4], "little")
        if length > MAX_DOCSTORE_BYTES:
            raise StorageError("corrupt docstore: record exceeds cap")
        end = off + 4 + length
        if end > len(self._data):
            raise StorageError("corrupt docstore: truncated record")
        payload = self._data[off + 4:end]
        if self._compress:
            try:
                payload = zlib.decompress(payload)
            except zlib.error as e:
                raise StorageError(f"corrupt docstore: {e}") from e
        try:
            return json.loads(payload)
        except json.JSONDecodeError as e:
            raise StorageError(f"corrupt docstore: {e}") from e

    def __len__(self) -> int:
        return len(self._offsets)
