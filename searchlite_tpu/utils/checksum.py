"""CRC32 checksums (IEEE, same polynomial as the reference's crc32fast;
see searchlite-core `util/checksum.rs:3-7`)."""

from __future__ import annotations

import zlib


def crc32(data: bytes) -> int:
    return zlib.crc32(data) & 0xFFFFFFFF
