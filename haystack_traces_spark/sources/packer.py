"""Packed-message framing + compression (SURVEY.md §2.9 pack/unpack).

Mirrors the reference's pluggable packer (commons/.../packer/Packer.scala:29-77):
stored blobs are framed as

    b"hytc" | 4-byte big-endian metadata length | metadata JSON | payload

where metadata carries the packer type (PackedMessage.scala:28-49). The
symmetric reader auto-detects: buffers without the magic are treated as raw
uncompressed payload (Unpacker.scala:52-80 backward compat).

Codecs: none/gzip always available (zlib); snappy/zstd gated behind
import-try — the engine's parquet tables use columnar zstd natively
(session.py), so this module exists for byte-level interop with reference
blobs, not for the storage path.
"""

from __future__ import annotations

import gzip
import json
import struct

MAGIC = b"hytc"

try:  # optional codecs, not in the base container
    import snappy as _snappy  # type: ignore
except Exception:
    _snappy = None
try:
    import zstandard as _zstd  # type: ignore
except Exception:
    _zstd = None


def _codecs() -> dict:
    c = {
        "none": (lambda b: b, lambda b: b),
        "gzip": (lambda b: gzip.compress(b, mtime=0), gzip.decompress),
    }
    if _snappy is not None:
        c["snappy"] = (_snappy.compress, _snappy.decompress)
    if _zstd is not None:
        c["zstd"] = (
            lambda b: _zstd.ZstdCompressor().compress(b),
            lambda b: _zstd.ZstdDecompressor().decompress(b),
        )
    return c


def available_codecs() -> list[str]:
    return sorted(_codecs())


def pack(payload: bytes, codec: str = "none") -> bytes:
    comp, _ = _codecs()[codec]
    meta = json.dumps({"t": codec}, separators=(",", ":")).encode("utf-8")
    return MAGIC + struct.pack(">I", len(meta)) + meta + comp(payload)


def unpack(buf: bytes) -> bytes:
    if not buf.startswith(MAGIC):
        return bytes(buf)  # legacy raw payload (Unpacker.scala:52-80)
    meta_len = struct.unpack_from(">I", buf, len(MAGIC))[0]
    meta_start = len(MAGIC) + 4
    meta = json.loads(buf[meta_start : meta_start + meta_len])
    codec = meta.get("t", "none")
    _, decomp = _codecs()[codec]
    return decomp(buf[meta_start + meta_len :])
