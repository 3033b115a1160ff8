"""Real gzip (RFC 1952) wrapper decode — pure stdlib zlib.

gzip is the third archive shape a real corpus carries next to zip and tar
(the classic ``.tar.gz`` path: gzip wrapping a ustar stream). ``zlib`` with
``wbits=31`` handles the full gzip framing including the CRC32 + ISIZE
trailer check; any framing/CRC error raises :class:`ExtractError` ->
``parse_ok=false`` rows, never task failures. Decompressed size is capped
(decompression-bomb guard — the zip-bomb analog for streams).

Payloads travel as bytes-as-text (latin-1), same bridge as zip/tar.
"""

from __future__ import annotations

import zlib

from tika_wrap_spark.core.errors import ExtractError

MAGIC = b"\x1f\x8b"

# decompression-bomb guard: one member may inflate to at most this many
# bytes (the reference's Tika applies analogous zip-bomb limits)
MAX_INFLATED = 64 * 1024 * 1024


def gunzip(data: bytes) -> bytes:
    if not data.startswith(MAGIC):
        raise ExtractError("gzip: bad magic")
    d = zlib.decompressobj(wbits=31)
    try:
        out = d.decompress(data, MAX_INFLATED)
    except zlib.error as exc:
        raise ExtractError("gzip: %s" % exc)
    if d.unconsumed_tail:
        raise ExtractError("gzip: inflated payload exceeds %d bytes" % MAX_INFLATED)
    if not d.eof:
        raise ExtractError("gzip: truncated stream")
    if d.unused_data.strip(b"\x00"):
        raise ExtractError("gzip: trailing garbage after stream")
    return out


def gzip_bytes(data: bytes) -> bytes:
    """Deterministic gzip framing (no mtime/name, fixed flags) — the
    test/corpus builder."""
    c = zlib.compressobj(9, zlib.DEFLATED, 31)
    body = c.compress(data) + c.flush()
    # zero the MTIME field (bytes 4-8) for byte-identical builds
    return body[:4] + b"\x00\x00\x00\x00" + body[8:]


def gunzip_text(text: str) -> str:
    try:
        data = text.encode("latin-1")
    except UnicodeEncodeError:
        raise ExtractError("gzip: payload is not a byte stream (non-latin-1 chars)")
    return gunzip(data).decode("latin-1")


def gzip_text(text: str) -> str:
    return gzip_bytes(text.encode("latin-1")).decode("latin-1")
