"""Real compressed-stream wrapper decode: gzip (RFC 1952), xz, bz2 —
pure stdlib (zlib / lzma / bz2).

These are the wrapper shapes a real corpus carries around tar streams and
single documents (.tar.gz / .tar.xz / .log.bz2 ...). gzip uses ``zlib``
with ``wbits=31`` (full framing incl. the CRC32 + ISIZE trailer check);
xz/bz2 use their stdlib incremental decompressors. Any framing/CRC error
raises :class:`ExtractError` -> ``parse_ok=false`` rows, never task
failures. Decompressed size is capped per stream (decompression-bomb
guard — the zip-bomb analog for wrappers).

Payloads travel as bytes-as-text (latin-1), same bridge as zip/tar.
"""

from __future__ import annotations

import bz2 as _bz2
import lzma as _lzma
import zlib

from tika_wrap_spark.core.errors import ExtractError

MAGIC = b"\x1f\x8b"
XZ_MAGIC = b"\xfd7zXZ\x00"
BZ2_MAGIC = b"BZh"

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


def unxz(data: bytes) -> bytes:
    if not data.startswith(XZ_MAGIC):
        raise ExtractError("xz: bad magic")
    d = _lzma.LZMADecompressor(format=_lzma.FORMAT_XZ)
    try:
        out = d.decompress(data, MAX_INFLATED)
    except _lzma.LZMAError as exc:
        raise ExtractError("xz: %s" % exc)
    if not d.eof:
        # needs_input => the stream ended early; otherwise output pending
        # beyond the cap => decompression bomb
        raise ExtractError(
            "xz: truncated stream"
            if d.needs_input
            else "xz: inflated payload exceeds %d bytes" % MAX_INFLATED
        )
    if d.unused_data.strip(b"\x00"):
        raise ExtractError("xz: trailing garbage after stream")
    return out


def xz_bytes(data: bytes) -> bytes:
    """Deterministic single-stream xz framing (fixed CRC64 check).
    preset 0 (256 KiB dictionary): members here are KB-sized, and the
    DECODER allocates the full dictionary recorded in the stream header —
    preset 6's 8 MiB dict per tiny stream is pure allocation churn that
    measurably hurts multi-core scaling (BENCH.md finding 17); the encode
    side also costs ~10x more at preset 6, which dominated corpus
    generation."""
    return _lzma.compress(data, format=_lzma.FORMAT_XZ, preset=0)


def unbz2(data: bytes) -> bytes:
    if not (
        data.startswith(BZ2_MAGIC)
        and len(data) > 3
        and data[3:4].isdigit()
        and data[3:4] != b"0"
    ):
        raise ExtractError("bz2: bad magic")
    d = _bz2.BZ2Decompressor()
    try:
        out = d.decompress(data, MAX_INFLATED)
    except OSError as exc:
        raise ExtractError("bz2: %s" % exc)
    if not d.eof:
        raise ExtractError(
            "bz2: truncated stream"
            if d.needs_input
            else "bz2: inflated payload exceeds %d bytes" % MAX_INFLATED
        )
    if d.unused_data.strip(b"\x00"):
        raise ExtractError("bz2: trailing garbage after stream")
    return out


def bz2_bytes(data: bytes) -> bytes:
    """compresslevel=1 (100 KiB blocks): level 9's 900 KiB blocks make the
    DECODER allocate ~3.7 MiB per stream — for KB-sized members that is
    allocation churn, not compression (BENCH.md finding 17)."""
    return _bz2.compress(data, compresslevel=1)


def _text_bridge(fn, what: str):
    def wrapped(text: str) -> str:
        try:
            data = text.encode("latin-1")
        except UnicodeEncodeError:
            raise ExtractError(
                "%s: payload is not a byte stream (non-latin-1 chars)" % what
            )
        return fn(data).decode("latin-1")

    return wrapped


gunzip_text = _text_bridge(gunzip, "gzip")
unxz_text = _text_bridge(unxz, "xz")
unbz2_text = _text_bridge(unbz2, "bz2")


def gzip_text(text: str) -> str:
    return gzip_bytes(text.encode("latin-1")).decode("latin-1")


def xz_text(text: str) -> str:
    return xz_bytes(text.encode("latin-1")).decode("latin-1")


def bz2_text(text: str) -> str:
    return bz2_bytes(text.encode("latin-1")).decode("latin-1")
