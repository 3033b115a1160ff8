"""Real image-header parsing: PNG IHDR and JPEG SOF dimensions, pure stdlib.

The reference ships image metadata via external tools (exiftool/tesseract,
/root/reference/README.md:17-21); the sandbox has no image libraries, but
PNG and JPEG dimensions are fixed byte-layout parses (public format specs:
PNG RFC 2083 / W3C, JPEG ISO 10918 marker structure) needing no decoder.
These feed (a) per-document media metadata in the extraction core and
(b) the multimodal decode operator's image path — audio/video stay behind
the declared deterministic stub.

All functions are total: malformed/foreign bytes return ``None``, never
raise (media payloads are untrusted corpus data).
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
JPEG_MAGIC = b"\xff\xd8"

# SOF0..SOF15 carry frame dims, except DHT(C4)/JPG(C8)/DAC(CC)
_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}
# standalone markers with no length field
_STANDALONE = frozenset({0x01, 0xD8}) | frozenset(range(0xD0, 0xD8))


def png_dims(data: bytes) -> tuple[int, int] | None:
    """(width, height) from the IHDR chunk, or None if not a valid PNG head.
    IHDR must be the first chunk (spec requirement)."""
    if len(data) < 24 or not data.startswith(PNG_MAGIC):
        return None
    if data[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", data[16:24])
    if w <= 0 or h <= 0:
        return None
    return (w, h)


def jpeg_dims(data: bytes) -> tuple[int, int] | None:
    """(width, height) from the first SOF segment, walking the marker
    stream; None for non-JPEG or truncated-before-SOF bytes."""
    n = len(data)
    if n < 4 or not data.startswith(JPEG_MAGIC):
        return None
    i = 2
    while i + 1 < n:
        if data[i] != 0xFF:
            return None
        marker = data[i + 1]
        while marker == 0xFF and i + 2 < n:  # fill bytes
            i += 1
            marker = data[i + 1]
        if marker in _STANDALONE:
            i += 2
            continue
        if marker in (0xD9, 0xDA):  # EOI / SOS before any SOF
            return None
        if i + 4 > n:
            return None
        seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
        if seg_len < 2:
            return None
        if marker in _SOF_MARKERS:
            if i + 9 > n:
                return None
            h, w = struct.unpack(">HH", data[i + 5 : i + 9])
            if w <= 0 or h <= 0:
                return None
            return (w, h)
        i += 2 + seg_len
    return None


def image_dims(data: bytes) -> tuple[int, int] | None:
    """Dispatch on magic: PNG IHDR or JPEG SOF dims, else None."""
    if data.startswith(PNG_MAGIC):
        return png_dims(data)
    if data.startswith(JPEG_MAGIC):
        return jpeg_dims(data)
    return None


def image_dims_text(text: str) -> tuple[int, int] | None:
    """Bytes-as-text bridge (latin-1), for payloads carried as strings."""
    try:
        return image_dims(text.encode("latin-1"))
    except UnicodeEncodeError:
        return None


def build_png(width: int, height: int, extra: bytes = b"") -> bytes:
    """Minimal structurally-valid PNG head: magic + IHDR (correct CRC) +
    ``extra`` filler — enough for any header-parsing consumer; the pixel
    data is not rendered by anything in this engine."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    crc = zlib.crc32(chunk) & 0xFFFFFFFF
    return PNG_MAGIC + struct.pack(">I", 13) + chunk + struct.pack(">I", crc) + extra


def build_jpeg(width: int, height: int, progressive: bool = False) -> bytes:
    """Minimal JPEG head: SOI + APP0(JFIF) + SOF0 (or SOF2) + EOI."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HH", 1, 1
    ) + b"\x00\x00"
    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    sof = sof_marker + struct.pack(">HBHHB", 8 + 3 * 1, 8, height, width, 1) + bytes(
        [1, 0x11, 0]
    )
    return JPEG_MAGIC + app0 + sof + b"\xff\xd9"
