"""Real PDF binary parsing — pure stdlib (re + zlib), same discipline as
``core/zipbin.py``.

The reference extracts text from *real* PDFs by delegating to Apache Tika
(HTTP ``PUT /tika``, /root/reference/src/java-env.cpp:313; ordered chunk
append preserving the extractor's reading order at :268-271). The rebuild
parses the binary format natively:

  * cross-reference: classic ``xref`` tables, ``/Prev`` incremental-update
    chains, ``/XRefStm`` hybrids, and PDF 1.5 cross-reference *streams*
    (``/Type /XRef``, ``/W`` field widths, PNG Up/Sub/Paeth predictors);
  * compressed objects: ``/Type /ObjStm`` object streams;
  * stream filters: ``FlateDecode`` (stdlib zlib; with ``/DecodeParms``
    predictors), ``ASCIIHexDecode``, ``ASCII85Decode`` (incl. filter
    chains), ``LZWDecode`` (PDF/TIFF variant: 9-12-bit codes,
    ``EarlyChange``, table-full CLEAR restart), ``RunLengthDecode``;
  * page tree: ``/Root -> /Pages -> /Kids`` recursive walk with cycle
    guard and inheritable ``/Resources``;
  * content streams: ``BT/ET Td TD Tm TL T* Tj TJ ' "`` text operators,
    positions tracked through the text-line matrix;
  * simple-font decoding: ``/WinAnsiEncoding`` (cp1252),
    ``/MacRomanEncoding``, and ``/Differences`` glyph-name overrides via
    an Adobe-Glyph-List subset;
  * encryption: the standard security handler opens transparently when
    the user password is empty (the common owner-password-only
    protection; Tika does the same) across RC4 V1/R2 + V2/R3
    (PDF 32000-1 §7.6.2-7.6.3), /V 4 R 4 crypt filters (/CFM /V2 RC4 and
    /AESV2 — IV-prefixed AES-128-CBC, 'sAlT'-extended object keys), and
    /V 5 R 6 AES-256 (ISO 32000-2 Algorithm 2.A/2.B hardened KDF, /UE
    file-key unwrap; ``core/aes.py`` is a pure-stdlib FIPS-197 AES
    validated against the C.1/C.3 and SP 800-38A vectors). Per-object
    keys, stream + string decryption, XRef streams exempt per spec. A
    non-empty user password raises ``pdf: encrypted (password
    required)``; non-Standard handlers and unknown /V raise.

Extraction emits the SAME page-runs shape as the synthetic-dialect parser
(``core/pdf.py``): ``list[list[(x, y, text)]]`` — one run per assembled
text line — so the shared ``pages_to_texts`` layout reorder ((y desc,
x asc)) is the single reading-order implementation for both parsers.

Malformations (missing ``startxref``, bad xref, unsupported filter,
truncated stream, cyclic page tree) raise :class:`ExtractError`; the
extraction core converts that to ``parse_ok=false`` rows — never a task
failure. Decompression is bomb-capped (``MAX_INFLATED``).

Payloads travel through the engine as bytes-as-text (latin-1):
``parse_real_pdf_pages_text`` bridges str -> bytes.
"""

from __future__ import annotations

import base64
import bisect
import hashlib
import re
import zlib

from tika_wrap_spark.core.aes import cbc_decrypt, cbc_encrypt
from tika_wrap_spark.core.errors import ExtractError
from tika_wrap_spark.core.procmemo import proc_memo

MAX_INFLATED = 64 * 1024 * 1024  # per-stream decompression bomb cap
MAX_PAGES = 50_000
MAX_OBJECTS = 1_000_000

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class Name(str):
    """A PDF name token (``/Foo``) — distinct from a string object."""


class Ref(tuple):
    """An indirect reference ``num gen R``."""

    __slots__ = ()


# ---------------------------------------------------------------------------
# object lexer / parser
# ---------------------------------------------------------------------------


def _skip_ws(data: bytes, i: int) -> int:
    n = len(data)
    while i < n:
        c = data[i]
        if c in _WS:
            i += 1
        elif c == 0x25:  # '%' comment to EOL
            while i < n and data[i] not in (0x0A, 0x0D):
                i += 1
        else:
            break
    return i


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_REF_RE = re.compile(rb"(\d+)\s+(\d+)\s+R(?![a-zA-Z0-9])")
_NAME_ESC_RE = re.compile(rb"#([0-9a-fA-F]{2})")


def _parse_name(data: bytes, i: int) -> tuple[Name, int]:
    j = i + 1  # past '/'
    n = len(data)
    while j < n and data[j] not in _WS and data[j] not in _DELIM:
        j += 1
    raw = _NAME_ESC_RE.sub(lambda m: bytes([int(m.group(1), 16)]), data[i + 1 : j])
    return Name(raw.decode("latin-1")), j


_STR_ESC = {
    ord("n"): "\n", ord("r"): "\r", ord("t"): "\t", ord("b"): "\b",
    ord("f"): "\f", ord("("): "(", ord(")"): ")", ord("\\"): "\\",
}


def _parse_literal_string(data: bytes, i: int) -> tuple[bytes, int]:
    # i at '('; returns raw bytes with escapes resolved
    # fast path: no escape and no nested paren before the closing paren
    j = data.find(b")", i + 1)
    if j != -1:
        seg = data[i + 1 : j]
        if b"\\" not in seg and b"(" not in seg:
            return seg, j + 1
    out = bytearray()
    depth = 1
    j = i + 1
    n = len(data)
    while j < n:
        c = data[j]
        if c == 0x5C:  # backslash
            if j + 1 >= n:
                break
            e = data[j + 1]
            if e in _STR_ESC:
                out.append(ord(_STR_ESC[e]))
                j += 2
            elif 0x30 <= e <= 0x37:  # octal, 1-3 digits
                k = j + 1
                oct_s = b""
                while k < n and len(oct_s) < 3 and 0x30 <= data[k] <= 0x37:
                    oct_s += bytes([data[k]])
                    k += 1
                out.append(int(oct_s, 8) & 0xFF)
                j = k
            elif e in (0x0A, 0x0D):  # line continuation
                j += 2
                if e == 0x0D and j < n and data[j] == 0x0A:
                    j += 1
            else:  # unknown escape: drop the backslash
                out.append(e)
                j += 2
        elif c == 0x28:
            depth += 1
            out.append(c)
            j += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), j + 1
            out.append(c)
            j += 1
        else:
            out.append(c)
            j += 1
    raise ExtractError("pdf: unterminated string literal")


def _parse_hex_string(data: bytes, i: int) -> tuple[bytes, int]:
    j = data.find(b">", i + 1)
    if j < 0:
        raise ExtractError("pdf: unterminated hex string")
    hx = re.sub(rb"[^0-9a-fA-F]", b"", data[i + 1 : j])
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii")), j + 1


def parse_object(data: bytes, i: int) -> tuple[object, int]:
    """Parse one PDF object at ``i`` (whitespace already allowed)."""
    i = _skip_ws(data, i)
    if i >= len(data):
        raise ExtractError("pdf: unexpected end of data")
    c = data[i]
    if c == 0x3C:  # '<'
        if data[i : i + 2] == b"<<":
            d: dict[str, object] = {}
            j = i + 2
            while True:
                j = _skip_ws(data, j)
                if data[j : j + 2] == b">>":
                    return d, j + 2
                if data[j : j + 1] != b"/":
                    raise ExtractError("pdf: dict key is not a name")
                key, j = _parse_name(data, j)
                val, j = parse_object(data, j)
                d[key] = val
        return _parse_hex_string(data, i)
    if c == 0x28:  # '('
        return _parse_literal_string(data, i)
    if c == 0x2F:  # '/'
        return _parse_name(data, i)
    if c == 0x5B:  # '['
        arr: list[object] = []
        j = i + 1
        while True:
            j = _skip_ws(data, j)
            if data[j : j + 1] == b"]":
                return arr, j + 1
            item, j = parse_object(data, j)
            arr.append(item)
    if data[i : i + 4] == b"true":
        return True, i + 4
    if data[i : i + 5] == b"false":
        return False, i + 5
    if data[i : i + 4] == b"null":
        return None, i + 4
    m = _REF_RE.match(data, i)
    if m:
        return Ref((int(m.group(1)), int(m.group(2)))), m.end()
    m = _NUM_RE.match(data, i)
    if m:
        s = m.group(0)
        val = float(s) if b"." in s else int(s)
        return val, m.end()
    raise ExtractError("pdf: unparseable object at offset %d" % i)


# ---------------------------------------------------------------------------
# stream filters
# ---------------------------------------------------------------------------


def _apply_png_predictor(data: bytes, colors: int, bpc: int, columns: int) -> bytes:
    bpp = max(1, (colors * bpc) // 8)
    rowlen = (columns * colors * bpc + 7) // 8
    out = bytearray()
    prev = bytearray(rowlen)
    i = 0
    n = len(data)
    while i < n:
        ft = data[i]
        row = bytearray(data[i + 1 : i + 1 + rowlen])
        if len(row) < rowlen:
            row.extend(b"\x00" * (rowlen - len(row)))
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for k in range(bpp, rowlen):
                row[k] = (row[k] + row[k - bpp]) & 0xFF
        elif ft == 2:  # Up
            for k in range(rowlen):
                row[k] = (row[k] + prev[k]) & 0xFF
        elif ft == 3:  # Average
            for k in range(rowlen):
                left = row[k - bpp] if k >= bpp else 0
                row[k] = (row[k] + ((left + prev[k]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for k in range(rowlen):
                a = row[k - bpp] if k >= bpp else 0
                b = prev[k]
                cc = prev[k - bpp] if k >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                row[k] = (row[k] + pred) & 0xFF
        else:
            raise ExtractError("pdf: unsupported PNG predictor filter type %d" % ft)
        out.extend(row)
        prev = row
        i += 1 + rowlen
    return bytes(out)


def _lzw_decode(data: bytes, early: int = 1) -> bytes:
    """PDF/TIFF-variant LZW (PDF 32000-1 §7.4.4): 9->12-bit codes, CLEAR=256,
    EOD=257, ``EarlyChange`` widens one code early (the default)."""
    out = bytearray()
    table: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    next_code = 258
    width = 9
    prev: bytes | None = None
    bitbuf = 0
    nbits = 0
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:  # CLEAR
                table = {i: bytes([i]) for i in range(256)}
                next_code = 258
                width = 9
                prev = None
                continue
            if code == 257:  # EOD
                return bytes(out)
            if prev is None:
                if code not in table:
                    raise ExtractError("pdf: LZW first code out of table")
                entry = table[code]
            elif code in table:
                entry = table[code]
                if next_code < 4096:
                    table[next_code] = prev + entry[:1]
                    next_code += 1
            elif code == next_code and next_code < 4096:  # KwKwK case
                entry = prev + prev[:1]
                table[next_code] = entry
                next_code += 1
            else:
                raise ExtractError("pdf: LZW code out of sequence")
            out += entry
            if len(out) > MAX_INFLATED:
                raise ExtractError("pdf: inflated stream exceeds cap")
            prev = entry
            # the decoder's table lags the encoder's by one entry (the
            # KwKwK asymmetry), so it must widen one code EARLIER than
            # the encoder's next_code-based condition
            if width < 12 and next_code + 1 >= (1 << width) - early:
                width += 1
    return bytes(out)


def _lzw_encode(data: bytes, early: int = 1) -> bytes:
    """Deterministic PDF-variant LZW encoder (builder/tests twin of
    ``_lzw_decode``): leading CLEAR, greedy longest-match, EOD."""
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    emit(256)
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        if next_code >= 4096 - early:  # table full: restart with CLEAR
            emit(256)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        else:
            table[wc] = next_code
            next_code += 1
            if width < 12 and next_code >= (1 << width) - early:
                width += 1
        w = bytes([b])
    if w:
        emit(table[w])
        # tail sync: the decoder ADDS an entry for this flushed code (the
        # encoder does not), catching its table up to ours — and then runs
        # its widen check before reading EOD. Mirror that check here or a
        # stream whose last add lands exactly one below the width boundary
        # (next_code == 2^w - early - 1) writes EOD one bit narrower than
        # the decoder reads it (caught at 1-in-~1700 LZW docs in the 1M
        # soak; tests/test_pdfbin.py::test_lzw_tail_boundary).
        if width < 12 and next_code + 1 >= (1 << width) - early:
            width += 1
    emit(257)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _rle_decode(data: bytes) -> bytes:
    """RunLengthDecode (PDF 32000-1 §7.4.5): length byte 0-127 copies L+1
    literals, 129-255 repeats the next byte 257-L times, 128 is EOD."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        length = data[i]
        i += 1
        if length == 128:
            break
        if length < 128:
            if i + length + 1 > n:
                raise ExtractError("pdf: RunLength literal run truncated")
            out += data[i : i + length + 1]
            i += length + 1
        else:
            if i >= n:
                raise ExtractError("pdf: RunLength repeat run truncated")
            out += data[i : i + 1] * (257 - length)
            i += 1
        if len(out) > MAX_INFLATED:
            raise ExtractError("pdf: inflated stream exceeds cap")
    return bytes(out)


def _rle_encode(data: bytes) -> bytes:
    """Deterministic RunLengthDecode encoder: repeat runs >=3 become
    repeat records, everything else literal records (<=128 each)."""
    out = bytearray()
    i = 0
    n = len(data)
    lit_start = 0

    def flush_literals(end: int) -> None:
        j = lit_start
        while j < end:
            chunk = data[j : min(j + 128, end)]
            out.append(len(chunk) - 1)
            out.extend(chunk)
            j += len(chunk)

    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            flush_literals(i)
            out.append(257 - run)
            out.append(data[i])
            i += run
            lit_start = i
        else:
            i += run
    flush_literals(n)
    out.append(128)  # EOD
    return bytes(out)


def decode_stream(sdict: dict, raw: bytes, resolve) -> bytes:
    """Apply the stream's /Filter chain. Flate + ASCIIHex supported."""
    filters = resolve(sdict.get("Filter"))
    if filters is None:
        return raw
    if not isinstance(filters, list):
        filters = [filters]
    parms = resolve(sdict.get("DecodeParms"))
    if not isinstance(parms, list):
        parms = [parms] * len(filters)
    data = raw
    for flt, pm in zip(filters, parms):
        flt = resolve(flt)
        pm = resolve(pm) or {}
        if flt == "FlateDecode":
            try:
                dec = zlib.decompressobj()
                data = dec.decompress(data, MAX_INFLATED + 1)
            except zlib.error as exc:
                raise ExtractError("pdf: FlateDecode failed: %s" % exc)
            if len(data) > MAX_INFLATED:
                raise ExtractError("pdf: inflated stream exceeds cap")
            pred = resolve(pm.get("Predictor", 1)) or 1
            if pred >= 10:
                data = _apply_png_predictor(
                    data,
                    int(resolve(pm.get("Colors", 1)) or 1),
                    int(resolve(pm.get("BitsPerComponent", 8)) or 8),
                    int(resolve(pm.get("Columns", 1)) or 1),
                )
            elif pred != 1:
                raise ExtractError("pdf: unsupported predictor %d" % pred)
        elif flt == "ASCIIHexDecode":
            body = data.split(b">", 1)[0]
            hx = re.sub(rb"[^0-9a-fA-F]", b"", body)
            if len(hx) % 2:
                hx += b"0"
            data = bytes.fromhex(hx.decode("ascii"))
        elif flt == "ASCII85Decode":
            body = data.split(b"~>", 1)[0]
            body = re.sub(rb"\s", b"", body)
            try:
                data = base64.a85decode(b"<~" + body + b"~>", adobe=True)
            except ValueError as exc:
                raise ExtractError("pdf: ASCII85Decode failed: %s" % exc)
        elif flt == "LZWDecode":
            data = _lzw_decode(data, int(resolve(pm.get("EarlyChange", 1)) or 0))
            pred = resolve(pm.get("Predictor", 1)) or 1
            if pred >= 10:
                data = _apply_png_predictor(
                    data,
                    int(resolve(pm.get("Colors", 1)) or 1),
                    int(resolve(pm.get("BitsPerComponent", 8)) or 8),
                    int(resolve(pm.get("Columns", 1)) or 1),
                )
            elif pred != 1:
                raise ExtractError("pdf: unsupported predictor %d" % pred)
        elif flt == "RunLengthDecode":
            data = _rle_decode(data)
        else:
            raise ExtractError("pdf: unsupported stream filter %s" % flt)
    return data


# ---------------------------------------------------------------------------
# encryption: standard security handler, RC4 (PDF 32000-1 §7.6.2-7.6.3)
# ---------------------------------------------------------------------------

# the spec's 32-byte password pad (PDF 32000-1 §7.6.3.3, Algorithm 2 step a)
_ENC_PAD = bytes(
    (
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    )
)


def _rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (public algorithm; symmetric, length-preserving)."""
    s = list(range(256))
    j = 0
    kl = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % kl]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _std_file_key(
    password: bytes,
    o_entry: bytes,
    p: int,
    id0: bytes,
    r: int,
    keylen: int,
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: file encryption key from a (user) password."""
    tail = b""
    if r >= 4 and not encrypt_metadata:
        tail = b"\xff\xff\xff\xff"
    h = hashlib.md5(
        (password + _ENC_PAD)[:32]
        + (o_entry or b"")[:32]
        + (p & 0xFFFFFFFF).to_bytes(4, "little")
        + id0
        + tail
    ).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:keylen]).digest()
    return h[:keylen]


def _hash_2b(password: bytes, salt: bytes, udata: bytes) -> bytes:
    """ISO 32000-2 Algorithm 2.B — the hardened R6 KDF: SHA-256 seed, then
    rounds of AES-128-CBC over 64 repetitions of (password+K+udata) with
    the digest width (256/384/512) chosen by the ciphertext mod 3, until
    >=64 rounds AND the last byte says stop. Memoized in the PROCESS-global
    store (finding 26: a module-level memo resets on every task's by-value
    module reconstruction — re-paying the ~0.5 s KDF per task serialized
    whole generation stages) — the corpus builder uses fixed salts, so
    every worker process pays the KDF once, not per task or document."""
    mk = (password, salt, udata)
    hit = _KDF_PRECOMPUTED.get(mk)
    if hit is not None:
        return hit
    _memo = proc_memo("pdf_hash_2b")
    hit = _memo.get(mk)
    if hit is not None:
        return hit
    k = hashlib.sha256(password + salt + udata).digest()
    rounds = 0
    while True:
        k1 = (password + k + udata) * 64
        e = cbc_encrypt(k[:16], k[16:32], k1)
        # first 16 bytes as a big-endian integer mod 3 == byte-sum mod 3
        # (256 ≡ 1 mod 3)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        rounds += 1
        if rounds >= 64 and e[-1] <= rounds - 32:
            break
    if len(_memo) < 64:
        _memo[mk] = k[:32]
    return k[:32]


def _std_owner_rc4_key(owner_pw: bytes, r: int, keylen: int) -> bytes:
    """Algorithm 3 steps a-c: the RC4 key that produces/undoes /O."""
    h = hashlib.md5((owner_pw + _ENC_PAD)[:32]).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    return h[:keylen]


def _std_o_entry(owner_pw: bytes, user_pw: bytes, r: int, keylen: int) -> bytes:
    """Algorithm 3: the /O dictionary entry."""
    rc4key = _std_owner_rc4_key(owner_pw, r, keylen)
    o = _rc4(rc4key, (user_pw + _ENC_PAD)[:32])
    if r >= 3:
        for i in range(1, 20):
            o = _rc4(bytes(b ^ i for b in rc4key), o)
    return o


def _std_u_entry(file_key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithm 4 (R2) / Algorithm 5 (R3): the /U dictionary entry."""
    if r == 2:
        return _rc4(file_key, _ENC_PAD)
    u = _rc4(file_key, hashlib.md5(_ENC_PAD + id0).digest())
    for i in range(1, 20):
        u = _rc4(bytes(b ^ i for b in file_key), u)
    return u + b"\x00" * 16  # 16 bytes of padding, arbitrary per spec


# builder-side R6 salts — FIXED across documents on purpose, and the four
# KDF outputs they pin PRECOMPUTED as literals below: pyspark 4's local
# runtime never reuses python workers (finding 26 — every task is a fresh
# process; builtins-level and module-level memos all reset), so the only
# zero-cost-per-task cache is module DATA, which by-value pickling ships
# with every closure. tests/test_pdfbin.py::test_r6_kdf_constants
# re-derives each literal from _hash_2b. Documents with OTHER salts
# (third-party R6 files) still pay the honest per-task KDF.
_B_VSALT = b"twcUvsl8"
_B_KSALT = b"twcUksl8"
_B_OVSALT = b"twcOvsl8"
_B_OKSALT = b"twcOksl8"
_KDF_PRECOMPUTED: dict[tuple[bytes, bytes, bytes], bytes] = {}


def _seed_kdf_precomputed() -> None:
    h1 = bytes.fromhex(
        "388fff36853e233dad8fb63588529b813d9fa66f33857aef53b47d33b4278534"
    )
    h2 = bytes.fromhex(
        "566fcaa07005a26bc9265b3dc3b800feec3c819e3b40f9bdb5ba414f6dbd3abd"
    )
    u = h1 + _B_VSALT + _B_KSALT
    h3 = bytes.fromhex(
        "c9aa9bb374c0e0e2ce2a242fe54583da2413726c33bc015848ecbddb860abf81"
    )
    h4 = bytes.fromhex(
        "e96d213a93a40df4b81d58258e3cf7ea34583f6ee1144450528a218f07bd2e49"
    )
    _KDF_PRECOMPUTED[(b"", _B_VSALT, b"")] = h1
    _KDF_PRECOMPUTED[(b"", _B_KSALT, b"")] = h2
    _KDF_PRECOMPUTED[(b"owner-secret", _B_OVSALT, u)] = h3
    _KDF_PRECOMPUTED[(b"owner-secret", _B_OKSALT, u)] = h4


_seed_kdf_precomputed()


def _obj_key_salted(file_key: bytes, num: int, gen: int, salt: bytes = b"") -> bytes:
    """Algorithm 1: per-object key — MD5 over the file key plus 3 low-order
    object-number bytes and 2 generation bytes (+ the 'sAlT' constant for
    AESV2)."""
    h = hashlib.md5(
        file_key
        + (num & 0xFFFFFF).to_bytes(3, "little")
        + (gen & 0xFFFF).to_bytes(2, "little")
        + salt
    ).digest()
    return h[: min(len(file_key) + 5, 16)]


def _obj_key(file_key: bytes, num: int, gen: int) -> bytes:
    return _obj_key_salted(file_key, num, gen)


# ---------------------------------------------------------------------------
# document: xref chain, object store, page tree
# ---------------------------------------------------------------------------

_OBJ_HEAD_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_XREF_ENT_RE = re.compile(rb"(\d{10})\s(\d{5})\s([nf])")


class RealPdf:
    """One parsed PDF document (read-only, eager xref, lazy objects)."""

    def __init__(self, data: bytes):
        if not data.startswith(b"%PDF-"):
            raise ExtractError("pdf: missing %PDF- header")
        self.data = data
        # offsets: obj num -> byte offset, or ('objstm', container_num, idx)
        self.offsets: dict[int, object] = {}
        self.trailer: dict[str, object] = {}
        self._cache: dict[int, object] = {}
        self._objstm_cache: dict[int, list[tuple[int, object]]] = {}
        self._font_cache: dict[int, "FontDecoder"] = {}
        self._enc_key: bytes | None = None
        self._enc_obj_num: int | None = None
        self._enc_cfm: str | None = None
        self._enc_streams = True  # /StmF: decrypt stream payloads
        self._enc_strings = True  # /StrF: decrypt string payloads
        self._read_xref_chain()
        self._setup_encryption()

    # -- xref ----------------------------------------------------------

    def _read_xref_chain(self) -> None:
        tail = self.data[-2048:]
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        if m is None:
            raise ExtractError("pdf: missing startxref")
        todo = [int(m.group(1))]
        seen: set[int] = set()
        while todo:
            off = todo.pop(0)
            if off in seen or off < 0 or off >= len(self.data):
                continue
            seen.add(off)
            i = _skip_ws(self.data, off)
            if self.data[i : i + 4] == b"xref":
                trailer = self._read_xref_table(i + 4)
            else:
                trailer = self._read_xref_stream(i)
            for key, val in trailer.items():
                self.trailer.setdefault(key, val)
            # hybrid-reference: the XRefStm section is *newer* than /Prev
            for k in ("XRefStm", "Prev"):
                v = trailer.get(k)
                if isinstance(v, (int, float)):
                    todo.append(int(v))
        if "Root" not in self.trailer:
            raise ExtractError("pdf: trailer has no /Root")

    def _setup_encryption(self) -> None:
        """Standard security handler, empty user password — the common
        owner-password-only protection Tika opens transparently. Supported
        crypt methods: RC4 V1/V2 (R2/R3), RC4-in-CF and AESV2 under
        /V 4 R 4, and AES-256 under /V 5 R 6 (ISO 32000-2 Algorithm
        2.A/2.B). Non-Standard handlers and unknown /V raise (declared
        stub path); a non-empty user password raises
        ``pdf: encrypted (password required)``."""
        enc = self.trailer.get("Encrypt")
        if enc is None:
            return
        if isinstance(enc, Ref):
            self._enc_obj_num = enc[0]
        enc = self.resolve(enc)
        if not isinstance(enc, dict):
            raise ExtractError("pdf: /Encrypt is not a dictionary")
        if enc.get("Filter") != "Standard":
            raise ExtractError(
                "pdf: encrypted (unsupported handler /%s)" % enc.get("Filter")
            )
        v = int(self.resolve(enc.get("V", 0)) or 0)
        r = int(self.resolve(enc.get("R", 2)) or 2)
        o_entry = enc.get("O")
        u_entry = enc.get("U")
        if not isinstance(o_entry, bytes) or not isinstance(u_entry, bytes):
            raise ExtractError("pdf: encrypted (missing /O or /U)")
        p = int(self.resolve(enc.get("P", 0)) or 0)
        ids = self.resolve(self.trailer.get("ID"))
        id0 = ids[0] if isinstance(ids, list) and ids else b""
        if not isinstance(id0, bytes):
            id0 = b""
        if v in (1, 2) and r in (2, 3):
            keylen = int(self.resolve(enc.get("Length", 40)) or 40) // 8
            if r == 2:
                keylen = 5
            if not 5 <= keylen <= 16:
                raise ExtractError("pdf: encrypted (bad key length)")
            key = _std_file_key(b"", o_entry, p, id0, r, keylen)
            if _std_u_entry(key, id0, r)[:16] != u_entry[:16]:
                raise ExtractError("pdf: encrypted (password required)")
            self._enc_cfm = "rc4"
            self._enc_key = key
        elif v == 4 and r == 4:
            cf = self.resolve(enc.get("CF")) or {}
            stdcf = self.resolve(cf.get("StdCF")) if isinstance(cf, dict) else {}
            cfm = (stdcf or {}).get("CFM")
            if cfm == "AESV2":
                self._enc_cfm = "aesv2"
            elif cfm == "V2":
                self._enc_cfm = "rc4"
            else:
                raise ExtractError("pdf: encrypted (unsupported /CFM /%s)" % cfm)
            keylen = int(self.resolve(enc.get("Length", 128)) or 128) // 8
            if not 5 <= keylen <= 16:
                raise ExtractError("pdf: encrypted (bad key length)")
            meta = self.resolve(enc.get("EncryptMetadata", True))
            key = _std_file_key(
                b"", o_entry, p, id0, r, keylen, encrypt_metadata=bool(meta)
            )
            if _std_u_entry(key, id0, 3)[:16] != u_entry[:16]:
                raise ExtractError("pdf: encrypted (password required)")
            self._enc_key = key
            self._read_cf_selectors(enc)
        elif v == 5 and r == 6:
            if len(u_entry) < 48:
                raise ExtractError("pdf: encrypted (/U too short for R6)")
            vsalt, ksalt = u_entry[32:40], u_entry[40:48]
            if _hash_2b(b"", vsalt, b"") != u_entry[:32]:
                raise ExtractError("pdf: encrypted (password required)")
            ue = enc.get("UE")
            if not isinstance(ue, bytes) or len(ue) < 32:
                raise ExtractError("pdf: encrypted (missing /UE)")
            ik = _hash_2b(b"", ksalt, b"")
            self._enc_key = cbc_decrypt(ik, b"\x00" * 16, ue[:32])
            self._enc_cfm = "aesv3"
            self._read_cf_selectors(enc)
        else:
            raise ExtractError("pdf: encrypted (unsupported /V %d /R %d)" % (v, r))

    def _read_cf_selectors(self, enc: dict) -> None:
        """/StmF and /StrF name the crypt filter for streams/strings under
        /V 4-5. The spec DEFAULT is /Identity (not encrypted); only
        /StdCF routes through the standard filter. Anything else is an
        unsupported named filter."""
        for key, attr in (("StmF", "_enc_streams"), ("StrF", "_enc_strings")):
            name = enc.get(key, "Identity")
            if name == "StdCF":
                setattr(self, attr, True)
            elif name == "Identity":
                setattr(self, attr, False)
            else:
                raise ExtractError(
                    "pdf: encrypted (unsupported /%s /%s)" % (key, name)
                )

    def _object_key(self, num: int, gen: int) -> bytes:
        """Per-object key: Algorithm 1 MD5 salt for RC4/AESV2 (AES appends
        the spec's 'sAlT'); AES-256 uses the file key directly."""
        if self._enc_cfm == "aesv3":
            return self._enc_key
        salt = b"sAlT" if self._enc_cfm == "aesv2" else b""
        return _obj_key_salted(self._enc_key, num, gen, salt)

    def _decrypt_payload(self, okey: bytes, data: bytes) -> bytes:
        """Decrypt one string/stream payload per the crypt method: raw RC4,
        or IV-prefixed AES-CBC with lenient PKCS#7 strip."""
        if self._enc_cfm == "rc4":
            return _rc4(okey, data)
        if not data:
            return data
        if len(data) < 16 or len(data) % 16:
            raise ExtractError("pdf: AES payload not block-aligned")
        pt = cbc_decrypt(okey, data[:16], data[16:])
        pad = pt[-1] if pt else 0
        if 1 <= pad <= 16 and len(pt) >= pad:
            pt = pt[:-pad]
        return pt

    def _decrypt_strings(self, obj: object, okey: bytes) -> object:
        """Strings in a directly-stored object are RC4'd with the object
        key (strings inside ObjStm members are covered by the container's
        encryption and must NOT be decrypted twice)."""
        if isinstance(obj, bytes):
            return self._decrypt_payload(okey, obj)
        if isinstance(obj, list):
            return [self._decrypt_strings(v, okey) for v in obj]
        if isinstance(obj, dict):
            return {k: self._decrypt_strings(v, okey) for k, v in obj.items()}
        return obj

    def _read_xref_table(self, i: int) -> dict:
        data = self.data
        while True:
            i = _skip_ws(data, i)
            if data[i : i + 7] == b"trailer":
                obj, _ = parse_object(data, i + 7)
                if not isinstance(obj, dict):
                    raise ExtractError("pdf: trailer is not a dict")
                return obj
            m = re.match(rb"(\d+)\s+(\d+)", data[i : i + 40])
            if not m:
                raise ExtractError("pdf: malformed xref subsection header")
            start, count = int(m.group(1)), int(m.group(2))
            if count > MAX_OBJECTS:
                raise ExtractError("pdf: xref subsection too large")
            i = i + m.end()
            for k in range(count):
                i = _skip_ws(data, i)
                em = _XREF_ENT_RE.match(data, i)
                if not em:
                    raise ExtractError("pdf: malformed xref entry")
                if em.group(3) == b"n":
                    self.offsets.setdefault(start + k, int(em.group(1)))
                i = em.end()

    def _read_xref_stream(self, i: int) -> dict:
        m = _OBJ_HEAD_RE.match(self.data, i)
        if not m:
            raise ExtractError("pdf: xref offset points at neither table nor stream")
        sdict, raw = self._read_stream_at(m.end())
        if sdict.get("Type") != "XRef":
            raise ExtractError("pdf: xref stream object is not /Type /XRef")
        body = decode_stream(sdict, raw, self.resolve)
        w = [int(x) for x in sdict.get("W", [])]
        if len(w) != 3:
            raise ExtractError("pdf: xref stream /W malformed")
        size = int(sdict.get("Size", 0))
        index = sdict.get("Index", [0, size])
        if not isinstance(index, list) or len(index) % 2:
            raise ExtractError("pdf: xref stream /Index malformed")
        rowlen = sum(w)
        pos = 0
        for s in range(0, len(index), 2):
            start, count = int(index[s]), int(index[s + 1])
            for k in range(count):
                row = body[pos : pos + rowlen]
                pos += rowlen
                if len(row) < rowlen:
                    raise ExtractError("pdf: xref stream truncated")
                fields = []
                fpos = 0
                for width in w:
                    fields.append(
                        int.from_bytes(row[fpos : fpos + width], "big") if width else 1
                    )
                    fpos += width
                ftype, f2, f3 = fields
                num = start + k
                if ftype == 1:
                    self.offsets.setdefault(num, f2)
                elif ftype == 2:
                    self.offsets.setdefault(num, ("objstm", f2, f3))
                # type 0 = free: skip
        return sdict

    # -- object access --------------------------------------------------

    def _read_stream_at(self, i: int) -> tuple[dict, bytes]:
        """Parse the dict at ``i``; if a stream follows, return raw bytes."""
        obj, j = parse_object(self.data, i)
        if not isinstance(obj, dict):
            return ({} if obj is None else {"__value__": obj}), b""
        j = _skip_ws(self.data, j)
        if self.data[j : j + 6] != b"stream":
            return obj, b""
        j += 6
        if self.data[j : j + 2] == b"\r\n":
            j += 2
        elif self.data[j : j + 1] in (b"\n", b"\r"):
            j += 1
        length = obj.get("Length")
        if isinstance(length, Ref):
            length = self.resolve(length)
        if isinstance(length, int) and 0 <= length <= len(self.data) - j:
            raw = self.data[j : j + length]
            after = _skip_ws(self.data, j + length)
            if self.data[after : after + 9] == b"endstream":
                return obj, raw
        # fallback: scan for endstream (lenient on bad /Length)
        end = self.data.find(b"endstream", j)
        if end < 0:
            raise ExtractError("pdf: stream without endstream")
        raw = self.data[j:end]
        if raw.endswith(b"\r\n"):
            raw = raw[:-2]
        elif raw.endswith(b"\n") or raw.endswith(b"\r"):
            raw = raw[:-1]
        return obj, raw

    def get_object(self, ref: Ref) -> object:
        num = ref[0]
        if num in self._cache:
            return self._cache[num]
        loc = self.offsets.get(num)
        if loc is None:
            self._cache[num] = None
            return None
        if isinstance(loc, tuple):  # ('objstm', container, idx)
            obj = self._load_from_objstm(loc[1], loc[2])
        else:
            m = _OBJ_HEAD_RE.match(self.data, _skip_ws(self.data, loc))
            if not m or int(m.group(1)) != num:
                raise ExtractError("pdf: xref offset for obj %d is wrong" % num)
            sdict, raw = self._read_stream_at(m.end())
            obj = (
                sdict["__value__"]
                if "__value__" in sdict
                else (sdict, raw) if raw else sdict
            )
            if isinstance(obj, dict) and not raw:
                obj = sdict
            if self._enc_key is not None and num != self._enc_obj_num:
                okey = self._object_key(num, int(m.group(2)))
                if isinstance(obj, tuple):
                    sd, rw = obj
                    # cross-reference streams are never encrypted (spec)
                    if sd.get("Type") != "XRef":
                        if self._enc_strings:
                            sd = self._decrypt_strings(sd, okey)
                        if self._enc_streams:
                            rw = self._decrypt_payload(okey, rw)
                        obj = (sd, rw)
                elif self._enc_strings:
                    obj = self._decrypt_strings(obj, okey)
        self._cache[num] = obj
        return obj

    def _load_from_objstm(self, container: int, idx: int) -> object:
        if container not in self._objstm_cache:
            cont = self.get_object(Ref((container, 0)))
            if not (isinstance(cont, tuple) and len(cont) == 2):
                raise ExtractError("pdf: object stream %d missing" % container)
            sdict, raw = cont
            if sdict.get("Type") != "ObjStm":
                raise ExtractError("pdf: obj %d is not /Type /ObjStm" % container)
            body = decode_stream(sdict, raw, self.resolve)
            n = int(self.resolve(sdict.get("N", 0)) or 0)
            first = int(self.resolve(sdict.get("First", 0)) or 0)
            pairs: list[tuple[int, object]] = []
            pos = 0
            heads = []
            for _ in range(n):
                m1 = _NUM_RE.match(body, _skip_ws(body, pos))
                if not m1:
                    raise ExtractError("pdf: ObjStm header malformed")
                m2 = _NUM_RE.match(body, _skip_ws(body, m1.end()))
                if not m2:
                    raise ExtractError("pdf: ObjStm header malformed")
                heads.append((int(m1.group(0)), int(m2.group(0))))
                pos = m2.end()
            for objnum, rel in heads:
                obj, _ = parse_object(body, first + rel)
                pairs.append((objnum, obj))
            self._objstm_cache[container] = pairs
        pairs = self._objstm_cache[container]
        if idx >= len(pairs):
            raise ExtractError("pdf: ObjStm index out of range")
        return pairs[idx][1]

    def resolve(self, obj: object, _depth: int = 0) -> object:
        while isinstance(obj, Ref):
            if _depth > 32:
                raise ExtractError("pdf: reference chain too deep")
            obj = self.get_object(obj)
            _depth += 1
        return obj

    # -- page tree -------------------------------------------------------

    def pages(self) -> list[dict]:
        root = self.resolve(self.trailer["Root"])
        if not isinstance(root, dict):
            raise ExtractError("pdf: /Root is not a dict")
        pages_ref = root.get("Pages")
        out: list[dict] = []
        seen: set[int] = set()

        def walk(node_ref: object, inherited_res: object) -> None:
            if isinstance(node_ref, Ref):
                if node_ref[0] in seen:
                    raise ExtractError("pdf: cyclic page tree")
                seen.add(node_ref[0])
            node = self.resolve(node_ref)
            if not isinstance(node, dict):
                raise ExtractError("pdf: page-tree node is not a dict")
            res = node.get("Resources", inherited_res)
            if node.get("Type") == "Page" or ("Contents" in node and "Kids" not in node):
                if len(out) >= MAX_PAGES:
                    raise ExtractError("pdf: page count exceeds cap")
                page = dict(node)
                page["Resources"] = res
                out.append(page)
                return
            kids = self.resolve(node.get("Kids"))
            if not isinstance(kids, list):
                raise ExtractError("pdf: /Pages node without /Kids")
            for kid in kids:
                walk(kid, res)

        walk(pages_ref, None)
        return out

    def page_content(self, page: dict) -> bytes:
        contents = self.resolve(page.get("Contents"))
        streams: list[object] = contents if isinstance(contents, list) else [contents]
        parts: list[bytes] = []
        for s in streams:
            s = self.resolve(s)
            if s is None:
                continue
            if not (isinstance(s, tuple) and len(s) == 2):
                raise ExtractError("pdf: /Contents member is not a stream")
            sdict, raw = s
            parts.append(decode_stream(sdict, raw, self.resolve))
        return b"\n".join(parts)

    @staticmethod
    def _text_string(b: object) -> str:
        """PDF text string: UTF-16BE with BOM, else PDFDocEncoding
        (approximated by cp1252 — the builder's encoding)."""
        if not isinstance(b, bytes):
            return b if isinstance(b, str) else ""
        if b.startswith(b"\xfe\xff"):
            return b[2:].decode("utf-16-be", "replace")
        return b.decode("cp1252", "replace")

    def annotations_text(self, page: dict) -> list[str]:
        """Non-empty /Contents strings of the page's /Annots (PDF 32000-1
        §12.5; Tika's PDFParser extracts annotation text with the page).
        Malformed annotation entries degrade to fewer strings."""
        annots = self.resolve(page.get("Annots"))
        out: list[str] = []
        if not isinstance(annots, list):
            return out
        for a in annots[:256]:
            a = self.resolve(a)
            if not isinstance(a, dict):
                continue
            text = self._text_string(self.resolve(a.get("Contents")))
            if text:
                out.append(text)
        return out

    def acroform_fields(self) -> list[tuple[str, str]]:
        """(/T name, /V value) pairs from the interactive form's field
        tree (PDF 32000-1 §12.7; Tika surfaces filled form values).
        Terminal-field /Kids recurse with dotted partial names; /V name
        objects (checkbox states) stringify. Depth/count-guarded."""
        root = self.resolve(self.trailer.get("Root"))
        if not isinstance(root, dict):
            return []
        acro = self.resolve(root.get("AcroForm"))
        if not isinstance(acro, dict):
            return []
        out: list[tuple[str, str]] = []

        def walk(fields: object, prefix: str, depth: int) -> None:
            if depth > 8 or not isinstance(fields, list):
                return
            for f in fields[:256]:
                f = self.resolve(f)
                if not isinstance(f, dict):
                    continue
                part = self._text_string(self.resolve(f.get("T")))
                name = "%s.%s" % (prefix, part) if prefix and part else (part or prefix)
                v = self.resolve(f.get("V"))
                if v is not None:
                    out.append((name, self._text_string(v) if not isinstance(v, Name) else str(v)))
                walk(self.resolve(f.get("Kids")), name, depth + 1)

        walk(self.resolve(acro.get("Fields")), "", 0)
        return out

    def xmp_title(self) -> str:
        """dc:title from the catalog's XMP /Metadata stream (ISO 16684-1
        packet; Tika maps it to dc:title). '' when absent/unparseable."""
        root = self.resolve(self.trailer.get("Root"))
        if not isinstance(root, dict):
            return ""
        meta = self.resolve(root.get("Metadata"))
        if not (isinstance(meta, tuple) and len(meta) == 2):
            return ""
        try:
            xml = decode_stream(meta[0], meta[1], self.resolve)
        except ExtractError:
            return ""
        m = re.search(
            rb"<dc:title>.*?<rdf:li[^>]*>(.*?)</rdf:li>", xml, re.S
        )
        if not m:
            return ""
        raw = m.group(1).decode("utf-8", "replace").strip()
        for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                        ("&apos;", "'"), ("&amp;", "&")):
            raw = raw.replace(ent, ch)
        return raw

    def outline_titles(self) -> list[str]:
        """Pre-order /Title strings of the catalog's document outline
        (PDF 32000-1 §12.3.3 — the /Outlines /First → /Next sibling
        chain with /First child recursion; Tika surfaces bookmarks as
        document metadata). Depth/cycle/count-guarded: a malformed or
        self-referential chain degrades to fewer titles, never an
        error."""
        root = self.resolve(self.trailer.get("Root"))
        if not isinstance(root, dict):
            return []
        outlines = self.resolve(root.get("Outlines"))
        if not isinstance(outlines, dict):
            return []
        out: list[str] = []
        seen: set[int] = set()

        def walk(node_ref: object, depth: int) -> None:
            while node_ref is not None and depth <= 8 and len(out) < 256:
                if isinstance(node_ref, Ref):
                    if node_ref[0] in seen:
                        return
                    seen.add(node_ref[0])
                node = self.resolve(node_ref)
                if not isinstance(node, dict):
                    return
                title = self._text_string(self.resolve(node.get("Title")))
                if title:
                    out.append(title)
                if node.get("First") is not None:
                    walk(node.get("First"), depth + 1)
                node_ref = node.get("Next")

        walk(outlines.get("First"), 0)
        return out

    def embedded_files(self) -> list[tuple[str, bytes]]:
        """Attachments from the catalog's /Names /EmbeddedFiles name tree
        (PDF 32000-1 §7.7.4 name dictionary, §7.11.4 embedded file
        streams; Tika recurses these as embedded documents via
        /root/reference/src/java-env.cpp:313's auto-parse). Returns
        (display name, decoded bytes) in tree order — [] when the
        document has no attachments. Depth/cycle-guarded; a malformed
        filespec degrades to fewer attachments, never an error (the
        page text already extracted)."""
        root = self.resolve(self.trailer.get("Root"))
        if not isinstance(root, dict):
            return []
        names = self.resolve(root.get("Names"))
        if not isinstance(names, dict):
            return []
        tree = self.resolve(names.get("EmbeddedFiles"))
        out: list[tuple[str, bytes]] = []
        seen: set[int] = set()

        def label_of(key: object, spec: dict) -> str:
            for cand in (spec.get("UF"), spec.get("F"), key):
                cand = self.resolve(cand)
                if isinstance(cand, bytes):
                    return cand.decode("utf-8", "replace")
                if isinstance(cand, str):
                    return cand
            return "attachment"

        def walk(node: object, depth: int) -> None:
            if depth > 16 or not isinstance(node, dict) or len(out) >= 256:
                return
            pairs = self.resolve(node.get("Names"))
            if isinstance(pairs, list):
                for k in range(0, len(pairs) - 1, 2):
                    spec = self.resolve(pairs[k + 1])
                    if not isinstance(spec, dict):
                        continue
                    ef = self.resolve(spec.get("EF"))
                    if not isinstance(ef, dict):
                        continue
                    fobj = self.resolve(ef.get("F") if "F" in ef else ef.get("UF"))
                    if isinstance(fobj, tuple) and len(fobj) == 2:
                        sdict, raw = fobj
                        try:
                            body = decode_stream(sdict, raw, self.resolve)
                        except ExtractError:
                            continue
                        out.append((label_of(pairs[k], spec), body))
            kids = self.resolve(node.get("Kids"))
            if isinstance(kids, list):
                for kid in kids:
                    if isinstance(kid, Ref):
                        if kid[0] in seen:
                            continue
                        seen.add(kid[0])
                    walk(self.resolve(kid), depth + 1)

        walk(tree, 0)
        return out

    def page_fonts(self, page: dict) -> dict[str, "FontDecoder"]:
        res = self.resolve(page.get("Resources")) or {}
        fonts = self.resolve(res.get("Font")) if isinstance(res, dict) else None
        out: dict[str, FontDecoder] = {}
        if isinstance(fonts, dict):
            for fname, fref in fonts.items():
                # decoders are pure functions of the font object: cache per
                # indirect ref so shared fonts build their table once per doc
                key = fref[0] if isinstance(fref, Ref) else None
                dec = self._font_cache.get(key) if key is not None else None
                if dec is None:
                    fdict = self.resolve(fref)
                    dec = FontDecoder(
                        fdict if isinstance(fdict, dict) else {}, self.resolve
                    )
                    if key is not None:
                        self._font_cache[key] = dec
                out[fname] = dec
        return out


# ---------------------------------------------------------------------------
# CMap parsing — /ToUnicode streams and embedded /Encoding CMaps for
# Type0 (composite/CID) fonts. Syntax per PDF 32000-1 §9.7.5/§9.10.3 and
# Adobe CMap/CIDFont spec (TN 5014): begincodespacerange, begincidchar/
# begincidrange (code -> CID) and beginbfchar/beginbfrange (code ->
# UTF-16BE unicode). The reference reads these via Tika/PDFBox
# (/root/reference/src/java-env.cpp:313 routes any PDF Tika supports).
# ---------------------------------------------------------------------------

_CMAP_TOK = re.compile(
    rb"<([0-9A-Fa-f \t\r\n]*)>"  # hex string (whitespace legal inside)
    rb"|(\[)|(\])"
    rb"|(\d+)"
    rb"|(begincodespacerange|endcodespacerange|begincidrange|endcidrange"
    rb"|begincidchar|endcidchar|beginbfchar|endbfchar"
    rb"|beginbfrange|endbfrange|endcmap)"
)


def _hex_to_unicode(b: bytes) -> str:
    """A bf destination hex string is UTF-16BE per spec; tolerate odd /
    single-byte forms from sloppy generators via latin-1."""
    if len(b) >= 2 and len(b) % 2 == 0:
        return b.decode("utf-16-be", "replace")
    return b.decode("latin-1")


class CMap:
    """One parsed CMap: codespace ranges (how many bytes the next code
    takes) plus code->unicode (bf*) and code->CID (cid*) mappings. Ranges
    stay UNEXPANDED — an Identity CMap declares <0000> <ffff> and a full
    expansion would be 64k entries per font — lookups bisect instead."""

    __slots__ = ("codespaces", "bf_single", "bf_ranges", "cid_single", "cid_ranges")

    def __init__(self) -> None:
        self.codespaces: list[tuple[int, int, int]] = []  # (nbytes, lo, hi)
        self.bf_single: dict[int, str] = {}
        self.bf_ranges: list[tuple[int, int, object]] = []  # (lo, hi, base str | list)
        self.cid_single: dict[int, int] = {}
        self.cid_ranges: list[tuple[int, int, int]] = []

    def lookup_bf(self, code: int) -> str | None:
        u = self.bf_single.get(code)
        if u is not None:
            return u
        k = bisect.bisect_right(self.bf_ranges, code, key=lambda r: r[0]) - 1
        if k >= 0:
            lo, hi, base = self.bf_ranges[k]
            if lo <= code <= hi:
                if isinstance(base, list):
                    return base[code - lo]
                # spec: the destination's LAST code unit increments with
                # the offset into the range
                if not base:
                    return None
                return base[:-1] + chr(ord(base[-1]) + (code - lo))
        return None

    def lookup_cid(self, code: int) -> int | None:
        cid = self.cid_single.get(code)
        if cid is not None:
            return cid
        k = bisect.bisect_right(self.cid_ranges, code, key=lambda r: r[0]) - 1
        if k >= 0:
            lo, hi, base = self.cid_ranges[k]
            if lo <= code <= hi:
                return base + (code - lo)
        return None

    def next_code(self, data: bytes, i: int) -> tuple[int, int]:
        """Read one character code at ``data[i:]`` using the codespace
        ranges (shortest matching byte-length wins, the spec's greedy
        rule). No match -> consume the shortest declared length (error
        recovery; a decoder must never stall)."""
        n = len(data)
        shortest = 0
        for nb, lo, hi in self.codespaces:
            if shortest == 0 or nb < shortest:
                shortest = nb
            if i + nb <= n:
                v = int.from_bytes(data[i : i + nb], "big")
                if lo <= v <= hi:
                    return v, nb
        nb = min(shortest or 1, n - i)
        return int.from_bytes(data[i : i + nb], "big"), nb


_IDENTITY_CMAP = CMap()
_IDENTITY_CMAP.codespaces.append((2, 0, 0xFFFF))


def parse_cmap(data: bytes) -> CMap:
    """Parse the mapping sections of a CMap program. Tokens outside the
    begin*/end* sections (the PostScript framing, /CIDSystemInfo, usecmap)
    are skipped; unknown section contents are tolerated item-wise."""
    cm = CMap()
    mode: str | None = None
    buf: list[object] = []  # pending operands within the current section
    arr: list[str] | None = None  # open [ ... ] bf destination array
    for m in _CMAP_TOK.finditer(data):
        hexs, lbr, rbr, num, kw = m.groups()
        if kw is not None:
            word = kw.decode("ascii")
            if word == "endcmap":
                break
            mode = word[5:] if word.startswith("begin") else None
            buf = []
            arr = None
            continue
        if mode is None:
            continue
        if lbr is not None:
            arr = []
            continue
        if rbr is not None:
            if arr is not None:
                buf.append(arr)
                arr = None
        elif hexs is not None:
            b = bytes.fromhex(hexs.decode("ascii").replace(" ", "").replace("\t", "").replace("\r", "").replace("\n", ""))
            if arr is not None:
                arr.append(_hex_to_unicode(b))
                continue
            buf.append(b)
        elif num is not None:
            buf.append(int(num))
        # reduce complete tuples per section
        if mode == "codespacerange" and len(buf) == 2:
            lo_b, hi_b = buf
            if isinstance(lo_b, bytes) and isinstance(hi_b, bytes) and lo_b:
                cm.codespaces.append(
                    (len(lo_b), int.from_bytes(lo_b, "big"), int.from_bytes(hi_b, "big"))
                )
            buf = []
        elif mode == "cidchar" and len(buf) == 2:
            code, cid = buf
            if isinstance(code, bytes) and isinstance(cid, int):
                cm.cid_single[int.from_bytes(code, "big")] = cid
            buf = []
        elif mode == "cidrange" and len(buf) == 3:
            lo_b, hi_b, cid = buf
            if isinstance(lo_b, bytes) and isinstance(hi_b, bytes) and isinstance(cid, int):
                cm.cid_ranges.append(
                    (int.from_bytes(lo_b, "big"), int.from_bytes(hi_b, "big"), cid)
                )
            buf = []
        elif mode == "bfchar" and len(buf) == 2:
            code, dst = buf
            if isinstance(code, bytes) and isinstance(dst, bytes):
                cm.bf_single[int.from_bytes(code, "big")] = _hex_to_unicode(dst)
            buf = []
        elif mode == "bfrange" and len(buf) == 3:
            lo_b, hi_b, dst = buf
            if isinstance(lo_b, bytes) and isinstance(hi_b, bytes):
                lo = int.from_bytes(lo_b, "big")
                hi = int.from_bytes(hi_b, "big")
                if isinstance(dst, bytes):
                    cm.bf_ranges.append((lo, hi, _hex_to_unicode(dst)))
                elif isinstance(dst, list) and len(dst) >= hi - lo + 1:
                    cm.bf_ranges.append((lo, hi, dst))
            buf = []
    # key-sort: third elements mix str/list and must never be compared
    cm.bf_ranges.sort(key=lambda r: (r[0], r[1]))
    cm.cid_ranges.sort(key=lambda r: (r[0], r[1]))
    return cm


# ---------------------------------------------------------------------------
# font decoding (simple fonts: base encoding + /Differences;
# Type0/CID fonts: Identity-H/V or embedded CMap + /ToUnicode)
# ---------------------------------------------------------------------------

# Adobe Glyph List subset: the names a /Differences array in a text-centric
# PDF actually uses (ASCII set + common Latin-1/typography). Unknown names
# keep the base-encoding char for their code.
_AGL = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    "bullet": "•", "dagger": "†", "daggerdbl": "‡",
    "emdash": "—", "endash": "–", "ellipsis": "…",
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "trademark": "™", "copyright": "©", "registered": "®",
    "degree": "°", "plusminus": "±", "mu": "µ",
    "paragraph": "¶", "section": "§", "cent": "¢",
    "sterling": "£", "yen": "¥", "Euro": "€",
    "florin": "ƒ", "fraction": "⁄", "perthousand": "‰",
    "agrave": "à", "aacute": "á", "acircumflex": "â",
    "adieresis": "ä", "ccedilla": "ç", "egrave": "è",
    "eacute": "é", "ecircumflex": "ê", "edieresis": "ë",
    "igrave": "ì", "iacute": "í", "ntilde": "ñ",
    "ograve": "ò", "oacute": "ó", "odieresis": "ö",
    "ugrave": "ù", "uacute": "ú", "udieresis": "ü",
    "Adieresis": "Ä", "Odieresis": "Ö", "Udieresis": "Ü",
    "germandbls": "ß", "oslash": "ø", "Oslash": "Ø",
    "aring": "å", "Aring": "Å", "ae": "æ", "AE": "Æ",
}

# letters/digits map to themselves ("a" -> a, "A" -> A)
for _ch in "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ":
    _AGL.setdefault(_ch, _ch)


_BASE_TABLES: dict[str | None, list[str]] = {}


class FontDecoder:
    """bytes -> str for one font.

    Simple fonts (Type1/TrueType/Type3): 256-entry code table from the
    base encoding + /Differences, with /ToUnicode (when present)
    overriding individual codes — subset fonts from office exporters
    carry custom encodings whose ONLY truth is the ToUnicode CMap.

    Composite fonts (/Subtype /Type0, PDF 32000-1 §9.7): multi-byte codes
    iterated via the encoding CMap's codespace ranges (Identity-H/V when
    the /Encoding is the predefined name; an embedded CMap stream is
    parsed for codespaces + cidchar/cidrange). Each code maps through
    /ToUnicode (the authoritative text mapping); absent that, the
    deterministic fallback is chr(CID) for valid scalar values — exact
    for the ubiquitous Identity-H + cid==codepoint subset convention,
    U+FFFD otherwise. The reference gets this via Tika/PDFBox
    (/root/reference/src/java-env.cpp:313)."""

    def __init__(self, fdict: dict, resolve):
        tou = resolve(fdict.get("ToUnicode"))
        self._tou: CMap | None = None
        if isinstance(tou, tuple) and len(tou) == 2:
            try:
                self._tou = parse_cmap(decode_stream(tou[0], tou[1], resolve))
            except ExtractError:
                self._tou = None
        subtype = resolve(fdict.get("Subtype"))
        self._type0 = isinstance(subtype, str) and str(subtype) == "Type0"
        if self._type0:
            enc = resolve(fdict.get("Encoding"))
            self._enc_cmap: CMap | None = None
            if isinstance(enc, tuple) and len(enc) == 2:
                try:
                    self._enc_cmap = parse_cmap(decode_stream(enc[0], enc[1], resolve))
                except ExtractError:
                    self._enc_cmap = None
            # code iteration: embedded CMap codespaces win; the predefined
            # Identity-H/Identity-V names (and any unknown predefined
            # name) iterate 2-byte codes
            if self._enc_cmap is not None and self._enc_cmap.codespaces:
                self._spaces = self._enc_cmap
            elif self._tou is not None and self._tou.codespaces:
                self._spaces = self._tou
            else:
                self._spaces = _IDENTITY_CMAP
            return
        enc = resolve(fdict.get("Encoding"))
        base = None
        differences = None
        if isinstance(enc, Name) or isinstance(enc, str) and not isinstance(enc, dict):
            base = str(enc) if enc is not None else None
        if isinstance(enc, dict):
            b = resolve(enc.get("BaseEncoding"))
            base = str(b) if b is not None else None
            differences = resolve(enc.get("Differences"))
        self.table = self._base_table(base)
        if isinstance(differences, list):
            code = 0
            for item in differences:
                item = resolve(item)
                if isinstance(item, (int, float)):
                    code = int(item)
                elif isinstance(item, str):
                    if 0 <= code < 256:
                        self.table[code] = _AGL.get(str(item), self.table[code])
                    code += 1
        if self._tou is not None:
            # ToUnicode is authoritative where it maps: override per code
            for code in range(256):
                u = self._tou.lookup_bf(code)
                if u is not None:
                    self.table[code] = u
        # decode fast paths: identical-to-latin-1 tables use the C codec
        # directly; any other table decodes latin-1 then str.translate()s
        # only the differing codes (C-speed; the per-byte join dominated
        # the extraction profile)
        latin1 = _BASE_TABLES.get(None) or self._base_table(None)
        self._latin1 = self.table == latin1
        self._xlate = {
            i: self.table[i] for i in range(256) if self.table[i] != latin1[i]
        }

    @staticmethod
    def _base_table(base: str | None) -> list[str]:
        # tables are immutable per base name: build once per process (a
        # table rebuild per font per page dominated the parse profile)
        key = base if base in ("MacRomanEncoding", "WinAnsiEncoding") else None
        cached = _BASE_TABLES.get(key)
        if cached is None:
            if key == "MacRomanEncoding":
                cached = [bytes([i]).decode("mac_roman", "replace") for i in range(256)]
            elif key == "WinAnsiEncoding":
                # WinAnsiEncoding == cp1252; the five unmapped C1 codes keep
                # their latin-1 identity rather than dropping
                cached = [
                    bytes([i]).decode("cp1252", "replace")
                    if i not in (0x81, 0x8D, 0x8F, 0x90, 0x9D)
                    else bytes([i]).decode("latin-1")
                    for i in range(256)
                ]
            else:
                # StandardEncoding / absent: latin-1 is the deterministic
                # superset fallback (ASCII-identical; high range passes
                # through rather than dropping)
                cached = [bytes([i]).decode("latin-1") for i in range(256)]
            _BASE_TABLES[key] = cached
        # copy: /Differences mutates the table per font
        return list(cached)

    def decode(self, raw: bytes) -> str:
        if self._type0:
            return self._decode_cid(raw)
        s = raw.decode("latin-1")
        if self._latin1:
            return s
        return s.translate(self._xlate)

    def _decode_cid(self, raw: bytes) -> str:
        out: list[str] = []
        i = 0
        n = len(raw)
        spaces = self._spaces
        tou = self._tou
        enc = self._enc_cmap
        while i < n:
            code, nb = spaces.next_code(raw, i)
            i += nb
            u = tou.lookup_bf(code) if tou is not None else None
            if u is None:
                cid = enc.lookup_cid(code) if enc is not None else None
                if cid is None:
                    cid = code  # Identity encoding: CID == code
                u = (
                    chr(cid)
                    if 0 < cid < 0x110000 and not (0xD800 <= cid <= 0xDFFF)
                    else "�"
                )
            out.append(u)
        return "".join(out)


_DEFAULT_DECODER = FontDecoder({}, lambda x: x)


# ---------------------------------------------------------------------------
# content-stream text extraction
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    rb"\(|<<|<|\[|\]|>>|/[^\s()<>\[\]{}/%]*|[+-]?(?:\d+\.?\d*|\.\d+)|'|\"|[A-Za-z*]{1,3}"
)


# master content-stream scanner: one regex drive per token instead of a
# per-byte python dispatch (profiled ~2x on run-dense giant pages). The
# nested-paren string body can't be a regex — the '(' group hands off to
# _parse_literal_string.
_CS_SCAN = re.compile(
    rb"[\x00\t\n\x0c\r ]+"
    rb"|(?P<cmt>%[^\r\n]*)"
    rb"|(?P<str>\()"
    rb"|(?P<dict><<)"
    rb"|(?P<hex><)"
    rb"|(?P<name>/[^\x00\t\n\x0c\r ()<>\[\]{}/%]*)"
    rb"|(?P<arr>\[)"
    rb"|(?P<num>[+-]?(?:\d+\.?\d*|\.\d+))"
    rb"|(?P<op>[A-Za-z'\"*][A-Za-z'\"*0-9]*)"
    rb"|(?P<other>.)",
    re.DOTALL,
)


# fast paths for the dominant show-run idioms (one regex drive instead of
# 3-7 generic token iterations): "x y Td", "a b c d e f Tm", "(…) Tj".
_WS_C = rb"[\x00\t\n\x0c\r ]"
_NUM_C = rb"[+-]?(?:\d+\.?\d*|\.\d+)"
_OPEND = rb"(?![A-Za-z0-9'\"*])"  # operator must not continue (Td vs TD)
_FAST_TD = re.compile(
    rb"(%s)%s+(%s)%s+Td%s" % (_NUM_C, _WS_C, _NUM_C, _WS_C, _OPEND)
)
_FAST_TM = re.compile(
    rb"(%s)%s+(%s)%s+(%s)%s+(%s)%s+(%s)%s+(%s)%s+Tm%s"
    % (_NUM_C, _WS_C, _NUM_C, _WS_C, _NUM_C, _WS_C, _NUM_C, _WS_C,
       _NUM_C, _WS_C, _NUM_C, _WS_C, _OPEND)
)
_FAST_TJ = re.compile(rb"%s*Tj%s" % (_WS_C, _OPEND))
_FAST_TJARR = re.compile(rb"%s*TJ%s" % (_WS_C, _OPEND))
# inline-image terminator (§8.9.7): whitespace + EI + delimiter/EOF. The
# image data after ID is raw binary that can contain bytes shaped like
# string/dict openers or text operators — it must be skipped WHOLESALE,
# never tokenized (PDF 2.0 added /L precisely because this scan is the
# only heuristic for unlabeled data; a data-embedded "\sEI\s" cuts early,
# which loses the image, never the text after it).
_INLINE_EI = re.compile(rb"%sEI(?=%s|$)" % (_WS_C, _WS_C))
_NUM_TOK = re.compile(rb"%s" % _NUM_C)


def _parse_tj_array_fast(content: bytes, i: int) -> tuple[bytes, int] | None:
    """Fast path for the hot ``[(s1) k1 (s2) ...] TJ`` kerned-show form:
    one tight loop over literal/hex strings and kern numbers instead of a
    generic parse_object recursion per element. Returns (joined string
    bytes, end-after-TJ) only when the WHOLE array is simple elements AND
    is immediately followed by TJ; anything else -> None, generic path
    (nothing is consumed). Semantics identical to the TJ operator branch:
    byte elements concatenate in order, kern numbers are ignored."""
    n = len(content)
    j = i + 1  # past '['
    parts: list[bytes] = []
    while j < n:
        c = content[j]
        if c in b" \t\r\n\x0c\x00":
            j += 1
            continue
        if c == 0x5D:  # ']'
            m = _FAST_TJARR.match(content, j + 1)
            if not m:
                return None
            return b"".join(parts), m.end()
        if c == 0x28:  # '(' literal string
            s, j = _parse_literal_string(content, j)
            parts.append(s)
            continue
        if c == 0x3C:  # '<' hex string ('<<' dict -> generic path)
            if j + 1 < n and content[j + 1] == 0x3C:
                return None
            s, j = _parse_hex_string(content, j)
            parts.append(s)
            continue
        m = _NUM_TOK.match(content, j)
        if m:
            j = m.end()
            continue
        return None
    return None


def _content_runs(
    content: bytes, fonts: dict[str, FontDecoder]
) -> list[tuple[float, float, str]]:
    """Tokenize one page's content stream; return raw (x, y, text) show
    events in appearance order. Positions come from the text-line matrix
    (Tm/Td/TD/T* translation); the CTM is assumed identity at page level —
    the documented limitation for transformed text."""
    runs: list[tuple[float, float, str]] = []
    stack: list[object] = []
    decoder = _DEFAULT_DECODER
    # text-line matrix translation + leading
    lx = ly = 0.0
    tl = 0.0
    in_text = False
    i = 0
    n = len(content)
    scan = _CS_SCAN.match
    fast_td = _FAST_TD.match
    fast_tm = _FAST_TM.match
    fast_tj = _FAST_TJ.match

    def show(raw: bytes) -> None:
        if raw:
            runs.append((lx, ly, decoder.decode(raw)))

    def num(v: object) -> float:
        return float(v) if isinstance(v, (int, float)) else 0.0

    while i < n:
        m = scan(content, i)
        kind = m.lastgroup
        if kind is None or kind == "cmt" or kind == "other":
            i = m.end()  # whitespace / comment / stray byte
            continue
        if kind == "num":
            fm = fast_td(content, i)
            if fm:  # "x y Td" as one drive
                lx += float(fm.group(1))
                ly += float(fm.group(2))
                i = fm.end()
                stack.clear()
                continue
            fm = fast_tm(content, i)
            if fm:  # "a b c d e f Tm" as one drive
                lx = float(fm.group(5))
                ly = float(fm.group(6))
                i = fm.end()
                stack.clear()
                continue
            s = m.group(0)
            stack.append(float(s) if b"." in s else int(s))
            i = m.end()
            continue
        if kind == "str":
            s, i = _parse_literal_string(content, i)
            fm = fast_tj(content, i)
            if fm:  # "(…) Tj" shows immediately, no stack round-trip
                if in_text:
                    show(s)
                i = fm.end()
                stack.clear()
                continue
            stack.append(s)
            continue
        if kind == "name":
            raw_name = m.group(0)[1:]
            if b"#" in raw_name:
                raw_name = _NAME_ESC_RE.sub(
                    lambda em: bytes([int(em.group(1), 16)]), raw_name
                )
            stack.append(Name(raw_name.decode("latin-1")))
            i = m.end()
            continue
        if kind == "arr":
            fast = _parse_tj_array_fast(content, i)
            if fast is not None:  # "[(…) k (…)] TJ" as one drive
                if in_text:
                    show(fast[0])
                i = fast[1]
                stack.clear()
                continue
            arr, i = parse_object(content, i)
            stack.append(arr)
            continue
        if kind == "dict":
            d, i = parse_object(content, i)
            stack.append(d)
            continue
        if kind == "hex":
            s, i = _parse_hex_string(content, i)
            stack.append(s)
            continue
        # operator token
        op = m.group(0)
        i = m.end()
        if op == b"BT":
            in_text = True
            lx = ly = 0.0
            stack.clear()
        elif op == b"ET":
            in_text = False
            stack.clear()
        elif op == b"Tf" and len(stack) >= 2:
            fname = stack[-2]
            decoder = fonts.get(str(fname), _DEFAULT_DECODER)
            stack.clear()
        elif op == b"Td" and len(stack) >= 2:
            lx += num(stack[-2])
            ly += num(stack[-1])
            stack.clear()
        elif op == b"TD" and len(stack) >= 2:
            tl = -num(stack[-1])
            lx += num(stack[-2])
            ly += num(stack[-1])
            stack.clear()
        elif op == b"TL" and stack:
            tl = num(stack[-1])
            stack.clear()
        elif op == b"Tm" and len(stack) >= 6:
            lx = num(stack[-2])
            ly = num(stack[-1])
            stack.clear()
        elif op == b"T*":
            ly -= tl
            stack.clear()
        elif op == b"Tj" and stack:
            if in_text and isinstance(stack[-1], bytes):
                show(stack[-1])
            stack.clear()
        elif op == b"'":
            ly -= tl
            if in_text and stack and isinstance(stack[-1], bytes):
                show(stack[-1])
            stack.clear()
        elif op == b'"' and len(stack) >= 3:
            ly -= tl
            if in_text and isinstance(stack[-1], bytes):
                show(stack[-1])
            stack.clear()
        elif op == b"TJ" and stack:
            if in_text and isinstance(stack[-1], list):
                parts = [p for p in stack[-1] if isinstance(p, bytes)]
                show(b"".join(parts))
            stack.clear()
        elif op == b"ID":
            # inline image data (BI ... ID <binary> EI): the BI dict's
            # name/number tokens parsed through the normal paths; from
            # here the payload is raw binary — jump past the EI sentinel
            ei = _INLINE_EI.search(content, i)
            i = ei.end() if ei else n
            stack.clear()
        else:
            # any other operator: operands are consumed, text state unaffected
            stack.clear()
    return runs


def _assemble_lines(
    raw_runs: list[tuple[float, float, str]]
) -> list[tuple[float, float, str]]:
    """Merge show events that share a y into one text line: per line, runs
    sort by (x, appearance) and concatenate; the line's x is its leftmost
    run. The result is one (x, y, text) run per visual line — the shape
    ``pages_to_texts`` reorders into reading order."""
    by_y: dict[float, list[tuple[float, int, str]]] = {}
    order: list[float] = []
    for seq, (x, y, text) in enumerate(raw_runs):
        if y not in by_y:
            by_y[y] = []
            order.append(y)
        by_y[y].append((x, seq, text))
    out: list[tuple[float, float, str]] = []
    for y in order:
        parts = sorted(by_y[y])
        out.append((parts[0][0], y, "".join(t for _x, _s, t in parts)))
    return out


def parse_real_pdf_pages_crypt(
    data: bytes,
) -> tuple[list[list[tuple[float, float, str]]], str]:
    """Parse a real binary PDF into pages of (x, y, text) line runs in
    appearance order — the same shape ``core.pdf.parse_pdf_pages`` emits
    for the synthetic dialect, feeding the shared layout reorder. Second
    element is the crypt method that protected the document ('' /
    'rc4' / 'aesv2' / 'aesv3') — the security-observability surface."""
    doc = RealPdf(data)
    pages: list[list[tuple[float, float, str]]] = []
    for page in doc.pages():
        fonts = doc.page_fonts(page)
        content = doc.page_content(page)
        pages.append(_assemble_lines(_content_runs(content, fonts)))
    return pages, doc._enc_cfm or ""


def parse_real_pdf_pages(data: bytes) -> list[list[tuple[float, float, str]]]:
    return parse_real_pdf_pages_crypt(data)[0]


def is_real_pdf_text(text: str) -> bool:
    """Real binary PDFs always carry a ``startxref`` pointer; the synthetic
    fixtures dialect (core/pdf.py) never does — the routing discriminator."""
    return "startxref" in text


def parse_real_pdf_pages_text(text: str) -> list[list[tuple[float, float, str]]]:
    """Bytes-as-text bridge (latin-1), mirroring ``zipbin.parse_zip_text``."""
    return parse_real_pdf_pages_text_crypt(text)[0]


def parse_real_pdf_pages_text_crypt(
    text: str,
) -> tuple[list[list[tuple[float, float, str]]], str]:
    """Bytes-as-text bridge returning (pages, crypt_method)."""
    try:
        data = text.encode("latin-1")
    except UnicodeEncodeError:
        raise ExtractError("pdf: payload is not a byte stream (non-latin-1 chars)")
    return parse_real_pdf_pages_crypt(data)


def parse_real_pdf_text_full(
    text: str,
) -> tuple[
    list[list[tuple[float, float, str]]],
    str,
    list[tuple[str, str]],
    list[str],
    list[tuple[str, str]],
    str,
    list[str],
]:
    """Bytes-as-text bridge returning
    (pages, crypt_method, attachments, annotations, form_fields,
    xmp_title, outline_titles): attachments are the /EmbeddedFiles
    payloads as latin-1 bytes-as-text (the shape the extraction core
    recurses like archive members), annotations the page-ordered /Annots
    /Contents strings, form_fields the filled /AcroForm (/T, /V) pairs,
    xmp_title the /Metadata dc:title, outline_titles the pre-order
    bookmark /Titles — the beyond-page-text surfaces Tika's PDFParser
    emits."""
    try:
        data = text.encode("latin-1")
    except UnicodeEncodeError:
        raise ExtractError("pdf: payload is not a byte stream (non-latin-1 chars)")
    doc = RealPdf(data)
    pages: list[list[tuple[float, float, str]]] = []
    annots: list[str] = []
    for page in doc.pages():
        fonts = doc.page_fonts(page)
        content = doc.page_content(page)
        pages.append(_assemble_lines(_content_runs(content, fonts)))
        annots.extend(doc.annotations_text(page))
    attachments = [
        (name, body.decode("latin-1")) for name, body in doc.embedded_files()
    ]
    return (
        pages,
        doc._enc_cfm or "",
        attachments,
        annots,
        doc.acroform_fields(),
        doc.xmp_title(),
        doc.outline_titles(),
    )


# ---------------------------------------------------------------------------
# deterministic builder (tests + synthetic corpus)
# ---------------------------------------------------------------------------


def _escape_pdf_string(s: str) -> bytes:
    # whole-string encode + bytes replace: the per-char loop dominated the
    # corpus-generation profile (build_pdf was slower than the parser)
    b = s.encode("cp1252", "replace")
    b = b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
    if any(c < 0x20 for c in b):  # rare: control bytes -> octal escapes
        out = bytearray()
        for c in b:
            if c < 0x20:
                out += b"\\%03o" % c
            else:
                out.append(c)
        return bytes(out)
    return b


def _build_tounicode_cmap(code_of: dict[str, int]) -> bytes:
    """Deterministic /ToUnicode CMap for the builder's code assignment.
    Consecutive (code, codepoint) runs become ``bfrange`` rows (split at
    the 256-code boundary per spec — lo/hi may differ only in the last
    byte); singletons become ``bfchar``; sections chunk at the spec's
    100-entry limit."""
    pairs = sorted((c, ch) for ch, c in code_of.items())
    ranges: list[tuple[int, int, str]] = []
    chars: list[tuple[int, str]] = []
    i = 0
    while i < len(pairs):
        j = i
        while (
            j + 1 < len(pairs)
            and pairs[j + 1][0] == pairs[j][0] + 1
            and ord(pairs[j + 1][1]) == ord(pairs[j][1]) + 1
            and pairs[j + 1][0] >> 8 == pairs[i][0] >> 8
        ):
            j += 1
        if j > i:
            ranges.append((pairs[i][0], pairs[j][0], pairs[i][1]))
        else:
            chars.append(pairs[i])
        i = j + 1
    out = [
        b"/CIDInit /ProcSet findresource begin",
        b"12 dict begin",
        b"begincmap",
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) /Supplement 0 >> def",
        b"/CMapName /Adobe-Identity-UCS def",
        b"/CMapType 2 def",
        b"1 begincodespacerange",
        b"<0000> <FFFF>",
        b"endcodespacerange",
    ]
    def u16(ch: str) -> bytes:
        return ch.encode("utf-16-be").hex().encode("ascii")
    for k in range(0, len(chars), 100):
        chunk = chars[k : k + 100]
        out.append(b"%d beginbfchar" % len(chunk))
        out += [b"<%04x> <%s>" % (c, u16(ch)) for c, ch in chunk]
        out.append(b"endbfchar")
    for k in range(0, len(ranges), 100):
        chunk = ranges[k : k + 100]
        out.append(b"%d beginbfrange" % len(chunk))
        out += [b"<%04x> <%04x> <%s>" % (lo, hi, u16(ch)) for lo, hi, ch in chunk]
        out.append(b"endbfrange")
    out += [
        b"endcmap",
        b"CMapName currentdict /CMap defineresource pop",
        b"end",
        b"end",
    ]
    return b"\n".join(out)


def build_pdf(
    pages: list[list[tuple[float, float, str]]],
    *,
    flate: bool = True,
    tj_arrays: bool = False,
    use_tm: bool = False,
    xref_stream: bool = False,
    cid: bool = False,
    cid_tounicode: bool = True,
    encrypt: str | None = None,
    encrypt_user_pw: bytes = b"",
    encrypt_stmf_identity: bool = False,
    content_filter: str | None = None,
    attachments: list[tuple[str, bytes]] | None = None,
    annotations: list[tuple[int, str]] | None = None,
    form_fields: list[tuple[str, str]] | None = None,
    xmp_title: str | None = None,
    outlines: list[tuple[int, str]] | None = None,
    inline_image: bool = False,
) -> bytes:
    """Build a real, deterministic, parser-valid PDF from (x, y, text) runs.

    ``flate`` compresses content streams (FlateDecode); ``tj_arrays`` emits
    each run as a kerned ``TJ`` array split mid-text; ``use_tm`` positions
    via ``Tm`` instead of ``Td``; ``xref_stream`` writes a PDF 1.5
    cross-reference stream instead of a classic table. Fonts declare
    ``/WinAnsiEncoding`` so non-ASCII round-trips through cp1252.

    ``cid=True`` emits a composite font instead (/Subtype /Type0,
    /Encoding /Identity-H, a CIDFontType2 descendant) and shows text as
    2-byte hex-string codes. With ``cid_tounicode`` the codes are a
    dense subset assignment (first-seen order of the document's distinct
    chars) mapped back by a generated /ToUnicode CMap mixing bfchar and
    bfrange rows — the shape every modern PDF generator emits. Without
    it, codes are the raw codepoints (the Identity cid==unicode subset
    convention) exercising the parser's no-ToUnicode fallback.

    ``encrypt`` ("rc4-40" -> V1/R2, "rc4-128" -> V2/R3) applies the
    standard security handler: streams and out-of-stream strings are
    RC4'd with per-object keys, /O//U computed per Algorithms 2-5
    (owner password fixed, user password ``encrypt_user_pw`` — empty by
    default so the parser's transparent-open path succeeds; non-empty
    plants a password-required document).
    """
    enc_key = None
    enc_p = -44  # print/extract allowed, modify denied — typical mask
    enc_id0 = hashlib.md5(
        repr((pages, encrypt, encrypt_user_pw)).encode("utf-8", "replace")
    ).digest()
    if encrypt in ("rc4-40", "rc4-128", "aes-128"):
        enc_v, enc_r, enc_bits = {
            "rc4-40": (1, 2, 40),
            "rc4-128": (2, 3, 128),
            "aes-128": (4, 4, 128),
        }[encrypt]
        enc_o = _std_o_entry(b"owner-secret", encrypt_user_pw, enc_r, enc_bits // 8)
        enc_key = _std_file_key(
            encrypt_user_pw, enc_o, enc_p, enc_id0, enc_r, enc_bits // 8
        )
        enc_u = _std_u_entry(enc_key, enc_id0, min(enc_r, 3))  # R4 -> Algorithm 5
    elif encrypt == "aes-256":  # /V 5 R 6 (ISO 32000-2)
        enc_key = hashlib.sha256(
            repr((pages, encrypt_user_pw)).encode("utf-8", "replace")
        ).digest()
        zero_iv = b"\x00" * 16
        enc_u = _hash_2b(encrypt_user_pw, _B_VSALT, b"") + _B_VSALT + _B_KSALT
        enc_ue = cbc_encrypt(_hash_2b(encrypt_user_pw, _B_KSALT, b""), zero_iv, enc_key)
        enc_o = _hash_2b(b"owner-secret", _B_OVSALT, enc_u) + _B_OVSALT + _B_OKSALT
        enc_oe = cbc_encrypt(_hash_2b(b"owner-secret", _B_OKSALT, enc_u), zero_iv, enc_key)
        perms_block = (
            (enc_p & 0xFFFFFFFF).to_bytes(4, "little")
            + b"\xff\xff\xff\xff" + b"Tadb" + b"twc!"
        )
        enc_perms = cbc_encrypt(enc_key, zero_iv, perms_block)
    elif encrypt is not None:
        raise ValueError("unknown encrypt mode %r" % encrypt)

    def _obj_crypt(num: int, body: bytes) -> bytes:
        if encrypt.startswith("rc4"):
            return _rc4(_obj_key(enc_key, num, 0), body)
        if encrypt == "aes-128":
            k = _obj_key_salted(enc_key, num, 0, b"sAlT")
        else:  # aes-256: file key directly
            k = enc_key
        iv = hashlib.md5(b"twc-iv-%d" % num).digest()[:16]
        padlen = 16 - len(body) % 16
        return iv + cbc_encrypt(k, iv, body + bytes([padlen]) * padlen)

    def enc_stream(num: int, body: bytes) -> bytes:
        # /StmF /Identity: streams stay plaintext while strings encrypt
        if enc_key is None or encrypt_stmf_identity:
            return body
        return _obj_crypt(num, body)

    def enc_str(num: int, s: bytes) -> bytes:
        if enc_key is None:
            return b"(" + s + b")"
        return b"<" + _obj_crypt(num, s).hex().encode("ascii") + b">"

    objects: dict[int, bytes] = {}
    n_pages = len(pages)
    code_of: dict[str, int] = {}
    if cid:
        if cid_tounicode:
            # dense code assignment over the document's sorted distinct
            # chars: sorted order makes contiguous codepoint runs land on
            # contiguous codes, so the CMap genuinely exercises bfrange
            alphabet = sorted({ch for runs in pages for _x, _y, t in runs for ch in t})
            code_of = {ch: k + 1 for k, ch in enumerate(alphabet)}
        else:
            code_of = {
                ch: ord(ch) for runs in pages for _x, _y, t in runs for ch in t
            }
    # 1=Catalog 2=Pages 3=Font, then per page: page obj, content obj;
    # cid appends descendant-font (+ ToUnicode) objects after the pages
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    kids = " ".join("%d 0 R" % (4 + 2 * i) for i in range(n_pages))
    objects[2] = (
        "<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n_pages)
    ).encode("ascii")
    if cid:
        desc_num = 4 + 2 * n_pages
        tou_num = desc_num + 1
        font = (
            b"<< /Type /Font /Subtype /Type0 /BaseFont /DejaVuSans"
            b" /Encoding /Identity-H /DescendantFonts [%d 0 R]" % desc_num
        )
        if cid_tounicode:
            font += b" /ToUnicode %d 0 R" % tou_num
        objects[3] = font + b" >>"
        objects[desc_num] = (
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /DejaVuSans"
            b" /CIDSystemInfo << /Registry %s /Ordering %s"
            b" /Supplement 0 >> /CIDToGIDMap /Identity /DW 1000 >>"
            % (enc_str(desc_num, b"Adobe"), enc_str(desc_num, b"Identity"))
        )
        if cid_tounicode:
            cmap = _build_tounicode_cmap(code_of)
            comp = enc_stream(tou_num, zlib.compress(cmap, 6))
            objects[tou_num] = (
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
                % (len(comp), comp)
            )
    else:
        objects[3] = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
            b" /Encoding /WinAnsiEncoding >>"
        )

    def hexshow(text: str) -> bytes:
        # astral chars in the raw-codepoint (no-ToUnicode) variant ride
        # UTF-16 surrogate pairs, the real Identity-H convention
        return b"".join(
            b"%04x" % c if c <= 0xFFFF else ch.encode("utf-16-be").hex().encode("ascii")
            for ch, c in ((ch, code_of[ch]) for ch in text)
        )

    # object-number plan past the fixed 1/2/3 + per-page pairs (+ cid
    # objects): attachments claim 2n+1, then annotations, form fields,
    # XMP metadata — precomputed so page dicts can reference their
    # /Annots before those objects are emitted
    next_free = 4 + 2 * n_pages
    if cid:
        next_free += 2 if cid_tounicode else 1
    if attachments:
        next_free += 2 * len(attachments) + 1
    ann_base = next_free
    annotations = annotations or []

    for i, runs in enumerate(pages):
        page_num = 4 + 2 * i
        cont_num = page_num + 1
        ann_refs = " ".join(
            "%d 0 R" % (ann_base + k)
            for k, (pi, _t) in enumerate(annotations)
            if pi == i
        )
        annots_part = " /Annots [%s]" % ann_refs if ann_refs else ""
        objects[page_num] = (
            "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            "/Resources << /Font << /F1 3 0 R >> >>%s /Contents %d 0 R >>"
            % (annots_part, cont_num)
        ).encode("ascii")
        lines = [b"BT", b"/F1 12 Tf"]
        for x, y, text in runs:
            if use_tm:
                lines.append(b"1 0 0 1 %s %s Tm" % (_fmt(x), _fmt(y)))
            else:
                lines.append(b"1 0 0 1 0 0 Tm")
                lines.append(b"%s %s Td" % (_fmt(x), _fmt(y)))
            if cid:
                if tj_arrays and len(text) > 4:
                    cut = len(text) // 2
                    lines.append(
                        b"[<%s> -28 <%s>] TJ"
                        % (hexshow(text[:cut]), hexshow(text[cut:]))
                    )
                else:
                    lines.append(b"<%s> Tj" % hexshow(text))
            else:
                esc = _escape_pdf_string(text)
                if tj_arrays and len(text) > 4:
                    cut = len(text) // 2
                    a = _escape_pdf_string(text[:cut])
                    b = _escape_pdf_string(text[cut:])
                    lines.append(b"[(%s) -28 (%s)] TJ" % (a, b))
                else:
                    lines.append(b"(%s) Tj" % esc)
        lines.append(b"ET")
        if inline_image:
            # BI/ID/EI inline image (§8.9.7) after the page text: 4x4
            # 8-bpc grayscale whose RAW DATA deliberately carries string/
            # operator look-alike bytes — the parser must skip it
            # wholesale, never tokenize it
            lines.append(b"q")
            lines.append(
                b"BI /W 4 /H 4 /CS /G /BPC 8 ID "
                + b"(<BT\xff\x00)(\x01\x02\x03\x04\x05\x06\x07\x08"
                + b" EI"
            )
            lines.append(b"Q")
        body = b"\n".join(lines)
        if content_filter == "lzw":
            comp = enc_stream(cont_num, _lzw_encode(body))
            objects[cont_num] = (
                b"<< /Length %d /Filter /LZWDecode >>\nstream\n%s\nendstream"
                % (len(comp), comp)
            )
        elif content_filter == "rle":
            comp = enc_stream(cont_num, _rle_encode(body))
            objects[cont_num] = (
                b"<< /Length %d /Filter /RunLengthDecode >>\nstream\n%s\nendstream"
                % (len(comp), comp)
            )
        elif content_filter == "a85":
            # chain: Flate then ASCII85 armor (filters apply last-to-first
            # on read: A85 strips the armor, Flate inflates)
            comp = enc_stream(
                cont_num,
                base64.a85encode(zlib.compress(body, 6), adobe=True)[2:] + b"\n",
            )
            objects[cont_num] = (
                b"<< /Length %d /Filter [/ASCII85Decode /FlateDecode] >>"
                b"\nstream\n%s\nendstream" % (len(comp), comp)
            )
        elif flate:
            comp = enc_stream(cont_num, zlib.compress(body, 6))
            objects[cont_num] = (
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
                % (len(comp), comp)
            )
        else:
            body = enc_stream(cont_num, body)
            objects[cont_num] = (
                b"<< /Length %d >>\nstream\n%s\nendstream" % (len(body), body)
            )

    catalog_extra: list[bytes] = []
    if attachments:
        # /Names /EmbeddedFiles name tree: one /EmbeddedFile stream + one
        # /Filespec per attachment, keys in lexical order (name-tree
        # invariant). Streams ride the same enc_stream path as content.
        att_sorted = sorted(attachments)
        pair_refs: list[tuple[bytes, int]] = []
        for name, body in att_sorted:
            stream_num = max(objects) + 1
            comp = enc_stream(stream_num, zlib.compress(body, 6))
            objects[stream_num] = (
                b"<< /Type /EmbeddedFile /Filter /FlateDecode /Length %d"
                b" /Params << /Size %d >> >>\nstream\n%s\nendstream"
                % (len(comp), len(body), comp)
            )
            spec_num = stream_num + 1
            # strings inside an encrypted doc must ride enc_str (the
            # parser decrypts every out-of-stream string); escaping is
            # literal-string syntax only — encrypted strings carry the
            # raw bytes
            raw_name = (
                _escape_pdf_string(name)
                if enc_key is None
                else name.encode("cp1252", "replace")
            )
            objects[spec_num] = (
                b"<< /Type /Filespec /F %s /UF %s /EF << /F %d 0 R >> >>"
                % (enc_str(spec_num, raw_name), enc_str(spec_num, raw_name), stream_num)
            )
            pair_refs.append((raw_name, spec_num))
        tree_num = max(objects) + 1
        objects[tree_num] = b"<< /Names [%s] >>" % b" ".join(
            b"%s %d 0 R" % (enc_str(tree_num, rn), sn) for rn, sn in pair_refs
        )
        catalog_extra.append(b" /Names << /EmbeddedFiles %d 0 R >>" % tree_num)

    for k, (_pi, text) in enumerate(annotations):
        num = ann_base + k
        assert num == max(objects) + 1  # the precomputed plan holds
        objects[num] = (
            b"<< /Type /Annot /Subtype /Text /Rect [36 36 72 72]"
            b" /Contents %s >>" % enc_str(num, text.encode("cp1252", "replace"))
        )
    if form_fields:
        field_nums = []
        for name, value in form_fields:
            num = max(objects) + 1
            field_nums.append(num)
            objects[num] = (
                b"<< /FT /Tx /T %s /V %s >>"
                % (
                    enc_str(num, name.encode("cp1252", "replace")),
                    enc_str(num, value.encode("cp1252", "replace")),
                )
            )
        catalog_extra.append(
            b" /AcroForm << /Fields [%s] >>"
            % b" ".join(b"%d 0 R" % n for n in field_nums)
        )
    if outlines:
        # document outline (§12.3.3): pre-order (level, title) rows become
        # the /First /Next sibling chain with /First child links; levels
        # deeper than parent+1 clamp to parent+1 (pre-order stays valid)
        o_root = max(objects) + 1
        nums = [o_root + 1 + k for k in range(len(outlines))]
        levels: list[int] = []
        for lvl, _t in outlines:
            levels.append(min(max(lvl, 0), (levels[-1] + 1) if levels else 0))
        parent: list[int] = []  # object num of each item's parent node
        first: dict[int, int] = {}
        last: dict[int, int] = {}
        prev: dict[int, int] = {}
        stack: list[int] = [o_root]  # parents by level: stack[lvl] = parent
        for k, lvl in enumerate(levels):
            stack = stack[: lvl + 1]
            p = stack[-1]
            parent.append(p)
            if p not in first:
                first[p] = nums[k]
            else:
                prev[nums[k]] = last[p]
            last[p] = nums[k]
            stack.append(nums[k])
        for k, (lvl, title) in enumerate(outlines):
            num = nums[k]
            parts = [
                b"/Title %s" % enc_str(num, title.encode("cp1252", "replace")),
                b"/Parent %d 0 R" % parent[k],
            ]
            if num in prev:
                parts.append(b"/Prev %d 0 R" % prev[num])
            nxt = [n for n in nums if prev.get(n) == num]
            if nxt:
                parts.append(b"/Next %d 0 R" % nxt[0])
            if num in first:
                parts.append(b"/First %d 0 R /Last %d 0 R" % (first[num], last[num]))
            objects[num] = b"<< %s >>" % b" ".join(parts)
        objects[o_root] = (
            b"<< /Type /Outlines /First %d 0 R /Last %d 0 R /Count %d >>"
            % (first[o_root], last[o_root], len(outlines))
        )
        catalog_extra.append(b" /Outlines %d 0 R" % o_root)
    if xmp_title is not None:
        num = max(objects) + 1
        esc = xmp_title
        for ch, ent in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")):
            esc = esc.replace(ch, ent)
        packet = (
            '<?xpacket begin="﻿" id="W5M0MpCehiHzreSzNTczkc9d"?>\n'
            '<x:xmpmeta xmlns:x="adobe:ns:meta/"><rdf:RDF'
            ' xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">'
            '<rdf:Description xmlns:dc="http://purl.org/dc/elements/1.1/">'
            "<dc:title><rdf:Alt><rdf:li xml:lang=\"x-default\">%s</rdf:li>"
            "</rdf:Alt></dc:title></rdf:Description></rdf:RDF></x:xmpmeta>\n"
            '<?xpacket end="w"?>' % esc
        ).encode("utf-8")
        body = enc_stream(num, packet)
        objects[num] = (
            b"<< /Type /Metadata /Subtype /XML /Length %d >>\nstream\n%s\nendstream"
            % (len(body), body)
        )
        catalog_extra.append(b" /Metadata %d 0 R" % num)
    if catalog_extra:
        objects[1] = (
            b"<< /Type /Catalog /Pages 2 0 R%s >>" % b"".join(catalog_extra)
        )

    trailer_extra = b""
    if enc_key is not None:
        enc_num = max(objects) + 1
        if encrypt == "aes-256":
            body = (
                b"<< /Filter /Standard /V 5 /R 6 /Length 256"
                b" /CF << /StdCF << /CFM /AESV3 /Length 32 >> >>"
                + (
                    b" /StmF /Identity /StrF /StdCF"
                    if encrypt_stmf_identity
                    else b" /StmF /StdCF /StrF /StdCF"
                )
                + b" /P %d /O <%s> /U <%s> /OE <%s> /UE <%s> /Perms <%s> >>"
                % (
                    enc_p,
                    enc_o.hex().encode("ascii"),
                    enc_u.hex().encode("ascii"),
                    enc_oe.hex().encode("ascii"),
                    enc_ue.hex().encode("ascii"),
                    enc_perms.hex().encode("ascii"),
                )
            )
        else:
            body = b"<< /Filter /Standard /V %d /R %d" % (enc_v, enc_r)
            if enc_v >= 2:
                body += b" /Length %d" % enc_bits
            if encrypt == "aes-128":
                body += b" /CF << /StdCF << /CFM /AESV2 /Length 16 >> >>"
                body += (
                    b" /StmF /Identity /StrF /StdCF"
                    if encrypt_stmf_identity
                    else b" /StmF /StdCF /StrF /StdCF"
                )
            body += b" /P %d /O <%s> /U <%s> >>" % (
                enc_p,
                enc_o.hex().encode("ascii"),
                enc_u.hex().encode("ascii"),
            )
        objects[enc_num] = body
        idhex = enc_id0.hex().encode("ascii")
        trailer_extra = b" /Encrypt %d 0 R /ID [<%s> <%s>]" % (enc_num, idhex, idhex)

    out = bytearray(b"%PDF-1.5\n%\xc2\xa5\xc2\xb1\n" if xref_stream else b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num
        out += objects[num]
        out += b"\nendobj\n"
    max_num = max(objects)
    if not xref_stream:
        xref_off = len(out)
        out += b"xref\n0 %d\n" % (max_num + 1)
        out += b"0000000000 65535 f \n"
        for num in range(1, max_num + 1):
            out += b"%010d 00000 n \n" % offsets.get(num, 0)
        out += (
            b"trailer\n<< /Size %d /Root 1 0 R%s >>\nstartxref\n%d\n%%%%EOF\n"
            % (max_num + 1, trailer_extra, xref_off)
        )
    else:
        xr_num = max_num + 1
        xref_off = len(out)
        rows = bytearray()
        rows += (0).to_bytes(1, "big") + (0).to_bytes(4, "big") + (0xFFFF).to_bytes(2, "big")
        for num in range(1, max_num + 1):
            rows += (1).to_bytes(1, "big") + offsets.get(num, 0).to_bytes(4, "big") + (0).to_bytes(2, "big")
        rows += (1).to_bytes(1, "big") + xref_off.to_bytes(4, "big") + (0).to_bytes(2, "big")
        comp = zlib.compress(bytes(rows), 6)
        out += b"%d 0 obj\n" % xr_num
        out += (
            b"<< /Type /XRef /Size %d /W [1 4 2] /Root 1 0 R%s"
            b" /Filter /FlateDecode /Length %d >>\nstream\n%s\nendstream\nendobj\n"
            % (xr_num + 1, trailer_extra, len(comp), comp)
        )
        out += b"startxref\n%d\n%%%%EOF\n" % xref_off
    return bytes(out)


def _fmt(v: float) -> bytes:
    s = ("%.4f" % float(v)).rstrip("0").rstrip(".")
    return (s or "0").encode("ascii")


def build_pdf_text(pages: list[list[tuple[float, float, str]]], **kw) -> str:
    """Builder bridge returning bytes-as-text (latin-1)."""
    return build_pdf(pages, **kw).decode("latin-1")
