"""Standard MIDI files — core/midibin.py parse_midi / build_midi.

SMF 1.0 chunk walk (MMA RP-001 byte layout): MThd/MTrk framing, VLQ
delta times, running status, meta/sysex skip logic, and the six
text-class meta events Tika's MidiParser surfaces (the reference reaches
it through Tika, /root/reference/src/java-env.cpp:313-314)."""

import random

import pytest

from tika_wrap_spark.core.errors import ExtractError
from tika_wrap_spark.core.extract import extract_document
from tika_wrap_spark.core.midibin import (
    _varint,
    _vlq,
    build_midi,
    build_midi_text,
    midi_extract_text,
    parse_midi,
)
from tika_wrap_spark.core.sniff import KIND_MIDI, sniff_kind


def test_vlq_roundtrip_spec_vectors():
    # the published VLQ examples from the SMF spec
    vectors = {
        0x00: b"\x00",
        0x40: b"\x40",
        0x7F: b"\x7f",
        0x80: b"\x81\x00",
        0x2000: b"\xc0\x00",
        0x3FFF: b"\xff\x7f",
        0x4000: b"\x81\x80\x00",
        0x1FFFFF: b"\xff\xff\x7f",
        0x0FFFFFFF: b"\xff\xff\xff\x7f",
    }
    for v, enc in vectors.items():
        assert _vlq(v) == enc, v
        assert _varint(enc, 0) == (v, len(enc)), v
    with pytest.raises(ExtractError):
        _varint(b"\xff\xff\xff\xff\x7f", 0)  # 5-byte VLQ


def test_roundtrip_text_events():
    tracks = [
        [("track_name", "Piano"), ("lyric", "do"), ("lyric", "re")],
        [("copyright", "(c) 2026 nobody"), ("marker", "coda")],
        [("instrument", "oboe"), ("text", "free text")],
    ]
    p = parse_midi(build_midi(tracks))
    assert p["format"] == 1
    assert p["tracks"] == tracks


def test_format0_single_track():
    p = parse_midi(build_midi([[("lyric", "solo")]], division=96))
    assert p["format"] == 0 and p["division"] == 96
    assert p["tracks"] == [[("lyric", "solo")]]


def test_running_status_walked():
    """The builder emits note-offs via running status; a parser that
    mis-sizes them desynchronizes and trips the EOT/bounds checks."""
    tracks = [[("lyric", "x" * n)] for n in (1, 10, 200)]
    for notes in (0, 1, 7):
        p = parse_midi(build_midi(tracks, notes_per_track=notes))
        assert [len(t) for t in p["tracks"]] == [1, 1, 1]


def test_extract_text_blocks_and_meta():
    blocks, meta = midi_extract_text(
        build_midi([[("track_name", "Alpha"), ("lyric", "la")], []])
    )
    assert blocks == ["Alpha\nla"]  # empty track emits no block
    assert meta["midi_format"] == "1"
    assert meta["midi_tracks"] == "2"
    assert meta["midi_track_name"] == "Alpha"


def test_malformed_raise():
    good = build_midi([[("lyric", "ok")]])
    with pytest.raises(ExtractError):
        parse_midi(b"MThx" + good[4:])
    with pytest.raises(ExtractError):
        parse_midi(good[:10])  # truncated header
    with pytest.raises(ExtractError):
        parse_midi(good[:-5])  # track overrun
    bad_fmt = good[:9] + b"\x07" + good[10:]
    with pytest.raises(ExtractError):
        parse_midi(bad_fmt)
    # a track whose declared length cuts the final EOT meta
    with pytest.raises(ExtractError):
        parse_midi(good[: len(good) - 1])


def test_bitflip_fuzz_never_crashes_policy():
    """Seeded bit flips anywhere in the file: extraction must yield either
    a parse_ok row or a 'midi:'-prefixed error row, never an exception."""
    rng = random.Random(77)
    base = build_midi_text(
        [[("track_name", "Fuzz"), ("lyric", "aa bb cc"), ("marker", "m1")]]
    )
    for _ in range(300):
        i = rng.randrange(len(base))
        flipped = base[:i] + chr(ord(base[i]) ^ (1 << rng.randrange(8))) + base[i + 1 :]
        r = extract_document(
            [{"kind": "text", "text": flipped, "media_ref": "", "offset": 0}]
        )
        if not r["parse_ok"]:
            assert r["error"], r
    # intact file end-to-end
    r = extract_document([{"kind": "text", "text": base, "media_ref": "", "offset": 0}])
    assert r["parse_ok"] and r["meta"]["midi_track_name"] == "Fuzz"
    assert r["spans"][0]["text"] == "Fuzz\naa bb cc\nm1"


def test_sniff_guard():
    assert sniff_kind(build_midi_text([[("lyric", "x")]])) == KIND_MIDI
    assert sniff_kind("MThd is how midi files start") != KIND_MIDI
    assert sniff_kind("MThd") != KIND_MIDI  # no guard byte present
