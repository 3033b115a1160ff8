"""Progressive JPEG codec (core/jpegbin.py, VERDICT r4 #6): SOF2 spectral
selection + successive approximation must decode to EXACTLY the pixels of
a baseline encode of the same image — both forms quantize through the same
Annex-K tables, so the coefficient stores are identical and the IDCT path
is shared. Also pins restart-interval resync (DRI/RSTn with DC-predictor
resets) and the malformed/stub contracts."""

from __future__ import annotations

import random

from tika_wrap_spark.core.jpegbin import build_jpeg_pixels, jpeg_pixels
from tika_wrap_spark.core.media import build_jpeg


def _gradient(w: int, h: int, seed: int) -> bytes:
    rng = random.Random(seed)
    base = rng.randrange(64)
    out = bytearray(w * h * 3)
    for y in range(h):
        for x in range(w):
            p = (y * w + x) * 3
            out[p] = (base + 3 * x + y) % 256
            out[p + 1] = (base + x + 5 * y) % 256
            out[p + 2] = (base + 2 * x + 2 * y) % 256
    return bytes(out)


def _noise(w: int, h: int, seed: int) -> bytes:
    rng = random.Random(seed)
    return bytes(rng.randrange(256) for _ in range(w * h * 3))


class TestProgressiveRoundtrip:
    def test_progressive_equals_baseline_gradients(self):
        for w, h, seed in [(8, 8, 1), (16, 16, 2), (24, 16, 3), (40, 24, 4)]:
            rgb = _gradient(w, h, seed)
            db = jpeg_pixels(build_jpeg_pixels(w, h, rgb))
            dp = jpeg_pixels(build_jpeg_pixels(w, h, rgb, progressive=True))
            assert db is not None and dp is not None
            assert db == dp, (w, h, seed)

    def test_progressive_equals_baseline_noise(self):
        # noise maximizes AC activity: every band scan, ZRL runs, and
        # refinement correction bits carry real payload
        for w, h, seed in [(13, 9, 7), (17, 31, 8), (32, 32, 9)]:
            rgb = _noise(w, h, seed)
            db = jpeg_pixels(build_jpeg_pixels(w, h, rgb))
            dp = jpeg_pixels(build_jpeg_pixels(w, h, rgb, progressive=True))
            assert db == dp, (w, h, seed)

    def test_flat_image_exercises_eob_runs(self):
        # a flat image's AC bands are empty: every block is a pure EOB in
        # the first scans and pure EOB-run handling in the refinements
        rgb = bytes([120, 64, 200]) * (24 * 24)
        db = jpeg_pixels(build_jpeg_pixels(24, 24, rgb))
        dp = jpeg_pixels(build_jpeg_pixels(24, 24, rgb, progressive=True))
        assert db == dp

    def test_sof2_marker_present(self):
        prog = build_jpeg_pixels(16, 8, _gradient(16, 8, 5), progressive=True)
        base = build_jpeg_pixels(16, 8, _gradient(16, 8, 5))
        assert b"\xff\xc2" in prog and b"\xff\xc2" not in base
        assert prog.count(b"\xff\xda") == 10  # the 10-scan script
        assert base.count(b"\xff\xda") == 1

    def test_decode_is_deterministic(self):
        rgb = _noise(20, 12, 11)
        enc = build_jpeg_pixels(20, 12, rgb, progressive=True)
        assert jpeg_pixels(enc) == jpeg_pixels(enc)


class TestRestartIntervals:
    def test_baseline_restart_equals_plain(self):
        rgb = _gradient(48, 24, 6)  # 18 MCUs
        plain = jpeg_pixels(build_jpeg_pixels(48, 24, rgb))
        for ri in (1, 2, 5):
            with_rst = build_jpeg_pixels(48, 24, rgb, restart_interval=ri)
            assert b"\xff\xdd" in with_rst  # DRI segment
            assert jpeg_pixels(with_rst) == plain, ri

    def test_rst_marker_cycle(self):
        # 18 MCUs at interval 2 -> 8 restarts cycling RST0..RST7
        enc = build_jpeg_pixels(48, 24, _gradient(48, 24, 6), restart_interval=2)
        body = enc[enc.index(b"\xff\xda") :]
        seen = [body[i + 1] - 0xD0 for i in range(len(body) - 1)
                if body[i] == 0xFF and 0xD0 <= body[i + 1] <= 0xD7]
        assert seen == [i % 8 for i in range(len(seen))] and len(seen) == 8


class TestMalformedContracts:
    def test_header_only_sof2_is_stub(self):
        # build_jpeg(progressive=True) carries SOF2 but no SOS: no scans
        # -> None (the multimodal stub path pin)
        assert jpeg_pixels(build_jpeg(64, 32, progressive=True)) is None

    def test_truncated_progressive_is_none(self):
        enc = build_jpeg_pixels(24, 24, _noise(24, 24, 13), progressive=True)
        # cut inside the later scans: strict decode refuses
        assert jpeg_pixels(enc[: len(enc) * 2 // 3]) is None

    def test_arithmetic_sof_is_none(self):
        enc = bytearray(build_jpeg_pixels(8, 8, _noise(8, 8, 14)))
        enc[enc.index(b"\xff\xc0") + 1] = 0xC9  # SOF9: arithmetic sequential
        assert jpeg_pixels(bytes(enc)) is None

    def test_garbage_is_none(self):
        assert jpeg_pixels(b"\xff\xd8\xff\xd9") is None
        assert jpeg_pixels(b"not a jpeg at all") is None
