"""GIF decoder tests (functions/imagecodec.decode_gif / gif_frames).

Attestation: tests/gifgen.py is an INDEPENDENT GIF/LZW encoder (own
dictionary management and bit packing, zero shared code with the
decoder) — every stream here was produced by the other implementation,
and GIF is lossless so round trips assert EXACT pixel equality. A
hand-assembled 2x2 stream pins the LZW bit layout (LSB-first packing,
clear/EOI codes, the encoder-at-2^w / decoder-at-2^w-1 width-growth
asymmetry) byte for byte."""

import os
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import gifgen  # noqa: E402
from indexlab_spark.functions.imagecodec import (  # noqa: E402
    decode_gif,
    gif_frames,
    sniff_image,
)

RNG = np.random.default_rng(1)
PAL8 = RNG.integers(0, 256, (8, 3), dtype=np.uint8)


class TestRoundTrip:
    def test_basic_global_palette(self):
        idx = RNG.integers(0, 8, (20, 30), dtype=np.uint8)
        gb = gifgen.build_gif(30, 20, [{"indices": idx}], global_palette=PAL8)
        np.testing.assert_array_equal(decode_gif(gb), PAL8[idx])

    @pytest.mark.parametrize("reset_on_full", [True, False])
    def test_256_colors_full_dictionary(self, reset_on_full):
        """Noisy 256-color image: code width grows to 12 bits and the
        dictionary fills — both the CLEAR-on-full and frozen-table
        ('deferred clear') encoder behaviors must decode."""
        pal = RNG.integers(0, 256, (256, 3), dtype=np.uint8)
        idx = RNG.integers(0, 256, (80, 100), dtype=np.uint8)
        gb = gifgen.build_gif(
            100, 80, [{"indices": idx}], global_palette=pal,
            reset_on_full=reset_on_full,
        )
        np.testing.assert_array_equal(decode_gif(gb), pal[idx])

    def test_interlaced(self):
        idx = RNG.integers(0, 8, (21, 30), dtype=np.uint8)
        gb = gifgen.build_gif(
            30, 21, [{"indices": idx, "interlace": True}],
            global_palette=PAL8,
        )
        np.testing.assert_array_equal(decode_gif(gb), PAL8[idx])

    def test_repetitive_and_solid(self):
        """Long LZW matches + the pure-KwKwK chain of a solid image."""
        rep = np.tile(np.arange(4, dtype=np.uint8), (16, 16))
        gb = gifgen.build_gif(
            64, 16, [{"indices": rep}], global_palette=PAL8[:4]
        )
        np.testing.assert_array_equal(decode_gif(gb), PAL8[:4][rep])
        solid = np.zeros((33, 47), np.uint8)
        gb2 = gifgen.build_gif(
            47, 33, [{"indices": solid}], global_palette=PAL8[:2]
        )
        np.testing.assert_array_equal(decode_gif(gb2), PAL8[:2][solid])

    def test_gif87a_version(self):
        idx = RNG.integers(0, 8, (8, 8), dtype=np.uint8)
        gb = gifgen.build_gif(
            8, 8, [{"indices": idx}], global_palette=PAL8,
            version=b"GIF87a",
        )
        np.testing.assert_array_equal(decode_gif(gb), PAL8[idx])


class TestAnimation:
    def test_frames_transparency_disposal(self):
        """Three frames: full background frame, an offset local-palette
        frame with disposal 2 (restore background), then a transparent
        overlay — compositing must match a viewer's canvas at each
        step."""
        lp = np.array(
            [[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], np.uint8
        )
        gpal = np.array([[10, 20, 30], [40, 50, 60]], np.uint8)
        frames = [
            {"indices": np.zeros((10, 10), np.uint8)},
            {"indices": np.full((4, 4), 1, np.uint8), "palette": lp,
             "left": 2, "top": 3, "disposal": 2},
            {"indices": np.array([[2, 3], [3, 2]], np.uint8),
             "palette": lp, "transparent": 3},
        ]
        gb = gifgen.build_gif(
            10, 10, frames, global_palette=gpal, bg_index=1
        )
        out = gif_frames(gb)
        assert len(out) == 3
        e0 = np.broadcast_to(gpal[0], (10, 10, 3)).copy()
        np.testing.assert_array_equal(out[0], e0)
        e1 = e0.copy()
        e1[3:7, 2:6] = lp[1]
        np.testing.assert_array_equal(out[1], e1)
        e2 = e1.copy()
        e2[3:7, 2:6] = gpal[1]       # disposal 2 restored the rect
        e2[0, 0] = lp[2]
        e2[1, 1] = lp[2]             # index 3 stayed transparent
        np.testing.assert_array_equal(out[2], e2)

    def test_disposal_previous(self):
        """Disposal 3: the canvas reverts to the pre-frame state."""
        gpal = np.array([[1, 2, 3], [200, 100, 50]], np.uint8)
        frames = [
            {"indices": np.zeros((6, 6), np.uint8)},
            {"indices": np.ones((3, 3), np.uint8), "left": 1, "top": 1,
             "disposal": 3},
            {"indices": np.ones((1, 1), np.uint8), "left": 5, "top": 5},
        ]
        gb = gifgen.build_gif(6, 6, frames, global_palette=gpal)
        out = gif_frames(gb)
        e2 = np.broadcast_to(gpal[0], (6, 6, 3)).copy()
        e2[5, 5] = gpal[1]           # frame 1's patch reverted
        np.testing.assert_array_equal(out[2], e2)

    def test_decode_gif_frame_selection(self):
        gpal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
        frames = [
            {"indices": np.zeros((4, 4), np.uint8)},
            {"indices": np.ones((4, 4), np.uint8)},
        ]
        gb = gifgen.build_gif(4, 4, frames, global_palette=gpal)
        np.testing.assert_array_equal(
            decode_gif(gb, frame=1),
            np.broadcast_to(gpal[1], (4, 4, 3)),
        )
        with pytest.raises(ValueError, match="frames"):
            decode_gif(gb, frame=5)


class TestHandVector:
    def test_two_by_two_bit_exact(self):
        """Hand-assembled 2x2 GIF, pixels [0,1,2,3], min code size 2:
        codes CLEAR(3b) 0(3b) 1(3b) 2(4b) 3(4b) EOI(4b) — the width
        bump to 4 bits happens exactly at the third data code (encoder
        table hits 8 entries after adding E7), LSB-first packed to
        bytes 44 64 0A."""
        pal = bytes([10, 0, 0, 0, 20, 0, 0, 0, 30, 0, 0, 0])  # 4 RGB
        gb = bytearray(b"GIF89a")
        gb += struct.pack("<HHBBB", 2, 2, 0x81, 0, 0)  # GCT, 4 colors
        gb += pal
        gb += bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
        gb += bytes([2])                    # LZW min code size
        gb += bytes([3, 0x44, 0x64, 0x0A])  # one 3-byte sub-block
        gb += bytes([0, 0x3B])
        out = decode_gif(bytes(gb))
        exp = np.frombuffer(pal, np.uint8).reshape(4, 3)[
            np.array([[0, 1], [2, 3]])
        ]
        np.testing.assert_array_equal(out, exp)


class TestGatesAndDispatch:
    def test_sniff(self):
        assert sniff_image(b"GIF89a\x01") == "gif"
        assert sniff_image(b"GIF87a\x01") == "gif"
        assert sniff_image(b"GIF88a\x01") is None

    @pytest.mark.parametrize("bad", [
        b"nope", b"GIF89a", b"GIF89a" + b"\x00" * 7,
    ])
    def test_malformed_is_valueerror(self, bad):
        with pytest.raises(ValueError):
            decode_gif(bad)

    def test_truncated_stream_is_valueerror(self):
        idx = RNG.integers(0, 8, (16, 16), dtype=np.uint8)
        gb = gifgen.build_gif(16, 16, [{"indices": idx}],
                              global_palette=PAL8)
        for cut in (20, 40, len(gb) - 10):
            with pytest.raises(ValueError):
                decode_gif(gb[:cut])

    def test_multimodal_dispatch(self):
        from indexlab_spark.operators.multimodal import decode_image

        idx = RNG.integers(0, 8, (12, 12), dtype=np.uint8)
        gb = gifgen.build_gif(12, 12, [{"indices": idx}],
                              global_palette=PAL8)
        out = decode_image(gb)
        np.testing.assert_array_equal(out, PAL8[idx])  # REAL decode
        fake = decode_image(b"GIF89a truncated!")
        assert fake.shape == (8, 8, 3)  # malformed -> deterministic fake
