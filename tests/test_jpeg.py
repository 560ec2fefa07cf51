"""Baseline JPEG decoder tests (functions/imagecodec.decode_jpeg).

Attestation: tests/jpeggen.py is an INDEPENDENT T.81 encoder (own
FDCT, own Huffman/table emission, zero shared code with the decoder)
— every stream the decoder sees here was produced by the other
implementation. With an all-ones quantization table the codec is
near-lossless, so round-trips assert tight pixel bounds (the only
error left is float DCT + color-transform rounding); a hand-built
single-block stream pins the DC path exactly."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jpeggen  # noqa: E402
from indexlab_spark.functions.imagecodec import (  # noqa: E402
    decode_jpeg,
    sniff_image,
)

Q1 = np.ones(64, dtype=np.int64)


def _maxerr(a, b):
    return int(np.abs(a.astype(int) - b.astype(int)).max())


class TestRoundTrip:
    def test_gray_constant_exact(self):
        img = np.full((16, 16), 130, dtype=np.uint8)
        out = decode_jpeg(jpeggen.encode_jpeg(img, qtable_luma=Q1))
        np.testing.assert_array_equal(out, img)

    def test_gray_random_near_lossless(self):
        img = np.random.default_rng(7).integers(
            0, 256, (24, 17), dtype=np.uint8
        )
        out = decode_jpeg(jpeggen.encode_jpeg(img, qtable_luma=Q1))
        assert out.shape == img.shape
        assert _maxerr(out, img) <= 1

    @pytest.mark.parametrize("subsample,bound", [("444", 2), ("420", 3)])
    def test_rgb_smooth(self, subsample, bound):
        xx, yy = np.meshgrid(np.arange(32), np.arange(20))
        img = np.stack(
            [(xx * 3 + yy) % 256, (xx + yy * 2) % 256, (xx * 2 + yy * 5) % 256],
            -1,
        ).astype(np.uint8)
        jb = jpeggen.encode_jpeg(
            img, qtable_luma=Q1, qtable_chroma=Q1, subsample=subsample
        )
        out = decode_jpeg(jb)
        assert out.shape == img.shape
        assert _maxerr(out, img) <= bound

    def test_odd_dimensions_and_restart(self):
        img = np.random.default_rng(3).integers(
            0, 256, (33, 41), dtype=np.uint8
        )
        jb = jpeggen.encode_jpeg(img, qtable_luma=Q1, restart_interval=3)
        assert b"\xff\xd0" in jb or b"\xff\xd1" in jb  # RSTn present
        assert _maxerr(decode_jpeg(jb), img) <= 1

    def test_standard_tables_smooth_image(self):
        # Annex K tables on a smooth gradient: lossy but close
        xx, yy = np.meshgrid(np.arange(48), np.arange(32))
        img = ((xx * 2 + yy * 3) % 200 + 20).astype(np.uint8)
        out = decode_jpeg(jpeggen.encode_jpeg(img))
        rmse = float(np.mean((out.astype(float) - img) ** 2)) ** 0.5
        assert out.shape == img.shape
        assert rmse < 20

    def test_420_chroma_really_subsampled(self):
        img = np.zeros((16, 16, 3), dtype=np.uint8)
        img[:, :8] = (255, 0, 0)
        img[:, 8:] = (0, 0, 255)
        jb420 = jpeggen.encode_jpeg(
            img, qtable_luma=Q1, qtable_chroma=Q1, subsample="420"
        )
        out = decode_jpeg(jb420)
        # block colors survive away from the chroma boundary
        assert _maxerr(out[:, :6], img[:, :6]) <= 4
        assert _maxerr(out[:, 10:], img[:, 10:]) <= 4


class TestHandVector:
    def test_single_block_dc_only(self):
        """Hand-assembled 8x8 gray JPEG: one DC coefficient, no AC.
        DC quantized value 16 with q=1 -> IDCT gives 16/8 = 2 above
        the +128 level shift everywhere: constant 130."""
        import struct

        out = bytearray(b"\xff\xd8")
        out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([1] * 64)
        out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 8, 1)
        out += bytes([1, 0x11, 0])
        # DC table: category 5 -> code '0' (1 bit); AC: EOB -> '0'
        out += b"\xff\xc4" + struct.pack(">HB", 20, 0x00)
        out += bytes([1] + [0] * 15) + bytes([5])
        out += b"\xff\xc4" + struct.pack(">HB", 20, 0x10)
        out += bytes([1] + [0] * 15) + bytes([0x00])
        out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0])
        out += b"\x00\x3f\x00"
        # entropy: DC code '0', 5 magnitude bits 10000 (=16), AC EOB '0'
        # bits: 0 10000 0 -> 0100 0000 padded with 1s -> 0x41? no:
        # 0,1,0,0,0,0,0 then pad 1 -> 0b01000001 = 0x41
        out += bytes([0b01000001])
        out += b"\xff\xd9"
        img = decode_jpeg(bytes(out))
        np.testing.assert_array_equal(
            img, np.full((8, 8), 130, dtype=np.uint8)
        )


class TestGatesAndDispatch:
    def test_arithmetic_raises_not_implemented(self):
        # SOF10 (0xCA, progressive + arithmetic coding) stays gated —
        # SOF2 Huffman progressive is REAL as of r16
        import struct

        jb = bytearray(b"\xff\xd8")
        jb += b"\xff\xca" + struct.pack(">HBHHB", 11, 8, 8, 8, 1)
        jb += bytes([1, 0x11, 0])
        with pytest.raises(NotImplementedError, match="Huffman"):
            decode_jpeg(bytes(jb))

    def test_malformed_raises_valueerror(self):
        with pytest.raises(ValueError):
            decode_jpeg(b"\xff\xd8\xff\xe0 jpeg-ish garbage")
        with pytest.raises(ValueError):
            decode_jpeg(b"not a jpeg at all")

    def test_sniff(self):
        assert sniff_image(b"\xff\xd8\xff\xe0") == "jpeg"

    def test_undefined_tables_are_valueerror(self):
        """A scan referencing an undefined Huffman/quant table is
        malformed input (ValueError), not an escaping KeyError."""
        import struct

        jb = bytearray(b"\xff\xd8")
        jb += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 8, 1)
        jb += bytes([1, 0x11, 0])  # quant table 0 never defined
        jb += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0])
        jb += b"\x00\x3f\x00"
        with pytest.raises(ValueError):
            decode_jpeg(bytes(jb))

    def test_zero_sampling_factor_is_valueerror(self):
        """A 0 sampling factor is malformed input (ValueError), not an
        escaping ZeroDivisionError."""
        import struct

        img = np.full((16, 16, 3), 90, dtype=np.uint8)
        jb = bytearray(jpeggen.encode_jpeg(img, Q1, Q1))
        i = jb.index(b"\xff\xc0")
        assert jb[i + 11] == 0x11
        jb[i + 11] = 0x01  # Y component: h=0, v=1
        with pytest.raises(ValueError):
            decode_jpeg(bytes(jb))

    def test_gray_sof_with_sampling_factors_decodes(self):
        """A grayscale SOF may legally declare sampling factors > 1;
        a single-component scan is non-interleaved so the factors are
        ignored and data units come in plain raster order (T.81
        A.2.2).  Patch the SOF hv byte of a normal gray stream — the
        entropy data IS raster-ordered 1x1 blocks, so the decode must
        be identical."""
        img = np.random.default_rng(5).integers(
            0, 256, (24, 24), dtype=np.uint8
        )
        jb = bytearray(jpeggen.encode_jpeg(img, qtable_luma=Q1))
        i = jb.index(b"\xff\xc0")
        assert jb[i + 11] == 0x11
        jb[i + 11] = 0x22  # declare 2x2 sampling on the only component
        out = decode_jpeg(bytes(jb))
        assert out.shape == img.shape
        assert _maxerr(out, img) <= 1

    def test_fill_ff_bytes_before_marker(self):
        """Runs of 0xFF before a marker are legal fill bytes (T.81
        B.1.1.2): FF FF DB must parse as one DQT, not marker 0xFF plus
        a bogus length."""
        img = np.random.default_rng(9).integers(
            0, 256, (16, 16), dtype=np.uint8
        )
        jb = bytearray(jpeggen.encode_jpeg(img, qtable_luma=Q1))
        i = jb.index(b"\xff\xdb")
        jb[i:i] = b"\xff\xff\xff"  # three fill bytes before DQT
        out = decode_jpeg(bytes(jb))
        assert _maxerr(out, img) <= 1

    def test_multimodal_dispatch_decodes_real_jpeg(self):
        from indexlab_spark.operators.multimodal import decode_image

        img = np.random.default_rng(1).integers(
            0, 256, (12, 12, 3), dtype=np.uint8
        )
        out = decode_image(jpeggen.encode_jpeg(img, Q1, Q1))
        assert out.shape == img.shape  # REAL decode, not the 8x8x3 fake
        assert _maxerr(out, img) <= 2

    def test_multimodal_fake_for_malformed(self):
        from indexlab_spark.operators.multimodal import decode_image

        fake = decode_image(b"\xff\xd8\xff\xe0 jpeg-ish garbage")
        assert fake.shape == (8, 8, 3)  # deterministic fake path kept

    def test_multimodal_fake_for_unsupported_profile(self):
        """Arithmetic-coded JPEG (SOF10): decode_jpeg raises the honest
        gate, but the pipeline dispatch maps it to the deterministic
        fake so a mixed corpus never crashes a batch (pre-r15
        contract)."""
        import struct

        from indexlab_spark.operators.multimodal import decode_image

        jb = bytearray(b"\xff\xd8")
        jb += b"\xff\xca" + struct.pack(">HBHHB", 11, 8, 8, 8, 1)
        jb += bytes([1, 0x11, 0])
        fake = decode_image(bytes(jb))
        assert fake.shape == (8, 8, 3)

    def test_multiscan_gate(self):
        """Non-interleaved multi-scan baseline: loud gate, not a
        KeyError."""
        import struct

        jb = bytearray(b"\xff\xd8")
        jb += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, 8, 8, 3)
        for ci in range(3):
            jb += bytes([ci + 1, 0x11, 0])
        jb += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0])
        jb += b"\x00\x3f\x00"
        with pytest.raises(NotImplementedError, match="multi-scan"):
            decode_jpeg(bytes(jb))


class TestProgressive:
    """SOF2 round trips against the independent Annex G emitter
    (jpeggen.encode_jpeg_progressive): spectral selection, successive
    approximation (DC raw-bit refinement + AC correction-bit
    refinement with EOB runs), interleaved DC / non-interleaved AC
    ordering, restarts, 4:2:0 padded-vs-true block grids."""

    def test_gray_spectral_selection_only(self):
        img = np.random.default_rng(3).integers(
            0, 256, (24, 17), dtype=np.uint8
        )
        jb = jpeggen.encode_jpeg_progressive(
            img, qtable_luma=Q1, point_transform=0
        )
        out = decode_jpeg(jb)
        assert out.shape == img.shape
        assert _maxerr(out, img) <= 1

    @pytest.mark.parametrize("pt", [1, 2, 3])
    def test_gray_successive_approximation(self, pt):
        img = np.random.default_rng(4 + pt).integers(
            0, 256, (80, 77), dtype=np.uint8
        )
        jb = jpeggen.encode_jpeg_progressive(
            img, qtable_luma=Q1, point_transform=pt,
            bands=((1, 2), (3, 10), (11, 40), (41, 63)),
        )
        assert _maxerr(decode_jpeg(jb), img) <= 1

    def test_rgb_444(self):
        img = np.random.default_rng(7).integers(
            0, 256, (20, 32, 3), dtype=np.uint8
        )
        jb = jpeggen.encode_jpeg_progressive(img, Q1, Q1, point_transform=1)
        out = decode_jpeg(jb)
        assert out.shape == img.shape
        assert _maxerr(out, img) <= 2

    def test_rgb_420_odd_dims_with_restarts(self):
        xx, yy = np.meshgrid(np.arange(35), np.arange(21))
        img = np.stack([(xx * 5 + yy) % 256] * 3, -1).astype(np.uint8)
        jb = jpeggen.encode_jpeg_progressive(
            img, Q1, Q1, subsample="420", point_transform=2,
            restart_interval=3,
        )
        out = decode_jpeg(jb)
        assert out.shape == img.shape
        assert _maxerr(out, img) <= 3

    def test_progressive_matches_baseline_annexk(self):
        """Same quant pipeline => identical coefficients => the
        progressive and baseline decodes must be BIT-IDENTICAL."""
        img = np.random.default_rng(11).integers(
            0, 256, (64, 56, 3), dtype=np.uint8
        )
        base = decode_jpeg(jpeggen.encode_jpeg(img))
        prog = decode_jpeg(jpeggen.encode_jpeg_progressive(img))
        np.testing.assert_array_equal(base, prog)

    def test_smooth_image_long_eob_runs(self):
        img = np.tile(np.arange(48, dtype=np.uint8), (40, 1))
        jb = jpeggen.encode_jpeg_progressive(
            img, qtable_luma=Q1, point_transform=1
        )
        np.testing.assert_array_equal(decode_jpeg(jb), img)

    def test_gray_sof2_with_sampling_factors(self):
        """nc==1 non-interleaved rule applies to progressive frames
        too: declared sampling factors > 1 are ignored."""
        img = np.random.default_rng(5).integers(
            0, 256, (24, 24), dtype=np.uint8
        )
        jb = bytearray(
            jpeggen.encode_jpeg_progressive(img, qtable_luma=Q1)
        )
        i = jb.index(b"\xff\xc2")
        assert jb[i + 11] == 0x11
        jb[i + 11] = 0x22
        assert _maxerr(decode_jpeg(bytes(jb)), img) <= 1

    def test_multimodal_dispatch_decodes_progressive(self):
        from indexlab_spark.operators.multimodal import decode_image

        img = np.random.default_rng(13).integers(
            0, 256, (16, 16, 3), dtype=np.uint8
        )
        out = decode_image(jpeggen.encode_jpeg_progressive(img, Q1, Q1))
        assert out.shape == img.shape  # REAL decode, not the 8x8x3 fake
        assert _maxerr(out, img) <= 2

    def test_truncated_progressive_is_valueerror(self):
        img = np.random.default_rng(17).integers(
            0, 256, (16, 16), dtype=np.uint8
        )
        jb = jpeggen.encode_jpeg_progressive(img, qtable_luma=Q1)
        with pytest.raises(ValueError):
            decode_jpeg(jb[: len(jb) // 3])
