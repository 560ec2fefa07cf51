"""Pure-stdlib PNG/BMP codec tests — round-trips exercise every PNG
filter branch (the encoder applies the exact inverse of the decoder's
unfilter), plus BMP row order / padding / BGR conversion and the
decode_image dispatch (real decode for PNG/BMP, deterministic fake for
unknown formats). No Spark session needed."""

import numpy as np
import pytest

from indexlab_spark.functions.imagecodec import (
    decode_bmp,
    decode_png,
    encode_bmp,
    encode_png,
    sniff_image,
)


def _img(h, w, ch, seed=0):
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_roundtrip_all_filters_and_channels(filter_type, ch):
    img = _img(13, 7, ch, seed=filter_type * 10 + ch)
    data = encode_png(img, filter_type=filter_type)
    assert sniff_image(data) == "png"
    out = decode_png(data)
    np.testing.assert_array_equal(out, img)


def test_png_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    # bit depth 16 -> ValueError (caller falls back to the fake)
    img = _img(4, 4, 3)
    data = bytearray(encode_png(img))
    data[24] = 16  # IHDR bit-depth byte
    with pytest.raises(ValueError):
        decode_png(bytes(data))


def test_bmp_roundtrip_and_padding():
    # w=3 -> row 9 bytes, padded to 12: exercises the 4-byte padding
    img = _img(5, 3, 3, seed=7)
    data = encode_bmp(img)
    assert sniff_image(data) == "bmp"
    np.testing.assert_array_equal(decode_bmp(data), img)


def test_bmp_top_down_variant():
    img = _img(4, 4, 3, seed=9)
    data = bytearray(encode_bmp(img))
    # flip height sign to top-down and reverse the stored row order
    import struct

    (h,) = struct.unpack("<i", bytes(data[22:26]))
    data[22:26] = struct.pack("<i", -h)
    row = (4 * 3 + 3) & ~3
    px = 54
    rows = [bytes(data[px + i * row:px + (i + 1) * row]) for i in range(4)]
    data[px:px + 4 * row] = b"".join(reversed(rows))
    np.testing.assert_array_equal(decode_bmp(bytes(data)), img)


def test_decode_image_dispatch_real_and_fake():
    from indexlab_spark.operators.multimodal import decode_image

    img = _img(6, 6, 3, seed=3)
    # real PNG path: exact pixels back
    np.testing.assert_array_equal(decode_image(encode_png(img)), img)
    # real BMP path
    np.testing.assert_array_equal(decode_image(encode_bmp(img)), img)
    # unknown format -> deterministic fake (stable across calls)
    fake1 = decode_image(b"\xff\xd8\xff\xe0 jpeg-ish garbage")
    fake2 = decode_image(b"\xff\xd8\xff\xe0 jpeg-ish garbage")
    np.testing.assert_array_equal(fake1, fake2)
    assert fake1.shape == (8, 8, 3)


def test_feature_extraction_over_real_png_is_stable():
    """with_image_features' kernel over a REAL decoded PNG: identical
    pixels -> identical features; different pixels -> different."""
    from indexlab_spark.operators.multimodal import _features_from_bytes

    a = encode_png(_img(8, 8, 3, seed=1))
    b = encode_png(_img(8, 8, 3, seed=2))
    fa1, fa2, fb = (
        _features_from_bytes(a),
        _features_from_bytes(a),
        _features_from_bytes(b),
    )
    np.testing.assert_array_equal(fa1, fa2)
    assert not np.array_equal(fa1, fb)
    assert abs(float(np.linalg.norm(fa1)) - 1.0) < 1e-6


# ---------------------------------------------------------------- hypothesis
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False

if HAVE_HYP:

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 24),
        w=st.integers(1, 24),
        ch=st.sampled_from([1, 2, 3, 4]),
        ftype=st.integers(0, 4),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_png_roundtrip_property(h, w, ch, ftype, seed):
        """ANY shape x channels x filter x content round-trips exactly."""
        img = _img(h, w, ch, seed=seed)
        np.testing.assert_array_equal(
            decode_png(encode_png(img, filter_type=ftype)), img
        )

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 24), w=st.integers(1, 24),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_bmp_roundtrip_property(h, w, seed):
        """ANY (h, w) incl. every row-padding residue round-trips."""
        img = _img(h, w, 3, seed=seed)
        np.testing.assert_array_equal(decode_bmp(encode_bmp(img)), img)


def test_png_palette_decode():
    """Color type 3 (palette) resolves indices through PLTE to RGB —
    hand-crafted PNG, filter 0."""
    import struct
    import zlib as _zlib

    from indexlab_spark.functions.imagecodec import PNG_SIG

    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (7, 8, 9)]
    idx = np.array([[0, 1, 2], [3, 2, 1]], dtype=np.uint8)  # 2x3
    h, w = idx.shape

    def chunk(ctype, body):
        crc = _zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    plte = b"".join(bytes(c) for c in palette)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    data = (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", _zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = decode_png(data)
    assert out.shape == (2, 3, 3)
    expect = np.array([[palette[i] for i in row] for row in idx], dtype=np.uint8)
    np.testing.assert_array_equal(out, expect)


def test_multimodal_oracle_sql_matches_real_codec_pipeline():
    """The r12 multimodal_pipeline oracle (_multimodal_sql — SHA-256
    from first principles in SQL) cross-engine against the REAL
    operator pieces on synthetic embeddings: quantize -> encode_png ->
    decode_image -> _features_from_bytes -> cosine pairs. This is the
    full-strength check of the oracle's honesty argument: the SQL
    never touches a PNG, so equality holds exactly BECAUSE the codec
    roundtrip is lossless — a corruption on either side breaks it."""
    import sys

    import duckdb
    import numpy as np

    sys.path.insert(0, ".")
    import __spark_entry__ as entry_mod
    from indexlab_spark.functions.imagecodec import encode_png
    from indexlab_spark.operators.multimodal import _features_from_bytes

    rng = np.random.default_rng(11)
    n, dim = 40, 64
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    # a constant vector exercises the scale == 0 -> 1.0 branch
    vecs[7] = 0.25

    feats = {}
    for i in range(n):
        x = vecs[i].astype(np.float64)
        lo, hi = x.min(), x.max()
        scale = (hi - lo) or 1.0
        px = np.clip(
            np.rint((x - lo) / scale * 255), 0, 255
        ).astype(np.uint8).reshape(8, 8)
        feats[i] = _features_from_bytes(encode_png(px)).astype(np.float64)
    for i in range(0, n, 10):
        feats[i + 100000] = feats[i]
    ids = sorted(feats)
    ref = {}
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            na = float(np.sqrt(np.dot(feats[a], feats[a])))
            nb = float(np.sqrt(np.dot(feats[b], feats[b])))
            cos = (
                float(np.dot(feats[a], feats[b])) / (na * nb)
                if na > 0 and nb > 0 else 0.0
            )
            cos = round(cos, 6)
            if cos >= 0.999:
                ref[(a, b)] = cos
    assert len(ref) >= 4  # the planted duplicates

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings(vec_id BIGINT, embedding DOUBLE[])"
    )
    con.executemany(
        "INSERT INTO embeddings VALUES (?,?)",
        [(i, [float(v) for v in vecs[i]]) for i in range(n)],
    )
    got = {
        (r[0], r[1]): r[2]
        for r in con.execute(
            entry_mod._multimodal_sql(dim=dim, threshold=0.999)
        ).fetchall()
    }
    assert got == ref
