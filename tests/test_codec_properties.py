"""Property-based round-trip nets for the round-15/16 codecs (CHM/LZX,
baseline + progressive JPEG, GIF) — hypothesis drives the independent test-side writers
(tests/chmgen.py, tests/jpeggen.py) with randomized inputs so the
hand-picked vectors in test_chm.py / test_jpeg.py are backed by a
search over member layouts, pixel content, dimensions and token mixes."""

import os
import sys

import numpy as np
from hypothesis import given, settings, strategies as st

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import chmgen  # noqa: E402
import jpeggen  # noqa: E402
from indexlab_spark.functions.imagecodec import decode_jpeg  # noqa: E402
from indexlab_spark.sources.chm import extract_chm, lzx_decompress  # noqa: E402


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=0, max_size=5000))
def test_lzx_literal_stream_roundtrip(data):
    if not data:
        return
    comp = chmgen.lzx_compress_literals(data)
    assert lzx_decompress(comp, len(data), 16) == data


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.integers(0, 255),
            st.tuples(st.integers(2, 257), st.sampled_from(["R0"])),
        ),
        min_size=1,
        max_size=200,
    )
)
def test_lzx_token_stream_roundtrip(tokens):
    # make the stream well-formed: force a literal first so R0=1
    # matches always have a window byte to copy
    tokens = [65] + tokens
    expect = bytearray()
    for tok in tokens:
        if isinstance(tok, int):
            expect.append(tok)
        else:
            ln, _ = tok
            start = len(expect) - 1  # R0 == 1
            for i in range(ln):
                expect.append(expect[start + i])
    comp = chmgen.lzx_encode_tokens(tokens, len(expect))
    assert lzx_decompress(comp, len(expect), 16) == bytes(expect)


@settings(max_examples=15, deadline=None)
@given(
    st.dictionaries(
        st.from_regex(r"[a-z]{1,8}\.(htm|html|css|txt)", fullmatch=True),
        st.binary(min_size=0, max_size=2000),
        min_size=1,
        max_size=8,
    ),
    st.booleans(),
)
def test_chm_container_roundtrip(members, compress):
    blob = chmgen.build_chm(members, compress=compress)
    assert dict(extract_chm(blob)) == members


@settings(max_examples=12, deadline=None)
@given(
    st.integers(8, 40),
    st.integers(8, 40),
    st.integers(0, 2**32 - 1),
    st.booleans(),
)
def test_jpeg_gray_near_lossless_roundtrip(h, w, seed, use_restart):
    img = np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)
    q1 = np.ones(64, dtype=np.int64)
    jb = jpeggen.encode_jpeg(
        img, qtable_luma=q1, restart_interval=2 if use_restart else 0
    )
    out = decode_jpeg(jb)
    assert out.shape == img.shape
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1


@settings(max_examples=8, deadline=None)
@given(
    st.integers(8, 32),
    st.integers(8, 32),
    st.integers(0, 2**32 - 1),
    st.sampled_from(["444", "420"]),
)
def test_jpeg_rgb_roundtrip(h, w, seed, subsample):
    rng = np.random.default_rng(seed)
    # smooth image: random low-frequency gradient kept strictly below
    # 256 (a mod-256 wrap would create a sharp edge that 4:2:0 chroma
    # subsampling legitimately cannot round-trip)
    gx = rng.integers(0, 3, 3)
    gy = rng.integers(0, 3, 3)
    base = rng.integers(30, 120, 3)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [base[c] + gx[c] * xx + gy[c] * yy for c in range(3)], -1
    ).astype(np.uint8)
    assert img.max() < 256 - 0  # 119 + 2*31 + 2*31 = 243, no wrap
    q1 = np.ones(64, dtype=np.int64)
    jb = jpeggen.encode_jpeg(
        img, qtable_luma=q1, qtable_chroma=q1, subsample=subsample
    )
    out = decode_jpeg(jb)
    assert out.shape == img.shape
    bound = 2 if subsample == "444" else 6
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= bound


@settings(max_examples=12, deadline=None)
@given(
    st.integers(1, 60),
    st.integers(1, 60),
    st.integers(2, 256),
    st.integers(0, 2**32 - 1),
    st.booleans(),
    st.booleans(),
)
def test_gif_lossless_roundtrip(h, w, ncolors, seed, interlace, reset_on_full):
    import gifgen
    from indexlab_spark.functions.imagecodec import decode_gif

    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    idx = rng.integers(0, ncolors, (h, w), dtype=np.uint8)
    gb = gifgen.build_gif(
        w, h, [{"indices": idx, "interlace": interlace}],
        global_palette=pal, reset_on_full=reset_on_full,
    )
    out = decode_gif(gb)
    np.testing.assert_array_equal(out, pal[idx])


@settings(max_examples=10, deadline=None)
@given(
    st.integers(0, 2**32 - 1),
    st.integers(1, 4),
)
def test_gif_progressive_jpeg_cross(seed, pt):
    """Progressive JPEG property net: random gray image, random point
    transform — decode must stay within 1 of the all-ones-quant
    original (the codec is near-lossless at q=1)."""
    import jpeggen
    from indexlab_spark.functions.imagecodec import decode_jpeg

    rng = np.random.default_rng(seed)
    h, w = int(rng.integers(8, 40)), int(rng.integers(8, 40))
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    jb = jpeggen.encode_jpeg_progressive(
        img, qtable_luma=np.ones(64, dtype=np.int64), point_transform=pt
    )
    out = decode_jpeg(jb)
    assert out.shape == img.shape
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1
