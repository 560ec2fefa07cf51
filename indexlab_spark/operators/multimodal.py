"""Multimodal column plumbing (SURVEY §7.1 M7 / task mandate).

Images/audio/video are opaque ``binary`` columns with typed metadata,
scanned via Spark's ``binaryFile`` source and processed with
Arrow-batched ``mapInPandas`` UDFs. Image decode is REAL for PNG and
24bpp BMP via the pure-stdlib codecs in functions/imagecodec (round 6;
no PIL needed); JPEG/video kernels remain gated (PIL / ffmpeg absent —
NotImplementedError or a deterministic fake used by tests). The
Spark-side plumbing — schema, partitioning, UDF signatures, batch
shapes — is real throughout and is what matters at 100 TB:

- assets are one row per object; content stays in executor memory one
  Arrow batch at a time, never on the driver.
- feature extraction emits fixed-dim ``array<float>`` compatible with
  operators/knn + operators/dedup.embedding_dup_pairs, so image dedup /
  similarity search compose with the text machinery unchanged.
- ``spark.sql.files.maxPartitionBytes`` governs how many assets land in
  a partition; for very large objects switch the source to a manifest
  table of (uri, byte_range) and fetch inside the UDF instead.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_DIM = 64


def read_binary_assets(
    spark: SparkSession, path: str, modality: str, glob: str = "*"
) -> DataFrame:
    """binaryFile scan -> asset rows (S5's pattern generalized)."""
    bin_df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", True)
        .load(path)
    )
    return bin_df.select(
        F.col("path").alias("asset_id"),
        F.lit(modality).alias("modality"),
        F.col("content"),
        F.create_map(
            F.lit("length"), F.col("length").cast("string"),
            F.lit("modificationTime"), F.col("modificationTime").cast("string"),
        ).alias("meta"),
    )


def decode_image(content: bytes) -> np.ndarray:
    """Decode an image column value to a uint8 numpy array.

    Decode order:
    1. PIL, when installed (any format) — import-gated, absent here.
    2. The pure-stdlib codecs in functions/imagecodec — REAL decoding
       for PNG (depth 8, gray/GA/RGB/RGBA, non-interlaced) and 24bpp
       BMP; no third-party dependency.
    3. Unknown formats (JPEG etc. — a DCT codec is out of stdlib
       scope): a deterministic seeded 8x8x3 fake keeps the downstream
       plumbing (resize/feature/dedup) testable with stable outputs.
    """
    try:
        from PIL import Image  # type: ignore
        import io

        return np.asarray(Image.open(io.BytesIO(content)))  # pragma: no cover
    except ImportError:
        pass
    if content is None:
        raise NotImplementedError("no content and no decoder installed")
    from indexlab_spark.functions.imagecodec import (
        decode_bmp,
        decode_png,
        sniff_image,
    )

    kind = sniff_image(content)
    try:
        if kind == "png":
            return decode_png(content)
        if kind == "bmp":
            return decode_bmp(content)
    except ValueError:
        pass  # malformed/unsupported variant -> deterministic fake
    seed = zlib.crc32(content)
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


def _features_from_bytes(content: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic feature vector from the (fake-)decoded image:
    histogram of pixel bytes hashed into ``dim`` buckets, L2-normalized.
    Same contract a real CNN/CLIP embedding UDF would satisfy."""
    img = decode_image(content)
    flat = img.reshape(-1)
    out = np.zeros(dim, dtype=np.float64)
    h = hashlib.sha256(flat.tobytes()).digest()
    for i in range(0, len(h) - 1, 2):
        out[h[i] % dim] += (h[i + 1] % 16) - 7.5
    n = np.linalg.norm(out)
    return (out / n if n > 0 else out).astype(np.float32)


def with_image_features(
    assets: DataFrame, content_col: str = "content", out_col: str = "embedding"
) -> DataFrame:
    """mapInPandas feature extraction: (asset rows) -> + array<float>.

    Batch shape: the UDF sees whole Arrow batches; per-batch numpy work,
    no per-row Python in the scheduler's view.
    """
    fields = [f"{f.name} {f.dataType.simpleString()}" for f in assets.schema.fields
              if f.name != content_col]
    out_schema = ", ".join(fields + [f"{out_col} array<float>"])
    cols = [f.name for f in assets.schema.fields if f.name != content_col]

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _features_from_bytes(c) if c is not None else None
                for c in pdf[content_col]
            ]
            out = pdf[cols].copy()
            out[out_col] = feats
            yield out

    return assets.mapInPandas(_extract, out_schema)


def resize_images(
    assets: DataFrame, width: int, height: int, content_col: str = "content"
) -> DataFrame:
    """Resize plumbing: decode -> resize -> re-encode, as mapInPandas.
    Nearest-neighbor resampling over the decoded array (real pixels for
    PNG/BMP via functions/imagecodec; the deterministic fake otherwise);
    output is raw pixel bytes — swap the kernel for PIL's resampling
    filters when installed."""
    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for c in pdf[content_col]:
                if c is None:
                    out_rows.append(None)
                    continue
                img = decode_image(c)
                ys = (np.arange(height) * img.shape[0] // height).clip(0, img.shape[0] - 1)
                xs = (np.arange(width) * img.shape[1] // width).clip(0, img.shape[1] - 1)
                out_rows.append(img[np.ix_(ys, xs)].tobytes())
            pdf = pdf.copy()
            pdf[content_col] = out_rows
            yield pdf

    return assets.mapInPandas(_resize, assets.schema)


def sample_video_frames(*_args, **_kwargs):
    """STUB — frame sampling needs ffmpeg/opencv (not installed). The
    scale design: mapInPandas over (uri, frame_index) manifest rows,
    fetching byte ranges per frame, emitting one asset row per frame."""
    raise NotImplementedError(
        "video frame sampling requires ffmpeg/opencv; not installed in "
        "this container"
    )
