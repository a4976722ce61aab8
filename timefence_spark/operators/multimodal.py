"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

Design for 100 TB media pipelines:

* Media travel as ``binary`` columns next to a typed metadata struct —
  never decoded until a stage needs pixels/samples.
* Decode / resize / feature-extract / frame-sample run as Arrow-batched
  ``mapInPandas`` stages (one Python worker per partition, zero-copy
  batches), NOT row-at-a-time UDFs.
* Heavyweight codec calls are injection points (no PIL/ffmpeg in this
  container): ``decode_fn=None`` uses a deterministic fake decoder that
  derives stable pseudo-metadata from the bytes, keeping every Spark-side
  contract (schema, batch shape, partitioning) real and testable. Pass a
  real ``decode_fn(bytes) -> dict`` to swap in PIL/ffmpeg in production —
  or use :mod:`timefence_spark.operators.codecs`, dependency-free
  numpy/stdlib codecs (Netpbm PPM, zlib-compressed PNG, PCM WAV) whose
  ``*_decode_info`` / ``*_resize`` / ``*_channel_stats`` functions plug
  straight into these operators, so REAL uncompressed AND compressed
  formats run through the whole pipeline even here.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_size", T.LongType()),
        T.StructField("content_sha", T.StringType()),
    ]
)

IMAGE_INFO_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)


def attach_media_metadata(
    df: DataFrame, *, binary_col: str, media_type: str
) -> DataFrame:
    """Add the typed metadata struct next to a binary column — pure
    expressions (sha2/length run JVM-side, no decode)."""
    return df.withColumn(
        f"{binary_col}_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.length(F.col(binary_col)).cast("long").alias("byte_size"),
            F.sha2(F.col(binary_col), 256).alias("content_sha"),
        ),
    )


def _fake_decode(data: bytes) -> dict:
    """Deterministic stand-in for an image decoder: stable pseudo-dimensions
    derived from a content hash. Replace with PIL in production."""
    h = hashlib.sha256(data or b"").digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "channels": 3,
        "format": "fake",
    }


def decode_images(
    df: DataFrame,
    *,
    id_col: str,
    binary_col: str,
    decode_fn: Callable[[bytes], dict] | None = None,
) -> DataFrame:
    """Decode image metadata via Arrow-batched mapInPandas.

    Output: (id, width, height, channels, format). Partitioning is preserved;
    each partition's rows stream through Python in Arrow batches."""
    import pandas as pd

    fn = decode_fn or _fake_decode
    out_schema = T.StructType(
        [df.schema[id_col], *IMAGE_INFO_SCHEMA.fields]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            infos = [fn(b if b is not None else b"") for b in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "width": [i["width"] for i in infos],
                    "height": [i["height"] for i in infos],
                    "channels": [i["channels"] for i in infos],
                    "format": [i["format"] for i in infos],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(batches, out_schema)


AUDIO_INFO_SCHEMA = T.StructType(
    [
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)


def _fake_audio_decode(data: bytes) -> dict:
    """Deterministic stand-in audio decoder (content-hash-derived
    pseudo-metadata). Use codecs.wav_decode_info for real PCM WAV."""
    h = hashlib.sha256(data or b"").digest()
    return {
        "sample_rate": (8000, 16000, 44100)[h[0] % 3],
        "n_samples": 1000 + int.from_bytes(h[1:3], "big"),
        "channels": 1 + h[3] % 2,
        "format": "fake",
    }


def decode_audio(
    df: DataFrame,
    *,
    id_col: str,
    binary_col: str,
    decode_fn: Callable[[bytes], dict] | None = None,
) -> DataFrame:
    """Decode audio metadata via Arrow-batched mapInPandas.

    Output: (id, sample_rate, n_samples, channels, format) — duration is
    ``n_samples / sample_rate`` downstream. Same batching contract as
    :func:`decode_images`; ``decode_fn=None`` uses the deterministic
    fake, ``codecs.wav_decode_info`` decodes real PCM WAV with numpy
    alone, and a soundfile/ffmpeg-backed function slots in the same way
    in production."""
    import pandas as pd

    fn = decode_fn or _fake_audio_decode
    out_schema = T.StructType([df.schema[id_col], *AUDIO_INFO_SCHEMA.fields])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            infos = [fn(b if b is not None else b"") for b in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "sample_rate": [i["sample_rate"] for i in infos],
                    "n_samples": [i["n_samples"] for i in infos],
                    "channels": [i["channels"] for i in infos],
                    "format": [i["format"] for i in infos],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(batches, out_schema)


def resize_images(
    df: DataFrame,
    *,
    id_col: str,
    binary_col: str,
    width: int,
    height: int,
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize stage: binary in -> binary out, Arrow-batched.

    The stub 'resize' is a deterministic re-hash of (bytes, w, h) — real
    pipelines pass a PIL/libvips ``resize_fn``."""
    import pandas as pd

    def _stub(data: bytes, w: int, h: int) -> bytes:
        raise NotImplementedError(
            "No image codec in this environment. Pass resize_fn=... "
            "(e.g. PIL-based) to resize_images()."
        )

    fn = resize_fn
    out_schema = T.StructType(
        [df.schema[id_col], T.StructField("resized", T.BinaryType())]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = [
                (fn or _stub)(b if b is not None else b"", width, height)
                for b in pdf[binary_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col].values, "resized": resized})

    return df.select(id_col, binary_col).mapInPandas(batches, out_schema)


def sample_frames(
    df: DataFrame,
    *,
    id_col: str,
    binary_col: str,
    every_n: int = 10,
    extract_fn: Callable[[bytes, int], list[bytes]] | None = None,
) -> DataFrame:
    """Frame-sampling stage for video: one input row -> N frame rows
    (mapInPandas fan-out). The stub emits deterministic pseudo-frames
    (sliced content hashes) so the explode shape is real."""
    import pandas as pd

    def _stub(data: bytes, n: int) -> list[bytes]:
        h = hashlib.sha256(data or b"").digest()
        count = 1 + h[2] % 4
        return [hashlib.sha256(h + bytes([i])).digest() for i in range(count)]

    fn = extract_fn or _stub
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for rid, b in zip(pdf[id_col], pdf[binary_col]):
                for i, fr in enumerate(fn(b if b is not None else b"", every_n)):
                    ids.append(rid)
                    idxs.append(i)
                    frames.append(fr)
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, binary_col).mapInPandas(batches, out_schema)


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("std_rgb", T.DoubleType()),
    ]
)


def image_channel_stats(
    df: DataFrame,
    *,
    id_col: str,
    binary_col: str,
    stats_fn: Callable[[bytes], dict] | None = None,
) -> DataFrame:
    """Feature-extraction stage with real pixels: per-channel means +
    global std per image, Arrow-batched through mapInPandas.

    Output: (id, mean_r, mean_g, mean_b, std_rgb). ``stats_fn(bytes) ->
    {'mean_r','mean_g','mean_b','std'}`` is the codec injection point —
    :func:`codecs.ppm_channel_stats` and :func:`codecs.png_channel_stats`
    plug in directly; there is no fake fallback because channel stats
    without a decoder are meaningless (unlike dimensions, which the fake
    decoder pseudo-derives). NULL/empty AND undecodable payloads yield
    NULL stats — a truncated or non-conforming image raises inside the
    codec (CRC/size errors), and one bad row must not fail the stage, so
    per-row codec exceptions are caught and mapped to NULL (ADVICE r7)."""
    import pandas as pd

    if stats_fn is None:
        raise ValueError(
            "image_channel_stats requires a stats_fn (e.g. "
            "codecs.png_channel_stats); there is no deterministic fake "
            "for pixel statistics."
        )
    out_schema = T.StructType([df.schema[id_col], *IMAGE_STATS_SCHEMA.fields])

    def safe_stats(b) -> dict | None:
        if not b:
            return None
        try:
            return stats_fn(b)
        except Exception:
            # Undecodable payload (truncated stream, bad CRC, wrong
            # magic): no statistics, not a failed stage.
            return None

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            stats = [safe_stats(b) for b in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "mean_r": [s["mean_r"] if s else None for s in stats],
                    "mean_g": [s["mean_g"] if s else None for s in stats],
                    "mean_b": [s["mean_b"] if s else None for s in stats],
                    "std_rgb": [s["std"] if s else None for s in stats],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(batches, out_schema)
