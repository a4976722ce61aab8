"""Multimodal plumbing: binary columns + mapInPandas stages (stubbed codecs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timefence_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    # synthesize opaque binary payloads from the documents table
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("blob")
    )


def test_attach_media_metadata(spark, media):
    out = multimodal.attach_media_metadata(media, binary_col="blob", media_type="image")
    row = out.where(F.col("doc_id") == 0).first()
    assert row.blob_meta.media_type == "image"
    assert row.blob_meta.byte_size == len(row.blob)
    assert len(row.blob_meta.content_sha) == 64


def test_decode_images_deterministic(spark, media):
    out1 = multimodal.decode_images(media, id_col="doc_id", binary_col="blob").collect()
    out2 = multimodal.decode_images(media, id_col="doc_id", binary_col="blob").collect()
    assert {r.doc_id: (r.width, r.height) for r in out1} == {
        r.doc_id: (r.width, r.height) for r in out2
    }
    assert all(64 <= r.width < 256 and r.channels == 3 for r in out1)
    assert len(out1) == media.count()


def test_resize_raises_without_codec(spark, media):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    df = multimodal.resize_images(
        media.limit(2), id_col="doc_id", binary_col="blob", width=8, height=8
    )
    with pytest.raises((PythonException, Py4JJavaError), match="No image codec"):
        df.collect()


def test_resize_with_custom_fn(spark, media):
    out = multimodal.resize_images(
        media.limit(5),
        id_col="doc_id",
        binary_col="blob",
        width=4,
        height=4,
        resize_fn=lambda b, w, h: b[: w * h],
    ).collect()
    assert all(len(r.resized) <= 16 for r in out)


def test_sample_frames_fanout(spark, media):
    out = multimodal.sample_frames(
        media.limit(20), id_col="doc_id", binary_col="blob"
    )
    rows = out.collect()
    assert len(rows) >= 20  # at least one frame per input
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    for idxs in per_doc.values():
        assert sorted(idxs) == list(range(len(idxs)))  # contiguous frame idx
