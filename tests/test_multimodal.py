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


def test_ppm_codec_roundtrip_and_real_decode_through_operators(spark):
    """A REAL codec (pure-numpy Netpbm P6) flows through the multimodal
    operators end-to-end: decode_images reads true dimensions from the
    header, resize_images produces a decodable PPM of the target size
    with nearest-neighbor pixels, and the batch shapes are the same
    Arrow-batched mapInPandas contracts the stubs use."""
    import numpy as np

    from timefence_spark.operators import codecs, multimodal

    rng = np.random.default_rng(7)
    imgs = {
        1: rng.integers(0, 256, (8, 12, 3), dtype=np.uint8),
        2: rng.integers(0, 256, (20, 5, 3), dtype=np.uint8),
    }
    # round-trip, including a commented header
    assert np.array_equal(codecs.ppm_decode(codecs.ppm_encode(imgs[1])), imgs[1])
    commented = b"P6\n# a comment\n12 8\n255\n" + imgs[1].tobytes()
    assert np.array_equal(codecs.ppm_decode(commented), imgs[1])

    df = spark.createDataFrame(
        [(k, bytearray(codecs.ppm_encode(v))) for k, v in imgs.items()],
        "media_id long, content binary",
    )
    decoded = {
        r["media_id"]: r
        for r in multimodal.decode_images(
            df, id_col="media_id", binary_col="content",
            decode_fn=codecs.ppm_decode_info,
        ).collect()
    }
    assert (decoded[1]["width"], decoded[1]["height"]) == (12, 8)
    assert (decoded[2]["width"], decoded[2]["height"]) == (5, 20)
    assert decoded[1]["format"] == "ppm"

    resized = {
        r["media_id"]: bytes(r["resized"])
        for r in multimodal.resize_images(
            df, id_col="media_id", binary_col="content", width=4, height=6,
            resize_fn=codecs.ppm_resize,
        ).collect()
    }
    out = codecs.ppm_decode(resized[1])
    assert out.shape == (6, 4, 3)
    # nearest-neighbor: corner pixels survive exactly
    assert tuple(out[0, 0]) == tuple(imgs[1][0, 0])

    stats = codecs.ppm_channel_stats(codecs.ppm_encode(imgs[2]))
    assert stats["mean_r"] == pytest.approx(imgs[2][:, :, 0].mean())


def test_wav_codec_roundtrip_and_decode_audio(spark):
    """Real PCM WAV flows through decode_audio: encode sine waves with
    the pure-numpy codec, decode true header facts back through the
    Arrow-batched stage; RMS of a full-scale sine is amplitude/sqrt(2)."""
    import numpy as np

    from timefence_spark.operators import codecs, multimodal

    t = np.arange(16000)
    mono = (10000 * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int16)
    stereo = np.stack([mono[:8000], -mono[:8000]], axis=1)
    clips = {1: (mono, 16000), 2: (stereo, 44100)}
    wav1 = codecs.wav_encode(mono, 16000)
    back, rate = codecs.wav_decode(wav1)
    assert rate == 16000 and np.array_equal(back[:, 0], mono)
    assert codecs.wav_rms(wav1) == pytest.approx(10000 / np.sqrt(2), rel=1e-3)

    df = spark.createDataFrame(
        [(k, bytearray(codecs.wav_encode(a, r))) for k, (a, r) in clips.items()],
        "media_id long, content binary",
    )
    out = {
        r["media_id"]: r
        for r in multimodal.decode_audio(
            df, id_col="media_id", binary_col="content",
            decode_fn=codecs.wav_decode_info,
        ).collect()
    }
    assert (out[1]["sample_rate"], out[1]["n_samples"], out[1]["channels"]) == (
        16000, 16000, 1,
    )
    assert (out[2]["sample_rate"], out[2]["n_samples"], out[2]["channels"]) == (
        44100, 8000, 2,
    )
    assert out[1]["format"] == "wav"
    # fake fallback keeps the same schema and determinism
    fake = multimodal.decode_audio(df, id_col="media_id", binary_col="content")
    assert fake.columns == ["media_id", "sample_rate", "n_samples", "channels", "format"]


def test_png_codec_roundtrip_all_filters():
    """The stdlib-zlib PNG codec must round-trip random rasters under
    every scanline filter type (0=None 1=Sub 2=Up 3=Average 4=Paeth) —
    the decoder's unfilter path is real reconstruction, not a header
    parse."""
    import numpy as np

    from timefence_spark.operators import codecs

    rng = np.random.default_rng(7)
    for ft in range(5):
        for shape in [(1, 1, 3), (3, 2, 3), (17, 23, 3), (40, 64, 3)]:
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            assert np.array_equal(
                codecs.png_decode(codecs.png_encode(img, filter_type=ft)), img
            ), (ft, shape)
    # corrupting a payload byte must fail the chunk CRC, not mis-decode
    blob = bytearray(codecs.png_encode(rng.integers(0, 256, (6, 6, 3), np.uint8)))
    blob[len(blob) - 20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|PNG"):
        codecs.png_decode(bytes(blob))
    with pytest.raises(ValueError, match="signature"):
        codecs.png_decode(b"not a png at all")


def test_png_pipeline_decode_resize_stats(spark):
    """Real PNGs through the Arrow-batched stages: decode_images reads
    true IHDR facts, resize_images reshapes actual pixels, and
    image_channel_stats computes means from the decompressed raster."""
    import numpy as np

    from timefence_spark.operators import codecs, multimodal

    rng = np.random.default_rng(11)
    imgs = {
        1: rng.integers(0, 256, (8, 12, 3), dtype=np.uint8),
        2: rng.integers(0, 256, (20, 5, 3), dtype=np.uint8),
    }
    df = spark.createDataFrame(
        [
            (k, bytearray(codecs.png_encode(v, filter_type=4)))
            for k, v in imgs.items()
        ],
        "media_id long, content binary",
    )
    decoded = {
        r["media_id"]: r
        for r in multimodal.decode_images(
            df, id_col="media_id", binary_col="content",
            decode_fn=codecs.png_decode_info,
        ).collect()
    }
    assert (decoded[1]["width"], decoded[1]["height"]) == (12, 8)
    assert (decoded[2]["width"], decoded[2]["height"]) == (5, 20)
    assert decoded[1]["format"] == "png" and decoded[1]["channels"] == 3

    resized = {
        r["media_id"]: bytes(r["resized"])
        for r in multimodal.resize_images(
            df, id_col="media_id", binary_col="content", width=4, height=6,
            resize_fn=codecs.png_resize,
        ).collect()
    }
    out = codecs.png_decode(resized[1])
    assert out.shape == (6, 4, 3)
    assert tuple(out[0, 0]) == tuple(imgs[1][0, 0])  # nearest-neighbor corner

    stats = {
        r["media_id"]: r
        for r in multimodal.image_channel_stats(
            df, id_col="media_id", binary_col="content",
            stats_fn=codecs.png_channel_stats,
        ).collect()
    }
    want = imgs[2].astype(np.float64)
    assert stats[2]["mean_g"] == pytest.approx(want[:, :, 1].mean())
    assert stats[2]["std_rgb"] == pytest.approx(want.std())
    with pytest.raises(ValueError, match="stats_fn"):
        multimodal.image_channel_stats(df, id_col="media_id", binary_col="content")

    # NULL payload -> NULL stats, not a failed stage
    with_null = df.unionByName(
        spark.createDataFrame([(9, None)], "media_id long, content binary")
    )
    null_row = {
        r["media_id"]: r
        for r in multimodal.image_channel_stats(
            with_null, id_col="media_id", binary_col="content",
            stats_fn=codecs.png_channel_stats,
        ).collect()
    }[9]
    assert null_row["mean_r"] is None and null_row["std_rgb"] is None


def test_image_channel_stats_undecodable_payload_yields_null(spark):
    """ADVICE r7: a truncated or non-conforming payload (codec raises a
    CRC/size error) must yield NULL stats for THAT row, not fail the
    stage — the docstring promises one bad row never kills the task."""
    import numpy as np

    from timefence_spark.operators import codecs, multimodal

    img = (np.arange(2 * 2 * 3, dtype=np.uint8)).reshape(2, 2, 3)
    good = codecs.png_encode(img)
    rows = [
        (1, good),
        (2, good[: len(good) // 2]),       # truncated stream
        (3, b"\x89PNG\r\n\x1a\njunk"),     # bad chunk structure
        (4, b"not an image at all"),       # wrong magic
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {
        r["media_id"]: r
        for r in multimodal.image_channel_stats(
            df, id_col="media_id", binary_col="content",
            stats_fn=codecs.png_channel_stats,
        ).collect()
    }
    assert got[1]["mean_r"] is not None
    for bad in (2, 3, 4):
        assert got[bad]["mean_r"] is None, bad
        assert got[bad]["std_rgb"] is None, bad


def test_jpeg_codec_roundtrip_and_contracts():
    """Baseline grayscale JPEG codec: lossy round-trip stays close on
    smooth content, uniform blocks with a flat-8 quant table round-trip
    EXACTLY (DC-only), tables are read from the stream, and unsupported
    shapes (color/progressive/truncated) raise cleanly."""
    import numpy as np

    from timefence_spark.operators import codecs

    # smooth gradient: small mean error, correct crop of edge blocks
    x = np.linspace(0, 255, 50, dtype=np.uint8)
    grad = np.tile(x, (33, 1))
    enc = codecs.jpeg_encode_gray(grad)
    dec = codecs.jpeg_decode_gray(enc)
    assert dec.shape == grad.shape
    assert np.abs(dec.astype(int) - grad.astype(int)).mean() < 3.0

    info = codecs.jpeg_decode_info(enc)
    assert info == {"width": 50, "height": 33, "channels": 1, "format": "jpeg"}

    # uniform blocks + q00=8: exact reconstruction incl. non-multiple-of-8
    flat8 = np.full((8, 8), 8, np.int32)
    img = np.full((10, 12), 201, np.uint8)
    assert (codecs.jpeg_decode_gray(codecs.jpeg_encode_gray(img, quant=flat8)) == 201).all()
    stats = codecs.jpeg_channel_stats(codecs.jpeg_encode_gray(img, quant=flat8))
    assert stats["mean_r"] == 201.0 and stats["std"] == 0.0

    # negative-DC and AC-coefficient content round-trips losslessly when
    # the quantized coefficients are re-fed (decode(encode(decode)) fixpoint)
    rng = np.random.default_rng(7)
    noisy = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    once = codecs.jpeg_decode_gray(codecs.jpeg_encode_gray(noisy))
    twice = codecs.jpeg_decode_gray(codecs.jpeg_encode_gray(once))
    assert np.abs(twice.astype(int) - once.astype(int)).mean() < 1.5

    with pytest.raises(ValueError, match="2-D uint8"):
        codecs.jpeg_encode_gray(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(ValueError, match="SOI"):
        codecs.jpeg_decode_gray(b"not a jpeg")
    with pytest.raises((ValueError, IndexError)):
        codecs.jpeg_decode_gray(enc[: len(enc) // 2])  # truncated
    # progressive: flip SOF0 (FFC0) to SOF2 (FFC2)
    prog = enc.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError, match="SOF0|baseline"):
        codecs.jpeg_decode_gray(prog)


def test_jpeg_color_codec_roundtrip_and_contracts():
    """YCbCr 4:4:4 color JPEG: smooth content round-trips closely, the
    unified jpeg_decode returns 2-D for gray and (h, w, 3) for color,
    per-channel stats come from real pixels, and grayscale-only entry
    points reject color files."""
    import numpy as np

    from timefence_spark.operators import codecs

    x = np.linspace(0, 255, 48, dtype=np.uint8)
    grad = np.stack(
        [
            np.tile(x, (24, 1)),
            np.tile(x[::-1], (24, 1)),
            np.full((24, 48), 80, np.uint8),
        ],
        axis=-1,
    )
    enc = codecs.jpeg_encode_rgb(grad)
    dec = codecs.jpeg_decode(enc)
    assert dec.shape == grad.shape
    assert np.abs(dec.astype(int) - grad.astype(int)).mean() < 4.0
    info = codecs.jpeg_decode_info(enc)
    assert info["channels"] == 3 and info["format"] == "jpeg"

    stats = codecs.jpeg_channel_stats(enc)
    for ch, key in enumerate(("mean_r", "mean_g", "mean_b")):
        assert abs(stats[key] - grad[:, :, ch].mean()) < 4.0, key

    with pytest.raises(ValueError, match="grayscale"):
        codecs.jpeg_decode_gray(enc)
    with pytest.raises(ValueError, match="uint8"):
        codecs.jpeg_encode_rgb(grad[:, :, 0])

    # odd dims crop correctly through the color path
    crop = grad[:13, :19]
    assert codecs.jpeg_decode(codecs.jpeg_encode_rgb(crop)).shape == (13, 19, 3)


def test_jpeg_420_codec_roundtrip():
    """4:2:0 chroma subsampling: smooth content round-trips with only
    the expected chroma-blur cost, odd dimensions crop correctly, and
    the subsampled file is smaller than its 4:4:4 sibling."""
    import numpy as np

    from timefence_spark.operators import codecs

    x = np.linspace(0, 255, 48, dtype=np.uint8)
    grad = np.stack(
        [
            np.tile(x, (32, 1)),
            np.tile(x[::-1], (32, 1)),
            np.full((32, 48), 80, np.uint8),
        ],
        axis=-1,
    )
    enc444 = codecs.jpeg_encode_rgb(grad, subsample="444")
    enc420 = codecs.jpeg_encode_rgb(grad, subsample="420")
    assert len(enc420) < len(enc444)
    dec = codecs.jpeg_decode(enc420)
    assert dec.shape == grad.shape
    assert np.abs(dec.astype(int) - grad.astype(int)).mean() < 4.0

    rng = np.random.default_rng(11)
    for shape in [(13, 19), (17, 33), (1, 1)]:
        img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
        out = codecs.jpeg_decode(codecs.jpeg_encode_rgb(img, subsample="420"))
        assert out.shape == img.shape, shape

    with pytest.raises(ValueError, match="subsample"):
        codecs.jpeg_encode_rgb(grad, subsample="422")
