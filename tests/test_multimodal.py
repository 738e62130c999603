"""Multimodal column operators (SURVEY.md §2.9 X4): binary media +
typed metadata, mapInPandas decode/resize/frame-sample plumbing with
the deterministic stub codec."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_geotab_spark.io import load_table
from etl_geotab_spark.operators.multimodal import (
    _decode_fake,
    decode_media,
    resize_media,
    sample_frames,
    synthesize_media,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF, "documents").limit(50)
    return synthesize_media(docs, "doc_id", "text").cache()


def test_synthesize_deterministic_binary(media):
    rows = media.collect()
    assert rows and all(r.media[:4] == b"FAKE" for r in rows)
    assert all(r.media_bytes == len(r.media) for r in rows)
    again = {r.doc_id: bytes(r.media) for r in media.collect()}
    assert all(bytes(r.media) == again[r.doc_id] for r in rows)


def test_decode_media_dims_and_histogram(media):
    out = decode_media(media, "doc_id").collect()
    assert out
    for r in out:
        assert 16 <= r.width <= 64 and 16 <= r.height <= 64
        assert 0.0 <= r.mean_intensity <= 255.0
        assert len(r.histogram) == 16
        assert abs(sum(r.histogram) - 1.0) < 1e-4  # density-normalized


def test_decode_rejects_real_media():
    with pytest.raises(NotImplementedError):
        _decode_fake(b"\x89PNG\r\n\x1a\n....")


def test_resize_roundtrip(media):
    small = resize_media(media, "doc_id", 8, 8)
    decoded = decode_media(small, "id").collect()
    assert decoded and all(r.width == 8 and r.height == 8 for r in decoded)


def test_sample_frames_schedule(spark):
    vids = spark.createDataFrame(
        [("v1", 3500), ("v2", 999), ("v3", 0)], "vid string, duration_ms int"
    )
    out = sample_frames(vids, "vid", "duration_ms", every_ms=1000).collect()
    by_vid = {}
    for r in out:
        by_vid.setdefault(r.vid, []).append(r.frame_ms)
    assert sorted(by_vid["v1"]) == [0, 1000, 2000, 3000]
    assert sorted(by_vid["v2"]) == [0]
    assert "v3" not in by_vid  # zero-length media yields no frames


def test_real_codec_gate():
    """The PIL branch is feature-gated: with Pillow absent (this
    container) non-FAKE bytes raise the documented NotImplementedError;
    with Pillow present they dispatch to _decode_real. The gate flag
    must agree with reality either way."""
    from etl_geotab_spark.operators import multimodal as mm

    try:
        import PIL  # noqa: F401

        assert mm.HAS_PIL
    except ImportError:
        assert not mm.HAS_PIL
    if mm.HAS_PIL:
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("L", (4, 3), color=7).save(buf, format="PNG")
        w, h, px = mm._decode_fake(buf.getvalue())
        assert (w, h, px.tolist()) == (4, 3, [7] * 12)
    else:
        import pytest

        with pytest.raises(NotImplementedError):
            mm._decode_fake(b"\x89PNG\r\n\x1a\nnotreal")


def test_binary_file_source_feeds_decode(spark, tmp_path):
    """binaryFile source → decode_media: the production multimodal
    ingestion path. Write real FAKE-container files to disk, ingest via
    the binaryFile source, decode the content column — same results as
    the synthesized in-flight blobs."""
    import struct as st

    from etl_geotab_spark.io import read_binary_files
    from etl_geotab_spark.operators.multimodal import _MAGIC, decode_media

    for i, (w, h) in enumerate([(4, 3), (5, 2)]):
        payload = bytes(range(w * h))
        (tmp_path / f"m{i}.bin").write_bytes(
            _MAGIC + st.pack("<BHH", 1, w, h) + payload
        )
    (tmp_path / "ignore.txt").write_text("not media")

    df = read_binary_files(spark, str(tmp_path), glob="*.bin")
    assert df.count() == 2
    # length filter prunes from listing metadata (no content read)
    assert read_binary_files(spark, str(tmp_path), glob="*.bin",
                             max_bytes=20).count() == 1  # keeps only the 19-byte blob
    decoded = decode_media(
        df.select(F.col("path").alias("id"), F.col("content").alias("media")),
        "id",
    ).collect()
    dims = sorted((r.width, r.height, r.intensity_sum) for r in decoded)
    assert dims == [(4, 3, sum(range(12))), (5, 2, sum(range(10)))]
