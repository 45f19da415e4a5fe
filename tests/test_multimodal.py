"""Multimodal plumbing: schemas, mapInPandas batch shape, stub policy."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from etl_pdf_pipepline_spark.operators.multimodal import (
    decode_image_fake,
    decode_image_real,
    decode_media,
    media_table,
    sample_frames,
)

SF = "/root/testdata/sf0.001"


def test_real_codec_decodes_png_and_rejects_others():
    # r6: the codec seam is closed for PNG (stdlib-only decoder); other
    # formats still raise — an honest error, not a guessed answer.
    from etl_pdf_pipepline_spark.functions.png import encode_png

    png = encode_png([bytes([10, 20, 30] * 5)] * 4, 5, 4, 3)
    assert decode_image_real(png) == (5, 4, "png")
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\xff\xd8\xff\xe0 jpeg-ish")


def test_fake_decode_deterministic():
    a = decode_image_fake(b"hello world")
    assert a == decode_image_fake(b"hello world")
    w, h, fmt = a
    assert w == 100 + 11 % 900 and h == 100 + 77 % 900
    assert fmt in ("png", "jpeg")


def test_media_table_types(spark):
    m = media_table(spark, SF)
    assert m.schema["content"].dataType.typeName() == "binary"
    types = {r.media_type for r in m.select("media_type").distinct().collect()}
    assert types == {"image", "audio", "video"}


def test_decode_media_matches_python(spark):
    m = media_table(spark, SF).limit(20)
    rows = decode_media(m).collect()
    src = {r.media_id: bytes(r.content) for r in m.collect()}
    assert len(rows) == 20
    for r in rows:
        w, h, fmt = decode_image_fake(src[r.media_id])
        assert (r.width, r.height, r.format) == (w, h, fmt)
        assert r.n_bytes == len(src[r.media_id])


def test_sample_frames_fanout_and_digest(spark):
    m = media_table(spark, SF).filter(F.col("media_type") == "video").limit(5)
    frames = sample_frames(m, 4).collect()
    assert len(frames) == 5 * 4
    src = {r.media_id: bytes(r.content) for r in m.collect()}
    for fr in frames:
        content = src[fr.media_id]
        off = (len(content) * fr.frame_index) // 4
        assert fr.offset_bytes == off
        assert fr.frame_digest == hashlib.sha256(content[off : off + 64]).hexdigest()


def test_media_image_features_from_decoded_pixels(spark):
    """Feature stats must come out of the real codec path: decode the
    same PNG packing by hand for one doc and compare."""
    import hashlib
    import math

    import numpy as np

    from etl_pdf_pipepline_spark.registry import all_queries

    rows = all_queries()["media_image_features"](spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    docs = {r.doc_id: r.text for r in spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").select("doc_id", "text").collect()}
    for r in rows[:5]:
        raw = docs[r.media_id].encode()
        assert r.n_pixels == len(raw)
        if len(raw) == 0:
            assert r.mean_pixel is None
        else:
            px = np.frombuffer(raw, dtype=np.uint8)
            assert r.min_pixel == int(px.min())
            assert r.max_pixel == int(px.max())
            assert abs(r.mean_pixel - px.sum() / len(raw)) < 1e-3
