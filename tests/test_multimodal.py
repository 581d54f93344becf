"""Multimodal plumbing tests: schema, batch shape, stub behavior, and the
metadata-only plan operators."""

from __future__ import annotations

import pytest

from rangebar_patterns_spark.operators import multimodal as MM
from rangebar_patterns_spark.sources.tables import load_table

from conftest import SF_DIR


def test_media_schema_and_payload_roundtrip(spark):
    media = MM.media_from_documents(load_table(spark, SF_DIR, "documents"))
    assert [f.name for f in media.schema.fields] == [
        f.name for f in MM.MEDIA_SCHEMA.fields
    ]
    row = media.filter(MM.F.col("media_id") == 0).first()
    doc = load_table(spark, SF_DIR, "documents").filter("doc_id = 0").first()
    assert bytes(row.payload).decode("utf-8") == doc.text
    assert row.kind == "image"


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        MM.decode_stub(b"xx", "image")


def test_resize_and_frame_plans(spark):
    media = MM.media_from_documents(load_table(spark, SF_DIR, "documents"))
    rp = MM.resize_plan(media, max_side=224).toPandas()
    assert (rp.target_w <= 224).all() and (rp.target_h <= 224).all()
    # aspect ratio preserved within integer floor tolerance
    assert (
        (rp.target_w / rp.width - rp.target_h / rp.height).abs() < 0.05
    ).all()
    fp = MM.frame_sample_plan(media, every_n=10).toPandas()
    assert (fp.frame_idx % 10 == 0).all()
    assert (fp.frame_idx < fp.n_frames).all()
