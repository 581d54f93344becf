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


def test_try_decode_graceful_paths():
    """try_decode: absent codec -> (None, stubbed:no-codec) in this
    container; if a codec IS importable, a garbage payload must yield a
    decode-error status, never an exception."""
    from rangebar_patterns_spark.operators.multimodal import try_decode

    for kind in ("image", "audio", "video"):
        arr, status = try_decode(b"not-real-media-bytes", kind)
        assert arr is None
        assert status == "stubbed:no-codec" or status.startswith(
            "decode-error:"
        ), status


def test_extract_features_attempt_decode(spark):
    """attempt_decode=True records a per-row status (environment-
    dependent value, environment-independent SHAPE) while the byte
    features stay identical to the stub path."""
    from rangebar_patterns_spark.operators.multimodal import (
        extract_features,
        media_from_documents,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)
    media = media_from_documents(docs)
    stub = extract_features(media).toPandas().sort_values("media_id")
    live = (
        extract_features(media, attempt_decode=True)
        .toPandas()
        .sort_values("media_id")
    )
    assert (stub.byte_checksum.values == live.byte_checksum.values).all()
    assert set(live.decode_status) <= {"stubbed:no-codec"} | {
        s for s in live.decode_status if s.startswith(("decoded:", "decode-error:"))
    }
