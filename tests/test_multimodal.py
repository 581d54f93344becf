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


def test_codec_roundtrips():
    """Vendored WAV/PPM codecs: encode -> decode is exact (16-bit PCM
    quantization for WAV; lossless for PPM)."""
    import numpy as np

    from rangebar_patterns_spark.operators import codecs as CC

    rng = np.random.default_rng(7)
    samples = rng.uniform(-0.9, 0.9, size=400)
    decoded = CC.decode_wav(CC.encode_wav(samples, 16000))
    assert decoded.shape == samples.shape
    # half-step rounding error plus the conventional 32767-encode /
    # 32768-decode scale mismatch (≤ |x| / 32768)
    assert np.abs(decoded - samples).max() <= 0.5 / 32768.0 + 1.0 / 32768.0

    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    out = CC.decode_ppm(CC.encode_ppm(img))
    assert np.array_equal(out, img)
    # header comments and odd whitespace must parse
    with_comment = b"P6\n# a comment\n7 5\n255\n" + img.tobytes()
    assert np.array_equal(CC.decode_ppm(with_comment), img)

    import pytest

    with pytest.raises(ValueError):
        CC.decode_ppm(b"P3\n1 1\n255\n0 0 0")  # ASCII PPM: not supported
    with pytest.raises(Exception):
        CC.decode_wav(b"RIFFgarbage")


def test_decoded_features_end_to_end(spark):
    """The decode -> feature-extract path on REAL media bytes: WAV and
    PPM payloads decode via the builtin tier inside mapInPandas, and the
    decoded-domain features match values computed locally; a garbage
    payload in the same batch degrades to a decode-error row."""
    import numpy as np

    from rangebar_patterns_spark.operators import codecs as CC
    from rangebar_patterns_spark.operators.multimodal import decoded_features

    rng = np.random.default_rng(11)
    samples = rng.uniform(-0.5, 0.5, size=256)
    wav = CC.encode_wav(samples, 16000)
    img = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    ppm = CC.encode_ppm(img)

    media = spark.createDataFrame(
        [
            (1, "audio", bytearray(wav), 0, 0, 16000, 0),
            (2, "image", bytearray(ppm), 6, 4, 0, 0),
            (3, "image", bytearray(b"not media"), 0, 0, 0, 0),
            (4, "video", bytearray(b"also not"), 0, 0, 0, 12),
        ],
        "media_id long, kind string, payload binary, width int, height int,"
        " sample_rate int, n_frames int",
    )
    rows = {r.media_id: r for r in decoded_features(media).collect()}

    assert rows[1].decode_status == "decoded:builtin-audio"
    assert rows[1].decoded_items == 256
    want_mean = float(
        np.abs(np.round(np.clip(samples, -1, 1) * 32767.0) / 32768.0).mean()
    )
    assert abs(rows[1].decoded_mean - want_mean) < 1e-12

    assert rows[2].decode_status == "decoded:builtin-image"
    assert rows[2].decoded_items == 4 * 6 * 3
    assert abs(rows[2].decoded_mean - float(img.astype(np.float64).mean())) < 1e-12

    assert rows[3].decode_status.startswith("decode-error:")
    assert rows[3].decoded_items is None and rows[3].decoded_mean is None
    assert rows[4].decode_status == "stubbed:no-codec"
