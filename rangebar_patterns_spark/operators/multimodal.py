"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed by Arrow-batched ``mapInPandas``.

The container has no full-fat image/audio codec libraries, so the decode
chain ends in vendored pure-Python PPM/WAV decoders (operators/codecs.py)
— real decodes for those formats, ``decoded:builtin-<kind>`` status — with
``decode_stub`` kept as the loud-failure placeholder for everything else.
Everything Spark-side is real and tested: the media schema, the binary
payload column, the mapInPandas batch iteration, the Arrow batch shapes,
the byte-level feature extraction (length + modular checksum + 16-bin
byte histogram computed with numpy over the raw buffers), and the
decoded-domain features over real WAV/PPM bytes (``decoded_features``).  The checksum/length features have a
DuckDB oracle twin over the same payload bytes, so the Python batch path
itself is correctness-gated — rare for UDF code.

At 100 TB: media tables partition by (kind, bucket(media_id)); payloads
stay columnar binary (Parquet) so column pruning skips them unless the
query touches ``payload``; mapInPandas streams Arrow batches without
materializing a partition, so executor memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CHECKSUM_MOD = 1_000_003
HIST_BINS = 16

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("byte_checksum", LongType()),
        StructField("byte_hist_csv", StringType()),  # CSV: array cols are not sortable/hashable in the compare gates
        StructField("decode_status", StringType()),
    ]
)

_KINDS = ["image", "audio", "video"]


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table: document text bytes stand in for
    encoded payloads; metadata is a pure function of doc_id.  (The real
    pipeline would read Parquet with actual encoded bytes — the schema and
    everything downstream is identical.)"""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        (F.col("doc_id") % 640 + 32).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 32).cast("int").alias("height"),
        F.when(kind == "audio", F.lit(16000)).otherwise(F.lit(0)).cast("int").alias("sample_rate"),
        F.when(kind == "video", (F.col("doc_id") % 120 + 1)).otherwise(F.lit(0)).cast("int").alias("n_frames"),
    )


def decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """Placeholder for the codec call (PIL/librosa/pyav NOT in this
    container).  Raises so nothing silently pretends to decode."""
    raise NotImplementedError(
        f"no {kind} codec available in this environment; "
        "byte-level features below operate on the raw payload instead"
    )


#: codec import per modality — resolved once per Python worker
_CODECS = {"image": "PIL.Image", "audio": "librosa", "video": "av"}


def _builtin_decode(payload: bytes, kind: str) -> tuple[np.ndarray | None, str]:
    """Fallback tier when the full-fat codec library is absent: vendored
    pure-Python decoders (operators/codecs.py) for the formats they can
    honestly handle — P6 PPM images and PCM WAV audio.  Video has no
    honest pure-Python fallback: stays ``stubbed:no-codec``."""
    from . import codecs as CC

    decoder = {"image": CC.decode_ppm, "audio": CC.decode_wav}.get(kind)
    if decoder is None:
        return None, "stubbed:no-codec"
    try:
        return decoder(payload), f"decoded:builtin-{kind}"
    except Exception as exc:  # noqa: BLE001 — any codec failure is data-level
        return None, f"decode-error:{type(exc).__name__}"


def try_decode(payload: bytes, kind: str) -> tuple[np.ndarray | None, str]:
    """Graceful decode: import the modality's codec if the environment
    has it, decode, and report status — ``(array, "decoded:<lib>")`` on
    success, falling back to the vendored pure-Python PPM/WAV decoders
    (``decoded:builtin-<kind>``) when the library is absent,
    ``(None, "stubbed:no-codec")`` when no decoder applies at all, and
    ``(None, "decode-error:<exc>")`` on bad payloads.  Worker-side helper
    for ``extract_features(attempt_decode=True)``."""
    mod_name = _CODECS.get(kind)
    if mod_name is None:
        # unknown modality must degrade like a bad payload, not kill the
        # Arrow batch with a KeyError
        return None, f"decode-error:UnknownKind({kind})"
    try:
        import importlib

        mod = importlib.import_module(mod_name)
    except ImportError:
        return _builtin_decode(payload, kind)
    try:
        if kind == "image":
            import io

            img = mod.open(io.BytesIO(payload))
            return np.asarray(img), f"decoded:{mod_name}"
        if kind == "audio":
            import io

            y, _sr = mod.load(io.BytesIO(payload), sr=None)
            return y, f"decoded:{mod_name}"
        import io

        with mod.open(io.BytesIO(payload)) as container:
            frame = next(container.decode(video=0))
            return frame.to_ndarray(), f"decoded:{mod_name}"
    except Exception as exc:  # noqa: BLE001 — any codec failure is data-level
        return None, f"decode-error:{type(exc).__name__}"


def extract_features(media: DataFrame, attempt_decode: bool = False) -> DataFrame:
    """Arrow-batched byte-feature extraction, vectorized across the whole
    batch: payloads are concatenated into one uint8 buffer and per-row
    sums / nibble histograms come from offset-segmented ``bincount`` —
    no per-row Python in the numeric path (the one remaining row loop
    renders the tiny histogram CSV string).

    ``attempt_decode=False`` (the gate entry): ``decode_status`` is the
    stub constant — deterministic across environments, oracle-stable.
    ``attempt_decode=True``: each row additionally runs :func:`try_decode`
    (real codec import where the environment has one; per-row status
    recorded) — the production switch, exercised environment-agnostically
    in tests/test_multimodal.py."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            n = len(payloads)
            lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=n)
            buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
            # per-row byte sums: float64 weights are exact (row sums
            # < 255 * len << 2^53); modulo taken back in int64
            sums = np.bincount(row_idx, weights=buf, minlength=n).astype(np.int64)
            hist = np.bincount(
                row_idx * HIST_BINS + (buf >> 4).astype(np.int64),
                minlength=n * HIST_BINS,
            ).reshape(n, HIST_BINS)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "n_bytes": lens,
                    "byte_checksum": sums % CHECKSUM_MOD,
                    "byte_hist_csv": [
                        ",".join(str(int(x)) for x in h) for h in hist
                    ],
                    "decode_status": (
                        [
                            try_decode(p, k)[1]
                            for p, k in zip(payloads, pdf["kind"])
                        ]
                        if attempt_decode
                        else "stubbed:no-codec"
                    ),
                }
            )

    return media.mapInPandas(process, FEATURE_SCHEMA)


DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("decode_status", StringType()),
        StructField("decoded_items", LongType()),
        StructField("decoded_mean", DoubleType()),
    ]
)


def decoded_features(media: DataFrame) -> DataFrame:
    """Decoded-DOMAIN features (not byte-level): each payload runs the
    full :func:`try_decode` chain inside ``mapInPandas`` and, on success,
    reports the decoded element count (pixels × channels / samples) and
    the mean of the decoded values (mean |sample| for audio, mean pixel
    for images) — the minimal proof that the decode → feature-extract
    path works end-to-end on real media bytes.  Rows that fail to decode
    carry NULL features and their status, never an exception (one bad
    payload must not kill an Arrow batch of good ones)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            statuses: list[str] = []
            items: list[int | None] = []
            means: list[float | None] = []
            for p, k in zip(pdf["payload"], pdf["kind"]):
                arr, status = try_decode(bytes(p), k)
                statuses.append(status)
                if arr is None or arr.size == 0:
                    items.append(None)
                    means.append(None)
                else:
                    a = np.asarray(arr, dtype=np.float64)
                    items.append(int(a.size))
                    means.append(
                        float(np.abs(a).mean() if k == "audio" else a.mean())
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "decode_status": statuses,
                    "decoded_items": pd.array(items, dtype="Int64"),
                    "decoded_mean": pd.array(means, dtype="float64"),
                }
            )

    return media.mapInPandas(process, DECODED_SCHEMA)


def resize_plan(media: DataFrame, max_side: int = 224) -> DataFrame:
    """Resize *planning* (pure metadata math — the pixel work would live in
    the decode stub): target dims preserving aspect ratio, capped at
    max_side."""
    scale = F.least(
        F.lit(float(max_side)) / F.col("width").cast("double"),
        F.lit(float(max_side)) / F.col("height").cast("double"),
        F.lit(1.0),
    )
    return media.filter(F.col("kind") == "image").select(
        "media_id",
        "width",
        "height",
        F.floor(F.col("width").cast("double") * scale).cast("int").alias("target_w"),
        F.floor(F.col("height").cast("double") * scale).cast("int").alias("target_h"),
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per selected
    frame index (posexplode of the frame sequence)."""
    frames = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    return (
        media.filter((F.col("kind") == "video") & (F.col("n_frames") > 0))
        .select("media_id", "n_frames", F.explode(frames).alias("frame_idx"))
    )
