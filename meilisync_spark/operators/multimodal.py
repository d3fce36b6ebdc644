"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, Arrow-batched
``mapInPandas``, partitioning, batch shapes. The codec layer has two
paths: the default extracts *deterministic* pseudo-metadata from the
bytes (sha256-derived), which keeps the operator oracle-checkable; and
``use_real_codecs=True`` routes through :func:`decode_real` —
import-gated PIL/soundfile with stdlib PNG/WAV fallbacks, raising for
formats nothing present can parse (pyav-less video).

Scale notes:

- Binary payloads ride in parquet as ``binary``; metadata lives in
  typed columns NEXT to the blob so filters/pruning never touch bytes
  (`SELECT doc_id WHERE width > 100` reads zero blob pages).
- ``mapInPandas`` streams Arrow record batches: bounded memory per
  task regardless of blob sizes; ``spark.sql.execution.arrow
  .maxRecordsPerBatch`` caps batch height for fat rows.
- Partition by content-defined buckets (hash of id), never by blob.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, width int, height int, "
    "sample_rate int, checksum string"
)


def make_media_table(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from the documents fixture: the utf-8
    bytes of ``text`` play the role of an encoded blob; media_type is
    derived deterministically from the doc id."""
    mt = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        "doc_id",
        mt.alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("content"),
    )


def decode_real(content: bytes, media_type: str) -> tuple[int, int, int]:
    """Real-codec integration point, import-gated: PIL for images and
    soundfile for audio when installed, with stdlib fallbacks for the
    two container-formats the standard library can parse on its own
    (PNG headers via struct, WAV via ``wave``). Video needs pyav — no
    stdlib fallback exists, so it raises until a deployment wires one.

    Returns (width, height, sample_rate). The deterministic
    ``_fake_decode`` stays the oracle-checked default path; this branch
    is for deployments with actual media blobs."""
    import io
    import struct

    if media_type == "image":
        try:
            from PIL import Image  # optional dependency

            with Image.open(io.BytesIO(content)) as im:
                return im.width, im.height, 0
        except ImportError:
            pass
        if content[:8] == b"\x89PNG\r\n\x1a\n":
            w, h = struct.unpack(">II", content[16:24])  # IHDR dims
            return w, h, 0
        raise NotImplementedError(
            "non-PNG image decoding requires PIL; install it or extend "
            "decode_real"
        )
    if media_type == "audio":
        try:
            import soundfile  # optional dependency

            info = soundfile.info(io.BytesIO(content))
            return 0, 0, int(info.samplerate)
        except ImportError:
            pass
        if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
            import wave

            with wave.open(io.BytesIO(content)) as wf:
                return 0, 0, wf.getframerate()
        raise NotImplementedError(
            "non-WAV audio decoding requires soundfile; install it or "
            "extend decode_real"
        )
    raise NotImplementedError(
        "video decoding requires pyav; wire it here for deployments "
        "with real video blobs"
    )


def _fake_decode(content: bytes, media_type: str) -> tuple[int, int, int]:
    """Deterministic stand-in for the decoder: dimensions derived from
    the content hash — stable across engines and runs."""
    h = int(hashlib.sha256(content).hexdigest()[:8], 16)
    if media_type == "image":
        return 320 + h % 320, 240 + (h // 320) % 240, 0
    if media_type == "audio":
        return 0, 0, 8000 + h % 40000
    return 320 + h % 320, 240 + (h // 320) % 240, 30  # video: dims + fps slot


def extract_media_metadata(media: DataFrame, use_real_codecs: bool = False) -> DataFrame:
    """Arrow-batched metadata extraction over the blob column.

    The batch function is self-contained (imports + logic inside) so
    cloudpickle ships it by value — executor Python workers need
    nothing on their path beyond pandas/hashlib.
    """
    real = decode_real if use_real_codecs else None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        import pandas as _pd

        def fake(content: bytes, media_type: str) -> tuple[int, int, int]:
            h = int(_hl.sha256(content).hexdigest()[:8], 16)
            if media_type == "image":
                return 320 + h % 320, 240 + (h // 320) % 240, 0
            if media_type == "audio":
                return 0, 0, 8000 + h % 40000
            return 320 + h % 320, 240 + (h // 320) % 240, 30

        decode = real or fake
        for pdf in batches:
            meta = [decode(c, m) for c, m in zip(pdf["content"], pdf["media_type"])]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(c) for c in pdf["content"]],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "sample_rate": [m[2] for m in meta],
                    "checksum": [_hl.sha256(c).hexdigest() for c in pdf["content"]],
                }
            )

    return media.mapInPandas(run, schema=MEDIA_META_SCHEMA)


RESIZE_TARGET = 256
RESIZE_SCHEMA = (
    "doc_id long, media_type string, width int, height int, "
    "out_width int, out_height int"
)


def resize_media(media: DataFrame, target: int = RESIZE_TARGET) -> DataFrame:
    """Fit image/video frames into a ``target``² box preserving aspect
    ratio — the standard pre-training normalization step. The decode +
    scale is the stubbed codec layer (integer math on the fake-decoded
    dims — a deployment swaps in PIL/pyav inside the same batch fn);
    the Spark plumbing (Arrow batches, pruned blob column, 1→1 schema
    contract) is real. Audio rows are filtered *before* the UDF so
    their blobs never cross the Arrow boundary."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        import pandas as _pd

        for pdf in batches:
            rows = []
            for doc_id, mt, content in zip(pdf["doc_id"], pdf["media_type"], pdf["content"]):
                h = int(_hl.sha256(content).hexdigest()[:8], 16)
                w, hgt = 320 + h % 320, 240 + (h // 320) % 240
                m = max(w, hgt)
                scale_num = min(target, m)  # never upscale
                rows.append(
                    (doc_id, mt, w, hgt, w * scale_num // m, hgt * scale_num // m)
                )
            yield _pd.DataFrame(
                rows,
                columns=["doc_id", "media_type", "width", "height", "out_width", "out_height"],
            )

    visual = media.where(F.col("media_type").isin("image", "video"))
    return visual.mapInPandas(run, schema=RESIZE_SCHEMA)


def resize_media_oracle_sql(target: int = RESIZE_TARGET) -> str:
    h = "(('0x' || substring(sha256(text), 1, 8))::BIGINT)"
    return f"""
    WITH v AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image' ELSE 'video' END AS media_type,
               CAST(320 + {h} % 320 AS INTEGER) AS width,
               CAST(240 + ({h} // 320) % 240 AS INTEGER) AS height
        FROM documents WHERE doc_id % 3 <> 1
    )
    SELECT doc_id, media_type, width, height,
           CAST(width * least({target}, greatest(width, height))
                // greatest(width, height) AS INTEGER) AS out_width,
           CAST(height * least({target}, greatest(width, height))
                // greatest(width, height) AS INTEGER) AS out_height
    FROM v
    """


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_ts_ms long, frame_id string"


def sample_frames(media: DataFrame) -> DataFrame:
    """Uniform frame sampling from video blobs — the 1→N expansion
    shape (one input row yields a variable number of frame rows through
    the same Arrow batch stream; ``mapInPandas`` output row count is
    unconstrained, so no explode/join scaffolding is needed). Frame
    count/duration come from the stubbed decoder; frame ids are
    content-derived so downstream dedup can run on frames."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        import pandas as _pd

        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                digest = _hl.sha256(content).hexdigest()
                h = int(digest[:8], 16)
                n_frames = 1 + h % 8
                duration_ms = 1000 * (1 + h % 30)
                for i in range(n_frames):
                    rows.append(
                        (
                            doc_id,
                            i,
                            i * duration_ms // n_frames,
                            _hl.sha256(f"{digest}:{i}".encode()).hexdigest(),
                        )
                    )
            yield _pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_ts_ms", "frame_id"])

    videos = media.where(F.col("media_type") == "video")
    return videos.mapInPandas(run, schema=FRAME_SCHEMA)


def sample_frames_oracle_sql() -> str:
    h = "(('0x' || substring(digest, 1, 8))::BIGINT)"
    return f"""
    WITH v AS (
        SELECT doc_id, sha256(text) AS digest,
               1 + {h} % 8 AS n_frames,
               1000 * (1 + {h} % 30) AS duration_ms
        FROM documents WHERE doc_id % 3 = 2
    )
    SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
           CAST(i * duration_ms // n_frames AS BIGINT) AS frame_ts_ms,
           sha256(digest || ':' || i) AS frame_id
    FROM v, UNNEST(range(0, n_frames)) t(i)
    """


def media_metadata_oracle_sql() -> str:
    """DuckDB mirror of make_media_table → extract_media_metadata with
    the deterministic fake decoder."""
    # DuckDB 1.0's sha256 takes VARCHAR only; content IS utf-8(text), so
    # hashing the text gives the identical digest
    h = "(('0x' || substring(sha256(text), 1, 8))::BIGINT)"
    return f"""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           octet_length(encode(text)) AS n_bytes,
           CASE WHEN doc_id % 3 = 1 THEN 0
                ELSE CAST(320 + {h} % 320 AS INTEGER) END AS width,
           CASE WHEN doc_id % 3 = 1 THEN 0
                ELSE CAST(240 + ({h} // 320) % 240 AS INTEGER) END AS height,
           CASE WHEN doc_id % 3 = 0 THEN 0
                WHEN doc_id % 3 = 1 THEN CAST(8000 + {h} % 40000 AS INTEGER)
                ELSE 30 END AS sample_rate,
           sha256(text) AS checksum
    FROM documents
    """
