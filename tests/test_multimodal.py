"""Multimodal plumbing tests: schema, Arrow batch shape, stub gating."""

from __future__ import annotations

import pytest

from meilisync_spark.operators.multimodal import (
    decode_real,
    extract_media_metadata,
    make_media_table,
)
from meilisync_spark.sources.parquet import load_table
from tests.conftest import SF_SMOKE


def test_media_table_schema(spark):
    media = make_media_table(load_table(spark, SF_SMOKE, "documents"))
    assert dict(media.dtypes) == {
        "doc_id": "bigint",
        "media_type": "string",
        "content": "binary",
    }


def test_metadata_extraction_deterministic(spark):
    media = make_media_table(load_table(spark, SF_SMOKE, "documents"))
    a = {r.doc_id: r for r in extract_media_metadata(media).collect()}
    b = {r.doc_id: r for r in extract_media_metadata(media).collect()}
    assert len(a) == media.count()
    assert all(a[k] == b[k] for k in a)
    img = next(r for r in a.values() if r.media_type == "image")
    assert 320 <= img.width < 640 and 240 <= img.height < 480
    assert img.sample_rate == 0 and len(img.checksum) == 64
    aud = next(r for r in a.values() if r.media_type == "audio")
    assert aud.width == 0 and 8000 <= aud.sample_rate < 48000


def test_real_codec_path_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        decode_real(b"\x89PNG", "image")


def test_resize_fits_box_and_skips_audio(spark):
    from meilisync_spark.operators.multimodal import resize_media

    media = make_media_table(load_table(spark, SF_SMOKE, "documents"))
    out = resize_media(media).collect()
    assert out and all(r.media_type in ("image", "video") for r in out)
    for r in out:
        assert max(r.out_width, r.out_height) <= 256
        # aspect preserved within integer-floor tolerance (relative)
        ratio, out_ratio = r.width / r.height, r.out_width / r.out_height
        assert abs(out_ratio - ratio) / ratio < 0.02
    # audio rows are filtered before the Arrow boundary
    n_visual = media.where("media_type <> 'audio'").count()
    assert len(out) == n_visual


def test_frame_sampling_expands_rows(spark):
    from meilisync_spark.operators.multimodal import sample_frames

    media = make_media_table(load_table(spark, SF_SMOKE, "documents"))
    frames = sample_frames(media).collect()
    n_videos = media.where("media_type = 'video'").count()
    assert len(frames) >= n_videos  # 1→N expansion
    per_doc: dict[int, list] = {}
    for f in frames:
        per_doc.setdefault(f.doc_id, []).append(f)
    assert len(per_doc) == n_videos
    for doc_frames in per_doc.values():
        idxs = sorted(f.frame_idx for f in doc_frames)
        assert idxs == list(range(len(idxs)))  # dense 0..n-1
        assert len({f.frame_id for f in doc_frames}) == len(doc_frames)
        ts = [f.frame_ts_ms for f in sorted(doc_frames, key=lambda x: x.frame_idx)]
        assert ts == sorted(ts) and ts[0] == 0


def _png(width: int, height: int) -> bytes:
    """Minimal valid RGBA PNG — parseable by PIL and by the stdlib
    IHDR fallback alike."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 6, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x00\x00\x00\xff" * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _wav(sample_rate: int) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(b"\x00\x00" * 16)
    return buf.getvalue()


def test_real_codec_branch_decodes_png_and_wav(spark):
    """use_real_codecs=True actually decodes: a synthesized PNG yields
    its true dimensions and a synthesized WAV its true sample rate,
    through the same Arrow mapInPandas plumbing as the fake path (PIL/
    soundfile when installed, stdlib PNG/WAV parsers otherwise)."""
    from meilisync_spark.operators.multimodal import extract_media_metadata

    media = spark.createDataFrame(
        [
            (1, "image", bytearray(_png(123, 45))),
            (2, "audio", bytearray(_wav(22050))),
        ],
        "doc_id long, media_type string, content binary",
    )
    rows = {r.doc_id: r for r in extract_media_metadata(media, use_real_codecs=True).collect()}
    assert (rows[1].width, rows[1].height, rows[1].sample_rate) == (123, 45, 0)
    assert (rows[2].width, rows[2].height, rows[2].sample_rate) == (0, 0, 22050)
    assert rows[1].n_bytes == len(_png(123, 45))


def test_real_codec_branch_raises_on_video(spark):
    """No pyav anywhere: the video arm must fail loudly, not fake."""
    import pytest

    from meilisync_spark.operators.multimodal import decode_real

    with pytest.raises(NotImplementedError, match="pyav"):
        decode_real(b"\x00\x00\x00\x18ftypmp42", "video")
