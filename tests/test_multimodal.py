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
