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
