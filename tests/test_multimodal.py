"""Multimodal plumbing tests: schema, batch shape, determinism of the
feature-extraction and frame-sampling stages; codec stub contract."""

from __future__ import annotations

import pytest

from delta_lake_validation_spark.operators.multimodal import (
    decode_image,
    extract_features,
    frame_sample,
    with_binary_payload,
)
from delta_lake_validation_spark.tables import Tables

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def media(spark):
    docs = Tables(spark, SF_DIR).documents.limit(50)
    return with_binary_payload(docs)


def test_payload_schema(media):
    assert dict(media.dtypes) == {
        "id": "bigint",
        "payload": "binary",
        "media": "struct<format:string,n_bytes:int>",
    }
    r = media.first()
    assert r.media.n_bytes == len(r.payload)


def test_features_deterministic(spark, media):
    a = {r.id: list(r.features) for r in extract_features(media, dim=16).collect()}
    b = {r.id: list(r.features) for r in extract_features(media, dim=16).collect()}
    assert a == b
    assert all(len(v) == 16 for v in a.values())
    assert all(-0.5 <= x <= 0.5 for v in a.values() for x in v)


def test_frame_sample_shape(media):
    frames = frame_sample(media, stride=64, max_frames=4).collect()
    assert all(r.frame_no < 4 for r in frames)
    by_id = {}
    for r in frames:
        by_id.setdefault(r.id, []).append(r.frame_no)
    assert all(sorted(v) == list(range(len(v))) for v in by_id.values())


def test_decode_stub_contract():
    with pytest.raises(NotImplementedError, match="imaging library"):
        decode_image(b"\xff\xd8\xff", "jpeg")


def test_thumbnail_bytes_plumbing(media):
    from delta_lake_validation_spark.operators.multimodal import thumbnail_bytes

    out = thumbnail_bytes(media, target_bytes=64).collect()
    assert all(len(r.thumb) <= 64 for r in out)
    assert all(0 < r.ratio <= 1.0 for r in out)
    # deterministic
    again = {r.id: bytes(r.thumb) for r in thumbnail_bytes(media, target_bytes=64).collect()}
    assert all(bytes(r.thumb) == again[r.id] for r in out)


def test_resize_stub_contract():
    from delta_lake_validation_spark.operators.multimodal import resize_image

    with pytest.raises(NotImplementedError, match="imaging library"):
        resize_image(b"\x89PNG", 64, 64)
