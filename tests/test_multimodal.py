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
    from delta_lake_validation_spark.operators.multimodal import (
        imaging_available,
    )

    if imaging_available():
        pytest.skip("imaging library present: stub contract not in effect")
    with pytest.raises(NotImplementedError, match="imaging library"):
        decode_image(b"\xff\xd8\xff", "jpeg")


def test_decode_path_with_imaging_lib(spark):
    """Real decode path: runs only where the optional imaging dependency
    is installed (VERDICT r7 task 8); skipped cleanly otherwise."""
    pytest.importorskip("PIL")
    import io

    import PIL.Image

    from delta_lake_validation_spark.operators.multimodal import (
        extract_pixel_features,
        resize_image,
    )

    def png(rgb, size=(8, 8)):
        img = PIL.Image.new("RGB", size, rgb)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    red, blue = png((255, 0, 0)), png((0, 0, 255))
    arr = decode_image(red, "png")
    assert arr.shape == (8, 8, 3) and arr[0, 0, 0] == 255

    small = resize_image(red, 4, 4)
    assert decode_image(small, "png").shape == (4, 4, 3)

    media = spark.createDataFrame(
        [(1, bytearray(red)), (2, bytearray(blue))], "id long, payload binary"
    )
    feats = {r.id: list(r.features)
             for r in extract_pixel_features(media, dim=6).collect()}
    assert feats[1] != feats[2]  # red and blue histograms differ
    assert len(feats[1]) == 6


def test_thumbnail_bytes_plumbing(media):
    from delta_lake_validation_spark.operators.multimodal import thumbnail_bytes

    out = thumbnail_bytes(media, target_bytes=64).collect()
    assert all(len(r.thumb) <= 64 for r in out)
    assert all(0 < r.ratio <= 1.0 for r in out)
    # deterministic
    again = {r.id: bytes(r.thumb) for r in thumbnail_bytes(media, target_bytes=64).collect()}
    assert all(bytes(r.thumb) == again[r.id] for r in out)


def test_resize_stub_contract():
    from delta_lake_validation_spark.operators.multimodal import (
        imaging_available,
        resize_image,
    )

    if imaging_available():
        pytest.skip("imaging library present: stub contract not in effect")
    with pytest.raises(NotImplementedError, match="imaging library"):
        resize_image(b"\x89PNG", 64, 64)
