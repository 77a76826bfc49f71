"""Multimodal plumbing tests: the binary-column schema, mapInPandas
batch shape, and fan-out behave correctly with the deterministic fake
decoder (real codecs are not in this image)."""

import pytest
from pyspark.sql import functions as F

from datawave_spark.operators import multimodal


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [(i, bytes([i % 251] * (10 + i)), f"s3://bucket/{i}.jpg")
            for i in range(20)]
    df = spark.createDataFrame(rows, "id long, payload binary, uri string")
    return multimodal.attach_media(df, "payload", "image/jpeg", uri_col="uri")


def test_attach_media_schema(media_df):
    assert dict(media_df.dtypes)["media"] == "binary"
    meta = media_df.select("media_meta.*").columns
    assert meta == ["mime", "width", "height", "duration_ms", "uri"]
    assert media_df.select("media_meta.mime").first()[0] == "image/jpeg"


def test_decode_requires_decoder(media_df):
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(media_df)


def test_decode_with_fake(media_df):
    out = multimodal.decode_media(media_df, decoder=multimodal.fake_decode)
    rows = {r.id: r for r in out.collect()}
    assert len(rows) == 20
    # deterministic: recompute one row python-side
    payload = bytes([5 % 251] * 15)
    h, w, m = multimodal.fake_decode(payload)
    assert (rows[5].height, rows[5].width, rows[5].mean_byte) == (h, w, m)


def test_resize_passthrough_shape(media_df):
    out = multimodal.resize_stub(media_df, target=(224, 224))
    assert out.count() == 20
    r = out.first()
    assert (r.height, r.width) == (224, 224)
    assert isinstance(r.media, (bytes, bytearray))


def test_frame_sample_fanout(media_df):
    out = multimodal.frame_sample_stub(media_df, every_ms=500, max_frames=4)
    agg = out.groupBy("id").count().collect()
    assert all(1 <= r["count"] <= 4 for r in agg)
    ts = [r.ts_ms for r in out.filter(F.col("id") == 3).orderBy("frame_idx").collect()]
    assert ts == [i * 500 for i in range(len(ts))]
