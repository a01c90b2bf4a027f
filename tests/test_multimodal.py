"""Multimodal plumbing tests: decode stubs gate cleanly, the mapInPandas
feature path produces typed arrays, frame sampling is deterministic."""

from __future__ import annotations

import pytest

from kuibadb_spark.operators.multimodal import (
    decode_audio,
    decode_image,
    mm_fake_features,
    mm_frame_sample,
)

SF = "/root/testdata/sf0.001"


def test_decode_stubs_gate_missing_codecs():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n")
    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFF....WAVE")


def test_fake_features_schema_and_batches(spark):
    df = mm_fake_features(spark, SF)
    assert [f.simpleString() for f in df.schema.fields] == [
        "doc_id:bigint",
        "fmt:string",
        "n_bytes:int",
        "mean_byte:double",
        "first8:string",  # CSV at the boundary (driver canon can't hash lists)
    ]
    row = df.head()
    assert len(row.first8.split(",")) == 8
    assert all(0 <= int(x) <= 255 for x in row.first8.split(","))
    assert 0 <= row.mean_byte <= 255


def test_frame_sample_deterministic(spark):
    a = {tuple(r) for r in mm_frame_sample(spark, SF).collect()}
    b = {tuple(r) for r in mm_frame_sample(spark, SF).collect()}
    assert a == b and len(a) > 0
