"""Tests for multimodal plumbing, scenario generation splits, and the
file-index/coverage surface."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
import pyspark.sql.functions as F

from finiextestingide_spark.operators.multimodal import (
    extract_features,
    frame_sample_stub,
    resize_stub,
    with_media_metadata,
)
from finiextestingide_spark.operators.scenario_gen import (
    blocks_split,
    volatility_split,
    walk_forward_split,
)
from finiextestingide_spark.sources.index import (
    build_file_index,
    coverage,
    range_query,
    relevant_files,
)

T0 = datetime(2026, 1, 5)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, bytes.fromhex("ffd8ff") + b"jpegpayload" * 30),
        (2, bytes.fromhex("89504e470d0a1a0a") + b"png!" * 50),
        (3, b"RIFF" + b"\x00" * 200),
        (4, b"garbage-bytes" * 10),
        (5, None),
    ]
    return spark.createDataFrame(rows, "media_id long, media binary")


def test_media_metadata_kind_sniff(spark, media):
    out = {r["media_id"]: r for r in with_media_metadata(media).collect()}
    assert out[1]["media_kind"] == "jpeg"
    assert out[2]["media_kind"] == "png"
    assert out[3]["media_kind"] == "riff"
    assert out[4]["media_kind"] == "unknown"
    assert out[1]["media_size_bytes"] == 3 + 11 * 30
    assert out[1]["media_sha"] is not None and len(out[1]["media_sha"]) == 64


def test_extract_features_deterministic(spark, media):
    a = {r["media_id"]: r for r in extract_features(media).collect()}
    b = {r["media_id"]: r for r in extract_features(media).collect()}
    assert a[1]["features"] == b[1]["features"]  # pure function of bytes
    assert len(a[1]["features"]) == 256
    assert (a[1]["height"], a[1]["width"]) == (16, 16)
    assert a[5]["features"] is None  # null media -> null features
    # histogram property: sum == payload length
    assert sum(a[3]["features"]) == pytest.approx(204)


def test_resize_stub_shapes(spark, media):
    out = {r["media_id"]: r for r in resize_stub(media, 8, 8).collect()}
    assert len(out[1]["media"]) == 64
    assert (out[1]["height"], out[1]["width"]) == (8, 8)
    assert out[5]["media"] is None


def test_frame_sample_stub(spark, media):
    out = frame_sample_stub(media, every_n=2).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    # id=3: 204 bytes -> 3 frames -> sampled idx 0, 2
    assert sorted(by_id[3]) == [0, 2]
    assert 5 not in by_id  # null media skipped


def test_blocks_split_roles(spark):
    out = blocks_split(spark, "X", T0, T0 + timedelta(days=9), 9, oos_every=3).collect()
    assert len(out) == 9
    roles = [r["role"] for r in sorted(out, key=lambda r: r["scenario_id"])]
    assert roles == ["IS", "IS", "OOS"] * 3
    assert out[0]["start_ts"] == T0
    assert sorted(out, key=lambda r: r["scenario_id"])[-1]["end_ts"] == T0 + timedelta(days=9)
    # contiguous, non-overlapping
    s = sorted(out, key=lambda r: r["start_ts"])
    for a, b in zip(s, s[1:]):
        assert a["end_ts"] == b["start_ts"]


def test_walk_forward_split(spark):
    out = walk_forward_split(
        spark, "X", T0, T0 + timedelta(days=10),
        train=timedelta(days=3), test=timedelta(days=1),
    ).collect()
    pairs = {}
    for r in out:
        pairs.setdefault(r["name"].rsplit("_", 1)[0], {})[r["role"]] = r
    assert len(pairs) == 7  # (10 - 4) / 1 + 1
    for p in pairs.values():
        assert p["IS"]["end_ts"] == p["OOS"]["start_ts"]
        assert p["OOS"]["end_ts"] - p["OOS"]["start_ts"] == timedelta(days=1)


def test_volatility_split_cuts_at_atr_minima(spark):
    # ATR profile with two obvious calm points at bars 30 and 60
    rows = []
    for i in range(90):
        atr = 5.0
        if i in (30, 60):
            atr = 0.1
        rows.append(("X", T0 + timedelta(hours=i), atr))
    bars = spark.createDataFrame(rows, "symbol string, bar_ts timestamp, atr double")
    out = volatility_split(bars, n_windows=3, min_separation_bars=10).collect()
    assert len(out) == 3
    cuts = sorted(r["start_ts"] for r in out)[1:]
    assert cuts == [T0 + timedelta(hours=30), T0 + timedelta(hours=60)]


def test_file_index_and_coverage(spark, tmp_path):
    rows = [
        ("mt5", "EURUSD", T0 + timedelta(seconds=i), 1.08, 1.081) for i in range(100)
    ] + [("mt5", "USDJPY", T0 + timedelta(seconds=i), 150.0, 150.02) for i in range(50)]
    df = spark.createDataFrame(
        rows, "broker_type string, symbol string, timestamp timestamp, bid double, ask double"
    )
    df.write.partitionBy("broker_type", "symbol").parquet(str(tmp_path / "lake"))
    lake = spark.read.parquet(str(tmp_path / "lake"))
    idx = build_file_index(lake).cache()
    cov = {r["symbol"]: r for r in coverage(idx).collect()}
    assert cov["EURUSD"]["rows"] == 100
    assert cov["USDJPY"]["rows"] == 50
    assert cov["EURUSD"]["start_ts"] == T0
    rel = relevant_files(idx, T0, T0 + timedelta(seconds=10))
    assert rel.count() >= 1
    rq = range_query(lake, T0, T0 + timedelta(seconds=4), limit=3)
    assert rq.count() == 3  # cap applied
