"""Import-pipeline tests (model: reference tests/data/import_pipeline/):
conversion, UTC offset application, session relabel, quality flags,
duplicate detection, lake roundtrip, signal JSONL loading."""

from __future__ import annotations

import json
from datetime import datetime

import pytest
import pyspark.sql.functions as F

from finiextestingide_spark.operators.asof import asof_join
from finiextestingide_spark.sources import mql5_json as mj
from finiextestingide_spark.sources.signals import (
    neutral_defaults,
    per_symbol_signals,
    read_signal_archive,
    trim_to_range,
)


def export_file(tmp_path, name, *, symbol="EURUSD", broker="mt5", offset=0,
                ticks=None, drop_meta=None):
    meta = {
        "symbol": symbol,
        "broker_type": broker,
        "broker": "Test Broker Ltd.",
        "broker_utc_offset_hours": offset,
        "start_time": "2026.03.07 09:00:00",
        "data_format_version": "1.3.0",
        "symbol_info": {"point_value": 0.0001, "digits": 5, "tick_size": 0.00001,
                        "tick_value": 1.0},
    }
    for k in drop_meta or []:
        del meta[k]
    if ticks is None:
        ticks = [
            {"timestamp": "2026.03.07 09:00:00", "time_msc": 1772874000000,
             "collected_msc": 1772874000005, "bid": 1.08, "ask": 1.0801,
             "real_volume": 1.5, "spread_points": 1, "spread_pct": 0.009,
             "session": "WRONG"},
            {"timestamp": "2026.03.07 23:00:01", "time_msc": 1772924401000,
             "collected_msc": 1772924401009, "bid": 1.081, "ask": 1.0812,
             "real_volume": 0.5, "spread_points": 2, "spread_pct": 0.018,
             "session": "WRONG"},
        ]
    p = tmp_path / name
    p.write_text(json.dumps({"metadata": meta, "ticks": ticks}))
    return str(p)


def test_ingest_end_to_end(spark, tmp_path):
    export_file(tmp_path, "a_ticks.json", offset=2)
    lake = str(tmp_path / "lake")
    stats = mj.ingest(spark, str(tmp_path / "*_ticks.json"), lake)
    assert stats == {"ticks_written": 2, "files_rejected": 0, "files_duplicate": 0}

    out = mj.read_tick_lake(spark, lake).orderBy("time_msc").collect()
    # S3: broker +2h local -> UTC shifts BOTH timestamp and time_msc back 2h
    assert out[0]["timestamp"] == datetime(2026, 3, 7, 7, 0, 0)
    assert out[0]["time_msc"] == 1772874000000 - 2 * 3600_000
    # S4: session recomputed from corrected UTC hour (7 -> EUROPE band)
    assert out[0]["session"] != "WRONG"
    # S8: volume guaranteed from real_volume
    assert out[0]["volume"] == pytest.approx(1.5)
    # S2: float32 downcast survives parquet roundtrip
    assert dict(mj.read_tick_lake(spark, lake).dtypes)["bid"] == "float"
    # partition layout: broker_type/symbol
    assert (tmp_path / "lake" / "broker_type=mt5" / "symbol=EURUSD").exists()


def test_validation_rejects_bad_files(spark, tmp_path):
    export_file(tmp_path, "good_ticks.json")
    export_file(tmp_path, "nometa_ticks.json", drop_meta=["broker_type"])
    exports = mj.read_exports(spark, str(tmp_path / "*_ticks.json"))
    valid, rejected = mj.validate_exports(exports)
    assert valid.count() == 1
    rej = rejected.collect()
    assert len(rej) == 1
    assert "broker_type" in rej[0]["reject_reason"]
    assert "nometa" in rej[0]["source_file"]


def test_mandatory_tick_fields_filtered(spark, tmp_path):
    ticks = [
        {"timestamp": "2026.03.07 09:00:00", "bid": 1.0, "ask": 1.01},
        {"timestamp": None, "bid": 1.0, "ask": 1.01},        # no ts
        {"timestamp": "2026.03.07 09:00:02", "bid": None, "ask": 1.01},  # no bid
    ]
    export_file(tmp_path, "x_ticks.json", ticks=ticks)
    exports = mj.read_exports(spark, str(tmp_path / "x_ticks.json"))
    valid, _ = mj.validate_exports(exports)
    assert mj.explode_ticks(valid).count() == 1


def test_quality_flags(spark, tmp_path):
    ticks = [
        {"timestamp": "2026.03.07 09:00:00", "time_msc": 1, "bid": 1.0, "ask": 1.001,
         "spread_pct": 0.1},
        {"timestamp": "2026.03.07 09:00:01", "time_msc": 2, "bid": -1.0, "ask": 1.001,
         "spread_pct": 0.1},                                     # invalid price
        {"timestamp": "2026.03.07 09:00:02", "time_msc": 3, "bid": 1.0, "ask": 1.07,
         "spread_pct": 6.8},                                     # extreme spread
        {"timestamp": "2026.03.07 09:00:03", "time_msc": 4, "bid": 1.2, "ask": 1.201,
         "spread_pct": 0.1},                                     # >10% jump vs prev mid
    ]
    export_file(tmp_path, "q_ticks.json", ticks=ticks)
    exports = mj.read_exports(spark, str(tmp_path / "q_ticks.json"))
    valid, _ = mj.validate_exports(exports)
    rows = (
        mj.quality_flags(mj.relabel_sessions(mj.apply_utc_offset(mj.explode_ticks(valid))))
        .orderBy("time_msc")
        .collect()
    )
    assert [r["flag_invalid_price"] for r in rows] == [False, True, False, False]
    assert [r["flag_extreme_spread"] for r in rows] == [False, False, True, False]
    assert rows[3]["flag_price_jump"] is True


def test_duplicate_import_detection(spark, tmp_path):
    export_file(tmp_path, "a_ticks.json")
    lake = str(tmp_path / "lake")
    mj.ingest(spark, str(tmp_path / "a_ticks.json"), lake)
    log = spark.read.parquet(lake).select("source_file")
    # re-ingesting the same file against the log writes nothing new
    stats = mj.ingest(spark, str(tmp_path / "a_ticks.json"), lake, ingest_log=log)
    assert stats["ticks_written"] == 0
    assert stats["files_duplicate"] == 1


SIGNAL_LINES = [
    {"collected_msc": 1772870000000, "schema_version": "1.0", "status": "success",
     "result": [{"symbol": "BTCUSD", "signal": "BUY", "sentiment_score": 0.8,
                 "confidence": 0.9, "urgency": 0.1, "is_breaking": False}]},
    {"collected_msc": 1772874100000, "schema_version": "1.0", "status": "success",
     "result": [{"symbol": "BTCUSD", "signal": "HOLD", "sentiment_score": 0.1,
                 "confidence": 0.5, "urgency": 0.2, "is_breaking": False},
                {"symbol": "ETHUSD", "signal": "SELL", "sentiment_score": -0.4,
                 "confidence": 0.7, "urgency": 0.9, "is_breaking": True}]},
    {"collected_msc": 1772874200000, "schema_version": "2.0", "status": "success",
     "result": [{"symbol": "BTCUSD", "signal": "SELL", "sentiment_score": -0.9,
                 "confidence": 0.9, "urgency": 0.9, "is_breaking": True}]},
    {"collected_msc": 1772860000000, "schema_version": "1.0", "status": "success",
     "result": [{"symbol": "BTCUSD", "signal": "SELL", "sentiment_score": -0.2,
                 "confidence": 0.3, "urgency": 0.0, "is_breaking": False}]},
]


def test_signal_archive_version_gate_and_trim(spark, tmp_path):
    p = tmp_path / "signals.jsonl"
    p.write_text("\n".join(json.dumps(line) for line in SIGNAL_LINES))
    snaps = read_signal_archive(spark, str(p))
    assert snaps.count() == 3  # major-version 2.0 dropped

    start = datetime(2026, 3, 7, 9, 0, 0)   # 1772874000000 ms
    end = datetime(2026, 3, 8, 0, 0, 0)
    trimmed = trim_to_range(snaps, start, end).orderBy("collected_msc").collect()
    # two pre-start snapshots -> only the LATEST kept, plus the in-range one
    assert [r["collected_msc"] for r in trimmed] == [1772870000000, 1772874100000]


def test_per_symbol_extraction_and_neutral_default(spark, tmp_path):
    p = tmp_path / "signals.jsonl"
    p.write_text("\n".join(json.dumps(line) for line in SIGNAL_LINES[:2]))
    snaps = read_signal_archive(spark, str(p))
    eth = per_symbol_signals(snaps, "ETHUSD")
    assert eth.count() == 1  # first envelope has no ETHUSD entry -> no row

    # as-of join ticks to ETH signals; pre-signal tick gets neutral default
    ticks = spark.createDataFrame(
        [("ETHUSD", 1772870000500), ("ETHUSD", 1772874100500)],
        "symbol string, tick_ms long",
    )
    joined = neutral_defaults(
        asof_join(
            ticks,
            eth.drop("signal_ts"),
            on=["symbol"],
            left_ts="tick_ms",
            right_ts="collected_msc",
            how="left",
        )
    ).orderBy("tick_ms").collect()
    assert joined[0]["signal"] == "HOLD" and joined[0]["confidence"] == 0.0
    assert joined[1]["signal"] == "SELL" and joined[1]["is_breaking"] is True


def test_carve_stale_windows(spark, tmp_path):
    from finiextestingide_spark.sources.signals import carve_stale_windows

    p = tmp_path / "signals.jsonl"
    p.write_text("\n".join(json.dumps(line) for line in SIGNAL_LINES))
    snaps = read_signal_archive(spark, str(p))
    assert snaps.count() == 3
    # window covering exactly the middle snapshot (1772870000000 ms)
    windows = spark.createDataFrame(
        [(datetime.utcfromtimestamp(1772869000), datetime.utcfromtimestamp(1772871000))],
        "win_start timestamp, win_end timestamp",
    )
    kept = carve_stale_windows(snaps, windows).orderBy("collected_msc").collect()
    assert [r["collected_msc"] for r in kept] == [1772860000000, 1772874100000]
