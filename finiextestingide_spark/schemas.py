"""Explicit StructTypes for every data contract (SURVEY.md §1.2).

The reference validates fixed schemas at ingest (reference:
python/framework/types/import_schema_types.py:132-148, TypedDict schemas
:39-124, pydantic signal envelopes signal_data_types.py:5-50). We encode the
same contracts as StructTypes and pass them to every reader — never
``inferSchema`` on the hot path: an explicit schema skips the sampling pass
and guarantees partition-pruning-friendly types at 100 TB.

Dtype discipline mirrors the reference (tick_importer.py:548-566):
prices/volumes float32, counters int32, ms-epoch columns int64; bar OHLCV is
float64 + int32 tick_count (vectorized_bar_renderer.py:197-207).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Tick columns on disk — the fixed projection list
# (reference: tick_importer.py:369-375).
TICK_SCHEMA = StructType(
    [
        StructField("timestamp", TimestampType(), False),
        StructField("time_msc", LongType(), False),
        StructField("collected_msc", LongType(), True),
        StructField("bid", FloatType(), False),
        StructField("ask", FloatType(), False),
        StructField("last", FloatType(), True),
        StructField("tick_volume", IntegerType(), True),
        StructField("real_volume", FloatType(), True),
        StructField("chart_tick_volume", IntegerType(), True),
        StructField("spread_points", IntegerType(), True),
        StructField("spread_pct", FloatType(), True),
        StructField("tick_flags", StringType(), True),
        StructField("session", StringType(), True),
        StructField("broker_type", StringType(), True),
        StructField("symbol", StringType(), True),
    ]
)

# Raw MQL5 JSON export envelope (reference: import_schema_types.py:39-124,
# sample data/raw_sample_data/mt5/*_ticks.json). Nested metadata objects are
# first-class structs here — better than the reference's JSON-string
# key-value parquet metadata (import_schema_types.py:151-155).
MQL5_EXPORT_SCHEMA = StructType(
    [
        StructField(
            "metadata",
            StructType(
                [
                    StructField("symbol", StringType(), False),
                    StructField("broker_type", StringType(), True),
                    StructField("data_collector", StringType(), True),
                    StructField("broker", StringType(), True),
                    StructField("broker_utc_offset_hours", IntegerType(), True),
                    StructField("start_time", StringType(), False),
                    StructField("data_format_version", StringType(), True),
                    StructField(
                        "symbol_info",
                        StructType(
                            [
                                StructField("point_value", DoubleType(), True),
                                StructField("digits", IntegerType(), True),
                                StructField("tick_size", DoubleType(), True),
                                StructField("tick_value", DoubleType(), True),
                            ]
                        ),
                        True,
                    ),
                    StructField(
                        "collection_settings",
                        StructType([StructField("max_ticks_per_file", IntegerType(), True)]),
                        True,
                    ),
                    StructField(
                        "error_tracking",
                        StructType([StructField("max_spread_percent", DoubleType(), True)]),
                        True,
                    ),
                ]
            ),
            False,
        ),
        StructField(
            "ticks",
            ArrayType(
                StructType(
                    [
                        StructField("timestamp", StringType(), False),
                        StructField("time_msc", LongType(), True),
                        StructField("collected_msc", LongType(), True),
                        StructField("bid", DoubleType(), False),
                        StructField("ask", DoubleType(), False),
                        StructField("last", DoubleType(), True),
                        StructField("tick_volume", IntegerType(), True),
                        StructField("real_volume", DoubleType(), True),
                        StructField("spread_points", IntegerType(), True),
                        StructField("spread_pct", DoubleType(), True),
                        StructField("tick_flags", StringType(), True),
                        StructField("session", StringType(), True),
                    ]
                )
            ),
            False,
        ),
    ]
)

# OHLCV bar (reference: market_data_types.py:47-110,
# vectorized_bar_renderer.py:197-207).
BAR_SCHEMA = StructType(
    [
        StructField("bar_ts", TimestampType(), False),
        StructField("symbol", StringType(), False),
        StructField("timeframe", StringType(), False),
        StructField("open", DoubleType(), False),
        StructField("high", DoubleType(), False),
        StructField("low", DoubleType(), False),
        StructField("close", DoubleType(), False),
        StructField("volume", DoubleType(), False),
        StructField("tick_count", IntegerType(), False),
    ]
)

# Signal snapshot envelope (reference: signal_data_types.py:20-50; JSONL
# archives under data/raw_sample_data/signals/). Arrays of structs are
# first-class.
SIGNAL_SCHEMA = StructType(
    [
        StructField("collected_msc", LongType(), False),
        StructField("schema_version", StringType(), True),
        StructField("timestamp", StringType(), True),
        StructField("status", StringType(), True),
        StructField(
            "result",
            ArrayType(
                StructType(
                    [
                        StructField("symbol", StringType(), False),
                        StructField("signal", StringType(), True),
                        StructField("sentiment_score", DoubleType(), True),
                        StructField("confidence", DoubleType(), True),
                        StructField("reasoning", StringType(), True),
                        StructField("urgency", DoubleType(), True),
                        StructField("is_breaking", BooleanType(), True),
                        StructField(
                            "sources",
                            ArrayType(
                                StructType(
                                    [
                                        StructField("article_id", StringType(), True),
                                        StructField("url", StringType(), True),
                                        StructField("title", StringType(), True),
                                        StructField("published_at", StringType(), True),
                                    ]
                                )
                            ),
                            True,
                        ),
                        StructField("basis", StringType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)

# Scenario rows drive the partitioned replay (reference:
# scenario_set_types.py; FIXTURES.md §5).
SCENARIO_SCHEMA = StructType(
    [
        StructField("scenario_id", IntegerType(), False),
        StructField("name", StringType(), False),
        StructField("broker_type", StringType(), True),
        StructField("symbol", StringType(), False),
        StructField("start_ts", TimestampType(), True),
        StructField("end_ts", TimestampType(), True),
        StructField("max_ticks", IntegerType(), True),
        StructField("warmup_bars", MapType(StringType(), IntegerType()), True),
        StructField("tick_processing_budget_ms", DoubleType(), True),
        StructField("latency_seed", IntegerType(), True),
        StructField("latency_min_ms", IntegerType(), True),
        StructField("latency_max_ms", IntegerType(), True),
        StructField("parameters", MapType(StringType(), StringType()), True),
        StructField("role", StringType(), True),
    ]
)

# Trade record emitted by the replay operator (reference:
# portfolio_trade_record_types.py:114, portfolio_types.py:100-155).
TRADE_SCHEMA = StructType(
    [
        StructField("scenario_id", IntegerType(), False),
        StructField("trade_id", IntegerType(), False),
        StructField("symbol", StringType(), False),
        StructField("direction", StringType(), False),
        StructField("lots", DoubleType(), False),
        StructField("entry_ts", TimestampType(), False),
        StructField("entry_price", DoubleType(), False),
        StructField("exit_ts", TimestampType(), True),
        StructField("exit_price", DoubleType(), True),
        StructField("gross_pnl", DoubleType(), True),
        StructField("fees", DoubleType(), True),
        StructField("net_pnl", DoubleType(), True),
        StructField("mae_pnl", DoubleType(), True),
        StructField("mfe_pnl", DoubleType(), True),
        StructField("mae_price", DoubleType(), True),
        StructField("mfe_price", DoubleType(), True),
        StructField("exit_reason", StringType(), True),
    ]
)

# Per-tick equity curve rows from the replay operator (reference:
# portfolio_manager.py:1080-1139).
EQUITY_SCHEMA = StructType(
    [
        StructField("scenario_id", IntegerType(), False),
        StructField("ts", TimestampType(), False),
        StructField("equity", DoubleType(), False),
        StructField("peak_equity", DoubleType(), False),
        StructField("drawdown", DoubleType(), False),
        StructField("max_drawdown", DoubleType(), False),
        StructField("open_positions", IntegerType(), False),
    ]
)

# Run-results ledger: append-only, identity as columns never paths
# (reference: run_results_ledger.py:1-37).
LEDGER_SCHEMA = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("sweep_id", StringType(), True),
        StructField("scenario_id", IntegerType(), False),
        StructField("scenario_name", StringType(), True),
        StructField("symbol", StringType(), True),
        StructField("role", StringType(), True),
        StructField("parameters", MapType(StringType(), StringType()), True),
        StructField("started_at", TimestampType(), True),
        StructField("finished_at", TimestampType(), True),
        StructField("status", StringType(), True),
        StructField("error", StringType(), True),
        StructField("ticks_processed", LongType(), True),
        StructField("trades", IntegerType(), True),
        StructField("wins", IntegerType(), True),
        StructField("losses", IntegerType(), True),
        StructField("gross_profit", DoubleType(), True),
        StructField("gross_loss", DoubleType(), True),
        StructField("net_pnl", DoubleType(), True),
        StructField("fees", DoubleType(), True),
        StructField("max_drawdown", DoubleType(), True),
        StructField("final_equity", DoubleType(), True),
        StructField("objective", DoubleType(), True),
    ]
)
