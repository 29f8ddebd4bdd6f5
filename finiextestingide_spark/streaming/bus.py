"""Durable message-bus live ingress — the Kafka-shaped tick source
(SURVEY.md §2.9; VERDICT r10 "What's missing" #4).

The reference's production live feed is a broker websocket pushed into a
durable queue; the Spark-native equivalent is ``readStream.format
("kafka")``, whose output has ONE universal schema regardless of broker
(key/value binary + topic/partition/offset/timestamp). Everything this
engine needs from a bus lands in that shape, so the ingress is split into
a config-level reader (``read_kafka_ticks`` — the one-liner a production
user points at their brokers) and a pure-DataFrame decoder
(``decode_bus_ticks``) that is fully testable WITHOUT a broker: any
DataFrame with the wire shape (a file stream in tests, MemoryStream, a
real Kafka load) decodes identically, because the decoder never touches
the source.

Wire mapping (the live session contract of ``streaming/live_replay``):

- ``value`` — one JSON tick ``{symbol, time_msc, bid, ask}`` (epoch-ms
  event clock, the engine's unified batch/live key; same payload the
  socket source parses, so producers can switch transports without a
  re-serialize);
- ``timestamp`` (the bus APPEND time) -> ``collected_msc`` — the ingest
  clock, the reference's Tier-1 "collected" stamp and the #197 clipping
  monitor's tick_delta source;
- ``offset`` -> ``tick_seq`` — per-partition monotone, so intra-ms ties
  keep arrival order through the stable sorts (bug #385 contract) when
  the producer keys the topic by symbol (one symbol never spans
  partitions — the partitioning discipline every downstream keyed
  operator already assumes);
- malformed payloads decode to NULL structs and are DROPPED by default
  (``drop_malformed=False`` keeps them with NULL fields so an audit can
  count them — the quality-check posture of the batch ingest).

Scale posture: the decode is ``from_json`` + column casts — whole-stage
codegen in the scan, zero Python; a 1000-partition topic parallelizes at
the source and every downstream operator is already keyed by symbol.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

#: exactly the output schema of spark's format("kafka") source — the
#: decoder accepts ANY DataFrame of this shape (test streams included)
KAFKA_WIRE_DDL = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)

#: the JSON tick payload inside ``value`` (epoch-ms event clock)
TICK_VALUE_DDL = "symbol string, time_msc long, bid double, ask double"

#: the JSON signal payload for W7 signal streams over the same bus
SIGNAL_VALUE_DDL = "symbol string, sig_ts long, score double"


def decode_bus_ticks(
    bus: DataFrame, *, drop_malformed: bool = True
) -> DataFrame:
    """Kafka-wire rows -> live tick contract ``(symbol, timestamp,
    time_msc, collected_msc, bid, ask, tick_seq)``.

    Works on batch or streaming input; see module doc for the field
    mapping. The result feeds every live operator directly
    (``live_backtest``/``incremental_bars``/``reconcile_stream``...)."""
    v = F.from_json(F.col("value").cast("string"), TICK_VALUE_DDL)
    # r15 optimization (guide §4.4's duplicated-evaluation lesson, JSON
    # form): projecting v.getField(...) five times lets the optimizer's
    # JSON pruning rewrite each access into its OWN single-field
    # from_json, and predicate pushdown copies four more into the
    # malformed filter below the project — the wire payload was parsed up
    # to 9x per row. explode(array(v)) is a Generate producing exactly one
    # row per input; generated attributes block both rewrites, so the
    # payload is parsed ONCE and every field access is a plain struct
    # read. Same expressions, same outputs for any input (well-formed or
    # malformed), batch or streaming.
    parsed = bus.select(
        F.explode(F.array(v)).alias("__v"),
        # the BUS's append stamp (bus["timestamp"], not the event-time
        # alias below) is the ingest clock
        F.unix_millis(bus["timestamp"]).alias("collected_msc"),
        F.col("offset").alias("tick_seq"),
    )
    out = parsed.select(
        F.col("__v.symbol").alias("symbol"),
        F.timestamp_millis(F.col("__v.time_msc")).alias("timestamp"),
        F.col("__v.time_msc").alias("time_msc"),
        F.col("collected_msc"),
        F.col("__v.bid").alias("bid"),
        F.col("__v.ask").alias("ask"),
        F.col("tick_seq"),
    )
    if drop_malformed:
        out = out.where(
            F.col("symbol").isNotNull()
            & F.col("time_msc").isNotNull()
            & F.col("bid").isNotNull()
            & F.col("ask").isNotNull()
        )
    return out


def decode_bus_signals(bus: DataFrame) -> DataFrame:
    """Kafka-wire rows -> W7 signal contract ``(symbol, sig_ts, score)``."""
    v = F.from_json(F.col("value").cast("string"), SIGNAL_VALUE_DDL)
    # single-parse shape — see decode_bus_ticks
    return (
        bus.select(F.explode(F.array(v)).alias("__v"))
        .select(
            F.col("__v.symbol").alias("symbol"),
            F.timestamp_millis(F.col("__v.sig_ts")).alias("sig_ts"),
            F.col("__v.score").alias("score"),
        )
        .where(F.col("symbol").isNotNull() & F.col("sig_ts").isNotNull())
    )


def read_kafka_ticks(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    *,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """The production ingress one-liner: subscribe + decode.

    ``max_offsets_per_trigger`` is the engine's designated load-shedding
    knob (the clipping monitor records ``drop_stale`` but the ENGINE never
    drops ticks — backpressure belongs at the source; see
    operators/clipping.py).

    TESTED/UNTESTED BOUNDARY (VERDICT r11 missing #3): everything from the
    wire rows down — ``decode_bus_ticks``/``decode_bus_signals`` and every
    consumer — is hash-gated against oracles without a broker
    (gates ``bus_decode_ticks``/``bus_decode_signals``), because the
    decoder never touches the source. THIS function is only the
    source-construction one-liner; it requires the spark-sql-kafka
    package, which is absent in the development sandbox (re-checked
    round 13: no kafka jars in pyspark/jars, none resolvable), so the
    subscribe/load call itself has never executed here.
    ``tests/test_bus.py::test_read_kafka_ticks_boundary`` pins the
    split: with the package absent it asserts the loud
    missing-data-source failure; in an environment that has the package
    it asserts the returned plan carries the exact tick contract."""
    src = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        src = src.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    return decode_bus_ticks(src.load())


def encode_bus_signals(
    signals: DataFrame, *, topic: str = "signals", n_partitions: int = 8
) -> DataFrame:
    """Signal rows ``(symbol, sig_ts timestamp, score)`` -> Kafka-wire rows
    (the W7 producer side, and the gate harness for
    ``decode_bus_signals``): value = the JSON payload with ``sig_ts`` as
    epoch-ms, key/partition by symbol exactly like the tick producer, so
    one symbol's signals and ticks can ride separate topics of the same
    bus with the same partitioning discipline."""
    from pyspark.sql import Window

    part = F.pmod(F.xxhash64("symbol"), F.lit(n_partitions)).cast("int")
    w = Window.partitionBy(part).orderBy("sig_ts", "symbol")
    return signals.select(
        F.encode("symbol", "UTF-8").alias("key"),
        F.encode(
            F.to_json(
                F.struct(
                    F.col("symbol"),
                    F.unix_millis("sig_ts").alias("sig_ts"),
                    F.col("score"),
                )
            ),
            "UTF-8",
        ).alias("value"),
        F.lit(topic).alias("topic"),
        part.alias("partition"),
        (F.row_number().over(w) - 1).cast("long").alias("offset"),
        F.col("sig_ts").alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )


def encode_bus_ticks(
    ticks: DataFrame, *, topic: str = "ticks", n_partitions: int = 8
) -> DataFrame:
    """Tick rows -> Kafka-wire rows (the PRODUCER side, and the test/gate
    harness for the decoder): value = the JSON payload, key = symbol,
    partition = a symbol hash (one symbol never spans partitions),
    offset = the per-partition (time_msc, symbol) rank — monotone within
    a partition exactly like a real log. ``timestamp`` (the bus append
    stamp) is taken from the tick's event time here; a real bus stamps
    arrival, which only tightens the clipping deltas."""
    from pyspark.sql import Window

    part = F.pmod(F.xxhash64("symbol"), F.lit(n_partitions)).cast("int")
    w = Window.partitionBy(part).orderBy("time_msc", "symbol")
    return ticks.select(
        F.encode("symbol", "UTF-8").alias("key"),
        F.encode(
            F.to_json(F.struct("symbol", "time_msc", "bid", "ask")), "UTF-8"
        ).alias("value"),
        F.lit(topic).alias("topic"),
        part.alias("partition"),
        (F.row_number().over(w) - 1).cast("long").alias("offset"),
        F.timestamp_millis(F.col("time_msc")).alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
