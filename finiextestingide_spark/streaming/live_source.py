"""Live tick feed over a real network socket (SURVEY.md §1.4, §2.9).

The reference's second entry point is the live autotrader loop: a WebSocket
thread pushes ticks into a thread-safe queue, and the tick loop drains the
queue into the SAME per-tick pipeline the batch path uses (reference:
python/framework/autotrader/autotrader_tick_loop.py:47-60,
python/framework/process/tick_pipeline_core.py:1-16). The engine analogue is
Spark's socket source: an unbounded TCP line stream parsed into the tick
schema and fed through the identical streaming operators
(bars_stream/incremental_bars/asof_stream) — the unified batch/streaming
DataFrame API is the shared pipeline core, for free.

Two pieces live here:

- ``read_socket_ticks``: readStream socket -> one JSON object per line ->
  typed tick columns. The socket source is Spark's test/bench-grade
  unbounded source; in production the same parse chain sits behind a Kafka
  source (``readStream.format("kafka")`` + the identical from_json select).
- ``TickFeedServer``: an in-process TCP replay server for parity tests —
  serves a recorded feed to each connecting client (the reference's
  recorded-feed parity suite, tests/parity/test_bar_parity_kraken_spot_
  btcusd.py, drives the live pipeline from a recorded Kraken feed the same
  way). After the recorded lines are sent the connection is held open and
  an optional keepalive tick stream continues, because a live bar only
  closes when a LATER tick arrives (bar_renderer.py:147-194) — the
  keepalive is the market still ticking.

Scale posture: the socket source is single-connection by design (Spark
docs); the production path is Kafka with one partition per symbol shard —
every operator downstream of the parse is already keyed/partitioned by
symbol, so the swap is source-only.
"""

from __future__ import annotations

import json
import socket
import threading
import time
from collections.abc import Iterable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# the wire schema: one JSON object per line, timestamps as epoch MICROS (tick data is microsecond-stamped; millis would truncate and break batch parity)
TICK_WIRE_DDL = "symbol string, ts_us long, mid double, vol double, seq long"
SIGNAL_WIRE_DDL = "symbol string, ts_us long, score double"


def tick_line(symbol: str, ts_us: int, mid: float, vol: float = 1.0, seq: int = 0) -> str:
    """Serialize one tick to its wire line (test/replay producer side)."""
    return json.dumps(
        {"symbol": symbol, "ts_us": ts_us, "mid": mid, "vol": vol, "seq": seq},
        separators=(",", ":"),
    )


def signal_line(symbol: str, ts_us: int, score: float) -> str:
    return json.dumps(
        {"symbol": symbol, "ts_us": ts_us, "score": score}, separators=(",", ":")
    )


def read_socket_lines(spark: SparkSession, host: str, port: int) -> DataFrame:
    """Raw unbounded line stream from a TCP socket."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )


def parse_tick_lines(lines: DataFrame, *, wire_ddl: str = TICK_WIRE_DDL) -> DataFrame:
    """JSON wire lines -> typed tick columns. Malformed lines parse to a
    NULL struct and are dropped (a live feed must not kill the query on one
    bad frame — the reference's pydantic ``extra='ignore'`` posture)."""
    parsed = lines.select(F.from_json(F.col("value"), wire_ddl).alias("t"))
    return (
        parsed.where(F.col("t").isNotNull() & F.col("t.ts_us").isNotNull())
        .select("t.*")
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        .drop("ts_us")
    )


def read_socket_ticks(spark: SparkSession, host: str, port: int) -> DataFrame:
    """The live tick source: socket -> parsed typed tick stream with an
    event-time ``ts`` column, ready for bars_stream/asof_stream/
    incremental_bars."""
    return parse_tick_lines(read_socket_lines(spark, host, port))


def read_socket_signals(spark: SparkSession, host: str, port: int) -> DataFrame:
    """Signal feed variant (J1/W7 live path): symbol, sig_ts, score."""
    df = parse_tick_lines(
        read_socket_lines(spark, host, port), wire_ddl=SIGNAL_WIRE_DDL
    )
    return df.withColumnRenamed("ts", "sig_ts")


class TickFeedServer:
    """Threaded TCP replay server: every client that connects receives the
    recorded feed, then (optionally) a keepalive tick every
    ``keepalive_secs`` with advancing event time — the 'market keeps
    ticking' signal that lets watermarks pass and final bars close, exactly
    as the reference's live loop closes a bar only when the next bucket's
    first tick arrives.

    Usage::

        with TickFeedServer(lines, keepalive=make_keepalive) as srv:
            stream = read_socket_ticks(spark, "127.0.0.1", srv.port)
            ...
    """

    def __init__(
        self,
        lines: Iterable[str],
        *,
        keepalive: "callable | None" = None,
        keepalive_secs: float = 0.3,
        chunk_pause_secs: float = 0.0,
        chunk_lines: int = 0,
        initial_delay_secs: float = 0.0,
    ):
        self._lines = list(lines)
        self._keepalive = keepalive
        self._keepalive_secs = keepalive_secs
        self._chunk_pause = chunk_pause_secs
        self._chunk_lines = chunk_lines
        # delay before the first line: lets a companion feed (e.g. the
        # signal stream of an as-of pair) land its recorded history first,
        # the arrival order the reference's queue-fed loop guarantees
        self._initial_delay = initial_delay_secs
        self._stop = threading.Event()
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind(("127.0.0.1", 0))
        self._sock.listen(8)
        self.port = self._sock.getsockname()[1]
        self._threads: list[threading.Thread] = []
        self._accept_thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._accept_thread.start()

    def _accept_loop(self) -> None:
        self._sock.settimeout(0.2)
        while not self._stop.is_set():
            try:
                conn, _addr = self._sock.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            t = threading.Thread(target=self._serve, args=(conn,), daemon=True)
            t.start()
            self._threads.append(t)

    def _serve(self, conn: socket.socket) -> None:
        try:
            if self._initial_delay:
                if self._stop.wait(self._initial_delay):
                    return
            sent = 0
            for item in self._lines:
                if self._stop.is_set():
                    return
                # an item may be (delay_secs, line): sleep BEFORE sending —
                # per-line pacing for wall-clock-scripted replays (e.g. the
                # as-of parity drive, where each signal must be on the wire
                # before its dependent ticks, the arrival order a live feed
                # delivers by construction). The delay may also be a
                # threading.Event: the line is withheld until the caller
                # SETS it — the deterministic form of out-of-order scripting
                # (a test releases the late line only after observing the
                # state it must race against, instead of sleeping and hoping
                # the first micro-batch beat the timer).
                if isinstance(item, tuple):
                    delay, line = item
                    if isinstance(delay, threading.Event):
                        while not delay.wait(0.1):
                            if self._stop.is_set():
                                return
                    elif delay and self._stop.wait(delay):
                        return
                else:
                    line = item
                conn.sendall(line.encode("utf-8") + b"\n")
                sent += 1
                # optional pacing so the feed spans several micro-batches
                # (a real feed is never one burst)
                if self._chunk_lines and sent % self._chunk_lines == 0:
                    time.sleep(self._chunk_pause)
            seq = 0
            while not self._stop.is_set():
                if self._keepalive is not None:
                    conn.sendall(self._keepalive(seq).encode("utf-8") + b"\n")
                    seq += 1
                time.sleep(self._keepalive_secs)
        except (BrokenPipeError, ConnectionResetError, OSError):
            return  # client (query) went away first — normal shutdown order
        finally:
            try:
                conn.close()
            except OSError:
                pass

    def stop(self) -> None:
        self._stop.set()
        try:
            self._sock.close()
        except OSError:
            pass

    def __enter__(self) -> "TickFeedServer":
        return self

    def __exit__(self, *exc) -> None:
        self.stop()
