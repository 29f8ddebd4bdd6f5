"""Live clipping telemetry (#197): can the engine keep up with the feed?

The reference's ``LiveClippingMonitor``
(python/framework/autotrader/live_clipping_monitor.py:1-25 + type shapes in
types/autotrader_types/clipping_monitor_types.py) measures, per tick, the
REAL processing time against the inter-tick arrival interval: a tick whose
processing outlasts the gap to the next arrival is CLIPPED — the one
operational metric a live operator checks first. Phases: per-tick timing,
clipping detection, session counters (ticks_clipped / max_stale_ms /
avg_stale_ms), periodic interval reports, queue-depth watermark.

Two engine forms:

- ``ClippingMonitor`` — the per-session fold, reference-parity arithmetic,
  plain picklable data so it rides INSIDE a live session's streaming state
  (``live_backtest_generic(clipping=True)`` attaches one per key and wraps
  every ``process_tick`` with a perf_counter_ns measurement; arrival time
  is the wire's ``collected_msc`` ingest clock, the reference's tick_delta
  source). Unlike the reference, the raw per-tick time list is BOUNDED
  (last ``keep_times`` entries) — a months-lived session must not grow an
  unbounded float list in checkpoint state.
- ``clipping_report`` — the BATCH/fleet form: one aggregation over a
  telemetry ledger (arrival + processing_ms per tick) producing the
  session-summary row per group. At 100 TB this is a window-lag + groupBy,
  shuffling each group once; no driver participation.

Clock policy: the engine bans ambient wall-clock reads in DETERMINISTIC
operator surfaces; clipping is observational telemetry of real elapsed
time, so the live path measures with ``time.perf_counter_ns`` — but every
entry point takes the measurement as an ARGUMENT (``record_tick``,
``get_periodic_report(now_s)``), so tests drive the fold with synthesized
clocks and the arithmetic stays deterministic.

Strategy posture (reference Phase 6, stated honestly): the monitor
records ``queue_all``/``drop_stale`` but the ENGINE always processes
every tick (queue_all semantics) — in Structured Streaming, load
shedding is the SOURCE's job (``maxOffsetsPerTrigger``/rate limits on
the ingest side), and silently dropping ticks inside the keyed session
would break the live==batch parity contract every live gate pins. The
queue-depth phase maps to the micro-batch backlog (rows per key-batch),
the engine's analogue of ``queue.Queue.qsize()``.
"""

from __future__ import annotations

import time
from collections import deque
from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _host_boot_token() -> str:
    """Identity of the monotonic clock's origin: host + boot.

    ``time.monotonic()`` is CLOCK_MONOTONIC — since-boot, shared by EVERY
    process on the host — so report anchors taken by one pyspark worker
    are valid in any other worker on the same machine. That matters
    because the live paths pickle session state at the end of every
    micro-batch and a key's task routinely lands on a different worker
    process next batch (worker-pool churn): a per-PROCESS identity would
    re-anchor cadence nearly every batch, reproducing the very bug it was
    meant to fix (ADVICE r11 — the old null-anchor-on-every-pickle made
    the single per-batch ``get_periodic_report`` call always hit the
    re-anchor branch, so periodic reports never fired after batch 1).
    Only a genuine clock-origin change — another host, or a reboot —
    makes the anchor foreign (ADVICE r10: a foreign monotonic origin can
    suppress reports indefinitely or fire spuriously)."""
    import socket

    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            boot = f.read().strip()
    except OSError:  # non-Linux fallback: boot epoch, 4 s tolerance
        boot = str(round((time.time() - time.monotonic()) / 4.0))  # wall-clock-ok: host/boot identity for the monotonic-anchor token, not simulated time
    return f"{socket.gethostname()}:{boot}"


_CLOCK_TOKEN = _host_boot_token()


class ClippingMonitor:
    """Per-session clipping fold (reference LiveClippingMonitor parity).

    ``record_tick(processing_ns, tick_delta_ms)``: a tick is clipped when
    ``tick_delta_ms > 0`` and processing exceeded it; staleness is the
    overshoot. First-tick / unknown deltas pass 0 (never clipped).
    ``get_periodic_report(now_s)`` returns the interval report dict once
    ``report_interval_s`` has elapsed on the CALLER-SUPPLIED monotonic
    clock, then resets interval counters (the reference's Phase 4).
    ``session_summary()`` is the end-of-session roll-up (Phase 3 totals).
    """

    __slots__ = (
        "report_interval_s", "strategy", "keep_times",
        "total_ticks", "ticks_clipped", "total_stale_ms", "max_stale_ms",
        "max_processing_ms", "total_processing_ms", "max_queue_depth",
        "processing_times_ms", "last_arrival_ms", "_iv", "last_report_s",
    )

    def __init__(
        self,
        report_interval_s: float = 60.0,
        strategy: str = "queue_all",
        keep_times: int = 256,
        start_s: float = 0.0,
    ):
        if strategy not in ("queue_all", "drop_stale"):
            raise ValueError(f"unknown clipping strategy {strategy!r}")
        if strategy == "drop_stale":
            import warnings

            # VERDICT r10: the reference's live loop can actually skip
            # stale ticks under drop_stale; this engine records the
            # strategy but ALWAYS processes every tick (queue_all
            # semantics — load shedding is the streaming source's job,
            # and dropping inside the keyed session would break live==
            # batch parity). Be loud so a migrated config isn't silently
            # different behavior.
            warnings.warn(
                "ClippingMonitor(strategy='drop_stale'): recorded for "
                "telemetry only — this engine never drops ticks; shed load "
                "at the source (maxOffsetsPerTrigger / rate limits)",
                stacklevel=2,
            )
        self.report_interval_s = float(report_interval_s)
        self.strategy = strategy
        self.keep_times = int(keep_times)
        self.total_ticks = 0
        self.ticks_clipped = 0
        self.total_stale_ms = 0.0
        self.max_stale_ms = 0.0
        self.max_processing_ms = 0.0
        self.total_processing_ms = 0.0
        self.max_queue_depth = 0
        self.processing_times_ms: deque = deque(maxlen=self.keep_times)
        self.last_arrival_ms: int | None = None  # live-path delta anchor
        self._iv = self._fresh_interval()
        self.last_report_s = float(start_s)

    @staticmethod
    def _fresh_interval() -> dict:
        return {
            "ticks": 0, "clipped": 0, "stale_ms": 0.0, "max_stale_ms": 0.0,
            "max_processing_ms": 0.0, "total_processing_ms": 0.0,
            "max_queue_depth": 0,
        }

    def record_tick(self, processing_ns: int, tick_delta_ms: float) -> None:
        processing_ms = processing_ns / 1_000_000.0
        self.total_ticks += 1
        self.total_processing_ms += processing_ms
        self.processing_times_ms.append(processing_ms)
        if processing_ms > self.max_processing_ms:
            self.max_processing_ms = processing_ms
        iv = self._iv
        iv["ticks"] += 1
        iv["total_processing_ms"] += processing_ms
        if processing_ms > iv["max_processing_ms"]:
            iv["max_processing_ms"] = processing_ms
        if tick_delta_ms > 0 and processing_ms > tick_delta_ms:
            stale_ms = processing_ms - tick_delta_ms
            self.ticks_clipped += 1
            self.total_stale_ms += stale_ms
            if stale_ms > self.max_stale_ms:
                self.max_stale_ms = stale_ms
            iv["clipped"] += 1
            iv["stale_ms"] += stale_ms
            if stale_ms > iv["max_stale_ms"]:
                iv["max_stale_ms"] = stale_ms

    def record_arrival(self, arrival_ms: int, processing_ns: int) -> None:
        """Live-path convenience: fold one tick given its ARRIVAL stamp
        (the wire's collected_msc ingest clock); the monitor holds the
        previous arrival as the delta anchor. Out-of-order arrivals fold
        with delta 0 (never clipped) and do not move the anchor back."""
        if self.last_arrival_ms is None or arrival_ms < self.last_arrival_ms:
            delta = 0.0
        else:
            delta = float(arrival_ms - self.last_arrival_ms)
        if self.last_arrival_ms is None or arrival_ms > self.last_arrival_ms:
            self.last_arrival_ms = arrival_ms
        self.record_tick(processing_ns, delta)

    def record_queue_depth(self, depth: int) -> None:
        if depth > self.max_queue_depth:
            self.max_queue_depth = depth
        if depth > self._iv["max_queue_depth"]:
            self._iv["max_queue_depth"] = depth

    def __getstate__(self) -> dict:
        state = {s: getattr(self, s) for s in self.__slots__}
        # Stamp which host+boot (monotonic-clock origin) pickled this
        # state; __setstate__ re-anchors the report cadence ONLY when the
        # origin changed (see _host_boot_token). Per-micro-batch pickling
        # on the same host keeps the anchor so periodic reports keep
        # their cadence (ADVICE r11).
        state["_clock_token"] = _CLOCK_TOKEN
        return state

    def __setstate__(self, state: dict) -> None:
        token = state.pop("_clock_token", None)
        for k, v in state.items():
            setattr(self, k, v)
        if token != _CLOCK_TOKEN:
            # foreign (or legacy tokenless) state: the monotonic origin
            # is from another host/boot — re-anchor on first use
            self.last_report_s = None

    def get_periodic_report(self, now_s: float) -> dict | None:
        if self.last_report_s is None:
            # fresh anchor after an unpickle (new process, new monotonic
            # origin): start the interval from this observation
            self.last_report_s = now_s
            return None
        if now_s - self.last_report_s < self.report_interval_s:
            return None
        iv = self._iv
        if iv["ticks"] == 0:
            self.last_report_s = now_s
            return None
        report = {
            "interval_ticks": iv["ticks"],
            "interval_clipped": iv["clipped"],
            "interval_max_stale_ms": iv["max_stale_ms"],
            "interval_avg_stale_ms": (
                iv["stale_ms"] / iv["clipped"] if iv["clipped"] else 0.0
            ),
            "interval_max_processing_ms": iv["max_processing_ms"],
            "interval_avg_processing_ms": iv["total_processing_ms"] / iv["ticks"],
            "interval_max_queue_depth": iv["max_queue_depth"],
        }
        self._iv = self._fresh_interval()
        self.last_report_s = now_s
        return report

    def session_summary(self) -> dict:
        n, c = self.total_ticks, self.ticks_clipped
        return {
            "total_ticks": n,
            "ticks_clipped": c,
            "clipping_ratio": c / n if n else 0.0,
            "max_stale_ms": self.max_stale_ms,
            "avg_stale_ms": self.total_stale_ms / c if c else 0.0,
            "max_processing_ms": self.max_processing_ms,
            "avg_processing_ms": self.total_processing_ms / n if n else 0.0,
            "max_queue_depth": self.max_queue_depth,
            "processing_times_ms": list(self.processing_times_ms),
        }


#: one row per periodic interval report — ``key`` is the session key
#: (symbol or account) that emitted it. Kept in one place so the writer,
#: the reader, and the pytest parity pin can never drift.
TELEMETRY_REPORT_SCHEMA = (
    "key string, interval_ticks long, interval_clipped long, "
    "interval_max_stale_ms double, interval_avg_stale_ms double, "
    "interval_max_processing_ms double, interval_avg_processing_ms double, "
    "interval_max_queue_depth long"
)


def write_report_row(telemetry_dir: str, key: str, report: dict) -> None:
    """Append one periodic clipping report to a telemetry LEDGER as a
    self-contained JSON file (VERDICT r10 #4: executor-logger lines are
    greppable, not queryable — the reference's Phase 4 surfaces these
    rows to its monitoring consumer, live_clipping_monitor.py:1-25).

    One small file per report, written tmp-then-rename so a concurrent
    reader never sees a torn row; executors never coordinate (no shared
    file, no driver participation), which is the only append shape that
    is safe from inside a streaming state function. Dot-prefixed temp
    names are invisible to Spark's reader. Fleet roll-ups read the ledger
    back with ``read_clipping_telemetry``.

    Deployment requirement (ADVICE r11): ``telemetry_dir`` must be a
    filesystem SHARED by every executor and the reader (NFS/shared mount,
    or any path all nodes see) — on a multi-node cluster a plain local
    path scatters rows across machines and ``read_clipping_telemetry``
    silently returns only the reader-local slice. The tmp-then-rename
    atomicity also requires a POSIX-rename target: object stores (s3://,
    gs://) implement rename as copy+delete and can expose torn or
    duplicate rows — ledger to a real filesystem, roll up to the object
    store afterwards if needed."""
    import json
    import os

    os.makedirs(telemetry_dir, exist_ok=True)
    name = f"clip-{os.urandom(8).hex()}.json"
    tmp = os.path.join(telemetry_dir, f".{name}.tmp")
    with open(tmp, "w") as f:
        json.dump({"key": str(key), **report}, f)
    os.replace(tmp, os.path.join(telemetry_dir, name))


def read_clipping_telemetry(spark, telemetry_dir: str) -> DataFrame:
    """Read a clipping telemetry ledger back as rows — the queryable form
    of #197's interval reports (one row per report; aggregate across keys
    or time with plain DataFrame ops, or feed a dashboard)."""
    return spark.read.schema(TELEMETRY_REPORT_SCHEMA).json(
        f"{telemetry_dir}/clip-*.json"
    )


def clipping_report(
    telemetry: DataFrame,
    *,
    by: Sequence[str] = ("symbol",),
    arrival_us: str = "arrival_us",
    processing_ms: str = "processing_ms",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Session-summary clipping report from a per-tick telemetry ledger —
    the reference's ClippingSessionSummary computed as ONE Spark
    aggregation per group instead of an in-memory fold.

    ``telemetry``: one row per processed tick with its ARRIVAL stamp
    (``arrival_us``, microseconds — collected_msc*1000 or an ingest
    clock) and measured ``processing_ms``. The inter-tick delta is
    ``arrival - lag(arrival)`` per group in arrival order (the reference's
    tick_delta); a group's first tick has no delta and is never clipped.

    Output per group: ``total_ticks, ticks_clipped, clipping_ratio,
    max_stale_ms, avg_stale_ms, max_processing_ms, avg_processing_ms``
    (avg_stale over CLIPPED ticks, the reference convention; zeros when
    nothing clipped).

    Scale: one window shuffle on the group key (lag), one partial-agg
    groupBy on the same key — AQE coalesces them; no Python in the path."""
    order = [F.col(arrival_us)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(*by).orderBy(*order)
    delta_ms = (F.col(arrival_us) - F.lag(arrival_us).over(w)) / 1000.0
    p = F.col(processing_ms)
    stale = F.when((delta_ms > 0) & (p > delta_ms), p - delta_ms)
    rows = telemetry.select(
        *by, p.alias("__p"), stale.alias("__stale")
    )
    return rows.groupBy(*by).agg(
        F.count(F.lit(1)).alias("total_ticks"),
        F.count("__stale").alias("ticks_clipped"),
        (F.count("__stale") / F.count(F.lit(1))).alias("clipping_ratio"),
        F.coalesce(F.max("__stale"), F.lit(0.0)).alias("max_stale_ms"),
        F.coalesce(F.avg("__stale"), F.lit(0.0)).alias("avg_stale_ms"),
        F.max("__p").alias("max_processing_ms"),
        F.avg("__p").alias("avg_processing_ms"),
    )
