"""Unit tests for the non-indicator operator library: bars, as-of join,
equity/drawdown, gaps, dedup primitives, similarity, text."""

from __future__ import annotations

import pandas as pd
from datetime import datetime, timedelta
import pytest
import pyspark.sql.functions as F

from finiextestingide_spark.operators.asof import asof_join
from finiextestingide_spark.operators.bars import multi_timeframe_bars, ohlcv_bars
from finiextestingide_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    word_shingles,
)
from finiextestingide_spark.operators.equity import with_drawdown, with_excursions
from finiextestingide_spark.operators.gaps import detect_gaps
from finiextestingide_spark.operators.similarity import cosine_topk

T0 = datetime(2026, 1, 5)


def ts(sec: float) -> datetime:
    return T0 + timedelta(seconds=sec)


@pytest.fixture(scope="module")
def ticks(spark):
    # two symbols, ticks across two M1 buckets; duplicate-second rows with
    # time_msc tiebreak to pin open/close stability (reference bug #385).
    rows = [
        ("A", ts(1), 1000, 10.0, 1.0),
        ("A", ts(1), 1001, 11.0, 1.0),  # same second, later time_msc
        ("A", ts(30), 1002, 12.0, 2.0),
        ("A", ts(61), 1003, 9.0, 1.0),
        ("B", ts(2), 2000, 100.0, 5.0),
        ("B", ts(59), 2001, 90.0, 5.0),
    ]
    return spark.createDataFrame(
        rows, "symbol string, timestamp timestamp, time_msc long, mid double, vol double"
    )


def test_ohlcv_bars_basic(spark, ticks):
    out = {
        (r["symbol"], r["bar_ts"]): r
        for r in ohlcv_bars(ticks, "M1", volume="vol").collect()
    }
    a0 = out[("A", ts(0))]
    assert (a0["open"], a0["high"], a0["low"], a0["close"]) == (10.0, 12.0, 10.0, 12.0)
    assert a0["volume"] == 4.0 and a0["tick_count"] == 3
    a1 = out[("A", ts(60))]
    assert (a1["open"], a1["close"], a1["tick_count"]) == (9.0, 9.0, 1)
    b0 = out[("B", ts(0))]
    assert (b0["open"], b0["close"]) == (100.0, 90.0)
    assert len(out) == 3  # gap buckets absent


def test_ohlcv_open_close_tiebreak_on_time_msc(spark):
    # same timestamp, distinct time_msc: open = lowest msc, close = highest
    rows = [("A", ts(0), 5, 1.0), ("A", ts(0), 1, 2.0), ("A", ts(0), 9, 3.0)]
    df = spark.createDataFrame(rows, "symbol string, timestamp timestamp, time_msc long, mid double")
    r = ohlcv_bars(df, "M1").collect()[0]
    assert r["open"] == 2.0 and r["close"] == 3.0


def test_multi_timeframe_bars(spark, ticks):
    out = multi_timeframe_bars(ticks, ["M1", "H1"], volume="vol").collect()
    tfs = {r["timeframe"] for r in out}
    assert tfs == {"M1", "H1"}
    h1 = [r for r in out if r["timeframe"] == "H1" and r["symbol"] == "A"]
    assert len(h1) == 1 and h1[0]["tick_count"] == 4


def test_asof_join_backward_with_tie_and_staleness(spark):
    left = spark.createDataFrame(
        [("A", ts(10)), ("A", ts(20)), ("A", ts(100)), ("B", ts(10))],
        "symbol string, ev_ts timestamp",
    )
    right = spark.createDataFrame(
        [("A", ts(10), 1.0), ("A", ts(15), 2.0), ("B", ts(50), 9.0)],
        "symbol string, sig_ts timestamp, score double",
    )
    out = asof_join(
        left, right, on=["symbol"], left_ts="ev_ts", right_ts="sig_ts",
        how="left", tolerance_ms=30_000,
    ).collect()
    by = {(r["symbol"], r["ev_ts"]): r for r in out}
    assert by[("A", ts(10))]["score"] == 1.0  # <= tie visible
    assert by[("A", ts(20))]["score"] == 2.0
    assert by[("A", ts(100))]["score"] == 2.0
    assert by[("A", ts(100))]["is_stale"] is True  # 85s > 30s tolerance
    assert by[("A", ts(20))]["is_stale"] is False
    assert by[("B", ts(10))]["score"] is None  # no snapshot yet, kept by how=left


def test_asof_inner_drops_unmatched(spark):
    left = spark.createDataFrame([("B", ts(10))], "symbol string, ev_ts timestamp")
    right = spark.createDataFrame(
        [("B", ts(50), 9.0)], "symbol string, sig_ts timestamp, score double"
    )
    assert (
        asof_join(left, right, on=["symbol"], left_ts="ev_ts", right_ts="sig_ts").count() == 0
    )


def test_drawdown_running_peak(spark):
    rows = [("s", ts(i), e) for i, e in enumerate([100.0, 110.0, 105.0, 90.0, 120.0, 95.0])]
    df = spark.createDataFrame(rows, "scenario_id string, ts timestamp, equity double")
    out = [r for r in with_drawdown(df).orderBy("ts").collect()]
    assert [r["peak_equity"] for r in out] == [100.0, 110.0, 110.0, 110.0, 120.0, 120.0]
    assert [r["drawdown"] for r in out] == [0.0, 0.0, 5.0, 20.0, 0.0, 25.0]
    assert out[-1]["max_drawdown"] == 25.0


def test_excursions_mae_mfe(spark):
    rows = [
        ("p1", ts(1), -5.0, 99.5),
        ("p1", ts(2), 10.0, 101.0),
        ("p1", ts(3), -8.0, 99.2),
        ("p1", ts(4), 3.0, 100.3),
    ]
    df = spark.createDataFrame(rows, "position_id string, ts timestamp, unrealized_pnl double, price double")
    last = with_excursions(df).orderBy("ts").collect()[-1]
    assert last["mae_pnl"] == -8.0 and last["mae_price"] == 99.2
    assert last["mfe_pnl"] == 10.0 and last["mfe_price"] == 101.0


def test_gap_detection_and_classification(spark):
    rows = (
        [("A", ts(i * 60)) for i in range(3)]
        + [("A", ts(3 * 60 + 50 * 60))]        # 51-min gap (from ts=120s) -> MODERATE
        + [("A", ts(3 * 60 + 50 * 60 + 60 * 60 * 6))]  # 6h gap -> LARGE
    )
    df = spark.createDataFrame(rows, "symbol string, timestamp timestamp")
    gaps = detect_gaps(df, expected_interval_ms=60_000)
    got = [(r["gap_class"], r["gap_ms"]) for r in gaps.orderBy("gap_start").collect()]
    assert got == [("MODERATE", 51 * 60_000), ("LARGE", 6 * 3600_000)]


def test_exact_dedup_min_id_is_canonical(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in exact_dedup(df).collect()}
    assert out[1]["is_duplicate"] is False and out[1]["group_size"] == 2
    assert out[2]["is_duplicate"] is True and out[2]["canonical_id"] == 1
    assert out[3]["is_duplicate"] is False and out[3]["group_size"] == 1


def test_jaccard_and_lsh_agree_on_obvious_pair(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and again today"),
            (3, "completely different content about spark query planning engines"),
        ],
        "doc_id long, text string",
    )
    sh = word_shingles(docs, n=3)
    jp = jaccard_pairs(sh, min_intersection=1, min_jaccard=0.5).collect()
    assert {(r["id_a"], r["id_b"]) for r in jp} == {(1, 2)}
    # doc1 has 10 3-shingles, doc2 has 11, all 10 shared
    (pair,) = jp
    assert pair["jaccard"] == pytest.approx(10 / 11)
    sigs = minhash_signatures(sh, num_hashes=32)
    cands = lsh_candidate_pairs(sigs, num_hashes=32, bands=16).collect()
    assert (1, 2) in {(r["id_a"], r["id_b"]) for r in cands}


def test_cosine_topk_orders_by_similarity(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    query = spark.createDataFrame([([1.0, 0.0],)], "embedding array<double>")
    out = cosine_topk(emb, query, k=2).orderBy("rank").collect()
    assert [r["vec_id"] for r in out] == [1, 2]
    assert out[0]["cosine"] == pytest.approx(1.0)


# --- swap accrual (R6): closed-form rollover count vs brute-force day walk ---


def test_swap_rollovers_match_bruteforce(spark):
    from datetime import date

    from finiextestingide_spark.operators.swap import with_swap_fee

    rows = []
    d0 = date(2024, 1, 1)  # a Monday
    for open_off in range(14):
        for held in [0, 1, 2, 3, 6, 7, 8, 13, 14, 20, 30]:
            o = d0 + timedelta(days=open_off)
            rows.append((f"p{open_off}_{held}", o, o + timedelta(days=held)))
    df = spark.createDataFrame(rows, "pid string, open_ts date, close_ts date").withColumn(
        "swap_rate", F.lit(1.0)
    ).withColumn("lots", F.lit(1.0))
    out = {
        r["pid"]: r
        for r in with_swap_fee(df, triple_weekday=3).collect()
    }
    for pid, o, c in rows:
        nights = (c - o).days
        # brute force: midnights crossed are the starts of days o+1 .. o+nights
        crossed = [o + timedelta(days=k) for k in range(1, nights + 1)]
        triples = sum(1 for d in crossed if d.isoweekday() == 3)
        r = out[pid]
        assert r["nights"] == nights, pid
        assert r["triple_rollovers"] == triples, pid
        assert r["swap_fee"] == pytest.approx(nights + 2 * triples), pid


def test_warmup_bars_and_interval_overlap(spark):
    from finiextestingide_spark.operators.scenario_prep import (
        interval_overlap_join,
        warmup_bars,
    )

    bars = spark.createDataFrame(
        [("A", ts(60 * k), 10.0 + k) for k in range(10)] + [("B", ts(60 * k), 5.0) for k in range(4)],
        "symbol string, bar_ts timestamp, close double",
    )
    scen = spark.createDataFrame(
        [("s1", "A", ts(60 * 5)), ("s2", "B", ts(60 * 100))],
        "scenario string, symbol string, start_ts timestamp",
    )
    out = warmup_bars(bars, scen, 3).collect()
    got = {(r["scenario"], r["bars_back"]): r["close"] for r in out}
    # s1: bars strictly before minute 5 -> minutes 4,3,2
    assert got[("s1", 1)] == 14.0 and got[("s1", 2)] == 13.0 and got[("s1", 3)] == 12.0
    # s2: all 4 B bars qualify, capped at 3
    assert sum(1 for r in out if r["scenario"] == "s2") == 3

    files = spark.createDataFrame(
        [("A", "f1", ts(0), ts(100)), ("A", "f2", ts(200), ts(300)), ("B", "f3", ts(0), ts(50))],
        "symbol string, file string, min_ts timestamp, max_ts timestamp",
    )
    ranges = spark.createDataFrame(
        [("r1", "A", ts(90), ts(250))],
        "range_id string, symbol string, start_ts timestamp, end_ts timestamp",
    )
    hits = sorted(r["file"] for r in interval_overlap_join(files, ranges).collect())
    assert hits == ["f1", "f2"]


def test_cascade_bars_equal_direct(spark):
    """Rolling coarse frames up from M1 bars must equal aggregating ticks
    directly (aggregate composability — the 100 TB render path)."""
    from finiextestingide_spark.operators.bars import (
        cascade_timeframe_bars,
        multi_timeframe_bars,
    )

    rows = []
    for i in range(500):
        t = ts(37 * i)  # irregular spacing across hours
        rows.append(("A", t, 1000 + i, 100.0 + ((i * 7) % 23) * 0.3, 1.0 + i % 3))
        if i % 3 == 0:
            rows.append(("B", t, 2000 + i, 50.0 + ((i * 5) % 17) * 0.2, 2.0))
    ticks = spark.createDataFrame(
        rows, "symbol string, timestamp timestamp, time_msc long, mid double, vol double"
    )
    kw = dict(ts="timestamp", key="symbol", price="mid", volume="vol", tiebreak="time_msc")
    tfs = ("M1", "M5", "M15", "H1", "D1")
    direct = {
        (r["timeframe"], r["symbol"], r["bar_ts"]): r
        for r in multi_timeframe_bars(ticks, tfs, **kw).collect()
    }
    cascade = {
        (r["timeframe"], r["symbol"], r["bar_ts"]): r
        for r in cascade_timeframe_bars(ticks, tfs, **kw).collect()
    }
    assert set(direct) == set(cascade)
    for k, d in direct.items():
        c = cascade[k]
        for col in ("open", "high", "low", "close", "tick_count"):
            assert c[col] == d[col], (k, col)
        assert c["volume"] == pytest.approx(d["volume"]), k


def test_asof_duplicate_right_ts_is_deterministic(spark):
    """Several right rows tied on (key, ts): the tiebreak column's greatest
    value wins, and the result is identical across input partitionings
    (regression for the partition-order-dependent F.last pick)."""
    import pyspark.sql.functions as F

    left = spark.createDataFrame(
        [("A", ts(20)), ("A", ts(40))], "symbol string, ev_ts timestamp"
    )
    dup_rows = [("A", ts(10), float(v), v) for v in (3, 1, 2)]
    outs = []
    for nparts in (1, 2, 7):
        right = spark.createDataFrame(
            dup_rows, "symbol string, sig_ts timestamp, score double, seq int"
        ).repartition(nparts)
        out = asof_join(
            left, right, on=["symbol"], left_ts="ev_ts", right_ts="sig_ts",
            tiebreak="seq",
        )
        outs.append(sorted((r["ev_ts"], r["score"], r["seq"]) for r in out.collect()))
    assert outs[0] == outs[1] == outs[2]
    assert all(seq == 3 for _, _, seq in outs[0])  # greatest tiebreak wins

    # default (no tiebreak): still deterministic across partitionings via
    # the payload-struct fallback ordering
    base = None
    for nparts in (1, 3, 5):
        right = spark.createDataFrame(
            dup_rows, "symbol string, sig_ts timestamp, score double, seq int"
        ).repartition(nparts)
        out = asof_join(
            left, right, on=["symbol"], left_ts="ev_ts", right_ts="sig_ts"
        )
        got = sorted((r["ev_ts"], r["score"], r["seq"]) for r in out.collect())
        base = got if base is None else base
        assert got == base


def test_deterministic_sample_stable_across_partitionings(spark):
    """The sampled row set must be identical for any partition layout and
    re-run (the curation contract `.sample()` cannot give)."""
    from finiextestingide_spark.operators.sampling import sample_deterministic

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(200)], "doc_id long, text string"
    )
    sets_ = []
    for nparts in (1, 4, 9):
        out = sample_deterministic(docs.repartition(nparts), 25)
        sets_.append(sorted(r["doc_id"] for r in out.collect()))
    assert sets_[0] == sets_[1] == sets_[2]
    assert 20 <= len(sets_[0]) <= 80  # ~25% of 200, loose band


def test_asof_join_map_payload(spark):
    """Right payloads containing non-orderable types (MapType) must work
    when tiebreak is None — the fallback sort key is restricted to the
    orderable payload columns (ADVICE regression)."""
    left = spark.createDataFrame(
        [("A", ts(20))], "symbol string, ev_ts timestamp"
    )
    right = spark.createDataFrame(
        [("A", ts(10), {"k": "v"}, 1.0), ("A", ts(15), {"k": "w"}, 2.0)],
        "symbol string, sig_ts timestamp, props map<string,string>, score double",
    )
    out = asof_join(
        left, right, on=["symbol"], left_ts="ev_ts", right_ts="sig_ts"
    ).collect()
    assert len(out) == 1 and out[0]["score"] == 2.0 and out[0]["props"] == {"k": "w"}


def test_dedup_keep_best_string_ids(spark):
    """exact_dedup_keep_best advertises a generic id_col; string doc_ids
    must work (ADVICE regression for the old numeric-only max_by argmax)."""
    from finiextestingide_spark.operators.dedup import exact_dedup_keep_best

    docs = spark.createDataFrame(
        [("doc-b", "same text", 0.9), ("doc-a", "same text", 0.9),
         ("doc-c", "same text", 0.5), ("doc-z", "other", 0.1)],
        "doc_id string, text string, q double",
    )
    out = {r["doc_id"]: r for r in
           exact_dedup_keep_best(docs, F.col("q"), id_col="doc_id").collect()}
    # highest score wins, tie breaks to smallest id
    assert out["doc-a"]["keep_id"] == "doc-a" and not out["doc-a"]["is_dropped"]
    assert out["doc-b"]["is_dropped"] and out["doc-c"]["is_dropped"]
    assert not out["doc-z"]["is_dropped"]


def test_connected_components_long_chain_converges(spark):
    """A 30-node chain (diameter > the old max_iter linear-propagation
    budget) must converge to ONE cluster via pointer doubling instead of
    silently returning split labels (ADVICE regression)."""
    from finiextestingide_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 30)], "id_a long, id_b long"
    )
    got = {r["node"]: r["cluster_id"] for r in connected_components(edges).collect()}
    assert set(got.values()) == {1} and len(got) == 30


def test_connected_components_known_graph(spark):
    from finiextestingide_spark.operators.dedup import connected_components

    # two chains and an isolated pair: {1-2-3-4}, {10-11}, {20-21-22}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (21, 20), (21, 22)],
        "id_a long, id_b long",
    )
    got = {r["node"]: r["cluster_id"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_ansi_degenerate_data_yields_null_not_crash(spark):
    """Spark 4 ANSI mode turns zero denominators into runtime errors;
    degenerate inputs (flat prices -> zero ATR, zero vectors) must yield
    null/empty results instead (regression for the division guards)."""
    from finiextestingide_spark.operators.extremes import extreme_move_candidates
    from finiextestingide_spark.operators.similarity import cosine

    bars = spark.createDataFrame(
        [("X", ts(60 * i), 100.0, 100.0, 100.0, 100.0, 0.0, 5) for i in range(30)],
        "symbol string, bar_ts timestamp, open double, high double, low double, "
        "close double, atr double, tick_count long",
    )
    out = extreme_move_candidates(bars, window_sizes=(8,), min_atr_multiple=1.0)
    assert out.count() == 0  # flat windows drop out; no DIVIDE_BY_ZERO

    import pyspark.sql.functions as F

    vecs = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    row = vecs.crossJoin(
        vecs.where(F.col("vec_id") == 2).select(F.col("embedding").alias("q"))
    ).select("vec_id", cosine(F.col("embedding"), F.col("q")).alias("c")).collect()
    by = {r["vec_id"]: r["c"] for r in row}
    assert by[1] is None and by[2] == 1.0


def test_gap_calendar_holiday_and_split(spark):
    """W9 extended: HOLIDAY classification and multi-weekend splitting
    (reference market_calendar.py:31,400-418,501)."""
    from datetime import datetime

    import pyspark.sql.functions as F

    from finiextestingide_spark.operators.gaps import (
        classify_gap,
        detect_gaps,
        split_gaps_at_market_boundaries,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stamps = [
        "2025-12-24 18:00:00",  # Wed before Christmas
        "2025-12-26 10:00:00",  # 40h gap containing Dec 25 -> HOLIDAY
        "2026-01-09 21:00:00",  # Fri; ~347h -> split across 2 weekends
        "2026-01-11 21:00:00",  # Sun; 48h -> WEEKEND primary
    ]
    ticks = spark.createDataFrame(
        [("X", datetime.fromisoformat(s)) for s in stamps], "symbol string, ts timestamp"
    )
    segs = split_gaps_at_market_boundaries(
        detect_gaps(ticks, 1000, key="symbol", ts="ts")
    ).withColumn(
        "cls",
        classify_gap(
            F.col("segment_ms"),
            F.col("segment_start"),
            F.col("segment_end"),
            weekend_closure=True,
        ),
    )
    rows = segs.orderBy("segment_start").collect()
    classes = [r["cls"] for r in rows]
    assert classes[0] == "HOLIDAY"  # Dec 25 inside, not a weekend pattern
    assert "WEEKEND" in classes[1:]  # split produced exact weekend segments
    # the long gap split at Fri-20:00/Sun-22:00 boundaries (2 weekends + NY)
    long_gap = [r for r in rows if r["n_segments"] > 1]
    assert long_gap and long_gap[0]["n_segments"] >= 4
    # final 48h Fri-21:00 -> Sun-21:00 gap is a single WEEKEND segment
    assert classes[-1] == "WEEKEND" and rows[-1]["n_segments"] == 1


def test_ngram_contamination_fractions(spark):
    """Train/eval n-gram overlap audit: exact fractions on a known corpus."""
    from finiextestingide_spark.operators.dedup import word_shingles
    from finiextestingide_spark.operators.text import ngram_contamination

    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "one two three four five")],
        "doc_id int, text string",
    )
    ev = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta"),  # fully contained -> 1.0
            (11, "zz yy xx ww"),  # disjoint -> 0.0
            (12, "one two three nine ten"),  # shares 'one two three' only
        ],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in ngram_contamination(
            word_shingles(train, 3), word_shingles(ev, 3)
        ).collect()
    }
    assert out[10]["contamination"] == 1.0
    assert out[11]["contamination"] == 0.0
    # eval doc 12 has 3 shingles; only "one two three" appears in train
    assert out[12]["n_shingles"] == 3 and out[12]["n_contaminated"] == 1


def test_neardup_dedup_keep_best_clusters_and_singletons(spark):
    """Cluster keep-policy: the highest-score member survives per near-dup
    cluster; singletons keep themselves."""
    import pyspark.sql.functions as F

    from finiextestingide_spark.operators.dedup import neardup_dedup_keep_best

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        [
            (1, base + " extra"),
            (2, base),  # near-dup of 1
            (3, "completely different words nothing shared here at all now"),
        ],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in neardup_dedup_keep_best(
            docs, F.length("text").cast("double"), min_jaccard=0.3
        ).collect()
    }
    # 1 and 2 cluster together; 1 has the longer text -> higher score -> kept
    assert out[1]["cluster_id"] == out[2]["cluster_id"]
    assert out[1]["keep_id"] == 1 and not out[1]["is_dropped"]
    assert out[2]["keep_id"] == 1 and out[2]["is_dropped"]
    assert out[1]["cluster_size"] == 2
    # 3 is a singleton keeping itself
    assert out[3]["cluster_id"] == 3 and out[3]["keep_id"] == 3
    assert out[3]["cluster_size"] == 1 and not out[3]["is_dropped"]


def test_lloyd_centroids_known_clusters(spark):
    """Quantized Lloyd k-means: two obvious clusters converge to their
    member means; init = lowest-id vectors."""
    from finiextestingide_spark.operators.similarity import lloyd_centroids

    # cosine k-means clusters by DIRECTION: one cluster along +x, one
    # along +y; init = the two lowest-id vectors (one per direction)
    rows = [
        (0, [1.0, 0.1]),
        (1, [0.1, 1.0]),
        (2, [0.9, 0.0]),
        (3, [0.0, 0.9]),
        (4, [1.1, 0.2]),
        (5, [0.2, 1.1]),
    ]
    vecs = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    cents = {
        r["centroid_id"]: [round(v, 4) for v in r["embedding"]]
        for r in lloyd_centroids(vecs, k=2, iters=3).collect()
    }
    x_members = [(1.0, 0.1), (0.9, 0.0), (1.1, 0.2)]
    y_members = [(0.1, 1.0), (0.0, 0.9), (0.2, 1.1)]
    assert cents[0] == [
        round(sum(a for a, _ in x_members) / 3, 4),
        round(sum(b for _, b in x_members) / 3, 4),
    ]
    assert cents[1] == [
        round(sum(a for a, _ in y_members) / 3, 4),
        round(sum(b for _, b in y_members) / 3, 4),
    ]


def test_reconcile_orders_all_classes(spark):
    """J6 reconciliation: every status class on a crafted ledger."""
    import pyspark.sql.functions as F

    from finiextestingide_spark.operators.reconcile import reconcile_orders

    orders = spark.createDataFrame(
        [(1, 100.0), (2, 50.0), (3, 80.0), (4, 30.0)], "k long, amt double"
    )
    execs = spark.createDataFrame(
        [(1, 60.0), (1, 40.0), (2, 20.0), (3, 95.0), (9, 10.0)], "k long, q double"
    )
    out = {
        r["k"]: r.asDict()
        for r in reconcile_orders(
            orders, execs, order_key="k", expected=F.col("amt"), executed=F.sum("q")
        ).collect()
    }
    assert out[1]["status"] == "MATCHED" and out[1]["n_executions"] == 2
    assert out[2]["status"] == "UNDER_EXECUTED"
    assert out[3]["status"] == "OVER_EXECUTED"
    assert out[4]["status"] == "MISSING" and out[4]["n_executions"] == 0
    assert out[9]["status"] == "ORPHAN"


def test_lloyd_centroids_sparse_and_string_ids(spark):
    """Seed init must be the k smallest ids regardless of id dtype or
    density (judge r4 finding: `id < k` silently under-seeded sparse/string
    keyed corpora). Offset int ids and string ids both yield exactly k
    centroids, numbered 0..k-1 in id order."""
    from finiextestingide_spark.operators.similarity import lloyd_centroids

    rows = [
        (1000, [1.0, 0.1]),
        (1001, [0.1, 1.0]),
        (1002, [0.9, 0.0]),
        (1003, [0.0, 0.9]),
    ]
    vecs = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    cents = lloyd_centroids(vecs, k=2, iters=2).collect()
    assert sorted(r["centroid_id"] for r in cents) == [0, 1]

    srows = [(f"doc-{i:03d}", v) for i, (_, v) in enumerate(rows)]
    svecs = spark.createDataFrame(srows, "vec_id string, embedding array<float>")
    scents = lloyd_centroids(svecs, k=2, iters=2).collect()
    assert sorted(r["centroid_id"] for r in scents) == [0, 1]
    # same geometry => same centroid vectors as the int-id run
    assert {tuple(r["embedding"]) for r in scents} == {
        tuple(r["embedding"]) for r in cents
    }


def test_neardup_pairs_blocked_skew_guard(spark):
    """A block whose candidate pair count n*(n-1)/2 exceeds the
    max_block_pairs budget raises before launching the quadratic join
    (round-9: a PAIRS budget, not a row cap — the sf10 sweep caught a
    fixed-cardinality block key slipping 2.4e8-pair blocks under the old
    50k ROW cap); None disables the guard."""
    import pytest as _pytest

    from finiextestingide_spark.operators.similarity import neardup_pairs_blocked

    rows = [(i, "hot", [1.0, 0.0]) for i in range(8)] + [(99, "cold", [0.0, 1.0])]
    vecs = spark.createDataFrame(rows, "vec_id int, block string, embedding array<float>")
    # hot block: 8 rows = 28 pairs > 20 -> budget trips, message names both
    with _pytest.raises(ValueError, match="28 candidate pairs.*max_block_pairs"):
        neardup_pairs_blocked(vecs, "block", max_block_pairs=20)
    # 28 pairs <= 28: the exact boundary passes
    out = neardup_pairs_blocked(vecs, "block", max_block_pairs=28).collect()
    assert len(out) == 8 * 7 // 2
    out = neardup_pairs_blocked(vecs, "block", max_block_pairs=None).collect()
    assert len(out) == 8 * 7 // 2  # all-pairs inside the hot block only


def test_token_budget_greedy_skips_oversized_and_continues(spark):
    """Greedy skip-and-continue: an oversized mid-rank doc is skipped and
    smaller lower-ranked docs still fill the budget — where the prefix-cut
    variant ends the group's selection at the first overflow."""
    from finiextestingide_spark.operators.sampling import (
        token_budget_sample,
        token_budget_sample_greedy,
    )

    rows = [
        # (doc_id, lang, n_tokens, quality) — rank order: 1, 2, 3, 4
        (1, "en", 40, 0.9),
        (2, "en", 100, 0.8),  # oversized: overflows a 100-token budget
        (3, "en", 30, 0.7),
        (4, "en", 25, 0.6),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, lang string, n_tokens int, quality double")

    prefix = {r["doc_id"]: r["selected"]
              for r in token_budget_sample(docs, 100).collect()}
    assert prefix == {1: True, 2: False, 3: False, 4: False}

    greedy = {r["doc_id"]: (r["selected"], r["kept_tokens"])
              for r in token_budget_sample_greedy(docs, 100).collect()}
    assert greedy == {1: (True, 40), 2: (False, 40), 3: (True, 70), 4: (True, 95)}


def test_result_cache_hit_skips_source_entirely(spark, tmp_path):
    """Second call with unchanged inputs+params is a pure cache read:
    compute() must not be invoked (throwing callback) and every file
    backing the returned DataFrame lives under the cache dir — zero
    source files in the scan."""
    import pyspark.sql.functions as F

    from finiextestingide_spark.operators.result_cache import ResultCache

    src = str(tmp_path / "src")
    spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    ).write.parquet(src)
    cache_dir = str(tmp_path / "cache")
    cache = ResultCache(cache_dir)
    params = {"mod": 7}

    def compute():
        return spark.read.parquet(src).groupBy("k").count().orderBy("k")

    first = cache.get_or_compute(spark, "counts", [src], params, compute)
    expect = sorted((r["k"], r["count"]) for r in first.collect())

    def recomputed():
        raise AssertionError("cache miss on unchanged inputs")

    second = cache.get_or_compute(spark, "counts", [src], params, recomputed)
    assert sorted((r["k"], r["count"]) for r in second.collect()) == expect
    backing = second.inputFiles()
    assert backing and all(cache_dir in f for f in backing)
    assert not any(src in f for f in backing)


def test_result_cache_invalidates_on_source_and_param_change(spark, tmp_path):
    """New source file -> new fingerprint -> recompute reflects the new
    data; param change alone also recomputes; superseded entries dropped."""
    import os
    import time

    import pyspark.sql.functions as F

    from finiextestingide_spark.operators.result_cache import ResultCache

    src = str(tmp_path / "src")
    spark.range(10).select(F.col("id")).write.parquet(src)
    cache = ResultCache(str(tmp_path / "cache"))

    def compute():
        return spark.read.parquet(src).agg(F.count(F.lit(1)).alias("n"))

    assert cache.get_or_compute(spark, "n", [src], {}, compute).collect()[0]["n"] == 10

    time.sleep(0.05)  # ensure a distinct mtime on the appended file
    spark.range(5).select(F.col("id")).write.mode("append").parquet(src)
    info_after = cache.lookup("n", [src], {})
    assert not info_after.hit  # staleness detected before any compute
    assert cache.get_or_compute(spark, "n", [src], {}, compute).collect()[0]["n"] == 15

    # param change is its own fingerprint
    info_params = cache.lookup("n", [src], {"threshold": 2})
    assert not info_params.hit
    # one entry per name after the rewrite (superseded fingerprint dropped)
    name_dir = os.path.join(str(tmp_path / "cache"), "n")
    entries = [e for e in os.listdir(name_dir) if e != "manifest.json"]
    assert len(entries) == 1


def test_result_cache_discovery_shape(spark, tmp_path):
    """The intended consumer shape: an extreme-moves style discovery scan
    cached across calls with its config as the params dict."""
    import pyspark.sql.functions as F

    from finiextestingide_spark.operators.result_cache import ResultCache

    src = str(tmp_path / "events")
    spark.range(2000).select(
        (F.col("id") % 4).cast("string").alias("symbol"),
        F.col("id").alias("ms"),
        (F.sin(F.col("id").cast("double")) * 10).alias("value"),
    ).write.parquet(src)
    cache = ResultCache(str(tmp_path / "cache"))
    cfg = {"window": 16, "min_strength": 2.5}

    def scan():
        df = spark.read.parquet(src)
        return (
            df.groupBy("symbol")
            .agg(F.max(F.abs("value")).alias("max_abs"))
            .where(F.col("max_abs") >= cfg["min_strength"])
        )

    a = cache.get_or_compute(spark, "extreme_moves", [src], cfg, scan)
    b = cache.get_or_compute(spark, "extreme_moves", [src], cfg, scan)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pii_redaction_and_counts(spark):
    from finiextestingide_spark.operators.text import pii_counts, redact_pii

    rows = [
        (1, "mail me at jo.doe+x@corp.example.com or call +1 (415) 555-0134 now"),
        (2, "server at 10.0.42.7 port 443"),
        (3, "clean text, no pii at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    c = pii_counts(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            redact_pii(F.col("text")).alias("red"),
            c["n_emails"].alias("e"),
            c["n_ips"].alias("i"),
            c["n_phones"].alias("p"),
        ).collect()
    }
    assert out[1]["red"] == "mail me at <EMAIL> or call <PHONE> now"
    assert (out[1]["e"], out[1]["i"], out[1]["p"]) == (1, 0, 1)
    assert out[2]["red"] == "server at <IP> port 443"
    assert (out[2]["e"], out[2]["i"], out[2]["p"]) == (0, 1, 0)
    assert out[3]["red"] == rows[2][1]
    assert (out[3]["e"], out[3]["i"], out[3]["p"]) == (0, 0, 0)


def test_repetition_stats_detects_boilerplate(spark):
    from finiextestingide_spark.operators.text import repetition_stats

    rows = [
        (1, "one two three four"),                      # all distinct
        (2, "spam spam spam spam"),                     # 75% dup words
        (3, "line a\nline b\nline a\n\nline a"),        # dup lines, blank dropped
        (4, ""),                                        # empty-safe
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    st = repetition_stats(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            st["n_words"].alias("nw"),
            F.round(st["dup_word_frac"], 6).alias("dw"),
            st["n_lines"].alias("nl"),
            F.round(st["dup_line_frac"], 6).alias("dl"),
        ).collect()
    }
    assert out[1]["dw"] == 0.0 and out[1]["nw"] == 4
    assert out[2]["dw"] == 0.75
    assert out[3]["nl"] == 4 and out[3]["dl"] == 0.5  # 2 distinct of 4 kept
    assert out[4]["nw"] == 0 and out[4]["dw"] == 0.0


def test_chunk_hashes_true_binary(spark):
    """chunk_hashes operates on real (non-ASCII) bytes: boundaries at
    chunk_bytes, last chunk short, empty payload emits nothing."""
    import hashlib

    from finiextestingide_spark.operators.multimodal import chunk_hashes

    payload = bytes(range(256)) * 2 + b"\xff\x00\xfe"  # 515 bytes, non-ASCII
    rows = [(1, payload), (2, b"")]
    df = spark.createDataFrame(rows, "doc_id int, media binary")
    out = {r["chunk_idx"]: r for r in chunk_hashes(df, chunk_bytes=256).collect()}
    assert len(out) == 3  # 256 + 256 + 3; doc 2 absent
    assert [out[i]["chunk_len"] for i in (0, 1, 2)] == [256, 256, 3]
    for i in range(3):
        expect = hashlib.md5(payload[i * 256:(i + 1) * 256]).hexdigest()
        assert out[i]["chunk_md5"] == expect


def test_decontaminate_keep_decision(spark):
    """decontaminate flags train docs over the overlap bound and keeps
    zero-overlap docs with contamination 0.0 (left-join completeness)."""
    from finiextestingide_spark.operators.dedup import word_shingles
    from finiextestingide_spark.operators.text import decontaminate

    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),   # heavy overlap
            (2, "one two three four five six"),           # zero overlap
            (3, "alpha beta gamma nine ten eleven"),      # partial overlap
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in decontaminate(
            word_shingles(train, 3), word_shingles(ev, 3), 0.3
        ).collect()
    }
    assert out[1]["contamination"] == 1.0 and not out[1]["keep"]
    assert out[2]["contamination"] == 0.0 and out[2]["keep"]
    # doc 3: 4 shingles, 1 shared ("alpha beta gamma") -> 0.25 <= 0.3
    assert out[3]["n_contaminated"] == 1 and out[3]["keep"]


def test_result_cache_wraps_extreme_move_discovery(spark, tmp_path):
    """The intended end-to-end consumer (reference discovery_cache.py
    get_extreme_moves): an extreme-move scan over a bar lake, cached by
    (bar files + scan config) fingerprint. Second call is a pure cache
    read; a config change re-scans and changes the result."""
    import math

    from finiextestingide_spark.operators.extremes import (
        deduplicate_overlaps,
        extreme_move_candidates,
    )
    from finiextestingide_spark.operators.result_cache import ResultCache

    bars_dir = str(tmp_path / "bars")
    rows = []
    for s, amp in (("EURUSD", 4.0), ("USDJPY", 0.5)):
        price = 100.0
        for i in range(400):
            # a few violent moves on EURUSD only
            step = amp if (i % 97 == 0 and amp > 1) else math.sin(i * 0.7) * 0.3
            price += step
            rows.append(
                (s, datetime(2026, 1, 1) + timedelta(minutes=5 * i),
                 price - step, price + abs(step), price - abs(step), price, 0.4, 10)
            )
    spark.createDataFrame(
        rows,
        "symbol string, bar_ts timestamp, open double, high double, "
        "low double, close double, atr double, tick_count int",
    ).write.parquet(bars_dir)
    cache = ResultCache(str(tmp_path / ".discovery_caches"))

    def scan(cfg):
        def compute():
            cands = extreme_move_candidates(
                spark.read.parquet(bars_dir),
                window_sizes=cfg["window_sizes"],
                min_atr_multiple=cfg["min_atr_multiple"],
            )
            return deduplicate_overlaps(cands)

        return cache.get_or_compute(
            spark, "extreme_moves", [bars_dir], cfg, compute
        )

    cfg = {"window_sizes": [10, 50], "min_atr_multiple": 3.0}
    first = scan(cfg).collect()
    assert len(first) > 0  # the EURUSD spikes are found
    again = scan(cfg)
    backing = again.inputFiles()
    assert backing, "cached result must report its backing files"
    assert all(str(tmp_path / ".discovery_caches") in f for f in backing)
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, first))

    # stricter threshold is a different fingerprint -> fresh scan
    strict = scan({"window_sizes": [10, 50], "min_atr_multiple": 9000.0})
    assert strict.count() == 0


def test_decontaminate_short_docs_with_universe(spark):
    """A train doc too short to shingle still appears (0 shingles, keep)
    when the full train-id universe is provided."""
    from finiextestingide_spark.operators.dedup import word_shingles
    from finiextestingide_spark.operators.text import decontaminate

    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "too short")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(9, "alpha beta gamma")], "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in decontaminate(
            word_shingles(train, 3), word_shingles(ev, 3), 0.3, train_ids=train
        ).collect()
    }
    assert set(out) == {1, 2}
    assert out[2]["n_shingles"] == 0 and out[2]["contamination"] == 0.0 and out[2]["keep"]
    # without the universe, the short doc is absent (documented behavior)
    part = decontaminate(word_shingles(train, 3), word_shingles(ev, 3), 0.3).collect()
    assert {r["doc_id"] for r in part} == {1}


def test_ivf_recall_floor_and_monotone(spark, sf_dir):
    """ANN quality gate (round-6): recall@k of the IVF path must clear a
    floor at the documented operating point (nprobe=2 of 8 buckets on the
    synthetic embeddings) and be monotone in nprobe, reaching exactly 1.0
    when every bucket is probed (all-bucket IVF == brute force)."""
    import pyspark.sql.functions as F

    import finiextestingide_spark.operators.similarity as sim
    from finiextestingide_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = sim.assign_centroids(emb, cents)
    queries = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    means = {}
    for nprobe in (1, 2, 8):
        rows = sim.ivf_recall(assigned, cents, queries, k=10, nprobe=nprobe).collect()
        assert len(rows) == 20
        means[nprobe] = sum(r["recall"] for r in rows) / len(rows)
    # documented floor at the nprobe=2 operating point (measured 0.615 at
    # sf0.01; floor leaves headroom for other SFs' synthetic draws)
    assert means[2] >= 0.5, means
    assert means[1] <= means[2] <= means[8], means
    assert means[8] == 1.0, means


def test_lsh_neardup_pairs_subset_and_band_recall(spark):
    """lsh_neardup_pairs (round-9: the scalable path the pairs-budget guard
    names): (1) verified output is a SUBSET of the exact blocked operator's
    pairs at the same threshold; (2) in the high-threshold regime LSH is
    built for, recall rises with the band count (the b knob of
    1-(1-p^r)^b); (3) a degenerate bucket trips the pairs budget."""
    import numpy as np
    import pytest as _pytest

    from finiextestingide_spark.operators.similarity import (
        lsh_neardup_pairs,
        neardup_pairs_blocked,
        random_hyperplanes,
    )

    # clustered corpus: 12 tight clusters of 4 (cos >= ~0.95 within),
    # random elsewhere — the semantic-near-dup shape LSH is built for
    rng = np.random.default_rng(5)
    rows = []
    vid = 0
    for c in range(12):
        center = rng.normal(size=32)
        center /= np.linalg.norm(center)
        for _ in range(4):
            v = center + rng.normal(size=32) * 0.03
            v /= np.linalg.norm(v)
            rows.append((vid, "g", [float(x) for x in v]))
            vid += 1
    vecs = spark.createDataFrame(rows, "vec_id int, label string, embedding array<float>")

    exact = {
        (r["id_a"], r["id_b"])
        for r in neardup_pairs_blocked(vecs, "label", 0.9).collect()
    }
    assert len(exact) >= 40  # the planted clusters

    planes16 = random_hyperplanes(16, 32, seed=3)
    got4 = {
        (r["id_a"], r["id_b"])
        for r in lsh_neardup_pairs(
            vecs, planes16, 0.9, bands=4, extra_key="label"
        ).collect()
    }
    assert got4 <= exact  # verified candidates: never a false positive

    planes32 = random_hyperplanes(32, 32, seed=3)
    got8 = {
        (r["id_a"], r["id_b"])
        for r in lsh_neardup_pairs(
            vecs, planes32, 0.9, bands=8, extra_key="label"
        ).collect()
    }
    assert got8 <= exact
    assert len(got8) >= len(got4)  # more bands -> recall monotone up
    assert len(got8) / len(exact) >= 0.9  # ~1-(1-0.537)^8 = 0.998 at r=4

    # pairs budget: 48 rows in one band-bucket-degenerate setup
    same = spark.createDataFrame(
        [(i, "g", [1.0] * 32) for i in range(48)],
        "vec_id int, label string, embedding array<float>",
    )
    with _pytest.raises(ValueError, match="max_bucket_pairs"):
        lsh_neardup_pairs(
            same, planes16, 0.9, bands=4, extra_key="label", max_bucket_pairs=100
        )

    # TOTAL pairs budget (round-10 sf10 finding): many buckets each under
    # the per-bucket cap whose SUM exceeds the total — the clustered
    # corpus spreads across buckets, so a tight total cap trips while the
    # per-bucket cap passes
    with _pytest.raises(ValueError, match="max_total_pairs"):
        lsh_neardup_pairs(
            vecs, planes16, 0.9, bands=4, extra_key="label",
            max_bucket_pairs=10_000, max_total_pairs=5,
        )
    # and both budgets disarmable
    ok = lsh_neardup_pairs(
        vecs, planes16, 0.9, bands=4, extra_key="label",
        max_bucket_pairs=None, max_total_pairs=None,
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in ok} == got4
