"""Drift auditor (J6 economics): local vs broker-truth comparison per fill.

The reference's live DriftAuditor (#327,
python/framework/trading_env/live/drift_auditor.py:1-26) is read-only
telemetry: after every fully-filled order it pulls the broker's own trade
records and compares the locally-computed fee/volume/price against that
truth, logging drift events above configured relative thresholds
(python/framework/types/live_types/drift_audit_types.py:19-58 —
DriftType FEE/VOLUME/PRICE/SLIPPAGE, DriftRecord.relative_delta_pct /
threshold_exceeded, DriftAuditSummary per-type counts + max drift).

Spark-first form: the pairing the reference does order-by-order over an
async query pipeline is ONE equi-join of the local execution ledger with
the broker trade feed, and the per-metric comparison is a column-expression
unpivot — no UDF, no state. Compose it over `operators.reconcile` /
`streaming.reconcile_stream` output: reconciliation answers "did every
order fill, exactly once, for the right quantity"; the drift auditor
answers "for the fills that DID pair, do our economics match the broker's
books". At 100 TB the join shuffles on the fill key exactly like the
reconciliation join; the unpivot is a per-row map.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def drift_events(
    local: DataFrame,
    broker: DataFrame,
    *,
    keys: Sequence[str],
    metrics: Sequence[tuple[str, str, str, float]],
    emit_all: bool = False,
) -> DataFrame:
    """Pair local and broker records on ``keys`` and emit per-metric drift.

    ``metrics``: (drift_type, local_col, broker_col, threshold_pct) — the
    reference's DriftAuditConfig thresholds are relative percentages.
    Output (long format, one row per paired fill per metric):
    ``*keys, drift_type, local_value, broker_value, delta,
    relative_delta_pct, threshold_pct, threshold_exceeded`` — filtered to
    exceeded rows unless ``emit_all`` (the reference logs only events above
    threshold; emit_all is the audit-table form).

    Semantics (drift_audit_types.py:38-43): delta = local - broker;
    relative_delta_pct = 100*|delta|/|broker|. A zero broker value with a
    zero local value is 0% drift; a zero broker value with a NONZERO local
    value has no defined relative delta (NULL) but is always an exceeded
    event — money appearing from nowhere must surface regardless of
    threshold. Only inner-paired rows are audited: unpaired fills are the
    reconciliation layer's finding (#151), not drift."""
    lcl = local.select(
        *keys, *[F.col(lc).cast("double").alias(f"__l_{name}") for name, lc, _, _ in metrics]
    )
    brk = broker.select(
        *keys, *[F.col(bc).cast("double").alias(f"__b_{name}") for name, _, bc, _ in metrics]
    )
    paired = lcl.join(brk, on=list(keys), how="inner")
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("drift_type"),
                F.col(f"__l_{name}").alias("local_value"),
                F.col(f"__b_{name}").alias("broker_value"),
                F.lit(float(thr)).alias("threshold_pct"),
            )
            for name, _, _, thr in metrics
        ]
    )
    out = paired.select(*keys, F.explode(rows).alias("__m")).select(*keys, "__m.*")
    delta = F.col("local_value") - F.col("broker_value")
    rel = F.when(
        F.col("broker_value") != 0.0,
        100.0 * F.abs(delta) / F.abs(F.col("broker_value")),
    ).when(F.col("local_value") == 0.0, F.lit(0.0))
    exceeded = F.when(rel.isNull(), F.lit(True)).otherwise(
        rel > F.col("threshold_pct")
    )
    out = out.select(
        *keys,
        "drift_type",
        "local_value",
        "broker_value",
        delta.alias("delta"),
        rel.alias("relative_delta_pct"),
        "threshold_pct",
        exceeded.alias("threshold_exceeded"),
    )
    return out if emit_all else out.where(F.col("threshold_exceeded"))


def state_diff(
    local: DataFrame,
    broker: DataFrame,
    *,
    key: str,
    fields: Sequence[tuple[str, str, str]],
    stale_tolerance_pct: float = 0.1,
) -> DataFrame:
    """Shadow-state vs broker-truth divergence (the reference Reconciler
    #151, python/framework/trading_env/live/reconciler.py:19-21,254-300,
    ALERT_ONLY): full-outer diff of two keyed state tables with the
    reference's divergence vocabulary —

    - ``ghost``  — broker has the key, local lacks it;
    - ``orphan`` — local has the key, broker lacks it;
    - ``stale``  — both have it but a field diverges beyond the relative
      tolerance (reconciler._within_tol: |a-b| / max(|broker|, 1e-12) *
      100 > stale_tolerance_pct, broker as the reference denominator);
    - ``missing_field`` — both have the key but the compared field is NULL
      on exactly ONE side (ADVICE r9: a broker row with a NULL price vs a
      populated local price is a divergence, not agreement — the relative
      delta is undefined, so it gets its own class instead of silently
      passing). A field NULL on BOTH sides is agreement (both books say
      "no value") and emits nothing.

    ``fields``: (field_name, local_col, broker_col) pairs compared per
    matched key; one output row PER diverged field (field/values NULL on
    ghost/orphan rows — there is nothing to compare). Matched keys with
    every field in tolerance emit nothing, so the result IS the divergence
    log the reference's [RECONCILE] channel prints.

    Physical shape: ONE full-outer join, then a per-row higher-order
    expression (filter/transform over the field array) classifies and
    explodes — a naive stale/ghost/orphan UNION of three filtered branches
    compiles to THREE joins re-scanning both ledgers (Catalyst specializes
    the outer join per branch), which triples the shuffle at 100 TB for no
    information. Verified single-Exchange-per-side in the plan audit."""
    lcl = local.select(
        F.col(key).alias("__k"),
        F.lit(1).alias("__l_present"),
        *[F.col(lc).cast("double").alias(f"__l_{n}") for n, lc, _ in fields],
    )
    brk = broker.select(
        F.col(key).alias("__k"),
        F.lit(1).alias("__b_present"),
        *[F.col(bc).cast("double").alias(f"__b_{n}") for n, _, bc in fields],
    )
    j = lcl.join(brk, on="__k", how="full_outer")
    has_l = F.col("__l_present").isNotNull()
    has_b = F.col("__b_present").isNotNull()

    def _rel(m):
        return (
            100.0
            * F.abs(m.local_value - m.broker_value)
            / F.greatest(F.abs(m.broker_value), F.lit(1e-12))
        )

    pairs = F.array(
        *[
            F.struct(
                F.col(f"__l_{n}").alias("local_value"),
                F.col(f"__b_{n}").alias("broker_value"),
                F.lit(n).alias("field"),
            )
            for n, _, _ in fields
        ]
    )
    def _one_null(m):
        return m.local_value.isNull() != m.broker_value.isNull()

    stale_rows = F.transform(
        # _one_null FIRST: _rel is NULL on one-sided-NULL pairs, and a bare
        # NULL predicate would DROP the pair — the ADVICE r9 silent pass
        F.filter(pairs, lambda m: _one_null(m) | (_rel(m) > stale_tolerance_pct)),
        lambda m: F.struct(
            F.when(_one_null(m), F.lit("missing_field"))
            .otherwise(F.lit("stale"))
            .alias("divergence"),
            m.field.alias("field"),
            m.local_value.alias("local_value"),
            m.broker_value.alias("broker_value"),
            F.when(~_one_null(m), _rel(m)).alias("relative_delta_pct"),
        ),
    )
    absent = lambda div: F.array(  # noqa: E731
        F.struct(
            F.lit(div).alias("divergence"),
            F.lit(None).cast("string").alias("field"),
            F.lit(None).cast("double").alias("local_value"),
            F.lit(None).cast("double").alias("broker_value"),
            F.lit(None).cast("double").alias("relative_delta_pct"),
        )
    )
    payload = (
        F.when(has_l & has_b, stale_rows)
        .when(has_b, absent("ghost"))
        .otherwise(absent("orphan"))
    )
    return (
        j.select(F.col("__k").alias(key), F.explode(payload).alias("__e"))
        .select(key, "__e.*")
    )


def flat_check(
    balances: DataFrame,
    *,
    asset_col: str = "asset",
    amount_col: str = "amount",
    quote_assets: Sequence[str] = (),
    dust_threshold: float = 1e-8,
) -> DataFrame:
    """SPOT flat-preflight (reconciler.py FlatCheckResult): non-quote asset
    balances above the dust threshold mean the account is NOT flat —
    returns the offending rows (empty = flat). Dust magnitudes (|amount|
    <= 1e-8, the reference's _DUST_THRESHOLD) are ignored: exchanges leave
    sub-satoshi residue on most balances."""
    return balances.where(
        (~F.col(asset_col).isin(list(quote_assets)))
        & (F.abs(F.col(amount_col)) > dust_threshold)
    )


def drift_summary(events: DataFrame, *, by: Sequence[str] = ()) -> DataFrame:
    """DriftAuditSummary shape (drift_audit_types.py:105-122): per
    drift_type (optionally per extra grouping, e.g. scenario/session) the
    count of threshold-exceeded events and the worst observed relative
    drift. Runs over ``drift_events(..., emit_all=True)`` output so the max
    covers ALL paired fills, not only the ones above threshold."""
    return events.groupBy(*by, "drift_type").agg(
        F.sum(F.col("threshold_exceeded").cast("long")).alias("n_events"),
        F.max("relative_delta_pct").alias("max_drift_pct"),
        F.count(F.lit(1)).alias("n_audited"),
    )
