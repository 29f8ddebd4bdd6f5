"""Named pre-flight scenario validators + post-run advisory checks (P8).

The reference runs five data-identity validators in Phase 0, BEFORE any
data is loaded (reference: python/framework/batch/batch_orchestrator.py:
345-383; python/framework/validators/scenario_validator.py): scenario
names unique and non-empty (:350), boundaries set (:285), symbol
registered in the broker config (:124), swap mode modeled by the swap
engine (:165), and account-currency compatibility with the symbol's
base/quote (:406). After the run, a PostRunValidator emits batch-global
advisory warnings (batch_orchestrator.py:576-623,
validators/post_run_validator.py) — stress-test active, budget clipping,
parameter drift across robustness windows.

Engine mapping: scenarios are config-scale driver metadata (a bounded
DataFrame, same as the reference's scenario list), so the checks run
driver-side on a size-guarded collect — SURVEY §2.2 maps P8 as driver-side
planning, not a distributed op. The posture matches the reference exactly:
validators MARK scenarios invalid and exclude them (they never abort the
whole batch); ``strict=True`` opts into fail-fast for CLI use.

Failing configs are rejected BEFORE any tick scan: ``preflight_validate``
returns the filtered scenarios DataFrame, so the replay's range join never
sees an invalid scenario.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

# the swap engine models points-based accrual or none (reference
# scenario_validator.py:165 — any other configured mode would silently
# accrue wrong financing)
MODELED_SWAP_MODES = {"points", "none"}

# known quote-currency suffixes, longest-match-first fallback to last-3
# (reference scenario_validator.detect_quote_currency :44-63)
KNOWN_QUOTES = ("USD", "EUR", "GBP", "CAD", "JPY", "AUD")


@dataclass(frozen=True)
class ValidationIssue:
    scenario_name: str
    check: str
    message: str
    is_error: bool = True  # False = advisory warning (scenario stays valid)


@dataclass
class PreflightResult:
    issues: list[ValidationIssue] = field(default_factory=list)

    @property
    def errors(self) -> list[ValidationIssue]:
        return [i for i in self.issues if i.is_error]

    @property
    def warnings(self) -> list[ValidationIssue]:
        return [i for i in self.issues if not i.is_error]

    def invalid_names(self) -> set[str]:
        return {i.scenario_name for i in self.errors}


def validate_snapshot_staleness(
    saved_at,
    now,
    *,
    max_age_trading_days: int,
    weekend_aware: bool = True,
    name: str = "session",
) -> ValidationIssue | None:
    """Trading-day-aware restore staleness (round-9 item 6; reference
    algo_state_store.py:19-22,196-211): a restored snapshot older than
    ``max_age_trading_days`` TRADING days yields an advisory
    ValidationIssue (is_error=False — the restore channel decides the
    policy), measured weekend-aware so a Friday-night snapshot restored
    Monday is 1 trading day old, not 3. ``max_age_trading_days <= 0``
    disables the check (the reference's policy-off value). Returns None
    when fresh."""
    from .gaps import trading_days_between

    if max_age_trading_days <= 0:
        return None
    td = trading_days_between(saved_at, now, weekend_aware=weekend_aware)
    if td <= max_age_trading_days:
        return None
    return ValidationIssue(
        name,
        "stale_snapshot",
        f"restored snapshot saved {saved_at.isoformat()} is {td} trading "
        f"day(s) old at restore time {now.isoformat()} (weekend_aware="
        f"{weekend_aware}) — exceeds max_age_trading_days="
        f"{max_age_trading_days}; the restored state may no longer "
        f"represent the market",
        is_error=False,
    )


def detect_quote_currency(symbol: str) -> str:
    s = symbol.upper()
    for quote in KNOWN_QUOTES:
        if s.endswith(quote):
            return quote
    return s[-3:]


def detect_base_currency(symbol: str) -> str:
    s = symbol.upper()
    for quote in KNOWN_QUOTES:
        if s.endswith(quote) and len(s) > len(quote):
            return s[: -len(quote)]
    return s[:-3]


def validate_scenario_names(rows: list[dict]) -> list[ValidationIssue]:
    """Non-empty + unique names (scenario_validator.py:350-404)."""
    issues = []
    for idx, r in enumerate(rows):
        name = (r.get("name") or "").strip()
        if not name:
            issues.append(
                ValidationIssue(
                    f"<unnamed_{idx}>",
                    "names",
                    "scenario has no name; every scenario must have a unique name",
                )
            )
    counts: dict[str, int] = {}
    for r in rows:
        name = (r.get("name") or "").strip()
        if name:
            counts[name] = counts.get(name, 0) + 1
    for name, n in counts.items():
        if n > 1:
            issues.append(
                ValidationIssue(
                    name, "names", f"duplicate scenario name ({n} occurrences)"
                )
            )
    return issues


def validate_scenario_boundaries(rows: list[dict]) -> list[ValidationIssue]:
    """end_ts or max_ticks required — without either the tick loader has no
    stop condition (scenario_validator.py:285-324)."""
    issues = []
    for r in rows:
        has_end = r.get("end_ts") is not None
        mt = r.get("max_ticks")
        if not has_end and not (mt is not None and mt > 0):
            issues.append(
                ValidationIssue(
                    r.get("name") or f"scenario_{r.get('scenario_id')}",
                    "boundaries",
                    "neither end_ts nor max_ticks set; at least one boundary "
                    "is required",
                )
            )
    return issues


def validate_scenario_symbols(
    rows: list[dict], broker_specs: dict[str, dict] | None
) -> list[ValidationIssue]:
    """Every scenario's symbol must be registered in the broker config
    (scenario_validator.py:124-162). No broker config -> check skipped,
    the reference's missing-broker-info posture."""
    if broker_specs is None:
        return []
    return [
        ValidationIssue(
            r.get("name") or f"scenario_{r.get('scenario_id')}",
            "symbols",
            f"symbol {r.get('symbol')!r} not found in broker configuration; "
            "check the 'symbols' section",
        )
        for r in rows
        if r.get("symbol") not in broker_specs
    ]


def validate_swap_modes(
    rows: list[dict], broker_specs: dict[str, dict] | None
) -> list[ValidationIssue]:
    """The symbol's configured swap_mode must be one the swap engine models
    (scenario_validator.py:165-211, #407): anything else would silently
    accrue wrong or zero overnight financing."""
    if broker_specs is None:
        return []
    issues = []
    for r in rows:
        spec = broker_specs.get(r.get("symbol"))
        if spec is None:
            continue  # missing symbol — validate_scenario_symbols flags it
        mode = str(spec.get("swap_mode", "none")).lower()
        if mode not in MODELED_SWAP_MODES:
            issues.append(
                ValidationIssue(
                    r.get("name") or f"scenario_{r.get('scenario_id')}",
                    "swap_modes",
                    f"symbol {r.get('symbol')!r} uses swap_mode {mode!r} which "
                    f"the swap engine does not model (supported: "
                    f"{sorted(MODELED_SWAP_MODES)})",
                )
            )
    return issues


def validate_account_currencies(rows: list[dict]) -> list[ValidationIssue]:
    """Account-currency compatibility (scenario_validator.py:406-496): an
    explicit account_currency must be the symbol's base or quote (cross-
    currency settlement needs an FX source — not modeled), and a balances
    map (JSON in the parameters map) must be non-empty with at least one
    key matching base/quote."""
    issues = []
    for r in rows:
        name = r.get("name") or f"scenario_{r.get('scenario_id')}"
        symbol = r.get("symbol") or ""
        params = r.get("parameters") or {}
        base, quote = detect_base_currency(symbol), detect_quote_currency(symbol)
        explicit = params.get("account_currency")
        if explicit and explicit.upper() not in {base, quote}:
            issues.append(
                ValidationIssue(
                    name,
                    "account_currencies",
                    f"account_currency {explicit!r} is neither base ({base}) nor "
                    f"quote ({quote}) of {symbol}; cross-currency settlement is "
                    "not supported",
                )
            )
        if "balances" in params:
            try:
                balances = json.loads(params["balances"])
            except (TypeError, ValueError):
                issues.append(
                    ValidationIssue(
                        name, "account_currencies",
                        f"balances is not valid JSON: {params['balances']!r}",
                    )
                )
                continue
            if not balances:
                issues.append(
                    ValidationIssue(
                        name, "account_currencies",
                        'balances must be non-empty, e.g. {"%s": 10000}' % quote,
                    )
                )
            elif not set(map(str.upper, balances)) & {base, quote}:
                issues.append(
                    ValidationIssue(
                        name,
                        "account_currencies",
                        f"no balance currency matches {symbol} "
                        f"({base}/{quote}); balances contain {sorted(balances)}",
                    )
                )
    return issues


_NUMERIC_PARAMS = {
    "bar_ms": int,
    "lots": float,
    "contract_size": float,
    "fee_per_side": float,
    "max_positions": int,
    "start_balance": float,
    "sl_dist": float,
    "tp_dist": float,
    "equity_sample_every": int,
}


def validate_scenario_parameters(rows: list[dict]) -> list[ValidationIssue]:
    """Strategy resolvable + core numeric params well-typed
    (scenario_validator.py:518+ / #359: a typo'd parameter is otherwise
    silently ignored at runtime, so the pre-flight gate is the only place
    it surfaces)."""
    from .replay import STRATEGIES, load_strategy_plugins

    issues = []
    # Plugin loading is process-global: attempt it ONCE per validate call,
    # and report a load FAILURE once (on the row that triggered the
    # attempt) — every unresolvable strategy still gets its own
    # unknown-strategy issue listing the built-ins, so a plain typo is
    # never misreported as a plugin load failure on later rows.
    plugins_attempted = False
    for r in rows:
        name = r.get("name") or f"scenario_{r.get('scenario_id')}"
        params = r.get("parameters") or {}
        strat = params.get("strategy", "sma_cross")
        if strat not in STRATEGIES and not plugins_attempted:
            plugins_attempted = True
            try:
                load_strategy_plugins()
            except ValueError as exc:
                issues.append(
                    ValidationIssue(name, "parameters", str(exc))
                )
        if strat not in STRATEGIES:
            issues.append(
                ValidationIssue(
                    name,
                    "parameters",
                    f"unknown strategy {strat!r} (built-ins: "
                    f"{sorted(STRATEGIES)}; plugins load via the "
                    "finiextestingide_spark.strategies entry-point group)",
                )
            )
        for key, typ in _NUMERIC_PARAMS.items():
            if key in params:
                try:
                    typ(params[key])
                except (TypeError, ValueError):
                    issues.append(
                        ValidationIssue(
                            name, "parameters",
                            f"parameter {key}={params[key]!r} is not a valid "
                            f"{typ.__name__}",
                        )
                    )
        if params.get("spot_mode") not in (None, "0", "1"):
            issues.append(
                ValidationIssue(
                    name, "parameters",
                    f"spot_mode must be '0' or '1', got {params['spot_mode']!r}",
                )
            )
    return issues


def preflight_validate(
    scenarios: DataFrame,
    broker_specs: dict[str, dict] | None = None,
    *,
    strict: bool = False,
    max_scenarios: int = 100_000,
) -> tuple[DataFrame, PreflightResult]:
    """Run the full Phase-0 validator set over a scenarios DataFrame BEFORE
    any data load. Returns (valid_scenarios_df, result): invalid scenarios
    are filtered out Spark-side so no downstream scan ever sees them — the
    reference's mark-invalid-and-exclude posture (§33: a bad scenario never
    aborts the batch). ``strict=True`` raises on any error instead.

    ``broker_specs``: {symbol: {"swap_mode": ..., "digits": ..., ...}} —
    the broker-config dimension (J5's table, collected); None skips the
    registration/swap checks, same as the reference when a broker has no
    info entry."""
    rows = [r.asDict(recursive=True) for r in scenarios.limit(max_scenarios + 1).collect()]
    if len(rows) > max_scenarios:
        raise ValueError(
            f"preflight_validate: scenario table exceeds {max_scenarios} rows; "
            "scenarios are config-scale driver metadata — this looks like a "
            "data table was passed by mistake"
        )
    result = PreflightResult()
    result.issues += validate_scenario_names(rows)
    result.issues += validate_scenario_boundaries(rows)
    result.issues += validate_scenario_symbols(rows, broker_specs)
    result.issues += validate_swap_modes(rows, broker_specs)
    result.issues += validate_account_currencies(rows)
    result.issues += validate_scenario_parameters(rows)

    if strict and result.errors:
        detail = "\n  ".join(
            f"[{i.check}] {i.scenario_name}: {i.message}" for i in result.errors
        )
        raise ValueError(f"scenario pre-flight validation failed:\n  {detail}")

    bad = result.invalid_names()
    if not bad:
        return scenarios, result
    valid = scenarios.where(
        ~((scenarios["name"].isNull()) | (scenarios["name"] == "") | scenarios["name"].isin(*bad))
    )
    return valid, result


def post_run_validate(
    results: DataFrame,
    scenarios: DataFrame,
    *,
    clip_warn_fraction: float = 0.10,
    max_scenarios: int = 100_000,
) -> list[ValidationIssue]:
    """Post-run advisory warnings over replay output (PostRunValidator,
    reference batch_orchestrator.py:576-623) — all is_error=False; the
    structured truth lands on the validation channel, reports only read it
    (#395: no decisions in reports):

    - stress-test active (seeded rejection / stale windows configured):
      results contain INTENTIONAL errors;
    - tick-budget clipping above ``clip_warn_fraction``: the budget is
      materially reshaping the data the strategy saw;
    - zero-trade scenarios: the strategy never engaged (often a boundary
      or warmup misconfiguration);
    - parameter drift across the window set (check_parameter_constancy,
      scenario_validator.py:267-290 / #367): a robustness distribution is
      only fair if params are held constant across windows."""
    res_rows = {
        r["scenario_id"]: r.asDict()
        for r in results.limit(max_scenarios).collect()
    }
    scen_rows = [
        r.asDict(recursive=True) for r in scenarios.limit(max_scenarios).collect()
    ]
    warnings: list[ValidationIssue] = []
    for s in scen_rows:
        name = s.get("name") or f"scenario_{s.get('scenario_id')}"
        params = s.get("parameters") or {}
        stress_bits = []
        if float(params.get("reject_probability", 0) or 0) > 0:
            stress_bits.append(
                f"reject_open_order p={float(params['reject_probability']):.0%}"
            )
        if "stale_from_ms" in params or "stale_windows" in params:
            stress_bits.append("stale_data_stress")
        if stress_bits:
            warnings.append(
                ValidationIssue(
                    name, "stress_test",
                    "stress tests active (" + ", ".join(stress_bits) + ") — "
                    "results contain intentional errors",
                    is_error=False,
                )
            )
        res = res_rows.get(s.get("scenario_id"))
        if res is None:
            continue
        processed = res.get("ticks_processed") or 0
        clipped = res.get("ticks_clipped") or 0
        denom = processed + clipped
        if denom and clipped / denom > clip_warn_fraction:
            warnings.append(
                ValidationIssue(
                    name, "budget",
                    f"tick budget clipped {clipped}/{denom} ticks "
                    f"({clipped / denom:.0%}) — the budget materially reshaped "
                    "the data the strategy saw",
                    is_error=False,
                )
            )
        if res.get("trades_count") == 0:
            warnings.append(
                ValidationIssue(
                    name, "zero_trades",
                    "scenario produced no trades — check boundaries/warmup/"
                    "strategy parameters",
                    is_error=False,
                )
            )
    if len(scen_rows) >= 2:
        ref_params = scen_rows[0].get("parameters") or {}
        drifting = [
            s.get("name") or f"scenario_{s.get('scenario_id')}"
            for s in scen_rows[1:]
            if (s.get("parameters") or {}) != ref_params
        ]
        if drifting:
            warnings.append(
                ValidationIssue(
                    "<batch>", "parameter_constancy",
                    "strategy parameters drift across the window set "
                    f"(vs first scenario): {drifting} — a robustness "
                    "distribution is only fair with constant parameters",
                    is_error=False,
                )
            )
    return warnings
