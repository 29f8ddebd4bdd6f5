"""Cross-engine result comparison used by the local gate check and pytest.

Mirrors what the driver's order-insensitive value-hash needs: canonical
column order, canonical dtypes, row-sorted frames, exact equality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                pass
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare_frames(
    spark_pdf: pd.DataFrame,
    oracle_pdf: pd.DataFrame,
    *,
    float_atol: float = 0.0,
    float_rtol: float = 0.0,
) -> list[str]:
    """Empty list == frames identical under canonicalization.

    Default is EXACT float equality — the driver's value-hash semantics,
    and what the sf0.01 gate runs under. ``float_atol``/``float_rtol``
    opt into a tolerance for extended-scale verification (sf1), where
    10x-longer float accumulations legitimately diverge past a 1e-6
    rounding boundary between summation orders; callers that use it must
    disclose tolerance-passes separately from exact passes."""
    issues: list[str] = []
    a, b = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    if list(a.columns) != list(b.columns):
        return [f"columns differ: spark={list(a.columns)} oracle={list(b.columns)}"]
    if len(a) != len(b):
        return [f"row counts differ: spark={len(a)} oracle={len(b)}"]
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if pd.api.types.is_float_dtype(a[c]):
            if float_atol or float_rtol:
                with np.errstate(invalid="ignore"):
                    eq = np.isclose(
                        av.astype(float), bv.astype(float),
                        atol=float_atol, rtol=float_rtol,
                    ) | (pd.isna(av) & pd.isna(bv))
            else:
                eq = (av == bv) | (pd.isna(av) & pd.isna(bv))
            if not eq.all():
                bad = int((~eq).sum())
                with np.errstate(invalid="ignore"):
                    md = np.nanmax(np.abs(av.astype(float) - bv.astype(float)))
                issues.append(f"col {c}: {bad}/{len(a)} values differ (max abs diff {md:.3e})")
        else:
            eqs = (pd.Series(av) == pd.Series(bv)) | (pd.isna(av) & pd.isna(bv))
            if not eqs.all():
                bad = int((~eqs).sum())
                i = int(np.argmax(~eqs.to_numpy()))
                issues.append(
                    f"col {c}: {bad}/{len(a)} values differ, e.g. row {i}: {av[i]!r} vs {bv[i]!r}"
                )
    return issues
