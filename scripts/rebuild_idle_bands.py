"""Rebuild bench_certificates/idle_bands_sf<sf>.json from a CLEAN bench run
(VERDICT r13 #8 — the rebuild protocol, now reproducible).

Reads a BENCH_STATS.json-shaped artifact (default: the committed one),
REFUSES to rebuild from a contended run (any rejected samples, any
tainted row, load over threshold at entry/end), and writes per-query
bands on MIN-of-n with the r11 variance model: +/-15% for multi-second
rows, +/-30% for sub-second rows (scheduler jitter dominates those).

    python scripts/rebuild_idle_bands.py                # from BENCH_STATS.json
    python scripts/rebuild_idle_bands.py --stats /tmp/bench_out.json
    python scripts/rebuild_idle_bands.py --per-row      # see below

``--per-row``: on a box with frequent co-tenant bursts a ~15-minute run
rarely finishes globally clean, but the PER-SAMPLE co-tenant guard (r10)
certifies each row individually — a row whose kept samples are all
untainted and un-rejected is trustworthy regardless of what happened
during other rows' windows. Per-row mode rebuilds bands ONLY for such
rows and carries the previous band forward for flagged ones (dropping a
flagged row's band entirely if it never had one), recording which rows
were carried in the file's note.

Bands are THIS box's envelope for bench.py's in-run stale/breach check;
cross-round regressions are judged by the SCALE.md committed history,
never by this file (the box profile can shift between rounds — r13
measured a uniform +15-28% slowdown on untouched pure-JVM rows).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from datetime import date


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--stats", default=os.path.join(repo, "BENCH_STATS.json"))
    ap.add_argument("--threshold", type=float, default=8.0)
    ap.add_argument("--per-row", action="store_true")
    args = ap.parse_args()

    with open(args.stats) as f:
        art = json.load(f)

    sf = art.get("sf")
    stats = art.get("queries_stats") or {}
    if not stats:
        print("no queries_stats in artifact", file=sys.stderr)
        return 1

    # refuse a contended source — bands inherit their source's noise
    guard = art.get("idle_guard", {})
    problems = []
    if guard.get("load1_at_start", 0.0) > args.threshold:
        problems.append(f"entry load {guard.get('load1_at_start')}")
    if art.get("load1_at_end", 0.0) > args.threshold:
        problems.append(f"end load {art.get('load1_at_end')}")
    if art.get("rejected_samples"):
        problems.append(f"{len(art['rejected_samples'])} rejected samples")
    tainted = [n for n, s in stats.items() if s.get("tainted_cotenant")]
    if tainted:
        problems.append(f"tainted rows: {tainted}")
    if problems and not args.per_row:
        print("REFUSING to rebuild bands from a contended run: "
              + "; ".join(problems) + " (use --per-row to rebuild only "
              "the rows whose kept samples are individually clean)",
              file=sys.stderr)
        return 1

    flagged = set(tainted)
    for r in art.get("rejected_samples", []):
        flagged.add(r if isinstance(r, str) else r.get("query"))

    prev = {}
    path = os.path.join(repo, "bench_certificates", f"idle_bands_sf{sf}.json")
    if args.per_row and os.path.exists(path):
        with open(path) as f:
            prev = json.load(f).get("queries", {})

    bands, carried = {}, []
    for name, s in stats.items():
        if args.per_row and name in flagged:
            if name in prev:
                bands[name] = prev[name]
                carried.append(name)
            continue
        m = float(s["min"])
        width = 0.30 if m < 1.0 else 0.15
        bands[name] = [round(m * (1 - width), 4), round(m * (1 + width), 4)]

    mode_note = ""
    if args.per_row:
        mode_note = (
            f" PER-ROW rebuild: rows flagged by the per-sample guard in the "
            f"source run ({sorted(flagged)}) did not get fresh bands — "
            f"carried forward: {sorted(carried)}; flagged rows with no "
            f"prior band are simply absent (the band check skips them)."
        )
    out = {
        "created": date.today().isoformat(),
        "sf": sf,
        "note": (
            "Per-query idle bands on MIN-of-n, rebuilt by "
            "scripts/rebuild_idle_bands.py from a verified-clean run "
            "(no rejected samples, no tainted rows, entry/end load under "
            "threshold). Width: +/-15% multi-second rows, +/-30% "
            "sub-second rows (the r11 variance model). Bands are THIS "
            "box's envelope for bench.py's in-run stale/breach check; "
            "cross-round regressions are judged by the SCALE.md committed "
            "history, never by this file (box profiles shift between "
            "rounds — r13 measured a uniform +15-28% host slowdown). "
            "breach_fast on a future run = improvement or slower-box "
            "band; rebuild here, don't roll back." + mode_note
        ),
        "queries": bands,
    }
    path = os.path.join(repo, "bench_certificates", f"idle_bands_sf{sf}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path} ({len(bands)} bands)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
