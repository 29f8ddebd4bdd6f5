"""Wall-clock ban for algo code (reference §9 / #359).

Decision logic must never read wall-clock time (`datetime.now()`,
`datetime.utcnow()`, `time.time()`, ...): a direct read breaks backtest
reproducibility and decouples timing from the tick cadence that gates
async resolution. The single canonical clock in this engine is the tick
stream itself (the replay core hands strategies bar closes and tick
contexts stamped from data).

Shared scanning core, the reference's layout
(validators/algo_clock_validator.find_wall_clock_calls): the CI lint scans
the shipped strategy surface, and load_strategy_plugins() runs the same
scan against USER plugin modules at load time.
"""

from __future__ import annotations

import ast
from pathlib import Path

# attribute-call patterns that read the wall clock
_BANNED_CALLS = {
    ("datetime", "now"),
    ("datetime", "utcnow"),
    ("datetime", "today"),
    ("date", "today"),
    ("time", "time"),
    ("time", "time_ns"),
    ("time", "monotonic"),
    ("time", "perf_counter"),
    ("time", "perf_counter_ns"),
}

# bare names that only exist as wall-clock reads (`from time import time`)
_BANNED_BARE = {"time_ns", "monotonic", "perf_counter", "perf_counter_ns"}


def find_wall_clock_calls(
    path: str | Path, *, only_class: str | None = None, allow_pragma: bool = False
) -> list[str]:
    """``file:line: call`` for every wall-clock read in a Python source
    file. AST-based (no regex false positives on strings/comments); a
    dotted call matches when its last two segments hit a banned pair, so
    ``datetime.datetime.now()`` and ``dt.now()`` after
    ``from datetime import datetime as dt`` are both caught.

    ``only_class`` scopes the call scan to that class's body (import
    aliases are still resolved module-wide), so a plugin class in a file
    with unrelated module-level timing code doesn't false-positive.

    ``allow_pragma=True`` honors ``# wall-clock-ok: <reason>`` on the
    call's line — for the REPO lint only, where a sanctioned observational
    read (the #197 clipping monitor measures REAL per-tick processing
    time; that is its one job) must be exempt WITH a stated reason. The
    plugin startup validator never sets it: a USER plugin cannot pragma
    its way past the determinism ban."""
    path = Path(path)
    src = path.read_text()
    tree = ast.parse(src, filename=str(path))
    src_lines = src.splitlines()

    def _pragma_ok(lineno: int) -> bool:
        if not allow_pragma or lineno > len(src_lines):
            return False
        line = src_lines[lineno - 1]
        mark = "# wall-clock-ok:"
        i = line.find(mark)
        return i >= 0 and bool(line[i + len(mark):].strip())
    hits: list[str] = []
    # `from time import time` style aliases: map imported names back to the
    # wall-clock functions they bind so a bare call is still caught
    bare_aliases: dict[str, str] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module == "time":
            for alias in node.names:
                if alias.name in {"time", "time_ns", "monotonic", "perf_counter", "perf_counter_ns"}:
                    bare_aliases[alias.asname or alias.name] = alias.name
    scan_root: ast.AST = tree
    if only_class is not None:
        cls_nodes = [
            n
            for n in ast.walk(tree)
            if isinstance(n, ast.ClassDef) and n.name == only_class
        ]
        if not cls_nodes:
            raise ValueError(
                f"class {only_class!r} not found in {path} — cannot scope "
                "the wall-clock scan (refusing to skip it)"
            )
        scan_root = ast.Module(body=cls_nodes, type_ignores=[])
    for node in ast.walk(scan_root):
        if not isinstance(node, ast.Call):
            continue
        func = node.func
        if isinstance(func, ast.Name):
            bound = bare_aliases.get(func.id)
            if (bound is not None or func.id in _BANNED_BARE) and not _pragma_ok(
                node.lineno
            ):
                hits.append(
                    f"{path}:{node.lineno}: {func.id}() [time.{bound or func.id}]"
                )
            continue
        if not isinstance(func, ast.Attribute):
            continue
        attr = func.attr
        base = func.value
        base_name = None
        if isinstance(base, ast.Name):
            base_name = base.id
        elif isinstance(base, ast.Attribute):
            base_name = base.attr
        if base_name is None:
            continue
        if (base_name, attr) in _BANNED_CALLS and not _pragma_ok(node.lineno):
            hits.append(f"{path}:{node.lineno}: {base_name}.{attr}()")
    return hits


def validate_no_wall_clock(
    paths: list[str | Path], *, only_class: str | None = None
) -> None:
    """Raise if any scanned file reads the wall clock (load_strategy_plugins
    runs this against plugin modules — the reference's startup validator)."""
    violations: list[str] = []
    for p in paths:
        violations.extend(find_wall_clock_calls(p, only_class=only_class))
    if violations:
        raise ValueError(
            "wall-clock read in strategy code (deterministic replay ban, "
            "reference §9) — derive time from tick/bar data instead:\n  "
            + "\n  ".join(violations)
        )
