"""Fingerprint-keyed materialized-result cache for discovery scans.

The reference keeps ~1.4k LoC of hand-rolled Parquet caches so a user
iterating on discoveries (extreme moves, data-coverage reports, volatility
profiles) doesn't re-pay the full bar scan every call
(discovery_cache.py:43-170, config_fingerprint_utils.py:40-53,
data_coverage_report_cache.py, volatility_profile_analyzer_cache.py).
Catalyst caches nothing across sessions, so the engine keeps the same thin
layer, generalized:

- The cache key is a SHA256 fingerprint over (a) the recursively-sorted
  params JSON — the reference's config fingerprint — and (b) a signature of
  every source file (relative path, size, mtime) — the reference's
  source-mtime invalidation, extended from one bar file to a file set.
- A result is materialized once per fingerprint as Parquet under
  ``cache_dir/name/<fingerprint>/``. A hit is a plain parquet read of the
  materialized result: ZERO source files are scanned. Any change to params
  or source files changes the fingerprint -> automatic miss + recompute;
  superseded fingerprints for the same name are dropped on write.

Scale posture: the fingerprint walk reads only directory metadata (no file
contents), and the materialized result is itself a distributed parquet
write — at 100 TB the cache holds small derived tables (discovery outputs),
never input data. On an object store, plug a lister into ``list_files``
(s3 LIST returns size+mtime the same way).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


def config_fingerprint(params: dict) -> str:
    """Deterministic SHA256 of a params dict (reference
    config_fingerprint_utils.generate_config_fingerprint: recursively
    sorted keys, compact separators)."""
    normalized = json.dumps(params, sort_keys=True, separators=(",", ":"))
    return hashlib.sha256(normalized.encode("utf-8")).hexdigest()


def list_files(path: str) -> list[tuple[str, int, float]]:
    """(relative path, size, mtime) for every data file under ``path`` —
    the invalidation signature. Hidden/_ files (Spark commit markers,
    .crc) are excluded so a rewrite that produces identical data files
    still invalidates via their mtimes, not via marker churn."""
    out = []
    if os.path.isfile(path):
        st = os.stat(path)
        return [(os.path.basename(path), st.st_size, st.st_mtime)]
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if f.startswith((".", "_")):
                continue
            full = os.path.join(root, f)
            st = os.stat(full)
            out.append((os.path.relpath(full, path), st.st_size, st.st_mtime))
    out.sort()
    return out


@dataclass(frozen=True)
class CacheInfo:
    hit: bool
    path: str
    fingerprint: str


class ResultCache:
    """get_or_compute() around any DataFrame-producing scan."""

    def __init__(self, cache_dir: str):
        self.cache_dir = cache_dir

    def _fingerprint(self, inputs: list[str], params: dict) -> str:
        sig = {
            "params": config_fingerprint(params),
            "inputs": {p: list_files(p) for p in sorted(inputs)},
        }
        return hashlib.sha256(
            json.dumps(sig, sort_keys=True, separators=(",", ":")).encode()
        ).hexdigest()

    def lookup(self, name: str, inputs: list[str], params: dict) -> CacheInfo:
        fp = self._fingerprint(inputs, params)
        path = os.path.join(self.cache_dir, name, fp)
        return CacheInfo(
            hit=os.path.exists(os.path.join(path, "_SUCCESS")), path=path, fingerprint=fp
        )

    def get_or_compute(
        self,
        spark: SparkSession,
        name: str,
        inputs: list[str],
        params: dict,
        compute: Callable[[], DataFrame],
        *,
        force_rebuild: bool = False,
    ) -> DataFrame:
        """Return the cached result for (inputs, params), computing and
        materializing it on miss. A hit reads ONLY the materialized
        parquet — no source file is touched. Stale entries (same name,
        different fingerprint) are removed on write, the reference's
        overwrite-on-invalid behavior.

        Concurrency contract: SINGLE WRITER per cache name (the
        reference's caches share the assumption — one analyst process per
        discovery cache). The write sequence is crash-ordered: the new
        entry's parquet lands first (with its _SUCCESS marker), then the
        manifest describing it, then superseded entries are deleted — so a
        crash at any point leaves a manifest that describes an existing,
        complete entry. Concurrent READERS of the current fingerprint are
        safe; a reader still holding a superseded fingerprint can observe
        its files vanishing mid-read (accepted under single-writer)."""
        info = self.lookup(name, inputs, params)
        if info.hit and not force_rebuild:
            return spark.read.parquet(info.path)
        df = compute()
        name_dir = os.path.dirname(info.path)
        df.write.mode("overwrite").parquet(info.path)
        # manifest BEFORE deleting superseded entries: a crash between the
        # two steps must never leave a manifest pointing at deleted data
        with open(os.path.join(name_dir, "manifest.json"), "w") as f:
            json.dump(
                {"fingerprint": info.fingerprint, "params": params, "inputs": sorted(inputs)},
                f,
                indent=1,
                sort_keys=True,
            )
        # drop superseded fingerprints so the cache holds one entry per
        # name; only directories qualify (manifest.json lives alongside)
        for entry in os.listdir(name_dir):
            full = os.path.join(name_dir, entry)
            if entry != info.fingerprint and os.path.isdir(full):
                shutil.rmtree(full, ignore_errors=True)
        return spark.read.parquet(info.path)
