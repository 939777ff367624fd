"""Session-scoped persisted-artifact store for the maintained-table
query families (round-11 drift snapshots, round-12 Bloom registers).

The persisted-artifact queries follow one lifecycle: a PREP step scans
the base table once, writes a small parquet artifact (histogram
snapshot ≤ n_bins + 3 rows, Bloom register table ≤ 1024 rows), and the
registered query reads ONLY the artifact — the build/probe split that
makes monitoring affordable at 100 TB. This module owns that
lifecycle so every family shares the same guarantees:

* **Keying** — ``(applicationId, sf_dir, kind, base (mtime_ns, size))``
  — literally ``catalog._stat_key``, the same invalidation contract as
  ``catalog._SCHEMA_CACHE`` including the size component: an
  in-session rewrite of the base table misses the cache and
  republishes even when it lands inside one mtime tick, so a stale
  artifact (exactly the monitoring failure these queries exist to
  rule out) is never served. Residual caveat shared with the schema
  cache: a same-tick byte-identical-length rewrite can still collide.
* **Supersede retirement** (ADVICE r11) — admitting a new base stat
  for the same (app, sf, kind) evicts the superseded KEY immediately
  (no future call can be served from it) and queues its directory for
  removal at interpreter exit rather than deleting it on the spot: a
  lazy DataFrame constructed before the rewrite may still hold
  FileScans over the old artifact paths (the plan-pinned
  ``psi_drift_persisted`` shape reads artifacts at collect time), and
  deleting under it would turn a held plan into FileNotFound. Disk
  cost is bounded by the number of in-process base rewrites — test
  harnesses, not deployments — and everything goes at exit.
* **Exit cleanup** (ADVICE r11) — every artifact root this process
  created, live or retired, is removed at interpreter exit, so
  driver-length processes leave nothing behind in the temp dir. A
  prep that FAILS mid-write is cleaned immediately (its root never
  enters the cache, so exit cleanup would miss it otherwise). (A real
  deployment would publish to the warehouse and RETAIN snapshots per
  ingest day; the temp-dir GC is the local-fixture stand-in, not the
  deployment shape.)
"""

from __future__ import annotations

import atexit
import os
import re
import shutil
import tempfile

from building_permissions_etl_spark.catalog import _stat_key

# key -> (root_dir, {artifact_name: parquet_path})
_CACHE: dict = {}
# superseded roots: unreachable for new calls, removed at exit (a live
# lazy plan may still scan them — see module docstring)
_RETIRED: list = []


def publish_artifacts(spark, sf: str, base_file: str, kind: str,
                      writer) -> dict:
    """Return {name: parquet_path} for the ``kind`` family's artifacts
    over ``sf``'s ``base_file``, building them via ``writer(root) ->
    {name: path}`` if this session hasn't yet (or the base was
    rewritten since). ``writer`` must write each artifact as a parquet
    directory under ``root``."""
    base_stat = _stat_key(os.path.join(sf, base_file))
    app = spark.sparkContext.applicationId
    key = (app, sf, kind, base_stat)
    if key not in _CACHE:
        tag = re.sub(r"[^A-Za-z0-9.]+", "_", sf).strip("_")
        root = os.path.join(
            tempfile.gettempdir(),
            f"{kind}_{app}_{tag}_{base_stat[0]}_{base_stat[1]}")
        try:
            paths = writer(root)
        except BaseException:
            # a half-written root never enters the cache, so exit
            # cleanup would leak it — remove it here
            shutil.rmtree(root, ignore_errors=True)
            raise
        for stale in [k for k in _CACHE
                      if k[:3] == (app, sf, kind) and k != key]:
            old_root, _ = _CACHE.pop(stale)
            _RETIRED.append(old_root)
        # ADVICE r12: a base restored to an identical (mtime_ns, size)
        # re-derives the SAME root name as a directory already queued
        # in _RETIRED; drop it from the queue so the live cache is the
        # path's sole owner (the writer just rebuilt it in place)
        while root in _RETIRED:
            _RETIRED.remove(root)
        _CACHE[key] = (root, paths)
    return _CACHE[key][1]


@atexit.register
def _cleanup_all() -> None:
    while _CACHE:
        _, (root, _) = _CACHE.popitem()
        shutil.rmtree(root, ignore_errors=True)
    while _RETIRED:
        shutil.rmtree(_RETIRED.pop(), ignore_errors=True)
