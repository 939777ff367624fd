"""Session-scoped persisted-artifact store for the maintained-table
query families (round-11 drift snapshots, round-12 Bloom registers).

The persisted-artifact queries follow one lifecycle: a PREP step scans
the base table once, writes a small parquet artifact (histogram
snapshot ≤ n_bins + 3 rows, Bloom register table ≤ 1024 rows), and the
registered query reads ONLY the artifact — the build/probe split that
makes monitoring affordable at 100 TB. This module owns that
lifecycle so every family shares the same guarantees:

* **Keying** — ``(applicationId, sf_dir, kind, base-table mtime_ns)``,
  the same invalidation contract as ``catalog._SCHEMA_CACHE``: an
  in-session rewrite of the base table misses the cache and republishes,
  so a stale artifact (exactly the monitoring failure these queries
  exist to rule out) is never served.
* **Supersede eviction** (ADVICE r11) — admitting a new mtime for the
  same (app, sf, kind) removes the superseded key's directory, so a
  harness that rewrites a fixture in a loop holds at most ONE live
  artifact dir per family instead of one per mtime.
* **Exit cleanup** (ADVICE r11) — every artifact root this process
  created is removed at interpreter exit, so driver-length processes
  leave nothing behind in the temp dir. (A real deployment would
  publish to the warehouse and RETAIN snapshots per ingest day; the
  temp-dir GC is the local-fixture stand-in, not the deployment shape.)

Safety of eviction: every registered query constructs AND executes
its artifact read within one call, and prep runs before construction,
so an evicted directory can never be a path some live plan still
needs — eviction only fires when a NEWER base mtime is observed, i.e.
when any plan over the old artifact is already answering about dead
data.
"""

from __future__ import annotations

import atexit
import os
import re
import shutil
import tempfile

from building_permissions_etl_spark.catalog import _mtime

# key -> (root_dir, {artifact_name: parquet_path})
_CACHE: dict = {}


def publish_artifacts(spark, sf: str, base_file: str, kind: str,
                      writer) -> dict:
    """Return {name: parquet_path} for the ``kind`` family's artifacts
    over ``sf``'s ``base_file``, building them via ``writer(root) ->
    {name: path}`` if this session hasn't yet (or the base was
    rewritten since). ``writer`` must write each artifact as a parquet
    directory under ``root``."""
    base_mtime = _mtime(os.path.join(sf, base_file))
    app = spark.sparkContext.applicationId
    key = (app, sf, kind, base_mtime)
    if key not in _CACHE:
        tag = re.sub(r"[^A-Za-z0-9.]+", "_", sf).strip("_")
        root = os.path.join(tempfile.gettempdir(),
                            f"{kind}_{app}_{tag}_{base_mtime}")
        paths = writer(root)
        for stale in [k for k in _CACHE
                      if k[:3] == (app, sf, kind) and k != key]:
            old_root, _ = _CACHE.pop(stale)
            shutil.rmtree(old_root, ignore_errors=True)
        _CACHE[key] = (root, paths)
    return _CACHE[key][1]


@atexit.register
def _cleanup_all() -> None:
    while _CACHE:
        _, (root, _) = _CACHE.popitem()
        shutil.rmtree(root, ignore_errors=True)
