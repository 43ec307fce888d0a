"""Registry + one-call sync of a base table's derived index artifacts.

The text index (operators/text_index.py) and the ANN index
(operators/ann_index.py) are derived icelite tables, each carrying its
own base-snapshot watermark. This module gives the BASE table a registry
of its derived indexes (the ``derived.indexes`` property — a JSON list of
index-table locations) so maintenance can keep every index current
without the operator knowing they exist:

  - ``register_*_index`` appends the new index's location to the base
    registry automatically;
  - ``sync_registered_indexes(spark, base)`` walks the registry and runs
    the right sync per index (dispatch on the index's own watermark
    property), dropping dead registrations (index table deleted);
  - ``run_full_maintenance`` calls it after the suite when the base
    carries registrations (opt-out: ``index-sync.auto=false``), the same
    auto-freshness contract as the NDV and partition-stats sidecars.
    A maintenance-only delta (compaction/cluster rewrites) produces an
    EMPTY logical diff, so the post-suite sync is a watermark move, not
    work.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession

from ..icelite.table import IceliteTable

PROP_REGISTRY = "derived.indexes"


def registered_indexes(base: IceliteTable) -> list[str]:
    raw = base.meta.properties.get(PROP_REGISTRY)
    return json.loads(raw) if raw else []


def register_index_on_base(base: IceliteTable, index_location: str) -> None:
    """Append an index-table location to the base's registry (idempotent)."""
    locs = registered_indexes(base)
    if index_location not in locs:
        base.set_properties({PROP_REGISTRY: json.dumps(locs + [index_location])})


def sync_registered_indexes(spark: SparkSession, base: IceliteTable) -> dict:
    """Sync every registered index to the base's current snapshot. Returns
    per-index results; a registration whose table no longer exists is
    dropped from the registry (GC'd indexes must not fail maintenance
    forever)."""
    from .ann_index import PROP_BASE_SNAPSHOT as ANN_WM
    from .ann_index import sync_ann_index
    from .text_index import PROP_BASE_SNAPSHOT as TIX_WM
    from .text_index import sync_text_index

    results: dict = {}
    live: list[str] = []
    for loc in registered_indexes(base):
        try:
            tbl = IceliteTable.load(loc)
        except FileNotFoundError:
            results[loc] = {"dropped": True}
            continue
        live.append(loc)
        props = tbl.meta.properties
        try:
            if TIX_WM in props:
                results[loc] = sync_text_index(spark, base, tbl)
            elif ANN_WM in props:
                results[loc] = sync_ann_index(spark, base, tbl)
            else:
                results[loc] = {"skipped": "unknown index kind"}
        except KeyError as e:
            # the watermark snapshot was expired out from under the index
            # (e.g. expire ran without the auto-sync, or with it disabled):
            # no diff exists to replay — the index needs a rebuild/re-
            # register. Report, don't fail the whole maintenance pass.
            results[loc] = {"stale_watermark": True, "error": str(e)}
    if len(live) != len(registered_indexes(base)):
        base.set_properties({PROP_REGISTRY: json.dumps(live)})
    return {
        "indexes": len(results),
        "synced": sum(1 for r in results.values() if r.get("synced")),
        "results": results,
    }
