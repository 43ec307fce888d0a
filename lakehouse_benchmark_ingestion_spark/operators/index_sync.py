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

import glob as _glob
import json
import os
import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession

from ..icelite import manifest as mf
from ..icelite.table import IceliteTable

PROP_REGISTRY = "derived.indexes"

#: the ONE list of index-watermark property keys — consumed by the sync
#: dispatch below, expire_snapshots' watermark pinning, and
#: plans.maintenance's freshness report. Adding an index kind means adding
#: its key HERE, and every watermark-aware site picks it up.
WATERMARK_PROPS = ("tix.base-snapshot", "ann-index.base-snapshot")


def watermark_of(props: dict) -> int | None:
    for key in WATERMARK_PROPS:
        if key in props:
            return int(props[key])
    return None


def commit_index_delta(
    tbl: IceliteTable,
    del_keys: DataFrame | None,
    key_col: str,
    data_paths: list[str],
    stat_columns: list[str],
    watermark: dict,
    op: str,
) -> dict:
    """ONE atomic commit applying a CDC delta to a derived-index table:

      - ``del_keys`` (distinct) become an equality-delete file on
        ``key_col`` at sequence S — it suppresses only rows with
        sequence < S (the v2 strict-< rule);
      - ``data_paths`` (the freshly written insert files) are added at the
        SAME sequence S, so an updated key's new rows outlive the delete
        on its old rows — equal sequence is NOT suppressed;
      - the watermark property moves in the same commit.

    Because delete, insert, and watermark land together, a crashed sync
    leaves NO partial state: the replay recomputes the identical diff and
    commits once — no duplicate eq-delete files can accumulate (the
    failure mode of a delete-first/append-second two-commit sync). Shared
    by the text and ANN index syncs so the sequencing logic exists once.
    """
    run_id = _uuid.uuid4().hex[:12]
    del_stats: list = []
    n_del_keys = 0
    if del_keys is not None:
        del_dir = os.path.join(tbl.location, "data", f"ixsync-{run_id}-deletes")
        del_keys.repartitionByRange(1, key_col).write.mode("overwrite").parquet(
            del_dir
        )
        del_paths = sorted(_glob.glob(os.path.join(del_dir, "part-*.parquet")))
        del_stats = mf.harvest_stats(del_paths, stat_columns=[key_col])
        n_del_keys = sum(f.record_count for f in del_stats)
        for s in del_stats:
            s.content = mf.CONTENT_EQ_DELETES

    data_stats = mf.harvest_stats(data_paths, stat_columns=stat_columns)
    pspec = tbl.partition_spec
    if pspec is not None:
        from ..icelite import partition as ps

        for s in data_stats:
            s.partition_json = ps.partition_json_from_path(
                s.path, pspec, tbl.schema
            )
    seq = tbl.next_sequence_number()
    for s in [*del_stats, *data_stats]:
        s.sequence_number = seq

    props = dict(watermark)
    if del_stats:
        props["merge-key"] = key_col
    # same commit shape (and operation label) as MOR MERGE INTO: eq-delete
    # + inserts at one equal sequence number (merge_into.py stamps both
    # sides with the same seq — equal seq is not suppressed by strict <)
    tbl.replace_files(
        set(),
        [*del_stats, *data_stats],
        operation="merge-mor" if data_stats else "delete-mor",
        summary={"op": op, "run-id": run_id, "keys": str(n_del_keys)},
        set_properties=props,
    )
    return {"deleted_keys": n_del_keys, "data_files": len(data_stats)}


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
