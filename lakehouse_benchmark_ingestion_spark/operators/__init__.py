from .compaction import CompactionPlan, compact, plan_compaction
from .clustering import cluster
from .expire_snapshots import expire_snapshots
from .manifest_rewrite import rewrite_manifests
from .merge_into import merge_into

__all__ = [
    "CompactionPlan",
    "cluster",
    "compact",
    "expire_snapshots",
    "merge_into",
    "plan_compaction",
    "rewrite_manifests",
]
