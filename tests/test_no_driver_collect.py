"""Guard: no driver-side materialization of row data inside the certified
query paths. A ``.collect()`` in a queries() entry is a driver OOM at scale
— the round-1 streaming queries collected their full result to survive a
tmpdir teardown; they now write under a session-scoped dir instead.

(The one sanctioned collect in operator code is the IVF centroid sample in
operators/similarity.py — 8 rows of metadata, not row data.)
"""

from __future__ import annotations

import os
import re

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "lakehouse_benchmark_ingestion_spark")

QUERY_FILES = ["queries.py", "queries_pipeline.py", "queries_relational.py"]


def test_query_paths_do_not_collect():
    pat = re.compile(r"\.collect\(\)")
    offenders = []
    for name in QUERY_FILES:
        with open(os.path.join(PKG, name)) as fh:
            for i, line in enumerate(fh, 1):
                code = line.split("#", 1)[0]
                if pat.search(code):
                    offenders.append(f"{name}:{i}: {line.strip()}")
    assert not offenders, "\n".join(offenders)
