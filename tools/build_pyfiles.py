"""Build the spark-submit --py-files archive (north_rule packaging).

    python tools/build_pyfiles.py [out_zip]

Produces a zip whose root contains the `lakehouse_benchmark_ingestion_spark`
package — the artifact `spark-submit --py-files engine.zip jobs/cli.py ...`
ships to every executor (the reference ships a fat jar the same way,
README.md:95-105). Only `.py` sources are packed: no tests, no __pycache__,
no data. Deterministic output (fixed timestamps, sorted entries) so repeated
builds of an unchanged tree are byte-identical — a re-submit with the same
artifact hash is provably the same code.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGE = "lakehouse_benchmark_ingestion_spark"


def build(out_zip: str) -> list[str]:
    """Write the archive; return the packed entry names (sorted)."""
    entries: list[str] = []
    pkg_root = os.path.join(REPO, PACKAGE)
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for name in sorted(filenames):
            if not name.endswith(".py"):
                continue
            full = os.path.join(dirpath, name)
            entries.append(os.path.relpath(full, REPO))
    os.makedirs(os.path.dirname(os.path.abspath(out_zip)) or ".", exist_ok=True)
    with zipfile.ZipFile(out_zip, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        for rel in entries:
            with open(os.path.join(REPO, rel), "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(rel.replace(os.sep, "/"), date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return entries


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "engine.zip")
    packed = build(out)
    print(f"{out}: {len(packed)} files, {os.path.getsize(out)} bytes")
