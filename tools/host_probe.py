"""Host-quietness probe for scaling measurements on a shared box.

Runs a fixed pure-CPU kernel on 1 thread and on N threads (processes —
no GIL): if N workers don't get ~N× the throughput of 1 worker, co-tenants
are eating cores and any N-vs-4N engine measurement taken now will
understate scaling no matter how good the engine is. BENCH.md's protocol
records engine efficiency alongside this control; run the sweep only when
the probe reports >= ~0.85.

Usage: python tools/host_probe.py [workers]   (default 16)
"""

from __future__ import annotations

import json
import sys
import time
from concurrent.futures import ProcessPoolExecutor


def _kernel(_=None) -> float:
    # single-threaded BLAS, or the 1-worker baseline silently uses every
    # core and the probe reports a loaded box even on an idle one
    import os

    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ[var] = "1"
    import numpy as np

    rng = np.random.default_rng(7)
    a = rng.random((600, 600))
    t0 = time.time()
    for _ in range(30):
        a = np.tanh(a @ a.T / 600.0)
    return time.time() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    t1 = min(_kernel() for _ in range(2))
    with ProcessPoolExecutor(max_workers=n) as ex:
        t0 = time.time()
        walls = list(ex.map(_kernel, range(n)))
        tn = time.time() - t0
    # n kernels in parallel should take ~t1 on an idle n-core box
    eff = t1 / tn
    print(
        json.dumps(
            {
                "workers": n,
                "single_sec": round(t1, 3),
                "parallel_wall_sec": round(tn, 3),
                "parallel_worker_max": round(max(walls), 3),
                "quietness": round(eff, 3),
                "verdict": "quiet" if eff >= 0.85 else "loaded",
            }
        )
    )


if __name__ == "__main__":
    main()
