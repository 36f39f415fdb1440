#!/usr/bin/env python
"""Re-find the seg-batch knee for THIS host in minutes.

The shipped ``--fast`` preset bakes in batch 8 — the measured knee on the
development box (1 CPU, TPU behind a high-latency tunnel; docs/PERF.md
"Seg batch sweep"). On multi-core hosts with local-DMA chips the knee sits
higher (larger batches amortize dispatch overhead once the link latency and
the single-CPU host bottleneck disappear), so real deployments should sweep
once and pass ``--seg-batch-size`` explicitly.

Each batch size runs in its OWN ``bench.py`` subprocess (fresh device state;
the persistent compile cache keeps repeat compiles cheap) over the real-TIFF
corpus — the metric that includes the production decode path. Usage::

    python tools/sweep_seg_batch.py                 # sweeps 4 8 16 32 64
    python tools/sweep_seg_batch.py 8 32 128        # explicit sizes
    ATLASPATCH_BENCH_PASSES=3 python tools/sweep_seg_batch.py

Prints one row per size (best/median slides/hour) and the winner; exits
non-zero if any run fails. Expect ~2-5 min per size on a warm compile cache.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_one(batch: int, passes: int) -> dict | None:
    env = dict(
        os.environ,
        ATLASPATCH_BENCH_SEG_BATCH=str(batch),
        ATLASPATCH_BENCH_PASSES=str(passes),
        ATLASPATCH_BENCH_SKIP="synthetic,embed",  # real-TIFF = production path
    )
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    if proc.returncode != 0:
        print(f"batch {batch}: bench failed\n{proc.stderr[-2000:]}", file=sys.stderr)
        return None
    line = proc.stdout.strip().splitlines()[-1]
    m = json.loads(line)["metrics"]["seg_coords_real_tiff"]
    return {"batch": batch, "best": m["value"], "median": m["median"]}


def main() -> int:
    sizes = [int(a) for a in sys.argv[1:]] or [4, 8, 16, 32, 64]
    passes = int(os.environ.get("ATLASPATCH_BENCH_PASSES", "3"))
    print(f"# sweeping seg batch sizes {sizes} ({passes} passes each, "
          f"real-TIFF corpus) — keep the host otherwise idle", file=sys.stderr)
    rows = []
    for b in sizes:
        r = run_one(b, passes)
        if r is None:
            return 1
        rows.append(r)
        print(f"# batch {b}: best {r['best']:,.0f} / median {r['median']:,.0f} slides/h",
              file=sys.stderr)
    rows.sort(key=lambda r: -r["median"])
    print(json.dumps({
        "winner_batch": rows[0]["batch"],
        "rows": sorted(rows, key=lambda r: r["batch"]),
        "hint": (f"pass --seg-batch-size {rows[0]['batch']} (or export "
                 f"ATLASPATCH_BENCH_SEG_BATCH={rows[0]['batch']} for bench.py); "
                 "the --fast preset's batch 8 is the dev-box knee"),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
