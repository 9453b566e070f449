"""C39/C40 BENCH-tier cost table (BASELINE.md "clock eviction cost").

Runs the BENCH crawl graph (~60k pages, 100k batch, 6 cycles) under
three frontier configs in one session, alternating warm runs:

  uncapped            — frontier_cap=None (the r4 baseline row)
  capped              — frontier_cap=20000 (sweeps fire every cycle)
  capped + low-water  — frontier_cap=20000, frontier_slack=4000
                        (sweeps fire every ~slack/novel-rate cycles)

Prints per-config wall, per-cycle walls, eviction count and sweep
cycles. Quiet machine required; min-of-reps is the adjudicated
number.

Usage: python tools/clock_cost_bench.py [reps]
"""

from __future__ import annotations

import dataclasses
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from pyspark.sql import functions as F

    from crawlspark.engine import CrawlEngine, EngineConfig
    from crawlspark.queries import pin_session
    from crawlspark.session import get_spark
    from crawlspark.synth import BENCH

    spark = get_spark("clock-cost-bench")
    pin_session(spark)

    cfgs = {
        "uncapped": dataclasses.replace(BENCH, frontier_cap=None),
        "capped20k": dataclasses.replace(BENCH, frontier_cap=20_000),
        "capped20k_lw4k": dataclasses.replace(
            BENCH, frontier_cap=20_000, frontier_slack=4_000
        ),
    }
    best: dict[str, dict] = {}
    for rep in range(reps):
        for name, g in cfgs.items():
            eng = CrawlEngine(
                spark, EngineConfig(graph=g, warehouse=tempfile.mkdtemp())
            )
            t0 = time.time()
            stats = eng.run()
            wall = time.time() - t0
            ev = eng.cat.read("evictions")
            n_ev = ev.count() if g.frontier_cap else 0
            sweep_cycles = (
                sorted(
                    r["cycle_id"]
                    for r in ev.select("cycle_id").distinct().collect()
                )
                if g.frontier_cap
                else []
            )
            row = {
                "wall": wall,
                "cycles": [round(s["wall_ms"] / 1000, 1) for s in stats],
                "evictions": n_ev,
                "sweep_cycles": sweep_cycles,
            }
            print(f"rep{rep} {name}: {row}", flush=True)
            if name not in best or wall < best[name]["wall"]:
                best[name] = row
    print("\n== min-of-reps ==")
    for name, row in best.items():
        print(f"{name}: wall {row['wall']:.1f}s  cycles {row['cycles']}  "
              f"evictions {row['evictions']}  sweeps@{row['sweep_cycles']}")


if __name__ == "__main__":
    main()
