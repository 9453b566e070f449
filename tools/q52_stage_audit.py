"""q52 stage-time audit (VERDICT r4 task #3).

Times the near-dup pipeline's stages CUMULATIVELY at two scale
factors, cold-cache per measurement: shingle materialization → wide
signature + band keys → band self-join candidates → set-based exact
verify. If stage times barely move between sf0.01 and sf0.1 (10× the
data), the residual is per-stage fixed cost (job scheduling + codegen
+ 32-way shuffle latency) that amortizes at scale — the audit
BENCH/BASELINE.md commits.

Usage: python tools/q52_stage_audit.py [reps]   (quiet machine!)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from crawlspark.operators import dedup
    from crawlspark.queries import pin_session
    from crawlspark.queries.relational import T
    from crawlspark.session import get_spark

    spark = get_spark("q52-stage-audit")
    pin_session(spark)

    def stages(sf_dir):
        d = T(spark, sf_dir, "documents")
        t = {}
        t0 = time.time()
        sh = dedup.shingle_table(d, "doc_id", "text", k=2).localCheckpoint(
            eager=False
        )
        n_sh = sh.count()
        t["1_shingles"] = time.time() - t0
        t0 = time.time()
        bandkey = dedup.band_keys_wide(
            dedup.minhash_wide(sh, 8), 8, 4
        ).localCheckpoint(eager=False)
        bandkey.count()
        t["2_sig_bands"] = time.time() - t0
        t0 = time.time()
        cand = dedup._band_self_join(bandkey).localCheckpoint(eager=False)
        n_cand = cand.count()
        t["3_band_join"] = time.time() - t0
        t0 = time.time()
        n_pairs = dedup.jaccard_verify(cand, sh, 0.5).count()
        t["4_verify"] = time.time() - t0
        return t, n_sh, n_cand, n_pairs

    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        best = None
        meta = None
        for _ in range(reps):
            t, n_sh, n_cand, n_pairs = stages(sf_dir)
            if best is None or sum(t.values()) < sum(best.values()):
                best, meta = t, (n_sh, n_cand, n_pairs)
        total = sum(best.values())
        print(f"\n{sf_dir}: shingles={meta[0]} cands={meta[1]} pairs={meta[2]}")
        for k, v in best.items():
            print(f"  {k:12s} {v:6.2f}s  ({100 * v / total:4.1f}%)")
        print(f"  {'total':12s} {total:6.2f}s  (min of {reps} reps)")


if __name__ == "__main__":
    main()
