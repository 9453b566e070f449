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
    ]
    out.write_text("\n".join(lines))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
