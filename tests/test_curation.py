"""P30 curation pipeline + R27 profiling: semantic invariants the
oracle gate can't see — partitioning-invariance (the 100 TB resume
property) and plan shape (no extra shuffles, single scan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlspark.operators import textstats
from crawlspark.queries.relational import q96_profile
from crawlspark.queries.textq import q95_curation

SF = "/root/testdata/sf0.001"

MIX = {"en": 0.5, "de": 2.25, "fr": 1.0, "zh": 0.125}


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _run(df):
    out = textstats.curate(
        df, "doc_id", "text", min_words=5, min_quality=0.4,
        mixture=MIX, default_weight=0.75, mixture_col="lang",
    )
    return sorted(
        (r.doc_id, r.lang, r.pred_lang, r.epoch, r.quality)
        for r in out.select("doc_id", "lang", "pred_lang", "epoch", "quality").collect()
    )


def test_curate_partitioning_invariant(spark):
    """The same rows (and epoch copies) survive under 1 partition and
    under a pathological 17-way repartition — md5-keyed dedup and
    md5-threshold mixture never consult physical layout, so a resumed
    or re-planned job re-draws the identical corpus."""
    d = _docs(spark)
    a = _run(d.coalesce(1))
    b = _run(d.repartition(17))
    assert a == b
    assert len(a) > 0


def test_curate_stages_compose(spark):
    """Each stage's contract holds on the composed output: every row
    passes the quality/word filters, keepers are the min doc_id of
    their dup_key, and per-group epoch counts follow the mixture
    weight floor/ceil."""
    out = textstats.curate(
        _docs(spark), "doc_id", "text", min_words=5, min_quality=0.4,
        mixture=MIX, default_weight=0.75, mixture_col="lang",
    ).cache()
    try:
        assert out.filter((F.col("n_words") < 5) | (F.col("quality") < 0.4)).count() == 0
        # keep-first: each dup_key's surviving doc_id is the group min
        # among survivors AND no two survivors share a dup_key
        per_key = out.select("dup_key", "doc_id").distinct().groupBy("dup_key").count()
        assert per_key.filter("count > 1").count() == 0
        # epoch copies per doc ∈ {floor(w), floor(w)+1}
        w_floor = {"en": 0, "de": 2, "fr": 1, "zh": 0}
        eps = out.groupBy("doc_id", "lang").agg(F.max("epoch").alias("n")).collect()
        for r in eps:
            lo = w_floor.get(r.lang, 0)
            assert r.n in (lo, lo + 1), (r.doc_id, r.lang, r.n)
    finally:
        out.unpersist()


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_curation_plan_shape(spark):
    """One scan; the only exchanges are the dedup window (with Spark's
    map-side WindowGroupLimit prune) and the rollup's two-phase
    distinct aggregate; nothing quadratic."""
    p = _plan(q95_curation(spark, "/root/testdata/sf0.01"))
    assert p.count("Scan parquet") == 2          # formatted lists nodes twice
    assert p.count("Exchange") <= 6              # 3 distinct exchanges
    assert p.count("WindowGroupLimit") >= 2      # map-side top-1 per dup_key
    assert "CartesianProduct" not in p


def test_profile_plan_single_pass(spark):
    """R27 profiles N columns in ONE scan: all stats are partial
    aggregates over a single Expand (the exact-distinct price), never
    one job per column."""
    p = _plan(q96_profile(spark, "/root/testdata/sf0.01"))
    assert p.count("Scan parquet") == 2          # one distinct scan
    assert p.count("Exchange") <= 4              # partial → final, once
    assert "CartesianProduct" not in p


def test_classifier_filter_exact_and_invariant(spark):
    """P10 model-based flavor: integer-exact pooled logit — identical
    across partitionings — and keep ⟺ positive weight sum."""
    import hashlib

    from crawlspark.operators.textstats import classifier_filter

    docs = [(i, f"alpha beta doc {i} " + "pad " * (i % 5)) for i in range(40)]

    def run(parts):
        df = spark.createDataFrame(docs, ["doc_id", "text"]).repartition(parts)
        return sorted(
            (r["id"], r["n_feats"], r["logit"], r["keep"])
            for r in classifier_filter(df, "doc_id", "text", dims=64).collect()
        )

    a, b = run(1), run(7)
    assert a == b
    # sequential twin for one row
    dims = 64
    w = [
        int(hashlib.md5(f"w#{k}".encode()).hexdigest()[:15], 16) % 2001 - 1000
        for k in range(dims)
    ]

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    toks = []
    ws = docs[3][1].strip().split(" ")
    toks += [t for t in ws if t]
    toks += [f"{ws[i]}_{ws[i+1]}" for i in range(len(ws) - 1)]
    sw = sum(w[h60(t) % dims] for t in toks)
    row = dict((r[0], r) for r in a)[3]
    assert row[1] == len(toks) and row[3] == (sw > 0)
    assert abs(row[2] - round(sw / (1000.0 * len(toks)), 6)) < 1e-12
