"""Tests for the late-round-4 curation operators: P32 cross-document
media dedup (q102) and P33 domain-level quality with empirical-Bayes
shrinkage (q103).

P32's engine-vs-refsim check runs through the driver harness
(q102_media_dedup vs crawl_oracle.py); here we pin the OPERATOR
properties that the oracle alone can't localize: the dedup aggregation
is partitioning-invariant, the keeper is the lexicographic minimum
occurrence, and the UNIT_MEDIA graph genuinely contains cross-document
duplicates (a dedup test over a dup-free corpus proves nothing).
"""

from pyspark.sql import functions as F

from crawlspark.operators import textstats


def _media_dedup(df):
    """The q102 aggregation body over any (doc_id, spans) frame."""
    m = (
        df.select("doc_id", F.explode("spans").alias("span"))
        .filter(F.col("span.kind") == "media")
        .select(
            F.col("span.media_ref").alias("media_ref"),
            "doc_id",
            F.col("span.offset").alias("offset"),
        )
    )
    return m.groupBy("media_ref").agg(
        F.count("*").cast("long").alias("n_refs"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.min(F.struct("doc_id", "offset")).alias("_k"),
    ).select(
        "media_ref", "n_refs", "n_docs",
        F.col("_k.doc_id").alias("keeper_doc"),
        F.col("_k.offset").alias("keeper_offset"),
    )


def _docs_df(spark):
    from crawlspark.schemas import SPAN
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN), False),
    ])

    def span(kind, ref, off):
        return ("media" if kind == "m" else "text",
                "" if kind == "m" else "x", ref, off)

    rows = [
        ("d1", [span("t", "", 0), span("m", "media://a/1", 10),
                span("m", "media://a/2", 80)]),
        ("d2", [span("m", "media://a/1", 5)]),
        ("d0", [span("m", "media://a/1", 99), span("m", "media://a/1", 7)]),
        ("d3", [span("t", "", 0)]),
    ]
    return spark.createDataFrame(rows, schema)


def test_media_dedup_keeper_is_lexicographic_min(spark):
    out = {r["media_ref"]: r for r in _media_dedup(_docs_df(spark)).collect()}
    assert set(out) == {"media://a/1", "media://a/2"}
    a1 = out["media://a/1"]
    # 4 occurrences across 3 docs; keeper = min (doc_id, offset) =
    # ("d0", 7) — NOT d1 (insertion order) and NOT d0@99
    assert (a1["n_refs"], a1["n_docs"]) == (4, 3)
    assert (a1["keeper_doc"], a1["keeper_offset"]) == ("d0", 7)
    a2 = out["media://a/2"]
    assert (a2["n_refs"], a2["n_docs"], a2["keeper_doc"]) == (1, 1, "d1")


def test_media_dedup_partitioning_invariant(spark):
    df = _docs_df(spark)
    base = sorted(map(tuple, _media_dedup(df).collect()))
    for n in (1, 7):
        got = sorted(map(tuple, _media_dedup(df.repartition(n)).collect()))
        assert got == base


def test_unit_media_graph_has_cross_document_duplicates():
    """The UNIT_MEDIA refsim corpus must contain refs shared across
    docs — otherwise q102's driver check degenerates to a rename."""
    from crawlspark.refsim import RefSim
    from crawlspark.synth import UNIT_MEDIA

    res = RefSim(UNIT_MEDIA).run()
    by_ref: dict[str, set] = {}
    for doc_id, (_c, spans) in res.docs.items():
        for s in spans:
            if s["kind"] == "media":
                by_ref.setdefault(s["media_ref"], set()).add(doc_id)
    assert any(len(d) > 1 for d in by_ref.values())


def test_domain_quality_shrinkage(spark):
    """Shrunk score lies between the domain score and the prior, and a
    thin domain moves proportionally closer to the prior than a dense
    one: weight on the prior is k/(n+k)."""
    rows = (
        # dense domain: 30 clean docs
        [(f"many the and of words here {i}", "dense") for i in range(30)]
        # thin domain: 2 punctuation-heavy docs
        + [("!!! ??? ... ;;;", "thin"), ("??? !!! ,,, :::", "thin")]
    )
    df = spark.createDataFrame(rows, "text string, source string")
    out = {r["source"]: r for r in
           textstats.domain_quality(df, "text", "source", k=20).collect()}
    dense, thin = out["dense"], out["thin"]
    assert dense["n_docs"] == 30 and thin["n_docs"] == 2
    assert dense["score"] > thin["score"]
    # recover the prior from the shrink equation on each row:
    # shrunk = (n·score + k·prior)/(n+k)  ⇒  prior = (shrunk·(n+k) − n·score)/k
    def prior_of(r, k=20.0):
        n = r["n_docs"]
        return (r["score_shrunk"] * (n + k) - n * r["score"]) / k

    p_dense, p_thin = prior_of(dense), prior_of(thin)
    # both rows must encode the SAME corpus prior (up to the 1e-6
    # output rounding, amplified by (n+k)/k ≤ 2.5 in the inversion)
    assert abs(p_dense - p_thin) < 1e-5
    prior = (p_dense + p_thin) / 2
    # each shrunk score lies between its raw score and the prior
    for r in (dense, thin):
        lo, hi = sorted([r["score"], prior])
        assert lo - 1e-6 <= r["score_shrunk"] <= hi + 1e-6
    # thin (n=2, k=20) keeps 2/22 of its own signal vs dense's 30/50:
    # its shrink fraction toward the prior must be much larger
    frac_thin = abs(thin["score_shrunk"] - thin["score"]) / abs(prior - thin["score"])
    frac_dense = abs(dense["score_shrunk"] - dense["score"]) / abs(prior - dense["score"])
    assert frac_thin > 0.85 > 0.45 > frac_dense


def test_domain_quality_partitioning_invariant(spark):
    rows = [(f"word {i} the of and to in is text here", f"s{i % 5}")
            for i in range(100)]
    df = spark.createDataFrame(rows, "text string, source string")
    base = sorted(map(tuple, textstats.domain_quality(df).collect()))
    for n in (1, 13):
        got = sorted(
            map(tuple, textstats.domain_quality(df.repartition(n)).collect())
        )
        assert got == base


def test_quantized_topk_matches_exact_and_is_invariant(spark):
    """P34 (q105): on the driver embeddings the SQ8 prefilter at
    expand=4 loses nothing — top-3 set equals the exact brute-force
    top-3 — and the two-stage pipeline is partitioning-invariant."""
    from pyspark.sql import functions as F

    from crawlspark.operators import similarity

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 10)
    c = e.filter(F.col("vec_id") >= 10)
    quant = similarity.quantized_topk(q, c, k=3, expand=4)
    base = sorted(map(tuple, quant.collect()))
    exact = similarity.brute_topk(q, c, k=3)
    assert {(r["q_id"], r["n_id"]) for r in quant.collect()} == {
        (r["q_id"], r["n_id"]) for r in exact.collect()
    }
    got = sorted(
        map(tuple, similarity.quantized_topk(q.repartition(3), c.repartition(7), k=3, expand=4).collect())
    )
    assert got == base


def test_leakage_safe_split_no_straddling_pair(spark):
    """P35 (q106): by construction no near-dup pair may straddle the
    train/val split, both splits must be populated, and the
    assignment must be partitioning-invariant."""
    from crawlspark.operators import dedup, graph
    from crawlspark.queries.dedupq import q106_leakage_safe_split

    sf = "/root/testdata/sf0.01"
    out = q106_leakage_safe_split(spark, sf)
    rows = out.collect()
    split_of = {r["id"]: r["split"] for r in rows}
    assert {r["split"] for r in rows} == {"train", "val"}
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    pairs = dedup.minhash_near_dups(
        docs, "doc_id", "text", k=2, n_hashes=8, bands=4, threshold=0.5
    ).collect()
    assert pairs, "corpus must actually contain near-dup pairs"
    for p in pairs:
        assert split_of[p["i"]] == split_of[p["j"]], (p["i"], p["j"])
    # invariance: same assignment regardless of input partitioning
    base = sorted(map(tuple, rows))
    docs13 = docs.repartition(13)
    pairs13 = dedup.minhash_near_dups(
        docs13, "doc_id", "text", k=2, n_hashes=8, bands=4, threshold=0.5
    )
    from pyspark.sql import functions as F

    from crawlspark.portable import md5hash60

    comp = graph.connected_components(pairs13.select("i", "j"))
    d = docs13.select(F.col("doc_id").alias("id")).join(comp, "id", "left")
    again = d.select(
        "id", F.coalesce("component", F.col("id")).alias("group_id")
    ).withColumn(
        "split",
        F.when(
            md5hash60(F.col("group_id").cast("string")) % 1000 < 100, "val"
        ).otherwise("train"),
    )
    assert sorted(map(tuple, again.collect())) == base


def test_compression_signal_discriminates(spark):
    """P36 (q111): repetitive boilerplate must compress far below
    high-entropy text, zero-length text is safe, and the UDF is
    partitioning-invariant."""
    import random

    rng = random.Random(7)
    rand_txt = "".join(chr(rng.randrange(33, 127)) for _ in range(2000))
    rep_txt = "the same boilerplate line over and over " * 50
    rows = [(1, rep_txt), (2, rand_txt), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in
           textstats.compression_signal(df).collect()}
    assert out[1]["z_ratio"] < 0.1 < 0.8 < out[2]["z_ratio"]
    assert out[3]["n_bytes"] == 0 and out[3]["z_bytes"] > 0
    base = sorted(map(tuple, textstats.compression_signal(df).collect()))
    got = sorted(map(tuple,
                     textstats.compression_signal(df.repartition(3)).collect()))
    assert got == base


def test_warc_roundtrip_adversarial_payloads(spark):
    """R30 (q112): the Content-Length-driven parser must survive the
    payloads blank-line splitting would corrupt — embedded CRLF CRLF
    inside the text, multi-byte UTF-8 (byte-vs-char slicing), empty
    text, and trailing whitespace."""
    from pyspark.sql import functions as F

    from crawlspark.operators import bucketing

    rows = [
        (1, "plain text"),
        (2, "embedded\r\n\r\nblank line"),
        (3, "unicode: héllo wörld — 中文 🙂"),
        (4, ""),
        (5, "trailing spaces   \r\n"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "uri", F.concat(F.lit("https://x/doc/"), F.col("doc_id").cast("string"))
    )
    w = bucketing.warc_records(d, "doc_id", "text", F.col("uri"))
    got = {
        r["doc_id"]: (r["uri"], r["text"])
        for r in bucketing.parse_warc_records(w).collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == (f"https://x/doc/{doc_id}", text), doc_id
