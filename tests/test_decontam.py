"""P41 bloom-prefiltered decontamination (q124): the Bloom prefilter +
exact-verify pipeline must be bit-identical to the broadcast-join
decontamination (q47) at ANY filter sizing — no false negatives by the
Bloom guarantee, false positives provably removed by the verify join —
and the prefilter must actually be selective at a sane sizing.
"""

from pyspark.sql import functions as F

from crawlspark.queries import textq

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted((r["doc_id"], r["n_shared_grams"]) for r in df.collect())


def test_decontam_bloom_matches_exact(spark):
    assert _rows(textq.q124_decontam_bloom(spark, SF)) == _rows(
        textq.q47_contamination(spark, SF)
    )


def test_decontam_bloom_exact_under_saturated_filter(spark):
    # nbits=64/k=2 saturates the bitset, maximizing false positives:
    # the verify join must still reduce the result to the exact answer
    assert _rows(textq.decontam_bloom(spark, SF, nbits=64, k=2)) == _rows(
        textq.q47_contamination(spark, SF)
    )


def test_decontam_bloom_prefilter_is_selective(spark):
    # at the default sizing, the bloom-positive gram stream that
    # reaches the exact verify join must be a strict subset of the
    # corpus gram stream (the whole point of the prefilter: the join
    # sees contaminated + eps grams, not every gram)
    from crawlspark.operators import seen
    from crawlspark.operators.dedup import _materialize
    from crawlspark.operators.textstats import _word_grams
    from crawlspark.portable import words
    from crawlspark import schemas
    from crawlspark.queries.relational import T

    d = _materialize(
        T(spark, SF, "documents")
        .select("doc_id", words("text").alias("_w"))
        .select("doc_id", _word_grams(F.col("_w"), 4).alias("_g"))
    )
    bench = d.filter(F.col("doc_id") < 5).select(
        F.explode("_g").alias("gram")
    ).distinct()
    bloom = seen.fold_bloom(
        bench.select(F.lit(0).alias("part"), F.xxhash64("gram").alias("url_hash")),
        spark.createDataFrame([], schemas.BLOOM_SEEN),
        cycle_id=0, nbits=1 << 16, k=7,
    )
    corpus = d.filter(F.col("doc_id") >= 5).select(
        "doc_id",
        F.explode("_g").alias("gram"),
        F.lit(0).alias("part"),
    ).withColumn("url_hash", F.xxhash64("gram"))
    probed = seen.bloom_prefilter_broadcast(corpus, bloom)
    total = probed.count()
    positive = probed.filter("maybe_seen").count()
    shared = corpus.join(F.broadcast(bench), "gram", "left_semi").count()
    # every truly-shared gram survives (no false negatives) ...
    assert positive >= shared
    # ... and the prefilter is selective: FPs are a small fraction of
    # the clean grams (1<<16 bits over ~1k eval grams => fp ~ 0)
    assert positive - shared <= max(1, (total - shared) // 20)
