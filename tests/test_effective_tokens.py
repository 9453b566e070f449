"""P42 dedup-discounted effective corpus size (q125): near-dup
clusters keep one doc; only keeper tokens count toward the effective
size. Pin the discount arithmetic on a planted duplicate pair."""

import tempfile

from crawlspark.queries import dedupq


def test_effective_tokens_discounts_near_dups(spark):
    rows = [
        # two exact copies in source a -> one keeper, ~half the tokens
        (0, "a", "the quick brown fox jumps over the lazy dog today"),
        (1, "a", "the quick brown fox jumps over the lazy dog today"),
        # unique doc in source b -> no discount
        (2, "b", "completely different text with its own unique words"),
    ]
    sf = tempfile.mkdtemp(prefix="efftok-")
    spark.createDataFrame(
        rows, ["doc_id", "source", "text"]
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    out = {r["source"]: r for r in dedupq.q125_effective_tokens(spark, sf).collect()}

    a, b = out["a"], out["b"]
    assert (a["n_docs"], a["n_docs_kept"]) == (2, 1)
    # identical texts: keeper holds exactly half the raw tokens
    assert a["effective_tokens"] * 2 == a["raw_tokens"]
    assert a["dup_token_frac"] == 0.5
    assert (b["n_docs"], b["n_docs_kept"]) == (1, 1)
    assert b["effective_tokens"] == b["raw_tokens"]
    assert b["dup_token_frac"] == 0.0
