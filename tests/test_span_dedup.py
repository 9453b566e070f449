"""P37 exact-substring span dedup (q113): pin the operator semantics
the DuckDB twin can't localize — global-first-occurrence wins, covered
positions merge across overlapping flagged windows, self-repetition
inside one document dedups, and the result is partitioning-invariant.
"""

from crawlspark.operators import dedup


DOCS = [
    ("d1", "a b c d e"),
    ("d2", "x a b c y"),          # contains d1's "a b c" at pos 2
    ("d3", "a b c d e"),          # exact copy of d1 — fully removed
    ("d4", "p q r a b c d"),      # overlapping dups "a b c", "b c d"
    ("d5", "m n o z m n o z m n o"),  # self-repetition
]

EXPECT = {
    # id: (n_tokens, n_removed, text_dedup)
    "d1": (5, 0, "a b c d e"),
    "d2": (5, 3, "x y"),
    "d3": (5, 5, ""),
    "d4": (7, 4, "p q r"),
    "d5": (11, 7, "m n o z"),
}


def _run(spark, df):
    out = dedup.span_dedup(df, "doc_id", "text", k=3)
    return {
        r["id"]: (r["n_tokens"], r["n_removed"], r["text_dedup"])
        for r in out.collect()
    }


def test_span_dedup_semantics(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    assert _run(spark, df) == EXPECT


def test_span_dedup_partitioning_invariant(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"]).repartition(7)
    assert _run(spark, df) == EXPECT


def test_span_dedup_short_docs_untouched(spark):
    # docs shorter than k generate no windows and survive verbatim,
    # even when they are exact copies of each other
    df = spark.createDataFrame(
        [("s1", "a b"), ("s2", "a b"), ("s3", "q")], ["doc_id", "text"]
    )
    got = _run(spark, df)
    assert got == {
        "s1": (2, 0, "a b"),
        "s2": (2, 0, "a b"),
        "s3": (1, 0, "q"),
    }
