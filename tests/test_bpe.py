"""P39 distributed BPE merge learning (q117): pin the rule semantics
on the textbook corpus — frequency-weighted overlapping pair counts,
(count DESC, lexicographic) argmax, merged symbols re-pairing in later
rounds — and partitioning invariance.
"""

from crawlspark.operators import textstats


DOCS = [("d0", "low low low"), ("d1", "lower lower"), ("d2", "newest")]

# hand-derived: round 1 ties l-o / o-w at 5 → lexicographic picks
# (l, o); round 2 the merged "lo" pairs with w at 5; round 3 ties
# low-e / e-r at 2 → (e, r) wins lexicographically
EXPECT = [
    (1, "l", "o", "lo", 5),
    (2, "lo", "w", "low", 5),
    (3, "e", "r", "er", 2),
]


def _run(spark, parts):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"]).repartition(parts)
    out = textstats.bpe_merges(df, "text", k_rounds=3).collect()
    return [
        (r["round"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in sorted(out, key=lambda r: r["round"])
    ]


def test_bpe_textbook_merges(spark):
    assert _run(spark, 2) == EXPECT


def test_bpe_partitioning_invariant(spark):
    assert _run(spark, 1) == _run(spark, 5) == EXPECT
