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


def _apply_py(word, merges):
    s = " " + " ".join(word) + " "
    for l, r in merges:
        s = s.replace(f" {l} {r} ", f" {l}{r} ")
    return s.strip().split(" ")


def test_bpe_apply_matches_sequential(spark):
    """P40 apply: Spark's vocab-side chained replaces == the sequential
    per-word twin, token counts weighted by corpus word frequency."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text"]).repartition(3)
    merges = [(l, r) for (_, l, r, _, _) in EXPECT]
    got = {
        r["token"]: r["n_occurrences"]
        for r in textstats.bpe_apply(df, "text", merges).collect()
    }
    want: dict[str, int] = {}
    for _, text in DOCS:
        for w in text.split(" "):
            for t in _apply_py(w, merges):
                want[t] = want.get(t, 0) + 1
    assert got == want
    # spot-check the hand expectation: "low" fully merges (3 from
    # "low" + 2 inside "lower"); "lower" becomes low-er; "newest" has
    # no adjacent e-r, so it stays fully character-split
    assert got["low"] == 5 and got["er"] == 2
    assert "newest" not in got and got["n"] == 1


def test_bpe_token_counts_per_doc(spark):
    """P40 per-doc flavor: n_tokens_bpe == the sequential per-word
    apply summed per document."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text"]).repartition(2)
    merges = [(l, r) for (_, l, r, _, _) in EXPECT]
    got = {
        r["id"]: r["n_tokens_bpe"]
        for r in textstats.bpe_token_counts(df, "doc_id", "text", merges).collect()
    }
    want = {
        i: sum(len(_apply_py(w, merges)) for w in t.split(" "))
        for i, t in DOCS
    }
    assert got == want
    # d0 "low low low" -> 3 fully-merged tokens; d1 "lower lower" ->
    # 2 x (low, er) = 4; d2 "newest" -> 6 chars, no merge fires
    assert got["d0"] == 3 and got["d1"] == 4 and got["d2"] == 6


def test_bpe_apply_learned_end_to_end(spark):
    """Learn on the corpus, apply the learned rules: every original
    character occurrence is conserved across tokens."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rules = sorted(
        textstats.bpe_merges(df, "text", k_rounds=3).collect(),
        key=lambda r: r["round"],
    )
    toks = textstats.bpe_apply(
        df, "text", [(r["left"], r["right"]) for r in rules]
    ).collect()
    n_chars_tok = sum(len(r["token"]) * r["n_occurrences"] for r in toks)
    n_chars_src = sum(len(t.replace(" ", "")) for _, t in DOCS)
    assert n_chars_tok == n_chars_src
