"""P54 SemDeDup, P55 DSIR importance selection, P56 HTML extraction,
P57 line-level filtering: semantic invariants and partitioning
invariance for the round-4e corpus-selection operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlspark.operators import similarity, textstats

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


# --- P54 SemDeDup ----------------------------------------------------------

def test_semantic_dedup_keep_rule(spark):
    emb = _emb(spark)
    out = similarity.semantic_dedup(emb, n_cells=8, tau=0.42, dim=64)
    rows = out.collect()
    assert len(rows) == emb.count()  # one verdict per vector
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    # per cell, the minimum id always survives
    for cell, members in by_cell.items():
        lo = min(m["vec_id"] for m in members)
        assert next(m for m in members if m["vec_id"] == lo)["keep"]
    # every dropped vector really has a smaller-id in-cell neighbor
    # with cos >= tau (recompute brute-force per cell)
    vecs = {r["vec_id"]: r["embedding"] for r in emb.collect()}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(y * y for y in b) ** 0.5
        return num / (na * nb)

    for cell, members in by_cell.items():
        ids = sorted(m["vec_id"] for m in members)
        dropped = {m["vec_id"] for m in members if not m["keep"]}
        for v in members:
            has_dup = any(
                j < v["vec_id"] and cos(vecs[j], vecs[v["vec_id"]]) >= 0.42
                for j in ids
            )
            assert has_dup == (v["vec_id"] in dropped)


def test_semantic_dedup_partitioning_invariant(spark):
    emb = _emb(spark)
    a = similarity.semantic_dedup(emb, n_cells=8, tau=0.42, dim=64)
    b = similarity.semantic_dedup(emb.repartition(7), n_cells=8, tau=0.42, dim=64)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# --- P55 DSIR --------------------------------------------------------------

def test_dsir_keep_matches_score_and_targets_rank_higher(spark):
    d = _docs(spark)
    out = textstats.dsir_weights(
        d, "doc_id", "text", F.col("source") == "src0", dims=128
    )
    rows = out.join(
        d.select(F.col("doc_id").alias("id"), "source"), "id"
    ).collect()
    for r in rows:
        # keep is the exact-integer version of score > 1
        assert r["keep"] == (r["dsir_score"] > 1.0) or abs(r["dsir_score"] - 1.0) < 1e-6
    tgt = [r["dsir_score"] for r in rows if r["source"] == "src0"]
    rest = [r["dsir_score"] for r in rows if r["source"] != "src0"]
    assert tgt and rest
    # the target domain must look more target-like on average
    assert sum(tgt) / len(tgt) > sum(rest) / len(rest)


def test_dsir_partitioning_invariant(spark):
    d = _docs(spark)
    pred = F.col("source") == "src0"
    a = textstats.dsir_weights(d, "doc_id", "text", pred, dims=64)
    b = textstats.dsir_weights(d.repartition(5), "doc_id", "text", pred, dims=64)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# --- P56/P57 HTML extraction + line filter ---------------------------------

def test_html_to_text_adversarial(spark):
    cases = [
        # script content must vanish; entities decode; tags strip
        ('<p>a b &amp; c</p><script>alert("x")</script>', "a b & c"),
        # block closers become line breaks; empties drop
        ("<h1>t1</h1><p></p><p>body text here</p>", "t1\nbody text here"),
        # br variants
        ("x<br>y<br/>z<br />w", "x\ny\nz\nw"),
        # internal runs of spaces collapse, edges trim
        ("<div>  a   b  </div>", "a b"),
        ("&lt;tag&gt; &quot;q&quot; &#39;s&#39;", "<tag> \"q\" 's'"),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "i long, h string"
    )
    got = {
        r["i"]: r["t"]
        for r in df.select("i", textstats.html_to_text(F.col("h")).alias("t")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_line_filter_recovers_main_text(spark):
    page = (
        "src0 & co\nHome | About & Contact\nsrc0 doc 1\n"
        "the quick brown fox jumps over the dog\n(c) 2026 src0"
    )
    df = spark.createDataFrame([(1, page)], "doc_id long, t string")
    out = textstats.line_quality_filter(df, "doc_id", "t", min_words=5).collect()[0]
    assert out["main_text"] == "the quick brown fox jumps over the dog"
    assert out["n_lines"] == 5 and out["n_kept"] == 1


# --- P58 Gopher rule bundle --------------------------------------------------

def test_gopher_rules_attribution(spark):
    """Each rule verified against a sequential recomputation on texts
    chosen to fire different subsets (degenerate repeats, stuffed
    bigrams, overlong words)."""
    cases = [
        "word " * 30,                                   # short, degenerate
        " ".join(f"w{i} the" for i in range(60)),       # stuffed bigrams
        " ".join(f"uniqueword{i:04d} the of" for i in range(40)),
    ]
    df = spark.createDataFrame(
        [(i, t.strip()) for i, t in enumerate(cases)], "doc_id long, text string"
    )
    from crawlspark.operators.textstats import gopher_rules

    got = {r["id"]: r.asDict() for r in gopher_rules(df, "doc_id", "text").collect()}
    for i, t in enumerate(cases):
        t = t.strip()
        w = t.split(" ")
        nw = len(w)
        chars = len(t) - (nw - 1)
        stops = sum(1 for x in w if x in {"the", "a", "of", "and", "to", "in", "is"})
        g2 = [f"{w[k]}_{w[k+1]}" for k in range(nw - 1)]
        top2 = max((g2.count(x) for x in set(g2)), default=0)
        r = got[i]
        assert r["r_too_few_words"] == (nw < 50), (i, nw)
        assert r["r_word_len"] == (chars < nw * 3 or chars > nw * 10)
        assert r["r_stop_ratio"] == (stops * 50 < nw)
        assert r["r_dup_bigrams"] == ((len(g2) - len(set(g2))) * 10 > len(g2) * 3)
        assert r["r_top_bigram"] == (top2 * 100 > len(g2) * 18)
        fired = [k for k in r if k.startswith("r_") and r[k]]
        assert r["keep"] == (not fired)
        mask = sum(
            1 << b for b, name in enumerate(
                ["r_too_few_words", "r_too_many_words", "r_word_len",
                 "r_stop_ratio", "r_dup_bigrams", "r_top_bigram"]
            ) if r[name]
        )
        assert r["rule_mask"] == mask
