"""P45 source caps + P46 stride chunking: pinned edge cases for the
chunk-boundary arithmetic and the quality-ranked cap rule."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlspark.operators import textstats


def _mk(spark, n_words_list):
    rows = [(i, " ".join(f"w{i}t{t}" for t in range(n))) for i, n in enumerate(n_words_list)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stride_chunk_boundaries(spark):
    # window=8, stride=6: n=8 -> 1 chunk; n=9 -> 2; n=14 -> 2; n=15 -> 3
    df = _mk(spark, [1, 8, 9, 14, 15, 20])
    got = {
        (r["id"], r["chunk_idx"]): (r["tok_start"], r["n_chunk_tokens"])
        for r in textstats.stride_chunks(df, "doc_id", "text", 8, 6).collect()
    }
    per_doc = {}
    for (i, m), v in got.items():
        per_doc.setdefault(i, []).append((m, v))
    assert len(per_doc[0]) == 1 and got[(0, 0)] == (1, 1)
    assert len(per_doc[1]) == 1 and got[(1, 0)] == (1, 8)
    assert len(per_doc[2]) == 2 and got[(2, 1)] == (7, 3)
    assert len(per_doc[3]) == 2 and got[(3, 1)] == (7, 8)
    assert len(per_doc[4]) == 3 and got[(4, 2)] == (13, 3)
    # every token index is covered by at least one chunk
    for i, n in [(4, 15), (5, 20)]:
        covered = set()
        for _m, (s, ln) in per_doc[i]:
            covered |= set(range(s, s + ln))
        assert covered == set(range(1, n + 1))


def test_stride_chunk_sigs_match_slice_hash(spark):
    from crawlspark.portable import md5hash60

    df = _mk(spark, [10])
    out = textstats.stride_chunks(df, "doc_id", "text", 8, 6)
    want = (
        df.select(
            F.lit(0).alias("chunk_idx"),
            md5hash60(
                F.array_join(F.slice(F.split(F.trim("text"), " "), 1, 8), "_")
            ).alias("sig"),
        ).collect()[0]["sig"]
    )
    got = {r["chunk_idx"]: r["chunk_sig"] for r in out.collect()}
    assert got[0] == want


def test_source_cap_rule(spark):
    from crawlspark.queries.textq import q128_source_cap

    out = q128_source_cap(spark, "/root/testdata/sf0.001").collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    import math

    for src, rows in by_src.items():
        n = len(rows)
        cap = math.ceil(0.6 * n)
        kept = [r for r in rows if r["kept"]]
        assert len(kept) == cap, (src, n, cap, len(kept))
        # kept docs are exactly the top-cap by (quality desc, doc_id)
        order = sorted(rows, key=lambda r: (-r["quality"], r["doc_id"]))
        assert {r["doc_id"] for r in kept} == {r["doc_id"] for r in order[:cap]}
