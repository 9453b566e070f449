"""P49 containment near-dups and P50 deterministic epoch shuffle:
prefix-filter completeness vs brute force on a planted-containment
corpus, containment arithmetic, window-vs-distributed rank-path
equality, and the per-epoch permutation/decorrelation properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlspark.operators import dedup
from crawlspark.operators.textstats import epoch_shuffle


def _docs(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base),                                  # full doc
        (2, "alpha beta gamma delta epsilon"),       # strict prefix of 1
        (3, "zeta eta theta iota kappa"),            # strict suffix of 1
        (4, "one two three four five six seven"),    # unrelated
        (5, "two three four five"),                  # contained in 4
        (6, base + " lambda mu nu xi"),              # 1 contained in 6
        (7, "solo words only here nothing shared"),  # isolated
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _brute_pairs(rows, t):
    def sh(text):
        w = text.split()
        return {f"{a}_{b}" for a, b in zip(w, w[1:])}

    out = set()
    for i, (ia, ta) in enumerate(rows):
        for ib, tb in rows[i + 1:]:
            a, b = sh(ta), sh(tb)
            if not a or not b:
                continue
            c = len(a & b) / min(len(a), len(b))
            if c >= t:
                out.add((min(ia, ib), max(ia, ib)))
    return out


def test_prefix_filter_complete_and_verify_exact(spark):
    d = _docs(spark)
    sh = dedup.shingle_table(d, "doc_id", "text", k=2)
    cands = dedup.prefix_filter_candidates(sh, t_num=3, t_den=5)
    got = dedup.containment_verify(cands, sh, threshold=0.6)
    got_pairs = {(r["i"], r["j"]) for r in got.collect()}

    rows = [(r["doc_id"], r["text"]) for r in d.collect()]
    want = _brute_pairs(rows, 0.6)
    assert got_pairs == want
    # the planted containments all surface
    assert (1, 2) in got_pairs and (1, 3) in got_pairs
    assert (4, 5) in got_pairs and (1, 6) in got_pairs
    # strict-prefix doc has containment exactly 1.0
    vals = {(r["i"], r["j"]): r["containment"] for r in got.collect()}
    assert vals[(1, 2)] == 1.0


def test_prefix_filter_prunes_something(spark):
    d = _docs(spark)
    sh = dedup.shingle_table(d, "doc_id", "text", k=2)
    n_docs = d.count()
    all_pairs = n_docs * (n_docs - 1) // 2
    n_cand = dedup.prefix_filter_candidates(sh, t_num=3, t_den=5).count()
    assert n_cand < all_pairs  # doc 7 shares nothing → never a candidate


def test_positional_filter_subset_and_result_invariant(spark):
    # ppjoin positional filter: candidates shrink (never grow) vs the
    # plain AllPairs prefix filter, and the exact-verified result is
    # identical — pruned rows all have overlap < α.
    d = _docs(spark)
    sh = dedup.shingle_table(d, "doc_id", "text", k=2)
    plain = dedup.prefix_filter_candidates(sh, 3, 5, positional=False)
    pos = dedup.prefix_filter_candidates(sh, 3, 5, positional=True)
    plain_set = {(r["i"], r["j"]) for r in plain.collect()}
    pos_set = {(r["i"], r["j"]) for r in pos.collect()}
    assert pos_set <= plain_set
    got_plain = {
        tuple(r) for r in dedup.containment_verify(plain, sh, 0.6).collect()
    }
    got_pos = {
        tuple(r) for r in dedup.containment_verify(pos, sh, 0.6).collect()
    }
    assert got_plain == got_pos


def test_epoch_shuffle_paths_agree(spark):
    d = _docs(spark)
    a = epoch_shuffle(d, "doc_id", n_epochs=3, distributed=False)
    b = epoch_shuffle(d, "doc_id", n_epochs=3, distributed=True)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb


def test_epoch_shuffle_permutation_and_decorrelation(spark):
    d = _docs(spark)
    n = d.count()
    out = epoch_shuffle(d, "doc_id", n_epochs=3).collect()
    by_epoch = {}
    for r in out:
        by_epoch.setdefault(r["epoch"], {})[r["pos"]] = r["doc_id"]
    assert set(by_epoch) == {0, 1, 2}
    orders = []
    for e in sorted(by_epoch):
        perm = by_epoch[e]
        # positions are exactly 0..n-1 and every doc appears once
        assert sorted(perm) == list(range(n))
        assert sorted(perm.values()) == sorted(r["doc_id"] for r in d.collect())
        orders.append(tuple(perm[p] for p in range(n)))
    # epochs are decorrelated: no two epoch orders identical
    assert len(set(orders)) == 3


def test_epoch_shuffle_partitioning_invariant(spark):
    d = _docs(spark)
    a = sorted(map(tuple, epoch_shuffle(d, "doc_id", 2).collect()))
    b = sorted(map(tuple, epoch_shuffle(d.repartition(7), "doc_id", 2).collect()))
    assert a == b
