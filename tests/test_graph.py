"""Iterative graph operators vs pure-Python references: PageRank vs
numpy power iteration, connected components vs union-find, and the
dedup keeper pipeline on the planted near-dups."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from crawlspark.operators import dedup, graph


def _edges(spark):
    # deterministic small digraph with a dangling node and a cycle
    e = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"), ("e", "d"), ("e", "a"), ("f", "a"),
        # g dangling (no out-edges), reachable from c? no: add c->g
        ("c", "g"),
    ]
    return spark.createDataFrame(e, "src string, dst string"), e


def test_pagerank_matches_power_iteration(spark):
    edges_df, e = _edges(spark)
    got = {r["id"]: r["rank"] for r in graph.pagerank(edges_df, 0.85, 12).collect()}

    nodes = sorted({x for p in e for x in p})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = {i: [] for i in range(n)}
    for s, d in e:
        out[idx[s]].append(idx[d])
    r = np.ones(n)
    for _ in range(12):
        inflow = np.zeros(n)
        dangling = 0.0
        for i in range(n):
            if out[i]:
                for j in out[i]:
                    inflow[j] += r[i] / len(out[i])
            else:
                dangling += r[i]
        r = (1 - 0.85) + 0.85 * (inflow + dangling / n)
    want = {nodes[i]: round(float(r[i]), 6) for i in range(n)}
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6, (k, got[k], want[k])


def test_hits_matches_reference(spark):
    edges_df, e = _edges(spark)
    got = {
        r["id"]: (r["hub"], r["auth"]) for r in graph.hits(edges_df, 6).collect()
    }

    nodes = sorted({x for p in e for x in p})
    hub = {u: 1.0 for u in nodes}
    auth = {u: 1.0 for u in nodes}
    for _ in range(6):
        auth = {u: 0.0 for u in nodes}
        for s, d in e:
            auth[d] += hub[s]
        hub = {u: 0.0 for u in nodes}
        for s, d in e:
            hub[s] += auth[d]
    sh, sa = sum(hub.values()), sum(auth.values())
    assert set(got) == set(nodes)
    for u in nodes:
        assert abs(got[u][0] - hub[u] / sh) < 1e-6, (u, got[u])
        assert abs(got[u][1] - auth[u] / sa) < 1e-6, (u, got[u])
    # sanity: a (many out-links to the cycle) hubs high; c/a authorities
    assert got["e"][0] > got["g"][0]  # e links out, g is a sink
    assert got["c"][1] > got["e"][1]  # c is heavily linked-to, e never


def test_bfs_distances_match_reference(spark):
    edges_df, e = _edges(spark)
    seeds = spark.createDataFrame([("e",), ("f",)], "id string")
    got = {r["id"]: r["dist"] for r in graph.bfs_distances(edges_df, seeds).collect()}

    # level-synchronous BFS twin
    adj = {}
    for s, d in sorted(set(e)):
        adj.setdefault(s, []).append(d)
    dist = {"e": 0, "f": 0}
    frontier = ["e", "f"]
    k = 0
    while frontier:
        k += 1
        nxt = []
        for u in frontier:
            for v in adj.get(u, []):
                if v not in dist:
                    dist[v] = k
                    nxt.append(v)
        frontier = sorted(set(nxt))
    assert got == dist
    # spot-check the hand-derivable facts: a/d one hop, g via c at 3
    assert got["a"] == 1 and got["d"] == 1 and got["g"] == 3


def test_connected_components_matches_union_find(spark):
    pairs = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (3, 4), (40, 41)]
    pdf = spark.createDataFrame(pairs, "i long, j long")
    got = {r["id"]: r["component"] for r in graph.connected_components(pdf).collect()}

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, j in pairs:
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)
    want = {x: find(x) for x in parent}
    assert got == want


def test_dedup_keepers_on_planted_dups(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    pairs = dedup.minhash_near_dups(docs, "doc_id", "text", threshold=0.5)
    ids = docs.select(F.col("doc_id").alias("id"))
    keep = graph.dedup_keepers(pairs.select("i", "j"), ids).persist()
    n_total = keep.count()
    n_keep = keep.filter("keep").count()
    n_pairs = pairs.count()
    assert n_total == docs.count()
    # every cluster drops at least one doc; planted 25 pairs form ≥1 cluster
    assert n_keep < n_total
    assert n_total - n_keep <= n_pairs
    # keepers are minimal ids within their cluster: no kept doc is the
    # larger element of any near-dup pair whose smaller element exists
    dropped = {r["id"] for r in keep.filter(~F.col("keep")).collect()}
    for r in pairs.collect():
        assert r["j"] in dropped or r["i"] in dropped
    keep.unpersist()


def test_multiprobe_improves_recall(spark):
    from pyspark.sql import functions as F

    from crawlspark.operators import similarity

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 30)
    corpus = e.filter(F.col("vec_id") >= 30)
    truth = {
        (r["q_id"], r["n_id"])
        for r in similarity.brute_topk(q, corpus, k=3).collect()
    }
    single = {
        (r["q_id"], r["n_id"])
        for r in similarity.ann_topk(q, corpus, spark, k=3).collect()
    }
    multi = {
        (r["q_id"], r["n_id"])
        for r in similarity.ann_topk(q, corpus, spark, k=3, multiprobe=True).collect()
    }
    r_single = len(single & truth) / len(truth)
    r_multi = len(multi & truth) / len(truth)
    # random (unclustered) embeddings bound achievable LSH recall; the
    # invariant is that probing 1-bit neighbors strictly helps
    assert r_multi > r_single, (r_single, r_multi)
    assert r_multi >= 0.25, (r_single, r_multi)
