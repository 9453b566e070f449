"""Anchor-text substrate (P43/P44): the anchored page rendering must
not perturb link extraction (the bit-identical-crawl claim behind
UNIT_ANCHOR), and weighted PageRank must match a numpy weighted power
iteration on a hand-built graph."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from crawlspark.operators import graph
from crawlspark.synth import (
    UNIT,
    UNIT_ANCHOR,
    extract_anchors_from_text,
    extract_links_from_text,
)


def test_anchored_pages_extract_identical_links():
    """For every regular page of the anchored graph, the shared href
    extraction returns the same URL list as the unanchored twin, and
    the anchor extraction's URL projection equals it — so crawl
    ordering/seen set cannot differ between UNIT and UNIT_ANCHOR."""
    n_pages = 0
    for i in range(UNIT_ANCHOR.n_sites):
        for j in range(UNIT_ANCHOR.pages_in_site(i)):
            plain = " ".join(
                s["text"] for s in UNIT.page_spans(i, j) if s["kind"] == "text"
            )
            anchored = " ".join(
                s["text"]
                for s in UNIT_ANCHOR.page_spans(i, j)
                if s["kind"] == "text"
            )
            want = extract_links_from_text(plain)
            assert extract_links_from_text(anchored) == want
            pairs = extract_anchors_from_text(anchored)
            assert [u for u, _a in pairs] == want
            # every anchor is 1-3 non-empty terms from the anc vocab
            for _u, a in pairs:
                toks = a.split(" ")
                assert 1 <= len(toks) <= 3
                assert all(t.startswith("anc") for t in toks)
            n_pages += 1
    assert n_pages > 50


@given(st.integers(0, 4), st.integers(0, 39))
@settings(max_examples=40, deadline=None)
def test_anchor_text_deterministic(i, j):
    if j >= UNIT_ANCHOR.pages_in_site(i):
        return
    a1 = UNIT_ANCHOR.page_spans(i, j)
    a2 = UNIT_ANCHOR.page_spans(i, j)
    assert a1 == a2


def test_weighted_pagerank_matches_power_iteration(spark):
    e = [
        ("a", "b", 3), ("a", "c", 1), ("b", "c", 2), ("c", "a", 5),
        ("d", "c", 1), ("e", "d", 4), ("e", "a", 1), ("f", "a", 2),
        ("c", "g", 1),  # g dangling
    ]
    edges_df = spark.createDataFrame(e, "src string, dst string, weight long")
    got = {
        r["id"]: r["rank"]
        for r in graph.weighted_pagerank(edges_df, 0.85, 12).collect()
    }

    nodes = sorted({x for s, d, _w in e for x in (s, d)})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out: dict[int, list[tuple[int, float]]] = {i: [] for i in range(n)}
    for s, d, w in e:
        out[idx[s]].append((idx[d], float(w)))
    r = np.ones(n)
    for _ in range(12):
        inflow = np.zeros(n)
        dangling = 0.0
        for i in range(n):
            if out[i]:
                wdeg = sum(w for _j, w in out[i])
                for j, w in out[i]:
                    inflow[j] += r[i] * w / wdeg
            else:
                dangling += r[i]
        r = (1 - 0.85) + 0.85 * (inflow + dangling / n)
    want = {nodes[i]: round(float(r[i]), 6) for i in range(n)}
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6, (k, got[k], want[k])


def test_uniform_weights_reduce_to_pagerank(spark):
    """weight=1 everywhere must reproduce the unweighted operator
    bit-for-bit (same float shape after round-6)."""
    e = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "b")]
    df = spark.createDataFrame(e, "src string, dst string")
    plain = {r["id"]: r["rank"] for r in graph.pagerank(df, 0.85, 8).collect()}
    from pyspark.sql import functions as F

    w = {
        r["id"]: r["rank"]
        for r in graph.weighted_pagerank(
            df.withColumn("weight", F.lit(1)), 0.85, 8
        ).collect()
    }
    assert plain == w
