"""Iterative graph operators over the crawl's link structure:
PageRank (host/page authority for crawl prioritization) and
connected components (near-dup pair clustering for dedup keeper
selection).

Both are driver-controlled fixed-point loops over DataFrame joins —
the idiomatic Spark shape for iteration (each step is a fully
optimized join+agg plan; the loop itself is tiny driver logic).
Scale notes:
- every iteration shuffles on the join key; `iterations` is O(10) for
  PageRank and O(log n) for components (label propagation halves the
  diameter each round via min-label spread);
- intermediate results are checkpoint-persisted each round and the
  previous round unpersisted, so lineage stays O(1) deep instead of
  O(iterations) (the classic iterative-Spark pitfall).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,  # (src, dst)
    damping: float = 0.85,
    iterations: int = 10,
) -> DataFrame:
    """(id, rank): standard damped PageRank; dangling mass is
    redistributed uniformly so total rank stays n (matching the
    textbook formulation a single-node reference would compute)."""
    edges = edges.persist()
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    out_deg = edges.groupBy("src").agg(F.count("*").alias("deg")).persist()
    out_deg.count()
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for _ in range(iterations):
        contribs = (
            edges.join(ranks, edges["src"] == ranks["id"])
            .join(out_deg, "src")
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        # dangling mass as a broadcast 1-row aggregate folded into the
        # same job as the rank update — no per-iteration driver collect
        dangling = ranks.join(
            out_deg, ranks["id"] == out_deg["src"], "left_anti"
        ).agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dangling"))
        # localCheckpoint (eager) both materializes the round and
        # TRUNCATES the logical plan — `ranks` is referenced twice per
        # round (contribs + dangling), so without truncation the plan
        # would double every iteration; persist alone cuts execution
        # lineage but not the analyzed-plan tree.
        ranks = (
            nodes.join(contribs, "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    (F.lit(1.0 - damping) + F.lit(damping) * F.col("_dangling") / n)
                    + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    out = ranks.select("id", F.round("rank", 6).alias("rank"))
    for df in (nodes, out_deg, edges):
        df.unpersist()
    return out


def weighted_pagerank(
    edges: DataFrame,  # (src, dst, weight) — one row per edge
    damping: float = 0.85,
    iterations: int = 10,
) -> DataFrame:
    """(id, rank): PageRank over WEIGHTED edges — each round a node
    splits its damped rank across outlinks proportionally to edge
    weight (anchor-term mass, link prominence, …) instead of
    uniformly; dangling = zero-out-weight nodes, redistributed
    uniformly, folded in as a broadcast 1-row aggregate like the
    unweighted twin above. Per-edge float shape is
    (rank * weight) / wdeg — the oracle twin
    (queries/crawl_oracle._weighted_pagerank) evaluates the identical
    expression. Same scale posture as pagerank: per-iteration
    localCheckpoint truncation, no per-iteration driver collect."""
    edges = edges.select(
        "src", "dst", F.col("weight").cast("double").alias("weight")
    ).persist()
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("wdeg")).persist()
    out_w.count()
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for _ in range(iterations):
        contribs = (
            edges.join(ranks, edges["src"] == ranks["id"])
            .join(out_w, "src")
            .select(
                F.col("dst").alias("id"),
                ((F.col("rank") * F.col("weight")) / F.col("wdeg")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        dangling = ranks.join(
            out_w, ranks["id"] == out_w["src"], "left_anti"
        ).agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dangling"))
        ranks = (
            nodes.join(contribs, "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    (F.lit(1.0 - damping) + F.lit(damping) * F.col("_dangling") / n)
                    + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    out = ranks.select("id", F.round("rank", 6).alias("rank"))
    for df in (nodes, out_w, edges):
        df.unpersist()
    return out


def hits(edges: DataFrame, iterations: int = 6) -> DataFrame:
    """(id, hub, auth): Kleinberg's HITS over directed edges —
    mutual reinforcement between hub pages (link out to good
    authorities: directory/index pages a crawler should fan out from)
    and authority pages (linked from good hubs: the pages worth
    fetch-priority), the classic complement to PageRank for
    crawl-frontier scoring.

    Each round: auth = Eᵀ·hub, then hub = E·auth (with the NEW auth —
    the textbook update order). Scores stay UN-normalized through the
    loop with a single L1 normalization at the end: the updates are
    linear, so scaling commutes and the result equals per-round
    normalization exactly while halving the float ops and
    cross-engine divergence surface (values stay well inside double
    range — growth is bounded by (max degree)² per round and
    `iterations` is O(6)). Same scale posture as pagerank: one join +
    partial-agg per half-round shuffling on the edge key only,
    per-round localCheckpoint truncation (hubs feeds two plans next
    round), no per-iteration driver collect; the final norm is a
    broadcast 1-row aggregate."""
    edges = edges.persist()
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    nodes.count()
    hubs = nodes.withColumn("hub", F.lit(1.0))
    auths = nodes.withColumn("auth", F.lit(1.0))
    for _ in range(iterations):
        a_in = (
            edges.join(hubs, edges["src"] == hubs["id"])
            .groupBy("dst")
            .agg(F.sum("hub").alias("a"))
        )
        auths = (
            nodes.join(a_in, nodes["id"] == a_in["dst"], "left")
            .select("id", F.coalesce("a", F.lit(0.0)).alias("auth"))
            .localCheckpoint(eager=True)
        )
        h_in = (
            edges.join(auths, edges["dst"] == auths["id"])
            .groupBy("src")
            .agg(F.sum("auth").alias("h"))
        )
        hubs = (
            nodes.join(h_in, nodes["id"] == h_in["src"], "left")
            .select("id", F.coalesce("h", F.lit(0.0)).alias("hub"))
            .localCheckpoint(eager=True)
        )
    joined = hubs.join(auths, "id")
    norms = joined.agg(
        F.sum("hub").alias("_sh"), F.sum("auth").alias("_sa")
    )
    out = (
        joined.crossJoin(F.broadcast(norms))
        .select(
            "id",
            F.round(F.col("hub") / F.col("_sh"), 6).alias("hub"),
            F.round(F.col("auth") / F.col("_sa"), 6).alias("auth"),
        )
    )
    for df in (nodes, edges):
        df.unpersist()
    return out


def bfs_distances(
    edges: DataFrame,  # (src, dst)
    seeds: DataFrame,  # (id)
    max_iterations: int = 20,
) -> DataFrame:
    """(id, dist): min-hop distance from the seed set over directed
    edges — frontier-based BFS as dataflow, the crawl-QA metric that
    audits discovery depth against TRUE link distance (a page first
    discovered at depth 5 but linkable in 2 hops signals frontier
    starvation; distance-from-seed is also a standard quality feature
    for crawl selection).

    Frontier-based, not whole-graph relaxation: each round joins the
    edges against ONLY the nodes settled last round and anti-joins the
    already-settled set away, so total work is O(E) across ALL rounds
    combined — min-label propagation (connected_components' shape)
    would rescan every edge every round. Distances are integers, so
    the result is exactly partitioning/retry-invariant (no float
    parity surface at all). One bounded driver action per round (the
    frontier count, doubling as the early-stop test), rounds ≤ graph
    diameter; per-round localCheckpoint keeps the settled set's plan
    O(1) deep."""
    edges = edges.persist()
    settled = (
        seeds.select("id")
        .distinct()
        .withColumn("dist", F.lit(0).cast("int"))
        .localCheckpoint(eager=True)
    )
    frontier = settled
    for k in range(1, max_iterations + 1):
        nxt = (
            edges.join(frontier, edges["src"] == frontier["id"])
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(settled, "id", "left_anti")
            .withColumn("dist", F.lit(k).cast("int"))
            .localCheckpoint(eager=True)
        )
        if nxt.count() == 0:
            break
        settled = settled.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    edges.unpersist()
    return settled


def connected_components(pairs: DataFrame, max_iterations: int = 20) -> DataFrame:
    """(id, component): min-label propagation over undirected edges —
    e.g. cluster near-dup pairs so exact-dedup can pick one keeper per
    cluster. Converges in O(diameter) rounds; stops early when no
    label changes."""
    edges = (
        pairs.select(F.col("i").alias("a"), F.col("j").alias("b"))
        .unionByName(pairs.select(F.col("j").alias("a"), F.col("i").alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .persist()
    )
    labels.count()
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges["b"] == labels["id"])
            .groupBy("a")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["a"], "left")
            .select(
                "id",
                F.least(F.col("component"), F.coalesce("nbr_min", F.col("component"))).alias(
                    "component"
                ),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels


def dedup_keepers(
    pairs: DataFrame, all_ids: DataFrame, comp: DataFrame | None = None
) -> DataFrame:
    """(id, keep): one keeper (min id) per near-dup cluster; ids with
    no near-dup pair keep themselves. The last stage of the dedup
    pipeline: minhash_near_dups → connected_components → keepers.
    Pass a precomputed ``comp`` (id, component) to reuse one clustering
    across consumers instead of re-iterating per caller."""
    if comp is None:
        comp = connected_components(pairs)
    keepers = comp.groupBy("component").agg(F.min("id").alias("keeper"))
    with_comp = all_ids.join(comp, "id", "left")
    return with_comp.join(keepers, "component", "left").select(
        "id",
        (F.col("keeper").isNull() | (F.col("keeper") == F.col("id"))).alias("keep"),
    )
