"""Deduplication queries (training-data pipeline ops over `documents`):
exact-key dedup, MinHash signatures, MinHash+LSH near-dup pairs,
SimHash fingerprints + hamming pairs, char-n-gram Jaccard — each
backed by crawlspark.operators.dedup and an exact DuckDB twin that
replays the same md5-60 hashing (crawlspark/portable.py), so even the
LSH candidate sets match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup
from ..portable import md5hash60, md5hash60_sql
from .relational import T

_H = md5hash60_sql

# shared SQL CTEs ----------------------------------------------------------

# (id, shingle) distinct word-bigram shingles, '_'-joined
SH_CTE = """
sh AS (
  SELECT DISTINCT doc_id AS id, (w[i] || '_' || w[i+1]) AS shingle
  FROM (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
       UNNEST(generate_series(1, len(w) - 1)) AS u(i))
"""

# (id, j, minh) minhash signatures, H=8
SIG_CTE = f"""
sig AS (
  SELECT id, j, min({_H("CAST(j AS VARCHAR) || '#' || shingle")}) AS minh
  FROM sh, UNNEST(generate_series(0, 7)) AS t(j)
  GROUP BY id, j)
"""

# (id, fp) 48-bit simhash over bigram-shingle token counts
SIMHASH_CTE = f"""
toks AS (
  SELECT id, tok, count(*) AS cnt
  FROM (
    SELECT doc_id AS id, (w[i] || '_' || w[i+1]) AS tok
    FROM (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
         UNNEST(generate_series(1, len(w) - 1)) AS u(i))
  GROUP BY 1, 2),
contrib AS (
  SELECT id, b, sum(cnt * ((({_H("tok")} >> b) & 1) * 2 - 1)) AS s
  FROM toks, UNNEST(generate_series(0, 47)) AS t(b)
  GROUP BY id, b),
fps AS (
  -- CAST: DuckDB sum(BIGINT) widens to HUGEINT; Spark's sum stays LONG.
  -- The driver's value-hash is representation-sensitive (r1 q53 failed on
  -- hash with identical values), so pin the output type to BIGINT.
  SELECT id, CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS fp
  FROM contrib GROUP BY id)
"""


# --- exact dedup on a normalized key -------------------------------------

def q50_exact_dedup(spark, sf):
    d = T(spark, sf, "documents")
    return dedup.exact_dedup(d, F.substring(F.col("text"), 1, 40), "doc_id").select(
        "doc_id", "dup_key", "keep"
    )


SQL50 = f"""
SELECT doc_id, dup_key,
       (row_number() OVER (PARTITION BY dup_key ORDER BY doc_id) = 1) AS keep
FROM (SELECT doc_id, {_H("substr(text, 1, 40)")} AS dup_key FROM documents)
"""


# --- MinHash signatures ---------------------------------------------------

def _shingles(spark, sf):
    """Memoized (id, shingle) bigram table over documents — the
    substrate q51 (signatures) and the near-dup pair pipeline share."""
    key = ("sh", spark.sparkContext.applicationId, sf)
    if key not in _PAIRS_CACHE:
        _PAIRS_CACHE[key] = dedup.shingle_table(
            T(spark, sf, "documents"), "doc_id", "text", k=2
        ).localCheckpoint(eager=False)
    return _PAIRS_CACHE[key]


def q51_minhash_sig(spark, sf):
    return dedup.minhash_signatures(_shingles(spark, sf), n_hashes=8)


SQL51 = f"""
WITH {SH_CTE}, {SIG_CTE}
SELECT id, j, minh FROM sig
"""


# --- MinHash + LSH near-dup pairs ----------------------------------------

# One near-dup pair graph (k=2, H=8, bands=4, τ=0.5 — the parameter
# set every consumer shares) and one clustering of it serve four
# queries: q52 (the pairs), q56 (keepers), q106 (leakage-safe split),
# q125 (effective tokens). Memoized per (app, sf) with a lazy
# localCheckpoint so the shingle→signature→band→verify pipeline and
# the label-propagation loop each run ONCE per process — the
# share-the-substrate materialization a production dedup stack
# performs anyway. Blocks are freed by the ContextCleaner when the
# cache entry drops.
_PAIRS_CACHE: dict[tuple, object] = {}


def _near_dup_pairs(spark, sf):
    key = ("pairs", spark.sparkContext.applicationId, sf)
    if key not in _PAIRS_CACHE:
        _PAIRS_CACHE[key] = dedup.minhash_near_dups(
            T(spark, sf, "documents"), "doc_id", "text",
            k=2, n_hashes=8, bands=4, threshold=0.5,
            sh=_shingles(spark, sf),
        ).localCheckpoint(eager=False)
    return _PAIRS_CACHE[key]


def _dedup_components(spark, sf):
    from ..operators import graph

    key = ("comp", spark.sparkContext.applicationId, sf)
    if key not in _PAIRS_CACHE:
        _PAIRS_CACHE[key] = graph.connected_components(
            _near_dup_pairs(spark, sf).select("i", "j")
        ).localCheckpoint(eager=False)
    return _PAIRS_CACHE[key]


def q52_near_dup_pairs(spark, sf):
    return _near_dup_pairs(spark, sf)


SQL52 = f"""
WITH {SH_CTE}, {SIG_CTE},
bands AS (
  SELECT id, j // 2 AS band,
         string_agg(CAST(minh AS VARCHAR), '#' ORDER BY j) AS bs
  FROM sig GROUP BY 1, 2),
bh AS (SELECT id, band, {_H("bs")} AS band_hash FROM bands),
cand AS (
  SELECT DISTINCT a.id AS i, b2.id AS j
  FROM bh a JOIN bh b2
    ON a.band = b2.band AND a.band_hash = b2.band_hash AND a.id < b2.id),
inter AS (
  SELECT c.i, c.j, count(*) AS n_inter
  FROM cand c JOIN sh a ON a.id = c.i
              JOIN sh b ON b.id = c.j AND b.shingle = a.shingle
  GROUP BY 1, 2),
sz AS (SELECT id, count(*) AS n FROM sh GROUP BY 1)
SELECT i, j, round(n_inter / (si.n + sj.n - n_inter), 6) AS jac
FROM inter JOIN sz si ON si.id = i JOIN sz sj ON sj.id = j
WHERE n_inter / (si.n + sj.n - n_inter) >= 0.5
"""


# --- incremental dedup: delta vs existing corpus (P28) -------------------

def q70_incremental_dedup(spark, sf):
    """P28: a synthetic 'today's crawl' increment (a deterministic ~30%
    of docs, re-ids'd `new-*`, with 3 words appended — the typical
    re-crawled-page-with-edit) deduped against the full corpus: delta
    docs shingle/minhash/band, probe the corpus band index, exact-
    verify candidates only. Corpus × corpus never joins."""
    d = T(spark, sf, "documents")
    delta = d.filter(F.pmod(md5hash60("doc_id"), F.lit(10)) < 3).select(
        F.concat(F.lit("new-"), F.col("doc_id")).alias("doc_id"),
        F.concat(F.trim(F.col("text")), F.lit(" incremental update pass")).alias("text"),
    )
    corpus = d.select(F.col("doc_id").cast("string").alias("doc_id"), "text")
    return dedup.incremental_near_dups(
        delta, corpus, "doc_id", "text", k=2, n_hashes=8, bands=4, threshold=0.5
    )


SQL70 = f"""
WITH sh AS (
  SELECT DISTINCT CAST(doc_id AS VARCHAR) AS id,
         (w[i] || '_' || w[i+1]) AS shingle
  FROM (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
       UNNEST(generate_series(1, len(w) - 1)) AS u(i)),
sig AS (
  SELECT id, j, min({_H("CAST(j AS VARCHAR) || '#' || shingle")}) AS minh
  FROM sh, UNNEST(generate_series(0, 7)) AS t(j)
  GROUP BY id, j),
bands AS (
  SELECT id, j // 2 AS band,
         string_agg(CAST(minh AS VARCHAR), '#' ORDER BY j) AS bs
  FROM sig GROUP BY 1, 2),
bh AS (SELECT id, band, {_H("bs")} AS band_hash FROM bands),
delta AS (
  SELECT 'new-' || doc_id AS id,
         trim(text) || ' incremental update pass' AS text
  FROM documents WHERE ({_H("doc_id")} % 10) < 3),
dsh AS (
  SELECT DISTINCT id, (w[i] || '_' || w[i+1]) AS shingle
  FROM (SELECT id, string_split(trim(text), ' ') AS w FROM delta),
       UNNEST(generate_series(1, len(w) - 1)) AS u(i)),
dsig AS (
  SELECT id, j, min({_H("CAST(j AS VARCHAR) || '#' || shingle")}) AS minh
  FROM dsh, UNNEST(generate_series(0, 7)) AS t(j)
  GROUP BY id, j),
dbands AS (
  SELECT id, j // 2 AS band,
         string_agg(CAST(minh AS VARCHAR), '#' ORDER BY j) AS bs
  FROM dsig GROUP BY 1, 2),
dbh AS (SELECT id, band, {_H("bs")} AS band_hash FROM dbands),
cand AS (
  SELECT DISTINCT a.id AS i, b2.id AS j
  FROM dbh a JOIN bh b2
    ON a.band = b2.band AND a.band_hash = b2.band_hash),
inter AS (
  SELECT c.i, c.j, count(*) AS n_inter
  FROM cand c JOIN dsh a ON a.id = c.i
              JOIN sh b ON b.id = c.j AND b.shingle = a.shingle
  GROUP BY 1, 2),
dsz AS (SELECT id, count(*) AS n FROM dsh GROUP BY 1),
sz AS (SELECT id, count(*) AS n FROM sh GROUP BY 1)
SELECT i, j, round(n_inter / (si.n + sj.n - n_inter), 6) AS jac
FROM inter JOIN dsz si ON si.id = i JOIN sz sj ON sj.id = j
WHERE n_inter / (si.n + sj.n - n_inter) >= 0.5
"""


# --- SimHash fingerprints + hamming pairs --------------------------------

def q53_simhash(spark, sf):
    return dedup.simhash(T(spark, sf, "documents"), "doc_id", "text", nbits=48, token_k=2)


SQL53 = f"""
WITH {SIMHASH_CTE}
SELECT id, fp FROM fps
"""


def q54_simhash_pairs(spark, sf):
    fps = dedup.simhash(T(spark, sf, "documents"), "doc_id", "text", nbits=48, token_k=2)
    return dedup.simhash_near_dups(fps, nbits=48, bands=8, max_ham=7)


SQL54 = f"""
WITH {SIMHASH_CTE}
SELECT a.id AS i, b.id AS j, bit_count(xor(a.fp, b.fp)) AS ham
FROM fps a JOIN fps b ON a.id < b.id
WHERE bit_count(xor(a.fp, b.fp)) <= 7
"""


# --- char-5-gram Jaccard (brute force on a subset) -----------------------

def q55_chargram_pairs(spark, sf):
    d = T(spark, sf, "documents").filter(F.col("doc_id") < 200)
    grams = dedup.char_ngrams(d, "doc_id", "text", n=5)
    pairs = (
        grams.select(F.col("id").alias("i"))
        .distinct()
        .join(grams.select(F.col("id").alias("j")).distinct(), F.col("i") < F.col("j"))
    )
    return dedup.jaccard_verify(pairs, grams, threshold=0.5)


SQL55 = """
WITH g AS (
  SELECT DISTINCT doc_id AS id, substr(t, i, 5) AS gram
  FROM (SELECT doc_id, trim(text) AS t FROM documents WHERE doc_id < 200),
       UNNEST(generate_series(1, length(t) - 4)) AS u(i)),
inter AS (
  SELECT a.id AS i, b.id AS j, count(*) AS n_inter
  FROM g a JOIN g b ON a.gram = b.gram AND a.id < b.id GROUP BY 1, 2),
sz AS (SELECT id, count(*) AS n FROM g GROUP BY 1)
SELECT i, j, round(n_inter / (si.n + sj.n - n_inter), 6) AS jac
FROM inter JOIN sz si ON si.id = i JOIN sz sj ON sj.id = j
WHERE n_inter / (si.n + sj.n - n_inter) >= 0.5
"""


# --- containment near-dups (asymmetric: short doc inside a long one) -----

def q134_containment_pairs(spark, sf):
    """P49 — n-gram containment near-dups. Jaccard (q52/q55) misses a
    short document pasted inside a much longer one (the union term
    dilutes the score); containment = |A∩B|/min(|A|,|B|) is the
    standard asymmetric complement (Broder's resemblance/containment
    pair). Candidates come from the COMPLETE AllPairs/SSJoin prefix
    filter (MinHash bands are the wrong prefilter for containment —
    see prefix_filter_candidates' docstring), verified exactly over
    the SAME memoized shingle substrate q51/q52/q56 share."""
    sh = _shingles(spark, sf)
    cands = dedup.prefix_filter_candidates(sh, t_num=3, t_den=5)
    return dedup.containment_verify(cands, sh, threshold=0.6)


SQL134 = f"""
WITH {SH_CTE},
dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1),
szr AS (SELECT id, count(*) AS n FROM sh GROUP BY 1),
ranked AS (
  SELECT s.id, s.shingle, z.n,
         row_number() OVER (PARTITION BY s.id ORDER BY d.df, s.shingle) AS r
  FROM sh s JOIN dfreq d ON d.shingle = s.shingle JOIN szr z ON z.id = s.id),
pfx AS (SELECT id, shingle, n FROM ranked WHERE r <= n - ((3*n + 4) // 5) + 1),
cand AS (
  SELECT DISTINCT least(p.id, f.id) AS i, greatest(p.id, f.id) AS j
  FROM pfx p JOIN ranked f ON f.shingle = p.shingle
  WHERE p.n < f.n OR (p.n = f.n AND p.id <> f.id)),
inter AS (
  SELECT c.i, c.j, count(*) AS n_inter
  FROM cand c JOIN sh a ON a.id = c.i
              JOIN sh b ON b.id = c.j AND b.shingle = a.shingle
  GROUP BY 1, 2),
sz AS (SELECT id, count(*) AS n FROM sh GROUP BY 1)
SELECT i, j, round(n_inter / least(si.n, sj.n), 6) AS containment
FROM inter JOIN sz si ON si.id = i JOIN sz sj ON sj.id = j
WHERE n_inter / least(si.n, sj.n) >= 0.6
"""


# --- near-dup clustering + keeper selection (iterative op with a
# --- recursive-CTE oracle) ------------------------------------------------

def q56_dedup_clusters(spark, sf):
    """Full corpus-dedup pipeline: MinHash+LSH pairs → connected
    components (iterative min-label propagation) → one keeper per
    cluster. Oracle replays the clustering with a recursive CTE."""
    from ..operators import graph

    docs = T(spark, sf, "documents")
    ids = docs.select(F.col("doc_id").alias("id"))
    return graph.dedup_keepers(
        None, ids, comp=_dedup_components(spark, sf)
    )


SQL56 = f"""
WITH RECURSIVE {SH_CTE}, {SIG_CTE},
bands AS (
  SELECT id, j // 2 AS band,
         string_agg(CAST(minh AS VARCHAR), '#' ORDER BY j) AS bs
  FROM sig GROUP BY 1, 2),
bh AS (SELECT id, band, {_H("bs")} AS band_hash FROM bands),
cand AS (
  SELECT DISTINCT a.id AS i, b2.id AS j
  FROM bh a JOIN bh b2
    ON a.band = b2.band AND a.band_hash = b2.band_hash AND a.id < b2.id),
inter AS (
  SELECT c.i, c.j, count(*) AS n_inter
  FROM cand c JOIN sh a ON a.id = c.i
              JOIN sh b ON b.id = c.j AND b.shingle = a.shingle
  GROUP BY 1, 2),
sz AS (SELECT id, count(*) AS n FROM sh GROUP BY 1),
pairs AS (
  SELECT i, j FROM inter JOIN sz si ON si.id = i JOIN sz sj ON sj.id = j
  WHERE n_inter / (si.n + sj.n - n_inter) >= 0.5),
e AS (SELECT i AS a, j AS b FROM pairs UNION SELECT j, i FROM pairs),
reach(id, r) AS (
  SELECT a, a FROM e
  UNION
  SELECT e.a, reach.r FROM e JOIN reach ON e.b = reach.id),
comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
keepers AS (SELECT component, min(id) AS keeper FROM comp GROUP BY component)
SELECT d.doc_id AS id,
       (k.keeper IS NULL OR k.keeper = d.doc_id) AS keep
FROM documents d
LEFT JOIN comp c ON c.id = d.doc_id
LEFT JOIN keepers k ON k.component = c.component
"""


def q125_effective_tokens(spark, sf):
    """P42 — dedup-discounted effective corpus size (P17 ∘ P11): the
    number a training-mix planner actually budgets against. Raw token
    counts overstate a corpus with near-duplicates (the duplicated
    tokens add no information); the effective size keeps one document
    per near-dup cluster (q56's keeper rule: min doc_id per connected
    component of the MinHash+LSH pair graph) and counts only keeper
    tokens, reported per source with the duplicated-token fraction.

    Scale shape: the pair graph + clustering is q56's (band join,
    never all-pairs; min-label propagation with early stop); token
    counting is a narrow JVM regexp; the rollup is one partial-agg
    groupBy on source. All sums are LONG (exact, order-insensitive);
    the only float op is one divide per source row, bit-exact across
    engines and partitionings."""
    from ..operators import graph, textstats

    docs = T(spark, sf, "documents")
    keep = graph.dedup_keepers(
        None, docs.select(F.col("doc_id").alias("id")),
        comp=_dedup_components(spark, sf),
    )
    t = docs.select(
        "doc_id", "source",
        textstats.token_count_col(F.col("text")).alias("n_tokens"),
    )
    return (
        t.join(keep, t["doc_id"] == keep["id"]).drop("id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0))
            .cast("long").alias("n_docs_kept"),
            F.sum("n_tokens").cast("long").alias("raw_tokens"),
            F.sum(F.when(F.col("keep"), F.col("n_tokens")).otherwise(0))
            .cast("long").alias("effective_tokens"),
        )
        .withColumn(
            "dup_token_frac",
            F.round(
                F.lit(1.0) - F.col("effective_tokens") / F.col("raw_tokens"), 6
            ),
        )
    )


SQL125 = f"""
WITH RECURSIVE {SH_CTE}, {SIG_CTE},
bands AS (
  SELECT id, j // 2 AS band,
         string_agg(CAST(minh AS VARCHAR), '#' ORDER BY j) AS bs
  FROM sig GROUP BY 1, 2),
bh AS (SELECT id, band, {_H("bs")} AS band_hash FROM bands),
cand AS (
  SELECT DISTINCT a.id AS i, b2.id AS j
  FROM bh a JOIN bh b2
    ON a.band = b2.band AND a.band_hash = b2.band_hash AND a.id < b2.id),
inter AS (
  SELECT c.i, c.j, count(*) AS n_inter
  FROM cand c JOIN sh a ON a.id = c.i
              JOIN sh b ON b.id = c.j AND b.shingle = a.shingle
  GROUP BY 1, 2),
sz AS (SELECT id, count(*) AS n FROM sh GROUP BY 1),
pairs AS (
  SELECT i, j FROM inter JOIN sz si ON si.id = i JOIN sz sj ON sj.id = j
  WHERE n_inter / (si.n + sj.n - n_inter) >= 0.5),
e AS (SELECT i AS a, j AS b FROM pairs UNION SELECT j, i FROM pairs),
reach(id, r) AS (
  SELECT a, a FROM e
  UNION
  SELECT e.a, reach.r FROM e JOIN reach ON e.b = reach.id),
comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
keepers AS (SELECT component, min(id) AS keeper FROM comp GROUP BY component),
kp AS (
  SELECT d.doc_id, d.source,
         len(regexp_extract_all(d.text,
             '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_tokens,
         (k.keeper IS NULL OR k.keeper = d.doc_id) AS keep
  FROM documents d
  LEFT JOIN comp c ON c.id = d.doc_id
  LEFT JOIN keepers k ON k.component = c.component)
SELECT source, count(*) AS n_docs,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
       CAST(sum(n_tokens) AS BIGINT) AS raw_tokens,
       CAST(sum(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT)
         AS effective_tokens,
       round(1.0 - CAST(sum(CASE WHEN keep THEN n_tokens ELSE 0 END)
                        AS DOUBLE)
                 / CAST(sum(n_tokens) AS DOUBLE), 6) AS dup_token_frac
FROM kp GROUP BY source
"""


# --- paragraph/chunk-level dedup (P25) ------------------------------------

def q59_chunk_dedup(spark, sf):
    """Sub-document dedup: 12-word chunks deduped corpus-wide (first
    occurrence wins via a partial-aggregated min, not a window — hot
    boilerplate keys combine map-side), surviving text reassembled per
    doc. Docs reduced to nothing (pure boilerplate) drop out."""
    return dedup.chunk_dedup(
        T(spark, sf, "documents"), "doc_id", "text", chunk_words=12
    )


SQL59 = f"""
WITH w AS (SELECT doc_id AS id, string_split(trim(text), ' ') AS w
           FROM documents),
c AS (
  SELECT id, CAST((s - 1) / 12 AS INTEGER) AS pos,
         array_to_string(list_slice(w, s, s + 11), ' ') AS chunk
  FROM w, UNNEST(range(1, len(w) + 1, 12)) AS u(s)),
k AS (SELECT *, {_H("chunk")} AS k FROM c),
kept AS (
  SELECT id, pos, chunk
  FROM (SELECT *, row_number() OVER (PARTITION BY k ORDER BY id, pos) AS rn
        FROM k)
  WHERE rn = 1)
SELECT id, CAST(count(*) AS BIGINT) AS n_chunks_kept,
       string_agg(chunk, ' ' ORDER BY pos) AS text_dedup
FROM kept GROUP BY id
"""


# --- leakage-safe corpus split (P35) --------------------------------------

def q106_leakage_safe_split(spark, sf):
    """P35: train/val assignment by near-dup CLUSTER, not by document —
    the data-leakage rule every eval pipeline needs: if a doc's
    near-duplicate lands in val while the doc trains, the benchmark is
    contaminated from inside the corpus. Group = connected component
    of the MinHash+LSH near-dup graph (q52/q56 machinery; singletons
    group as themselves); split = md5(group_id) mod 1000 < 100 → val
    (10% holdout) — deterministic and partitioning-invariant, so a
    resumed 100 TB job re-draws the identical split, and BY
    CONSTRUCTION no near-dup pair straddles it."""
    docs = T(spark, sf, "documents")
    comp = _dedup_components(spark, sf)
    d = docs.select(F.col("doc_id").alias("id")).join(comp, "id", "left")
    return d.select(
        "id",
        F.coalesce("component", F.col("id")).alias("group_id"),
    ).withColumn(
        "split",
        F.when(
            md5hash60(F.col("group_id").cast("string")) % 1000 < 100, "val"
        ).otherwise("train"),
    )


SQL106 = f"""
WITH RECURSIVE {SH_CTE}, {SIG_CTE},
bands AS (
  SELECT id, j // 2 AS band,
         string_agg(CAST(minh AS VARCHAR), '#' ORDER BY j) AS bs
  FROM sig GROUP BY 1, 2),
bh AS (SELECT id, band, {_H("bs")} AS band_hash FROM bands),
cand AS (
  SELECT DISTINCT a.id AS i, b2.id AS j
  FROM bh a JOIN bh b2
    ON a.band = b2.band AND a.band_hash = b2.band_hash AND a.id < b2.id),
inter AS (
  SELECT c.i, c.j, count(*) AS n_inter
  FROM cand c JOIN sh a ON a.id = c.i
              JOIN sh b ON b.id = c.j AND b.shingle = a.shingle
  GROUP BY 1, 2),
sz AS (SELECT id, count(*) AS n FROM sh GROUP BY 1),
pairs AS (
  SELECT i, j FROM inter JOIN sz si ON si.id = i JOIN sz sj ON sj.id = j
  WHERE n_inter / (si.n + sj.n - n_inter) >= 0.5),
e AS (SELECT i AS a, j AS b FROM pairs UNION SELECT j, i FROM pairs),
reach(id, r) AS (
  SELECT a, a FROM e
  UNION
  SELECT e.a, reach.r FROM e JOIN reach ON e.b = reach.id),
comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
sel AS (
  SELECT d.doc_id AS id, coalesce(c.component, d.doc_id) AS group_id
  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id)
SELECT id, group_id,
       CASE WHEN {_H("CAST(group_id AS VARCHAR)")} % 1000 < 100
            THEN 'val' ELSE 'train' END AS split
FROM sel
"""


# --- exact-substring span dedup (P37) -------------------------------------

def q113_span_dedup(spark, sf):
    """ExactSubstr-style dedup: every 8-token window seen anywhere
    earlier in the corpus (global (id, pos) order) is removed from its
    later occurrences by covered token position; overlapping flagged
    windows merge into maximal removed spans. Unlike q59's fixed
    chunks, the stride-1 windows catch duplication at any alignment."""
    return dedup.span_dedup(T(spark, sf, "documents"), "doc_id", "text", k=8)


SQL113 = f"""
WITH toks AS (
  SELECT doc_id AS id, string_split(trim(text), ' ') AS w FROM documents),
win AS (
  SELECT id, i AS pos,
         {_H("array_to_string(list_slice(w, i, i + 7), '_')")} AS wkey
  FROM toks, UNNEST(generate_series(1, len(w) - 7)) AS u(i)),
flagged AS (
  SELECT id, pos FROM (
    SELECT id, pos,
           row_number() OVER (PARTITION BY wkey ORDER BY id, pos) AS rn
    FROM win) WHERE rn > 1),
covered AS (
  SELECT DISTINCT id, pos + g AS cpos
  FROM flagged, UNNEST(generate_series(0, 7)) AS t(g)),
pos AS (
  SELECT t.id, i, w[i] AS tok
  FROM toks t, UNNEST(generate_series(1, len(w))) AS u(i)),
kept AS (
  SELECT p.id, p.i, p.tok FROM pos p
  ANTI JOIN covered c ON p.id = c.id AND p.i = c.cpos),
agg AS (
  SELECT id, count(*) AS n_kept,
         string_agg(tok, ' ' ORDER BY i) AS text_dedup
  FROM kept GROUP BY id)
SELECT t.id, len(t.w) AS n_tokens,
       CAST(len(t.w) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed,
       coalesce(a.text_dedup, '') AS text_dedup
FROM toks t LEFT JOIN agg a ON t.id = a.id
"""


QUERIES = {
    "q50_exact_dedup": q50_exact_dedup,
    "q59_chunk_dedup": q59_chunk_dedup,
    "q51_minhash_sig": q51_minhash_sig,
    "q52_near_dup_pairs": q52_near_dup_pairs,
    "q53_simhash": q53_simhash,
    "q54_simhash_pairs": q54_simhash_pairs,
    "q55_chargram_pairs": q55_chargram_pairs,
    "q134_containment_pairs": q134_containment_pairs,
    "q56_dedup_clusters": q56_dedup_clusters,
    "q70_incremental_dedup": q70_incremental_dedup,
    "q106_leakage_safe_split": q106_leakage_safe_split,
    "q113_span_dedup": q113_span_dedup,
    "q125_effective_tokens": q125_effective_tokens,
}

ORACLE = {
    "q50_exact_dedup": SQL50,
    "q59_chunk_dedup": SQL59,
    "q51_minhash_sig": SQL51,
    "q52_near_dup_pairs": SQL52,
    "q53_simhash": SQL53,
    "q54_simhash_pairs": SQL54,
    "q55_chargram_pairs": SQL55,
    "q134_containment_pairs": SQL134,
    "q56_dedup_clusters": SQL56,
    "q70_incremental_dedup": SQL70,
    "q106_leakage_safe_split": SQL106,
    "q113_span_dedup": SQL113,
    "q125_effective_tokens": SQL125,
}
