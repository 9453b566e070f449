"""Similarity-search queries over `embeddings`: brute-force cosine
top-k and hyperplane-LSH ANN — backed by
crawlspark.operators.similarity.

Float parity: Spark's F.aggregate folds left-to-right in double
starting from 0.0; DuckDB's list_reduce folds left-to-right starting
from the first element. (0.0 + x1) == x1 exactly, so both engines
produce bit-identical dot products and cosines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import similarity
from ..portable import md5hash60_sql
from .relational import T

_H = md5hash60_sql

DOT = (
    "list_reduce(list_transform(list_zip({a}, {b}),"
    " x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (acc, v) -> acc + v)"
)


def _dot(a: str, b: str) -> str:
    return DOT.format(a=a, b=b)


def q60_cosine_topk(spark, sf):
    e = T(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    corpus = e.filter(F.col("vec_id") >= 10)
    return similarity.brute_topk(q, corpus, k=3)


SQL60 = f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
n AS (SELECT vec_id AS n_id, embedding AS nv FROM embeddings WHERE vec_id >= 10),
scored AS (
  SELECT q_id, n_id,
         {_dot('qv', 'nv')} / (sqrt({_dot('qv', 'qv')}) * sqrt({_dot('nv', 'nv')})) AS c
  FROM n CROSS JOIN q),
r AS (
  SELECT q_id, n_id, c,
         row_number() OVER (PARTITION BY q_id ORDER BY c DESC, n_id ASC) AS rnk
  FROM scored)
SELECT q_id, n_id, rnk, round(c, 6) AS cos FROM r WHERE rnk <= 3
"""


def q61_ann_lsh(spark, sf):
    e = T(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    corpus = e.filter(F.col("vec_id") >= 10)
    return similarity.ann_topk(q, corpus, spark, k=3, n_planes=6, seed=7, dim=64)


SQL61 = f"""
WITH planes AS (
  SELECT p, d, ({_H("CAST(7 AS VARCHAR) || '_' || CAST(p AS VARCHAR) || '_' || CAST(d AS VARCHAR)")} % 2001 - 1000) / 1000.0 AS coef
  FROM UNNEST(generate_series(0, 5)) AS tp(p),
       UNNEST(generate_series(0, 63)) AS td(d)),
comp AS (
  SELECT vec_id AS id, i - 1 AS d, embedding[i] AS x
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)),
proj AS (
  SELECT id, p, sum(CAST(x AS DOUBLE) * coef) AS proj
  FROM comp JOIN planes USING (d) GROUP BY id, p),
buckets AS (
  SELECT id, sum(CASE WHEN proj > 0 THEN (CAST(1 AS BIGINT) << p) ELSE CAST(0 AS BIGINT) END) AS bucket
  FROM proj GROUP BY id),
q AS (
  SELECT e.vec_id AS q_id, e.embedding AS qv, b.bucket
  FROM embeddings e JOIN buckets b ON b.id = e.vec_id WHERE e.vec_id < 10),
n AS (
  SELECT e.vec_id AS n_id, e.embedding AS nv, b.bucket
  FROM embeddings e JOIN buckets b ON b.id = e.vec_id WHERE e.vec_id >= 10),
cand AS (SELECT q_id, qv, n_id, nv FROM q JOIN n USING (bucket) WHERE q_id != n_id),
scored AS (
  SELECT q_id, n_id,
         {_dot('qv', 'nv')} / (sqrt({_dot('qv', 'qv')}) * sqrt({_dot('nv', 'nv')})) AS c
  FROM cand),
r AS (
  SELECT q_id, n_id, c,
         row_number() OVER (PARTITION BY q_id ORDER BY c DESC, n_id ASC) AS rnk
  FROM scored)
SELECT q_id, n_id, rnk, round(c, 6) AS cos FROM r WHERE rnk <= 3
"""


def q62_ann_multiprobe(spark, sf):
    e = T(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    corpus = e.filter(F.col("vec_id") >= 10)
    return similarity.ann_topk(
        q, corpus, spark, k=3, n_planes=6, seed=7, dim=64, multiprobe=True
    )


_PROBES = ", ".join(
    f"xor(bucket, CAST({1 << p} AS BIGINT))" for p in range(6)
)

SQL62 = f"""
WITH planes AS (
  SELECT p, d, ({_H("CAST(7 AS VARCHAR) || '_' || CAST(p AS VARCHAR) || '_' || CAST(d AS VARCHAR)")} % 2001 - 1000) / 1000.0 AS coef
  FROM UNNEST(generate_series(0, 5)) AS tp(p),
       UNNEST(generate_series(0, 63)) AS td(d)),
comp AS (
  SELECT vec_id AS id, i - 1 AS d, embedding[i] AS x
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)),
proj AS (
  SELECT id, p, sum(CAST(x AS DOUBLE) * coef) AS proj
  FROM comp JOIN planes USING (d) GROUP BY id, p),
buckets AS (
  SELECT id, sum(CASE WHEN proj > 0 THEN (CAST(1 AS BIGINT) << p) ELSE CAST(0 AS BIGINT) END) AS bucket
  FROM proj GROUP BY id),
qb AS (
  SELECT e.vec_id AS q_id, b.bucket
  FROM embeddings e JOIN buckets b ON b.id = e.vec_id WHERE e.vec_id < 10),
qp AS (
  SELECT q_id, unnest([bucket, {_PROBES}]) AS bucket FROM qb),
nb AS (
  SELECT e.vec_id AS n_id, b.bucket
  FROM embeddings e JOIN buckets b ON b.id = e.vec_id WHERE e.vec_id >= 10),
cand AS (
  SELECT DISTINCT qp.q_id, nb.n_id FROM qp JOIN nb USING (bucket)
  WHERE qp.q_id != nb.n_id),
scored AS (
  SELECT c.q_id, c.n_id,
         {_dot('eq.embedding', 'en.embedding')}
         / (sqrt({_dot('eq.embedding', 'eq.embedding')}) * sqrt({_dot('en.embedding', 'en.embedding')})) AS c
  FROM cand c
  JOIN embeddings eq ON eq.vec_id = c.q_id
  JOIN embeddings en ON en.vec_id = c.n_id),
r AS (
  SELECT q_id, n_id, c,
         row_number() OVER (PARTITION BY q_id ORDER BY c DESC, n_id ASC) AS rnk
  FROM scored)
SELECT q_id, n_id, rnk, round(c, 6) AS cos FROM r WHERE rnk <= 3
"""


def q63_ann_banded(spark, sf):
    """Band-OR amplified LSH ANN (L=6 tables × r=3 planes): the
    production recall lever — measured recall@3 = 0.87 vs brute force
    on this testdata (q62 multi-probe: 0.30); curve + sizing rule in
    BENCH/ANN_RECALL.md."""
    e = T(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    corpus = e.filter(F.col("vec_id") >= 10)
    return similarity.ann_topk_banded(
        q, corpus, spark, k=3, n_tables=6, planes_per_table=3, seed=7, dim=64
    )


SQL63 = f"""
WITH planes AS (
  SELECT p, d, ({_H("CAST(7 AS VARCHAR) || '_' || CAST(p AS VARCHAR) || '_' || CAST(d AS VARCHAR)")} % 2001 - 1000) / 1000.0 AS coef
  FROM UNNEST(generate_series(0, 17)) AS tp(p),
       UNNEST(generate_series(0, 63)) AS td(d)),
comp AS (
  SELECT vec_id AS id, i - 1 AS d, embedding[i] AS x
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)),
proj AS (
  SELECT id, p, sum(CAST(x AS DOUBLE) * coef) AS proj
  FROM comp JOIN planes USING (d) GROUP BY id, p),
buckets AS (
  SELECT id, p // 3 AS t,
         CAST(sum(CASE WHEN proj > 0 THEN (CAST(1 AS BIGINT) << (p % 3)) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bucket
  FROM proj GROUP BY id, p // 3),
q AS (
  SELECT e.vec_id AS q_id, b.t, b.bucket
  FROM embeddings e JOIN buckets b ON b.id = e.vec_id WHERE e.vec_id < 10),
n AS (
  SELECT e.vec_id AS n_id, b.t, b.bucket
  FROM embeddings e JOIN buckets b ON b.id = e.vec_id WHERE e.vec_id >= 10),
cand AS (
  SELECT DISTINCT q.q_id, n.n_id FROM q JOIN n USING (t, bucket)
  WHERE q.q_id != n.n_id),
scored AS (
  SELECT c.q_id, c.n_id,
         {_dot('eq.embedding', 'en.embedding')}
         / (sqrt({_dot('eq.embedding', 'eq.embedding')}) * sqrt({_dot('en.embedding', 'en.embedding')})) AS c
  FROM cand c
  JOIN embeddings eq ON eq.vec_id = c.q_id
  JOIN embeddings en ON en.vec_id = c.n_id),
r AS (
  SELECT q_id, n_id, c,
         row_number() OVER (PARTITION BY q_id ORDER BY c DESC, n_id ASC) AS rnk
  FROM scored)
SELECT q_id, n_id, rnk, round(c, 6) AS cos FROM r WHERE rnk <= 3
"""


def q64_ann_ivf(spark, sf):
    """IVF coarse-quantizer ANN (16 cells, 4-probe, exact re-rank in
    probed cells) — the inverted-file scale path beside the LSH family.
    n_probe=4 is the smallest config whose probed-cell capture of the
    genuinely-similar vectors (the q57 planted near-dup pairs) reaches
    ≥ 0.9 — measured 0.93 at 25% probed fraction, 1.00 at n_probe=6;
    the full n_probe curve for both that metric and isotropic global
    recall is in BENCH/ANN_RECALL.md. The quantizer is trained
    Spark-side but bit-exactly replayable (md5-seeded cells,
    sequential id-ordered centroid folds), so the oracle hash-compares
    the full output."""
    e = T(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    corpus = e.filter(F.col("vec_id") >= 10)
    return similarity.ann_topk_ivf(
        q, corpus, spark, k=3, n_cells=16, n_probe=4, sample_per_cell=24, dim=64
    )


_CENT_COS = (
    "list_reduce(list_transform(list_zip({a}, {b}),"
    " x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (acc, v) -> acc + v)"
    " / (sqrt(list_reduce(list_transform(list_zip({a}, {a}),"
    " x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (acc, v) -> acc + v))"
    " * sqrt(list_reduce(list_transform(list_zip({b}, {b}),"
    " x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (acc, v) -> acc + v)))"
)

def _MEANS(src: str, out: str) -> str:
    """CTE chunk: bounded id-ordered sample mean per cell of `src`
    (columns id, v, cell) — the DuckDB twin of similarity._cell_means
    (sequential fold, bit-exact vs F.aggregate)."""
    return f"""
samp_{out} AS (
  SELECT cell, id, v, row_number() OVER (PARTITION BY cell ORDER BY id) AS rn
  FROM {src}),
cellvs_{out} AS (
  SELECT cell, list(v ORDER BY id) AS vs, count(*) AS cnt
  FROM samp_{out} WHERE rn <= 24 GROUP BY cell),
{out} AS (
  SELECT cell,
         list_transform(
           list_reduce(vs, (acc, x) -> list_transform(list_zip(acc, x), z -> z[1] + z[2])),
           s -> s / cnt) AS centroid
  FROM cellvs_{out})"""


SQL64 = f"""
WITH corpus AS (
  SELECT vec_id AS id,
         list_transform(embedding, e -> CAST(e AS DOUBLE)) AS v,
         CAST(({_H("'ivf_' || CAST(vec_id AS VARCHAR)")} % 16) AS INT) AS cell
  FROM embeddings WHERE vec_id >= 10),
{_MEANS('corpus', 'cent0')},
rescore AS (
  SELECT b.id, b.v, c.cell,
         row_number() OVER (
           PARTITION BY b.id
           ORDER BY ({_CENT_COS.format(a='b.v', b='c.centroid')}) DESC, c.cell ASC
         ) AS crnk
  FROM corpus b CROSS JOIN cent0 c),
reassigned AS (SELECT id, v, cell FROM rescore WHERE crnk = 1),
{_MEANS('reassigned', 'cent')},
nscore AS (
  SELECT b.id AS n_id, b.v AS nv, c.cell,
         row_number() OVER (
           PARTITION BY b.id
           ORDER BY ({_CENT_COS.format(a='b.v', b='c.centroid')}) DESC, c.cell ASC
         ) AS crnk
  FROM corpus b CROSS JOIN cent c),
nassign AS (SELECT n_id, nv, cell FROM nscore WHERE crnk = 1),
qbase AS (
  SELECT vec_id AS q_id, list_transform(embedding, e -> CAST(e AS DOUBLE)) AS qv
  FROM embeddings WHERE vec_id < 10),
qscore AS (
  SELECT q.q_id, q.qv, c.cell,
         row_number() OVER (
           PARTITION BY q.q_id
           ORDER BY ({_CENT_COS.format(a='q.qv', b='c.centroid')}) DESC, c.cell ASC
         ) AS crnk
  FROM qbase q CROSS JOIN cent c),
qassign AS (SELECT q_id, qv, cell FROM qscore WHERE crnk <= 4),
cand AS (
  SELECT DISTINCT q.q_id, q.qv, n.n_id, n.nv
  FROM qassign q JOIN nassign n USING (cell) WHERE q.q_id != n.n_id),
scored AS (
  SELECT q_id, n_id, {_dot('qv', 'nv')}
         / (sqrt({_dot('qv', 'qv')}) * sqrt({_dot('nv', 'nv')})) AS c
  FROM cand),
r AS (
  SELECT q_id, n_id, c,
         row_number() OVER (PARTITION BY q_id ORDER BY c DESC, n_id ASC) AS rnk
  FROM scored)
SELECT q_id, n_id, rnk, round(c, 6) AS cos FROM r WHERE rnk <= 3
"""


def q57_embed_near_dups(spark, sf):
    """Embedding-cosine near-dup pairs over the whole embeddings table
    (banded-LSH candidates, exact cos ≥ 0.42 verify — τ calibrated to
    this corpus's cosine geometry: 34 brute-force pairs exist at 0.42;
    the oracle replays the identical bucketing)."""
    return similarity.embedding_near_dups(
        T(spark, sf, "embeddings"), spark, threshold=0.42,
        n_tables=6, planes_per_table=3, seed=7, dim=64,
    )


SQL57 = f"""
WITH planes AS (
  SELECT p, d, ({_H("CAST(7 AS VARCHAR) || '_' || CAST(p AS VARCHAR) || '_' || CAST(d AS VARCHAR)")} % 2001 - 1000) / 1000.0 AS coef
  FROM UNNEST(generate_series(0, 17)) AS tp(p),
       UNNEST(generate_series(0, 63)) AS td(d)),
comp AS (
  SELECT vec_id AS id, i - 1 AS d, embedding[i] AS x
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)),
proj AS (
  SELECT id, p, sum(CAST(x AS DOUBLE) * coef) AS proj
  FROM comp JOIN planes USING (d) GROUP BY id, p),
buckets AS (
  SELECT id, p // 3 AS t,
         CAST(sum(CASE WHEN proj > 0 THEN (CAST(1 AS BIGINT) << (p % 3)) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bucket
  FROM proj GROUP BY id, p // 3),
cand AS (
  SELECT DISTINCT a.id AS i, b.id AS j
  FROM buckets a JOIN buckets b ON a.t = b.t AND a.bucket = b.bucket AND a.id < b.id),
scored AS (
  SELECT c.i, c.j,
         {_dot('ei.embedding', 'ej.embedding')}
         / (sqrt({_dot('ei.embedding', 'ei.embedding')}) * sqrt({_dot('ej.embedding', 'ej.embedding')})) AS c
  FROM cand c
  JOIN embeddings ei ON ei.vec_id = c.i
  JOIN embeddings ej ON ej.vec_id = c.j)
SELECT i, j, round(c, 6) AS cos FROM scored WHERE c >= 0.42
"""


# --- int8 scalar-quantized top-k with exact re-rank (P34) ----------------

def q105_quantized_topk(spark, sf):
    """P34: SQ8 similarity — rank the corpus per query by cosine over
    symmetric per-vector int8 quantizations (exact integer dot
    products over 4×-smaller vectors: the bandwidth-bound pass at
    100 TB), keep k·4 candidates, exact-re-rank only those. Oracle
    replays the identical quantize/rank/re-rank pipeline (the
    q61–q64 replayed-bucketing discipline)."""
    e = T(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    corpus = e.filter(F.col("vec_id") >= 10)
    return similarity.quantized_topk(q, corpus, k=3, expand=4)


_Q8 = (
    "list_transform({v}, x -> CAST(round(CAST(x AS DOUBLE) * 127.0 /"
    " greatest(list_max(list_transform({v}, y -> abs(CAST(y AS DOUBLE)))),"
    " 1e-30)) AS BIGINT))"
)

_DOT8 = (
    "list_reduce(list_transform(list_zip({a}, {b}),"
    " x -> x[1] * x[2]), (acc, v) -> acc + v)"
)


def _dot8(a: str, b: str) -> str:
    return _DOT8.format(a=a, b=b)


SQL105 = f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
n AS (SELECT vec_id AS n_id, embedding AS nv FROM embeddings WHERE vec_id >= 10),
q8t AS (SELECT q_id, qv, {_Q8.format(v='qv')} AS q8 FROM q),
n8t AS (SELECT n_id, nv, {_Q8.format(v='nv')} AS n8 FROM n),
scored AS (
  SELECT q_id, n_id, qv, nv,
         {_dot8('q8', 'n8')}
         / (sqrt(CAST({_dot8('q8', 'q8')} AS DOUBLE))
            * sqrt(CAST({_dot8('n8', 'n8')} AS DOUBLE))) AS c8
  FROM n8t CROSS JOIN q8t),
cand AS (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY c8 DESC, n_id ASC) AS r8
  FROM scored),
rr AS (
  SELECT q_id, n_id, c8,
         {_dot('qv', 'nv')} / (sqrt({_dot('qv', 'qv')}) * sqrt({_dot('nv', 'nv')})) AS c
  FROM cand WHERE r8 <= 12),
r AS (
  SELECT q_id, n_id, c, c8,
         row_number() OVER (PARTITION BY q_id ORDER BY c DESC, n_id ASC) AS rnk
  FROM rr)
SELECT q_id, n_id, rnk, round(c, 6) AS cos, round(c8, 6) AS cos8
FROM r WHERE rnk <= 3
"""


# --- embedding-space semantic dedup (P54) ---------------------------------

def q139_semantic_dedup(spark, sf):
    """P54 SemDeDup (operators/similarity.semantic_dedup): IVF-cell
    clustering of the WHOLE embeddings table, then within-cell
    duplicate suppression at cos >= 0.42 (the q57-calibrated
    threshold) keeping each duplicate group's minimum id. Pairs form
    only inside a cell — never all-pairs — and the quantizer training
    replays bit-exactly in the oracle (the q64 discipline), so
    (vec_id, cell, keep) hash-compares including the float verify."""
    return similarity.semantic_dedup(
        T(spark, sf, "embeddings"), n_cells=16, tau=0.42,
        sample_per_cell=24, dim=64,
    )


SQL139 = f"""
WITH corpus AS (
  SELECT vec_id AS id,
         list_transform(embedding, e -> CAST(e AS DOUBLE)) AS v,
         CAST(({_H("'ivf_' || CAST(vec_id AS VARCHAR)")} % 16) AS INT) AS cell
  FROM embeddings),
{_MEANS('corpus', 'cent0')},
rescore AS (
  SELECT b.id, b.v, c.cell,
         row_number() OVER (
           PARTITION BY b.id
           ORDER BY ({_CENT_COS.format(a='b.v', b='c.centroid')}) DESC, c.cell ASC
         ) AS crnk
  FROM corpus b CROSS JOIN cent0 c),
reassigned AS (SELECT id, v, cell FROM rescore WHERE crnk = 1),
{_MEANS('reassigned', 'cent')},
ascore AS (
  SELECT b.id, b.v, c.cell,
         row_number() OVER (
           PARTITION BY b.id
           ORDER BY ({_CENT_COS.format(a='b.v', b='c.centroid')}) DESC, c.cell ASC
         ) AS crnk
  FROM corpus b CROSS JOIN cent c),
assigned AS (SELECT id, v, cell FROM ascore WHERE crnk = 1),
dup AS (
  SELECT DISTINCT a.id
  FROM assigned a JOIN assigned b ON a.cell = b.cell AND b.id < a.id
  WHERE ({_dot('a.v', 'b.v')}
         / (sqrt({_dot('a.v', 'a.v')}) * sqrt({_dot('b.v', 'b.v')}))) >= 0.42)
SELECT a.id AS vec_id, a.cell, (d.id IS NULL) AS keep
FROM assigned a LEFT JOIN dup d ON a.id = d.id
"""


QUERIES = {
    "q57_embed_near_dups": q57_embed_near_dups,
    "q60_cosine_topk": q60_cosine_topk,
    "q61_ann_lsh": q61_ann_lsh,
    "q62_ann_multiprobe": q62_ann_multiprobe,
    "q63_ann_banded": q63_ann_banded,
    "q64_ann_ivf": q64_ann_ivf,
    "q105_quantized_topk": q105_quantized_topk,
    "q139_semantic_dedup": q139_semantic_dedup,
}

ORACLE = {
    "q57_embed_near_dups": SQL57,
    "q60_cosine_topk": SQL60,
    "q61_ann_lsh": SQL61,
    "q62_ann_multiprobe": SQL62,
    "q63_ann_banded": SQL63,
    "q64_ann_ivf": SQL64,
    "q105_quantized_topk": SQL105,
    "q139_semantic_dedup": SQL139,
}
