"""Portable deterministic primitives — identical results in Spark SQL
and ANSI/DuckDB SQL.

The driver's correctness gate runs every query twice (Spark DataFrame
vs DuckDB SQL) and hash-compares values, so any hashing the operators
rely on (minhash, simhash, LSH hyperplanes, fingerprints) must be
computable bit-identically in both engines. ``xxhash64`` is Spark-only,
so the portable hash is 60 bits of md5 over the same input string:

    Spark : conv(substr(md5(s), 1, 15), 16, 10)::long
    DuckDB: ('0x' || substr(md5(s), 1, 15))::bigint

md5 here is a *deterministic mixer*, not a security primitive. The
crawl engine's hot path keeps using ``F.xxhash64`` (JVM, faster);
portable md5-hash is for the oracle-checked dedup/similarity surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5hash60(col: Column | str) -> Column:
    """60-bit non-negative hash, reproducible in DuckDB (see module doc)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")


def md5hash60_sql(expr: str) -> str:
    """The DuckDB-side twin of :func:`md5hash60`."""
    return f"(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 15))::BIGINT)"


def words(col: Column | str) -> Column:
    """Whitespace tokens of trimmed text. DuckDB twin:
    ``string_split(trim(text), ' ')`` (testdata is single-spaced)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), " ")


def shingles(words_col: Column, k: int, sep: str = "_") -> Column:
    """k-word shingles in document order; empty array when the doc has
    fewer than k words. DuckDB twin::

        SELECT (w[i] || '_' || w[i+1] ...) FROM t,
               UNNEST(generate_series(1, len(w)-k+1)) AS u(i)
    """
    n = F.size(words_col)
    mk = F.transform(
        F.sequence(F.lit(1), n - F.lit(k - 1)),
        lambda i: F.concat_ws(
            sep, *[F.element_at(words_col, i + F.lit(j)) for j in range(k)]
        ),
    )
    return F.when(n >= F.lit(k), mk).otherwise(F.array().cast("array<string>"))
