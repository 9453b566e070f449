"""R32 sort-clustered layout: non-overlapping per-file min/max on the
cluster column, file-level skipping for selective predicates, and
exact data preservation through the re-layout."""

from __future__ import annotations

import glob
import tempfile

from pyspark.sql import functions as F

from crawlspark.operators import bucketing

SF = "/root/testdata/sf0.001"


def _minmax(files):
    import pyarrow.parquet as pq

    out = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        col = None
        for i in range(len(md.schema)):
            if md.schema.column(i).name == "doc_id":
                col = i
                break
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col).statistics
            mins.append(st.min)
            maxs.append(st.max)
        if mins:
            out.append((min(mins), max(maxs)))
    return sorted(out)


def test_clustered_layout_prunes(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = tempfile.mkdtemp(prefix="crawlspark-layout-") + "/c"
    bucketing.clustered_write(docs, out, "doc_id", n_files=8)
    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert len(files) >= 4  # range partitioner may merge tiny tails
    ranges = _minmax(files)
    # non-overlapping, totally ordered file ranges — the stats-skipping
    # substrate
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2
    # a selective point-range predicate intersects exactly one file
    lo, hi = ranges[2][0], min(ranges[2][0] + 3, ranges[2][1])
    touched = [r for r in ranges if not (r[1] < lo or r[0] > hi)]
    assert len(touched) == 1
    # data preserved exactly through the re-layout
    a = sorted(map(tuple, docs.select("doc_id", "n_chars").collect()))
    b = sorted(
        map(tuple, spark.read.parquet(out).select("doc_id", "n_chars").collect())
    )
    assert a == b
    # the predicate reaches the scan (PushedFilters), so the min/max
    # skipping actually engages
    plan = (
        spark.read.parquet(out)
        .filter((F.col("doc_id") >= lo) & (F.col("doc_id") <= hi))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [IsNotNull(doc_id), GreaterThanOrEqual(doc_id" in plan


def test_orc_pushdown_and_pruning(spark):
    """R33: the ORC scan honors predicate pushdown and column pruning
    exactly like parquet — the filter reaches the data source and the
    read schema excludes unused columns."""
    import tempfile

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = tempfile.mkdtemp(prefix="crawlspark-orc-") + "/o"
    docs.write.mode("overwrite").orc(out)
    df = (
        spark.read.orc(out)
        .filter(F.col("lang") == "en")
        .select("doc_id", "n_chars")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
    assert "text" not in plan.split("ReadSchema:")[1].splitlines()[0]
    # roundtrip exactness
    a = sorted(map(tuple, docs.select("doc_id", "n_chars", "lang").collect()))
    b = sorted(
        map(tuple, spark.read.orc(out).select("doc_id", "n_chars", "lang").collect())
    )
    assert a == b
