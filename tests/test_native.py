"""JVM-native Bloom probe (native/src/BloomProbe.scala): bit-parity
with the numpy probe, no false negatives, and graceful fallback when
the jar is absent."""

from __future__ import annotations

import numpy as np
import pytest

from crawlspark.operators import seen
from crawlspark.schemas import BLOOM_SEEN


def _bloom_over(spark, hashes, nparts):
    parts = (hashes % nparts + nparts) % nparts
    new = spark.createDataFrame(
        [(int(p), int(h)) for p, h in zip(parts, hashes)], "part int, url_hash long"
    )
    bloom = seen.fold_bloom(
        new, spark.createDataFrame([], BLOOM_SEEN), cycle_id=1
    ).persist()
    bloom.count()
    return bloom, parts


def test_native_probe_matches_python(spark):
    if not seen._native_loaded(spark):
        pytest.skip("native jar not on classpath")
    rng = np.random.default_rng(7)
    members = rng.integers(-2**63, 2**63 - 1, size=8000, dtype=np.int64)
    bloom, _ = _bloom_over(spark, members, nparts=4)
    probes = np.concatenate(
        [members[:3000], rng.integers(-2**63, 2**63 - 1, size=3000, dtype=np.int64)]
    )
    pparts = (probes % 4 + 4) % 4
    cand = spark.createDataFrame(
        [(int(p), int(h)) for p, h in zip(pparts, probes)], "part int, url_hash long"
    )
    nat = {
        (r["part"], r["url_hash"]): r["maybe_seen"]
        for r in seen.bloom_prefilter_native(cand, bloom).collect()
    }
    py = {
        (r["part"], r["url_hash"]): r["maybe_seen"]
        for r in seen.bloom_prefilter_broadcast(cand, bloom).collect()
    }
    assert nat == py
    # exactness contract: a Bloom may only over-approximate
    assert all(
        nat[(int(p), int(h))] for p, h in zip(pparts[:3000], probes[:3000])
    ), "false negative on a true member"
    seen.release_broadcasts(spark)
    bloom.unpersist()


def test_seen_filter_native_equals_python_paths(spark):
    """The full C4 seen_filter returns the same survivor set through
    the native, Python-broadcast, and cogroup probe strategies."""
    rng = np.random.default_rng(11)
    members = rng.integers(-2**63, 2**63 - 1, size=5000, dtype=np.int64)
    bloom, _ = _bloom_over(spark, members, nparts=4)
    url_seen = spark.createDataFrame(
        [
            (int(h), f"http://h/p{i}", 0, int((h % 4 + 4) % 4))
            for i, h in enumerate(members)
        ],
        "url_hash long, url_norm string, first_cycle long, part int",
    )
    probes = np.concatenate(
        [members[:2000], rng.integers(-2**63, 2**63 - 1, size=2000, dtype=np.int64)]
    )
    cand = spark.createDataFrame(
        [
            (int(h), f"http://h/p{i}" if i < 2000 else f"http://x/q{i}",
             int((h % 4 + 4) % 4))
            for i, h in enumerate(probes)
        ],
        "url_hash long, url_norm string, part int",
    )
    outs = []
    for bb in (True, False):
        out = seen.seen_filter(cand, url_seen, bloom, broadcast_bloom=bb)
        outs.append(sorted((r["url_hash"], r["url_norm"]) for r in out.collect()))
    assert outs[0] == outs[1]
    assert len(outs[0]) == 2000  # exactly the never-seen half survives
    seen.release_broadcasts(spark)
    bloom.unpersist()


def test_committed_jar_matches_source(tmp_path):
    """Reproducible-build gate: recompile native/src with the bundled
    Scala compiler and require every .class entry in the committed jar
    to be byte-identical to the fresh build (and vice versa) — the
    committed binary can never drift from the reviewed source."""
    import hashlib
    import os
    import subprocess
    import zipfile
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    jars_dir = os.environ.get("SPARK_JARS_DIR", "/opt/spark-4.1.2-bin-hadoop3/jars")
    if not (Path(jars_dir) / "scala-compiler-2.13.17.jar").exists():
        pytest.skip("bundled Scala compiler not found")

    fresh = tmp_path / "fresh.jar"
    subprocess.run(
        ["bash", str(repo / "tools" / "build_native.sh")],
        check=True, env={**os.environ, "OUT_JAR": str(fresh)},
        capture_output=True,
    )

    def class_digests(p):
        with zipfile.ZipFile(p) as z:
            return {
                n: hashlib.md5(z.read(n)).hexdigest()
                for n in z.namelist()
                if n.endswith(".class")
            }

    committed = class_digests(repo / "crawlspark" / "jars" / "crawlspark-native.jar")
    rebuilt = class_digests(fresh)
    assert committed, "committed jar has no class entries?"
    assert committed == rebuilt


def test_native_fold_matches_python(spark, monkeypatch):
    """C5 fold bit-parity: the JVM UDAF fold (partial-agg, no Python
    stage) must produce byte-identical bitsets to the numpy cogroup
    fold, both from empty and when ORing into an existing sidecar."""
    if not seen._native_loaded(spark):
        pytest.skip("native jar not on classpath")
    rng = np.random.default_rng(11)

    def hashes_df(n, seed_off):
        h = rng.integers(-2**63, 2**63 - 1, size=n, dtype=np.int64)
        p = (h % 4 + 4) % 4
        return spark.createDataFrame(
            [(int(a), int(b)) for a, b in zip(p, h)], "part int, url_hash long"
        )

    empty = spark.createDataFrame([], BLOOM_SEEN)
    first, second = hashes_df(5000, 0), hashes_df(3000, 1)

    def bits_of(df):
        return {r["part"]: bytes(r["bits"]) for r in df.collect()}

    nat1 = seen.fold_bloom_native(first, empty, cycle_id=1, nbits=seen.NBITS_DEFAULT, k=seen.K_DEFAULT)
    assert nat1 is not None
    # no Python/Arrow stage anywhere in the native fold plan (C5 goal)
    plan = nat1._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapCoGroupsInPandas"):
        assert marker not in plan
    nat1 = nat1.persist()
    monkeypatch.setenv("CRAWLSPARK_NO_NATIVE", "1")
    py1 = seen.fold_bloom(first, empty, cycle_id=1).persist()
    monkeypatch.delenv("CRAWLSPARK_NO_NATIVE")
    assert bits_of(nat1) == bits_of(py1)

    # second cycle: OR into the existing sidecar, cross-checked both ways
    nat2 = seen.fold_bloom_native(second, py1, cycle_id=2, nbits=seen.NBITS_DEFAULT, k=seen.K_DEFAULT)
    monkeypatch.setenv("CRAWLSPARK_NO_NATIVE", "1")
    py2 = seen.fold_bloom(second, nat1, cycle_id=2)
    monkeypatch.delenv("CRAWLSPARK_NO_NATIVE")
    assert bits_of(nat2) == bits_of(py2)
    nat1.unpersist(); py1.unpersist()
