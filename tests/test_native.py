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
