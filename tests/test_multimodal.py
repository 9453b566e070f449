"""Multimodal pipeline tests: schema/partitioning/batch plumbing of the
binary-column path (decode itself is a documented stub)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from crawlspark import multimodal as M
from crawlspark.engine import CrawlEngine, EngineConfig
from crawlspark.synth import UNIT


def _docs(spark):
    eng = CrawlEngine(spark, EngineConfig(graph=UNIT, warehouse=tempfile.mkdtemp()))
    eng.bootstrap()
    eng.run_cycle(1)
    eng.run_cycle(2)
    return eng.documents()


def test_media_pipeline_end_to_end(spark):
    docs = _docs(spark)
    refs = M.media_refs(docs)
    n_refs = refs.count()
    n_media_spans = docs.select(F.explode("spans").alias("s")).filter(
        F.col("s.kind") == "media"
    ).count()
    assert n_refs == n_media_spans
    assert refs.filter((F.col("ref_salt") < 0) | (F.col("ref_salt") >= M.N_REF_SALT)).count() == 0

    feats = M.media_pipeline(docs)
    rows = feats.collect()
    assert len(rows) == n_refs
    for r in rows:
        assert r["decoder"] == "stub"
        assert r["n_bytes"] > 0
        assert len(r["feature"]) == M.FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r["feature"])

    # determinism: same refs => identical features
    again = {r["media_ref"]: r["feature"] for r in M.media_pipeline(docs).collect()}
    for r in rows:
        assert again[r["media_ref"]] == r["feature"]


def test_frame_sample_plan(spark):
    docs = _docs(spark)
    feats = M.media_pipeline(docs)
    frames = M.frame_sample(feats, every_n=4)
    fr = frames.collect()
    by_ref = {}
    for r in fr:
        by_ref.setdefault(r["media_ref"], []).append(r["frame_idx"])
    nf = {r["media_ref"]: r["n_frames"] for r in feats.filter(F.col("kind") != "image").collect()}
    assert set(by_ref) == set(nf)
    for ref, idxs in by_ref.items():
        assert idxs == list(range(0, nf[ref], 4))
