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


def test_real_decode_optin_never_raises(spark):
    """The real_decode opt-in must return rows in ANY environment:
    synthetic blobs aren't decodable images (and this image has no
    Pillow), so every row falls back to the stub — crucially, none
    raises (the r3 landmine)."""
    docs = _docs(spark)
    media = M.fetch_blobs(M.media_refs(docs))
    rows = M.decode_media(media, real_decode=True).collect()
    assert rows and all(r["decoder"] == "stub" for r in rows)
    assert all(len(r["feature"]) == M.FEATURE_DIM for r in rows)


def test_pil_features_decoder_present_branch(monkeypatch):
    """Force the decoder-present branch with a fake PIL module: a
    decodable 'image' yields a pil feature row; undecodable bytes
    yield None (→ stub fallback), never an exception."""
    import sys
    import types

    class _FakeImg:
        size = (320, 200)

        def convert(self, mode):
            return self

        def resize(self, wh):
            return self

        def getdata(self):
            return list(range(16))

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class _Image:
        @staticmethod
        def open(fp):
            data = fp.read()
            if not data.startswith(b"OKIMG"):
                raise OSError("cannot identify image file")
            return _FakeImg()

    pil = types.ModuleType("PIL")
    pil.Image = _Image
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", _Image)

    out = M._pil_features(b"OKIMG" + b"\x00" * 64)
    assert out is not None
    w, h, nf, feat = out
    assert (w, h, nf) == (320, 200, 1)
    assert len(feat) == M.FEATURE_DIM
    assert feat[3] == 3 / 255.0
    # undecodable bytes: clean None, no raise
    assert M._pil_features(b"not an image") is None


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
