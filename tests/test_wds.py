"""R31 WebDataset-style tar shard export: deterministic USTAR bytes,
round-trip identity through a stock tarfile reader, and
partitioning-invariant shard membership.
"""

import hashlib
import io
import tarfile

from crawlspark.operators import bucketing

DOCS = [
    (1, "alpha beta gamma"),
    (2, ""),  # empty payload: header-only member
    (3, "x" * 600),  # payload spans two 512-byte blocks
    (4, "héllo ünïcode"),  # multi-byte UTF-8
    (10, "ten sorts before nine as a string key"),
    (9, "nine"),
]


def _shards(spark, parts, n_shards=3):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"]).repartition(parts)
    return bucketing.wds_shards(df, "doc_id", "text", n_shards).collect()


def test_wds_roundtrip_and_layout(spark):
    rows = _shards(spark, 2)
    assert sum(r["n_samples"] for r in rows) == len(DOCS)
    seen = {}
    for r in rows:
        raw = bytes(r["tar"])
        assert len(raw) % 10240 == 0  # record-size padding
        assert hashlib.sha256(raw).hexdigest() == r["tar_sha256"]
        assert len(raw) == r["tar_bytes"]
        names = []
        with tarfile.open(fileobj=io.BytesIO(raw)) as tf:
            for m in tf:
                assert (m.mtime, m.uid, m.gid, m.mode) == (0, 0, 0, 0o644)
                fh = tf.extractfile(m)
                seen[m.name] = (fh.read() if fh and m.size else b"").decode()
                names.append(m.name)
        assert names == sorted(names)  # members in id-string order
    assert seen == {f"{i}.txt": t for i, t in DOCS}


def test_wds_deterministic_across_partitionings(spark):
    a = {r["shard_id"]: r["tar_sha256"] for r in _shards(spark, 1)}
    b = {r["shard_id"]: r["tar_sha256"] for r in _shards(spark, 5)}
    assert a == b


def test_wds_parse_is_inverse(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    shards = bucketing.wds_shards(df, "doc_id", "text", 2)
    got = {
        (r["id"], r["text"]) for r in bucketing.wds_parse(shards).collect()
    }
    assert got == {(str(i), t) for i, t in DOCS}
