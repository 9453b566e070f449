"""Multimodal columns: image/audio/video payloads as opaque binary
columns with typed metadata, processed by Arrow-batched Pandas UDFs.

The crawl's `documents.spans` rows with kind='media' reference binary
assets (`media_ref`). At 100 TB those assets dominate storage, so the
design rules are:

- blobs live in their own table (`media`), NEVER inline in `documents`
  — span rows stay small so frontier/dedup scans don't drag gigabytes
  through every shuffle;
- `media` is partitioned by `ref_salt` (hash of media_ref) so blob
  work fans out evenly regardless of per-site skew;
- decode / feature-extract / resize / frame-sample run as
  `mapInPandas` over Arrow batches — one Python roundtrip per batch,
  never per row; batch size is bounded by bytes not rows (big blobs ⇒
  small batches) via `maxRecordsPerBatch` plus the salt partitioning.

The decode internals are STUBBED (no image/audio libs in this image):
`decode_media(real_decode=True)` opts in to Pillow image decoding
(per-row fallback to the stub, never an error); by default it
derives deterministic fake features from the blob bytes, so
the Spark-side plumbing — schemas, partitioning, UDF signatures, batch
shapes — is real and tested end-to-end while the pixel math is not.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("ref_salt", T.IntegerType(), False),
        T.StructField("blob", T.BinaryType(), False),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)

FEATURES = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("decoder", T.StringType(), False),  # 'pil' | 'stub'
    ]
)

N_REF_SALT = 64
FEATURE_DIM = 16


def media_refs(docs: DataFrame) -> DataFrame:
    """Explode media spans of the span-documents table into one row per
    asset reference (JVM-only)."""
    spans = docs.select(
        "doc_id", F.explode("spans").alias("span")
    ).filter(F.col("span.kind") == "media")
    return spans.select(
        F.col("span.media_ref").alias("media_ref"),
        "doc_id",
        F.when(F.pmod(F.xxhash64("span.media_ref"), F.lit(3)) == 0, "video")
        .when(F.pmod(F.xxhash64("span.media_ref"), F.lit(3)) == 1, "audio")
        .otherwise("image")
        .alias("kind"),
        F.pmod(F.xxhash64("span.media_ref"), F.lit(N_REF_SALT)).cast("int").alias("ref_salt"),
    )


def fetch_blobs(refs: DataFrame) -> DataFrame:
    """Deterministic synthetic blob fetcher (stand-in for an object-store
    reader): blob bytes are a keyed hash stream of the ref. Same
    mapInPandas interface a real S3/HTTP reader would use."""

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for ref in pdf["media_ref"]:
                h = hashlib.blake2b(ref.encode(), digest_size=32).digest()
                size = 256 + h[0] * 16
                blobs.append((h * (size // 32 + 1))[:size])
            out = pdf.assign(blob=blobs)
            out["n_bytes"] = [len(b) for b in blobs]
            yield out

    return (
        refs.repartition(N_REF_SALT, "ref_salt")
        .mapInPandas(fetch, schema=MEDIA)
    )


def _stub_features(blob: bytes, kind: str):
    """Deterministic fake decode: dimensions/frames/features derived
    from blob bytes. Replace with PIL / torchaudio / pyav when present."""
    h = hashlib.blake2b(blob, digest_size=FEATURE_DIM + 8).digest()
    width = 64 + h[0] * 4
    height = 64 + h[1] * 4
    n_frames = 1 if kind == "image" else 8 + h[2] % 120
    feat = [b / 255.0 for b in h[8 : 8 + FEATURE_DIM]]
    return width, height, n_frames, feat


def _pil_features(blob: bytes):
    """Real image decode via Pillow (when importable AND opted in):
    grayscale 4×4 thumbnail, pixels normalized to [0,1] as the
    FEATURE_DIM-vector. Returns (width, height, n_frames, feat) or
    None when the bytes aren't a decodable image — callers fall back
    to the stub row, they never raise (a corrupt blob in one batch
    must not kill a 100 TB decode job)."""
    import io

    try:
        from PIL import Image
    except ImportError:  # pragma: no cover - lib not in this image
        return None
    try:
        with Image.open(io.BytesIO(blob)) as im:
            w, h = im.size
            px = list(im.convert("L").resize((4, 4)).getdata())
        return w, h, 1, [p / 255.0 for p in px[:FEATURE_DIM]]
    except Exception:
        return None


def decode_media(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Decode + feature-extract, Arrow-batched. The deterministic stub
    is ALWAYS the default and the per-row fallback; `real_decode=True`
    opts in to Pillow image decoding where the library is importable
    and the bytes actually decode (decoder='pil' on those rows). No
    path raises: a present-but-unused decoder, an undecodable blob,
    or a non-image kind all land stub rows, so the pipeline shape
    (schema, partition fan-out, batch iteration) holds in any image.
    Audio/video decode (torchaudio / pyav) would slot in the same
    way; until wired they always stub."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                real = (
                    _pil_features(bytes(r.blob))
                    if real_decode and r.kind == "image"
                    else None
                )
                if real is not None:
                    w, h, nf, feat = real
                    dec = "pil"
                else:
                    w, h, nf, feat = _stub_features(bytes(r.blob), r.kind)
                    dec = "stub"
                rows.append(
                    (r.media_ref, r.doc_id, r.kind, r.n_bytes, w, h, nf, feat, dec)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref", "doc_id", "kind", "n_bytes",
                    "width", "height", "n_frames", "feature", "decoder",
                ],
            )

    return media.mapInPandas(decode, schema=FEATURES)


def frame_sample(features: DataFrame, every_n: int = 4) -> DataFrame:
    """Video frame sampling plan: one row per sampled frame index —
    pure JVM explode over the frame count (the decode of each sampled
    frame would be another mapInPandas over (media_ref, frame_idx))."""
    return (
        features.filter(F.col("kind") != "image")
        .select(
            "media_ref",
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )


def media_pipeline(docs: DataFrame) -> DataFrame:
    """refs → blobs → decoded features (the full multimodal path)."""
    return decode_media(fetch_blobs(media_refs(docs)))
