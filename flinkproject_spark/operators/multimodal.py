"""Multimodal asset operators (north-star surface): opaque binary payloads
with typed metadata, decoded/featurized via Arrow-batched `mapInPandas`.

Design for a 100 TB media corpus:

- **Assets are rows**: (asset_id, kind, payload: BINARY, meta: MAP) — the
  payload is opaque to Catalyst; everything prunable (kind, meta, sizes)
  lives in columns so scans can skip payload bytes entirely when a query
  only touches metadata (parquet column pruning does the heavy lifting).
- **Decode is the slow path, batched**: `mapInPandas` streams Arrow record
  batches into Python, so the per-row overhead is amortized and memory is
  bounded by `spark.sql.execution.arrow.maxRecordsPerBatch` — not by
  partition size. Real image/audio decoding libs are NOT in this container;
  `_decode_batch` is a clearly-marked STUB whose deterministic fake
  derives every "decoded" property from the payload bytes, keeping the
  Spark-side plumbing (schema, batching, partitioning) real and testable.
- **Frame sampling is relational**: a video row fans out to its sampled
  frame indices with `explode(sequence(...))` — pure JVM, no Python.
- **Features are fixed-width**: the extractor emits one row per
  (asset, feature index) so downstream joins/aggs shuffle scalars, not
  arrays; assembling array<float> for the similarity operators is a
  `collect_list` away.

The deterministic fake uses the cross-engine md5 kernels so every operator
here still has a DuckDB oracle twin — the decode stub is the ONLY part a
production deployment replaces (with PIL/ffmpeg/soundfile inside the same
mapInPandas contract).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KINDS = ("image", "audio", "video")

DECODE_SCHEMA = (
    "asset_id bigint, kind string, n_bytes bigint, payload_md5 string, "
    "width bigint, height bigint"
)
FEATURE_SCHEMA = "asset_id bigint, feat_idx bigint, feature double"


def documents_as_assets(documents: DataFrame) -> DataFrame:
    """Bridge: the documents table as a multimodal asset table — payload =
    utf-8 text bytes, kind cycled by doc_id, frame-count metadata for the
    'video' rows. Production replaces this with a real asset catalog; the
    operator surface downstream is identical."""
    kind = F.element_at(F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int"))
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.create_map(
            F.lit("n_frames"), (F.col("doc_id") % 20 + 10).cast("string"),
            F.lit("lang"), F.col("lang"),
        ).alias("meta"),
    )


def _fake_dims(md5_hex: str) -> tuple[int, int]:
    """Deterministic stand-in for decoded pixel dimensions: derived from the
    payload hash so tests and the DuckDB oracle can reproduce them."""
    w = 64 + int(md5_hex[:8], 16) % 1920
    h = 64 + int(md5_hex[8:16], 16) % 1080
    return w, h


def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """STUB decode — this container has no image/audio libraries.

    Contract for a real deployment: replace the body below with e.g.
    PIL.Image.open(io.BytesIO(payload)) / soundfile.read(...) keeping the
    same output columns. The deterministic fake hashes the payload and
    derives plausible properties from it.
    """
    try:  # pragma: no cover - decode libs absent by design here
        import PIL  # noqa: F401

        raise NotImplementedError(
            "real image decode not wired; replace _decode_batch's fake path"
        )
    except ImportError:
        pass
    md5s = [hashlib.md5(p).hexdigest() for p in pdf["payload"]]
    dims = [_fake_dims(m) for m in md5s]
    return pd.DataFrame(
        {
            "asset_id": pdf["asset_id"],
            "kind": pdf["kind"],
            "n_bytes": pdf["payload"].map(len).astype("int64"),
            "payload_md5": md5s,
            "width": pd.Series([d[0] for d in dims], dtype="int64"),
            "height": pd.Series([d[1] for d in dims], dtype="int64"),
        }
    )


def decode_assets(assets: DataFrame) -> DataFrame:
    """Decode every asset's payload to typed properties via mapInPandas.

    The projection before mapInPandas keeps only the columns the decoder
    needs, so Catalyst prunes everything else out of the scan."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _decode_batch(pdf)

    return assets.select("asset_id", "kind", "payload").mapInPandas(run, DECODE_SCHEMA)


def frame_sample(assets: DataFrame, stride: int = 4) -> DataFrame:
    """One row per sampled frame of each video asset: frame indices
    0, stride, 2*stride, ... below meta['n_frames']. Pure relational fan-out
    (explode over sequence) — no Python in the loop."""
    vids = assets.filter(F.col("kind") == "video").select(
        "asset_id", F.col("meta")["n_frames"].cast("bigint").alias("n_frames")
    )
    return vids.select(
        "asset_id",
        "n_frames",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(stride))).alias("frame_idx"),
    )


def extract_features(assets: DataFrame, dim: int = 8) -> DataFrame:
    """Fixed-width feature rows per asset via mapInPandas (Arrow-batched).

    STUB extractor (same contract note as _decode_batch): feature i is a
    deterministic [0,1) double derived from md5(payload || '|i') — exactly
    reproducible in SQL, so the full plumbing is oracle-checked. A real
    model replaces the hash with an embedding forward pass, batch-at-a-time.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids, idxs, feats = [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                for i in range(dim):
                    h = hashlib.md5(bytes(payload) + f"|{i}".encode()).hexdigest()
                    ids.append(aid)
                    idxs.append(i)
                    feats.append((int(h[:8], 16) % 1000) / 1000.0)
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "feat_idx": pd.Series(idxs, dtype="int64"),
                    "feature": pd.Series(feats, dtype="float64"),
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "asset_id bigint, kind string, width bigint, height bigint, "
    "resized_md5 string"
)


def resize_assets(assets: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Resize plumbing (same STUB contract as _decode_batch): emits the
    target dimensions plus a deterministic content hash standing in for the
    resized payload — a real deployment swaps the hash for
    PIL `Image.resize` bytes inside the identical mapInPandas shape.

    Only image/video assets resize; audio rows are filtered relationally so
    the scan prunes them before any Python runs.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            md5s = [
                hashlib.md5(bytes(p) + f"|{target_w}x{target_h}".encode()).hexdigest()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "width": pd.Series([target_w] * len(pdf), dtype="int64"),
                    "height": pd.Series([target_h] * len(pdf), dtype="int64"),
                    "resized_md5": md5s,
                }
            )

    visual = assets.filter(F.col("kind").isin("image", "video"))
    return visual.select("asset_id", "kind", "payload").mapInPandas(run, RESIZE_SCHEMA)


def feature_vectors(assets: DataFrame, dim: int = 8) -> DataFrame:
    """Assemble (asset_id, features array<double>) from the feature rows —
    the bridge into the similarity operators' array<float> surface."""
    rows = extract_features(assets, dim)
    return (
        rows.groupBy("asset_id")
        .agg(F.array_sort(F.collect_list(F.struct("feat_idx", "feature"))).alias("fs"))
        .select("asset_id", F.col("fs.feature").alias("features"))
    )
