"""JSON-Lines corpus ingestion — the standard interchange format of
training-data pipelines (one document object per line), read with the
same dirty-side-channel discipline as the behavior-log source
(sources/logs.parse_logs; BaseLogApp.java:53-68's side output):
nothing is silently dropped, malformed lines ride a quarantine frame
with the raw text preserved for inspection or re-parse.

Design notes:

- The file is read as TEXT, not via `spark.read.json`: json's
  PERMISSIVE mode spreads corrupt rows across `_corrupt_record` with
  per-column nulls, loses blank-line positions, and (in multi-file
  reads) reorders the corrupt rows away from their source lines.
  Text + `from_json` keeps the raw line next to its parse verdict in
  ONE narrow projection — same single-pass plan, explicit semantics.
- Validation composes with parsing: a structurally valid JSON object
  that fails the corpus contract (null/absent doc_id or text) is dirty
  too, exactly like the log source's missing-ts rule.
- Streaming twin for free: pass `spark.readStream.text(path)` output
  through the same function — the projection is trigger-agnostic.
- Scale: text scan -> one from_json per line -> two filters over the
  one parsed column. No shuffle; corrupt handling never forces a
  second file pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


def parse_jsonl_corpus(
    raw: DataFrame, value_col: str = "value", schema: T.StructType = DOC_SCHEMA
) -> tuple[DataFrame, DataFrame]:
    """(clean, dirty) from a frame of raw JSON-line strings.

    Dirty = unparseable JSON, blank line, or a parsed object missing the
    corpus contract's required fields (doc_id, text). Clean rows carry
    the schema's columns plus `n_chars` (recomputed, never trusted from
    the wire); dirty rows carry the raw line for quarantine.
    """
    parsed = raw.withColumn("d", F.from_json(F.col(value_col), schema))
    is_dirty = (
        F.col("d").isNull()
        | F.col("d.doc_id").isNull()
        | F.col("d.text").isNull()
    )
    clean = (
        parsed.filter(~is_dirty)
        .select("d.*")
        .withColumn("n_chars", F.length("text").cast("bigint"))
    )
    dirty = parsed.filter(is_dirty).select(F.col(value_col).alias("raw"))
    return clean, dirty


def read_jsonl_corpus(
    spark: SparkSession, path: str, schema: T.StructType = DOC_SCHEMA
) -> tuple[DataFrame, DataFrame]:
    """Batch entry point: text-scan `path` (file, directory, or glob) and
    split into (clean, dirty). Blank lines are dirty (visible in the
    quarantine count), matching the nothing-vanishes discipline."""
    return parse_jsonl_corpus(spark.read.text(path), schema=schema)
