"""Tests for the sources layer and the 10-job pipeline assemblies."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from flinkproject_spark import catalog
from flinkproject_spark.operators import state
from flinkproject_spark.plans import dwd, dwm, dws
from flinkproject_spark.sources import cdc, kafka, logs


@pytest.fixture(scope="module")
def tables(spark, sf_dir):
    return catalog.load_tables(spark, sf_dir)


# --- catalog physical normalization ----------------------------------------

def test_catalog_normalizes_timestamps_to_session_tz(spark, sf_dir, tables):
    """Driver testdata regenerations have shipped events.ts as
    TIMESTAMP(NANOS) (read as long) and as MICROS isAdjustedToUTC=false
    (read as TIMESTAMP_NTZ in Spark 4). Whatever the physical, the loader
    must hand every downstream operator a session-tz TIMESTAMP — NTZ
    silently breaks epoch kernels (unix_millis rejects it) and window()
    semantics would drift from the UTC convention the oracles pin."""
    for t in ("events", "orders", "lineitem"):
        for f in tables[t].schema.fields:
            assert f.dataType.typeName() != "timestamp_ntz", f"{t}.{f.name} left NTZ"
    assert dict(tables["events"].dtypes)["ts"] == "timestamp"
    # the epoch kernel that caught the NTZ regression must work post-load
    assert tables["events"].select(F.unix_millis("ts")).first()[0] > 0


# --- sources.logs ----------------------------------------------------------

def test_log_parse_clean_and_dirty_split(tables):
    raw = logs.events_to_log_json(tables["events"], corrupt_every=10)
    clean, dirty = logs.parse_logs(raw)
    n = tables["events"].count()
    n_dirty = tables["events"].filter(F.col("event_id") % 10 == 0).count()
    assert dirty.count() == n_dirty
    assert clean.count() == n - n_dirty
    row = clean.first()
    assert row.common["mid"] is not None and row.ts > 0


# --- sources.jsonl ----------------------------------------------------------

def test_jsonl_corpus_split_and_roundtrip(spark, tables, tmp_path):
    """(1) Exact clean/dirty partition on a hand-built file mixing valid
    docs, corrupt JSON, a blank line, and contract violations (missing
    doc_id / text); (2) documents-table roundtrip through JSONL preserves
    every row and recomputes n_chars."""
    from flinkproject_spark.sources import jsonl

    p = tmp_path / "corpus.jsonl"
    lines = [
        '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}',
        'not json at all {{{',
        '',
        '{"doc_id": null, "text": "orphan"}',
        '{"doc_id": 3, "lang": "en"}',
        '{"doc_id": 2, "text": "ok", "lang": "fr", "source": "book"}',
    ]
    p.write_text("\n".join(lines))
    clean, dirty = jsonl.read_jsonl_corpus(spark, str(p))
    got = {r.doc_id: r for r in clean.collect()}
    assert set(got) == {1, 2}
    assert got[1].n_chars == len("hello world") and got[1].lang == "en"
    raws = sorted(r.raw for r in dirty.collect())
    assert raws == sorted([lines[1], lines[2], lines[3], lines[4]])
    assert clean.count() + dirty.count() == len(lines)  # nothing vanishes

    # roundtrip: documents -> JSONL -> (clean, dirty) == (documents, empty)
    docs = tables["documents"]
    out = tmp_path / "docs_jsonl"
    docs.select(F.to_json(F.struct("doc_id", "text", "lang", "source")).alias("value")) \
        .write.mode("overwrite").text(str(out))
    c2, d2 = jsonl.read_jsonl_corpus(spark, str(out))
    assert d2.count() == 0
    a = c2.orderBy("doc_id").collect()
    b = docs.select("doc_id", "text", "lang", "source", "n_chars").orderBy("doc_id").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


# --- sources.cdc -----------------------------------------------------------

def test_snapshot_envelope_shape(tables):
    env = cdc.snapshot_envelope(tables["nation"], "gmall", "nation")
    assert env.columns == ["database", "tableName", "before", "after", "type"]
    rows = env.collect()
    assert len(rows) == tables["nation"].count()
    assert all(r.type == "insert" and r.after["n_name"] for r in rows)


def test_cdc_file_stream_roundtrip(spark, tables, tmp_path):
    env = cdc.snapshot_envelope(tables["nation"], "gmall", "nation")
    path = str(tmp_path / "cdc")
    env.select(F.to_json(F.struct(*env.columns)).alias("value")).coalesce(1).write.mode(
        "overwrite"
    ).text(path)
    stream = cdc.cdc_file_stream(spark, path, max_files_per_trigger=10)
    from flinkproject_spark.streaming.replay import run_to_table

    out = run_to_table(stream)
    assert out.count() == tables["nation"].count()
    assert out.filter(F.col("after")["n_nationkey"].isNull()).count() == 0


# --- sources.kafka (construction-only in this container) -------------------

def test_kafka_builders_construct_without_broker(spark):
    assert not kafka.kafka_available(spark)  # no connector jar baked in
    reader = kafka.kafka_reader(spark, "ods_base_log", group_id="g1")
    assert reader is not None  # configured, not loaded
    rate = spark.readStream.format("rate").load()  # built-in streaming source
    w = kafka.kafka_writer(rate.selectExpr("CAST(value AS STRING) AS value"), topic="t")
    assert w is not None


# --- plans.dwd -------------------------------------------------------------

def test_base_log_app_three_way_split(tables):
    raw = logs.events_to_log_json(tables["events"])
    out = dwd.base_log_app(raw.select("value"))
    n = tables["events"].count()
    # the bridge emits no start payloads and no displays
    assert out["start"].count() == 0
    assert out["page"].count() == n
    assert out["display"].count() == 0
    assert out["dirty"].count() == 0
    # page rows keep the map-typed common/page fields
    r = out["page"].first()
    assert r.page["page_id"] in ("view", "click", "signup", "purchase", "error")


def test_base_db_app_routes_and_prunes(spark, tables):
    env = cdc.snapshot_envelope(tables["orders"], "gmall", "orders").unionByName(
        cdc.snapshot_envelope(tables["customer"], "gmall", "customer")
    )
    raw = env.select(F.to_json(F.struct(*env.columns)).alias("value"))
    routed = dwd.base_db_app(raw)
    assert routed["dwd_order_info"].columns == [
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate",
    ]
    assert routed["dwd_order_info"].count() == tables["orders"].count()
    assert routed["dim_user_info"].count() == tables["customer"].count()
    assert routed["dwd_order_update"].count() == 0  # no update-typed rows


# --- plans.dwm / plans.dws -------------------------------------------------

def test_order_wide_app_joins_fact_and_dims(tables):
    out = dwm.order_wide_app(
        tables["orders"], tables["lineitem"], tables["customer"],
        tables["nation"], tables["region"],
    )
    assert out.filter(F.col("province_name").isNull()).count() == 0
    # row count equals the interval join's (dims are left joins on pk)
    from flinkproject_spark.operators.joins import interval_join_orders_lineitem

    assert out.count() == interval_join_orders_lineitem(
        tables["orders"], tables["lineitem"]
    ).count()


def test_unique_visit_and_jump_apps_delegate(tables):
    assert dwm.unique_visit_app(tables["events"]).count() == state.unique_visits(
        tables["events"]
    ).count()
    assert dwm.user_jump_app(tables["events"]).count() == state.detect_bounces(
        tables["events"]
    ).count()


def test_product_stats_app_enriches_with_dims(tables):
    out = dws.product_stats_app(
        tables["lineitem"], tables["part"], tables["supplier"], tables["nation"]
    )
    assert out.filter(F.col("sku_name").isNull()).count() == 0
    assert {"stt", "edt", "sku_id", "order_amount", "order_ct", "tm_name"} <= set(out.columns)


def test_gmv_serving_topn(tables):
    ps = dws.product_stats_app(
        tables["lineitem"], tables["part"], tables["supplier"], tables["nation"]
    )
    top = dws.gmv_serving(ps, top=5).collect()
    assert len(top) == 5
    amounts = [r.order_amount for r in top]
    assert amounts == sorted(amounts, reverse=True)


def test_corpus_pipeline_v3_composition_matches_components(spark, sf_dir):
    """v3's selected doc set must equal applying the component operators
    sequentially: corpus_profile gate -> min-doc_id-per-fingerprint dedup
    -> DSIR importance >= 0 — the composition can't drift from its parts."""
    import pyspark.sql.functions as F

    from flinkproject_spark import catalog
    from flinkproject_spark.operators import text
    from flinkproject_spark.plans import corpus

    docs = catalog.load_table(spark, sf_dir, "documents")
    v3 = corpus.build_training_corpus_v3(docs)

    prof = text.corpus_profile(docs).filter(
        F.col("gopher_keep") & (F.col("quality_score") >= 0.5)
    )
    keepers = prof.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    pool = docs.join(keepers.select("doc_id"), "doc_id", "left_semi")
    sel = text.dsir_importance(pool).filter(F.col("log_importance") >= 0.0)

    want = {r.doc_id for r in sel.select("doc_id").collect()}
    got = {r.doc_id for r in v3.select("doc_id").collect()}
    assert got == want
    n = v3.count()
    assert sorted(r.global_pos for r in v3.collect()) == list(range(1, n + 1))
