"""Structured Streaming surface of the engine.

The reference is a *streaming* warehouse: 10 Flink jobs over Kafka topics
(SURVEY.md §0). This package re-expresses that layer on Spark Structured
Streaming:

- `replay`   — deterministic replay harness: any batch table becomes a
               time-ordered chunked file stream (the test stand-in for
               Kafka, which isn't available in this environment).
- `jobs`     — watermarked streaming forms of the DWS/DWM computations;
               they reuse the *same* DataFrame-building functions as the
               batch operators (flinkproject_spark.operators), so batch
               parity tests transfer to streaming directly (SURVEY.md §5).
- `stateful` — `applyInPandasWithState` operators for the semantics Spark
               has no built-in for: keyed first-seen flag (A11,
               BaseLogApp.java:73-96), CEP bounce detection with event-time
               timeout (A12, UserJumpDetailApp.java:68-117), exact per-day
               dedup with TTL-style state eviction (A10/A14,
               UniqueVisitApp.java:54-87).
- `sinks`    — foreachBatch sink builders: config-routed fan-out (A15/B5/
               B6), parquet/kafka/console (B2/B11).

Scale posture: everything here is trigger-agnostic — the same code runs
`availableNow` replays in tests and continuous micro-batch triggers against
Kafka in production; state stores shard by key hash across executors, and
watermarks bound all stateful operators' memory.
"""
