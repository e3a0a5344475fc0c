"""Source connectors (SURVEY.md §2 B1-B4, B9).

The reference ingests three shapes of data, all as JSON-string streams:

- behavior-log events from an HTTP collector via Kafka `ods_base_log`
  (logger/.../LoggerController.java:24-33, consumed app/dwd/BaseLogApp.java:50),
- MySQL binlog CDC wrapped in a Debezium-style envelope via Kafka
  `ods_base_db` (app/ods/FlinkCDC.java:33-43,
  app/function/CustomerDeserialization.java:23-85),
- intermediate DWD/DWM topics between jobs (utils/MyKafkaUtil.java:46-70).

This package re-expresses them Spark-first:

- `kafka`  — readStream/writeStream builders for the topic surfaces (B1-B3);
             constructible anywhere, runnable where the Kafka connector and
             a broker exist (this container has neither — gated helpers).
- `cdc`    — the Debezium envelope schema, JSON-file CDC streams (the
             broker-less stand-in), and snapshot-then-stream assembly
             mirroring Flink CDC's `StartupOptions.initial()` (B4).
- `logs`   — the behavior-log event schema, permissive parsing with the
             dirty-record side channel, and the events-table -> log-JSON
             bridge used by tests (B9's payload, BaseLogApp's input).

Every builder returns unstarted DataFrames so the operator layer stays
source-agnostic: swap the file stand-in for the Kafka builder and nothing
downstream changes.
"""
