"""Pipeline assemblies mirroring the reference's 10 dataflow jobs (SURVEY §0).

Each reference Flink job becomes a documented assembly function composing
the operator library; the operator bodies are the oracle-checked ones, so
these plans add *wiring*, not new semantics:

| reference job            | assembly                         | layer |
|--------------------------|----------------------------------|-------|
| FlinkCDC                 | sources.cdc (snapshot + stream)  | ODS   |
| BaseLogApp               | dwd.base_log_app                 | DWD   |
| BaseDBApp                | dwd.base_db_app                  | DWD   |
| UniqueVisitApp           | dwm.unique_visit_app             | DWM   |
| UserJumpDetailApp        | dwm.user_jump_app                | DWM   |
| OrderWideApp             | dwm.order_wide_app               | DWM   |
| PaymentWideApp           | dwm.payment_wide_app             | DWM   |
| VisitorStatsApp          | dws.visitor_stats_app            | DWS   |
| ProductStatsApp          | dws.product_stats_app            | DWS   |
| ProvinceStatsSqlApp      | dws.province_stats_app           | DWS   |
| KeywordStatsApp          | dws.keyword_stats_app            | DWS   |

Every assembly takes DataFrames in and returns DataFrames out (batch or
streaming — the bodies are trigger-agnostic); sinks are the caller's choice
from streaming.sinks. The end-to-end DWD->DWM->DWS chain is exercised in
tests/test_plans.py.
"""
