from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pytest

from flinkproject_spark.catalog import TABLES
from flinkproject_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    yield con


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
