"""The DuckDB oracle gate, run locally: every query with an oracle must match
on row count, schema (sorted column names) and order-insensitive values —
exactly what the driver records in CORRECTNESS_r{N}.json."""

import pytest

from oracle_utils import compare, duck_con

import __spark_entry__ as entry_mod
from semantic_search_system_spark.fixtures.interleave import build_interleaved

from conftest import SF_MED

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    build_interleaved(SF_MED)
    c = duck_con(SF_MED)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(name, spark, con):
    df = _QUERIES[name](spark, SF_MED)
    res = compare(df, _ORACLES[name], con)
    assert res["rows_match"], (res["n_spark"], res["n_duck"])
    assert res["schema_match"], (res["spark_cols"], res["duck_cols"])
    assert res["values_match"], res["sample_diff"]
