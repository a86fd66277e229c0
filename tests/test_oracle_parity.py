"""The DuckDB oracle gate, run locally: every query with an oracle must match
on row count, schema (sorted column names) and order-insensitive values —
exactly what the driver records in CORRECTNESS_r{N}.json."""

import pytest

from oracle_utils import compare, duck_con

from semantic_search_system_spark import entrypoints as ep
from semantic_search_system_spark.fixtures.interleave import build_interleaved

from conftest import SF_MED


@pytest.fixture(scope="module")
def con():
    build_interleaved(SF_MED)
    c = duck_con(SF_MED)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ep.oracles()))
def test_oracle_parity(name, spark, con):
    df = ep.registry()[name](spark, SF_MED)
    res = compare(df, ep.oracles()[name], con)
    assert res["rows_match"], (res["n_spark"], res["n_duck"])
    assert res["schema_match"], (res["spark_cols"], res["duck_cols"])
    assert res["values_match"], res["sample_diff"]
