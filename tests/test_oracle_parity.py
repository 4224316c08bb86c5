"""Run every registered query against its DuckDB oracle at sf0.001 —
the local twin of the driver's CORRECTNESS gate."""

import pytest

from kafka_connect_msk_demo_spark.oracle import check_query
from kafka_connect_msk_demo_spark.queries import ALL_QUERIES


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_query_matches_oracle(spark, sf_small, name):
    fn, sql = ALL_QUERIES[name]
    if not sql:
        pytest.skip("no oracle (rows-only check)")
    issues = check_query(spark, name, fn, sql, sf_small)
    assert not issues, f"{name}: " + "; ".join(issues)
