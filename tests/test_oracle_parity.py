"""Every registered (queries, oracle_sql) pair must hash-match at sf0.01 —
this mirrors the driver's t2 correctness gate exactly."""

from __future__ import annotations

import pytest

from weather_data_pipeline_spark import registry

from .conftest import SF_ORACLE
from .oracle_harness import compare

_QUERIES = registry.queries()
_ORACLE = registry.oracle_sql()


@pytest.mark.parametrize("name", sorted(_ORACLE))
def test_oracle_parity(spark, name):
    compare(spark, name, _QUERIES[name], _ORACLE[name], SF_ORACLE)


def test_every_query_runs(spark):
    """Queries without an oracle still must run and return a schema."""
    for name, fn in _QUERIES.items():
        if name in _ORACLE:
            continue
        df = fn(spark, SF_ORACLE)
        assert df.columns, name
        assert df.count() >= 0, name
