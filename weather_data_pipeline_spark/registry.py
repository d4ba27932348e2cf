"""Query registry — the single source for the driver contract.

Every implemented operator from SURVEY.md §2 registers here a named
callable ``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) a
DuckDB oracle SQL string over the same parquet tables. ``__spark_entry__``
re-exports these.

Determinism rules enforced by convention here (SURVEY.md §7.4):
- aggregate doubles through DECIMAL casts (exact, order-independent) or
  explicit rounding applied identically on both sides;
- every window ``ORDER BY`` carries a unique tiebreak key;
- timestamps compared as UTC; session tz pinned via session.tune().
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .session import tune

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as queries()[name]; ``oracle`` is DuckDB ANSI SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = wrapped
        if oracle is not None:
            _ORACLE[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(_ORACLE)


_LOADED = False


def _load_all() -> None:
    """Import every operator module so decorators run (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from .operators import (  # noqa: F401
        advanced,
        dedup,
        flagship,
        joins_aggs,
        json_ops,
        ml_queries,
        multimodal,
        python_exec,
        relational,
        sessionize,
        similarity,
        streaming_queries,
        text_analysis,
        weather_queries,
        windows,
    )

    _LOADED = True
