"""The t2 gate, locally: every oracle-checkable catalog query must match
DuckDB exactly at sf0.001 (the driver repeats this at sf0.01)."""

from __future__ import annotations

import pytest

from monitoring_data_ingestion_spark.plans import REGISTRY

from .conftest import SF_ORACLE
from .oracle_harness import compare, duck_connection

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_ORACLE)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, duck, name):
    spec = REGISTRY[name]
    spark_pdf = spec.fn(spark, SF_ORACLE).toPandas()
    duck_pdf = duck.execute(spec.oracle).fetchdf()
    compare(spark_pdf, duck_pdf, name)


def test_every_query_has_doc():
    for name, spec in REGISTRY.items():
        assert spec.doc, f"{name} is missing a docstring"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
