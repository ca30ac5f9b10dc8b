"""Differential tests: every oracle-declared query vs DuckDB at sf0.001.

This mirrors what the driver does at sf0.01 (CORRECTNESS_r{N}.json) so
regressions surface locally first.
"""

from __future__ import annotations

import pytest

from mapreducehs_spark.queries import ORACLE, QUERIES
from tests.conftest import SF_DIR
from tests.oracle import assert_matches_oracle, duckdb_conn


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(spark, con, name):
    df = QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, con, ORACLE[name], name)


def test_every_query_has_an_oracle():
    """Round 6 flipped the last rows-only defaults to value-checked
    kernels; this replaces the (then-vestigial, always-skipped)
    rows-only runner with the invariant it proved: the oracle record
    IS the spec, for EVERY declared query (reference discipline:
    test/Generator.hs:83-92)."""
    assert set(QUERIES) == set(ORACLE)
