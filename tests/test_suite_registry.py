"""Registry guards: every oracle belongs to a query, every query runs
and returns a stable schema at smoke scale (the driver's contract)."""

import pytest

from southpaw_spark import suite


def test_every_oracle_has_a_query():
    missing = set(suite.ORACLES) - set(suite.QUERIES)
    assert not missing, f"oracles without queries: {missing}"
    extra_missing = set(suite.EXTRA_ORACLES) - set(suite.EXTRA_QUERIES)
    assert not extra_missing, f"extra oracles without queries: {extra_missing}"


def test_every_query_has_an_oracle():
    # round 6: the last rows-only rows gained real oracles — d05/s02 by
    # pinning + embedding their seeded hyperplanes as SQL literals,
    # e03 by hashing exact counts plus a sketch-invariant boolean
    rows_only = set(suite.QUERIES) - set(suite.ORACLES)
    assert rows_only == set(), f"rows without oracles: {rows_only}"
    extra_rows_only = set(suite.EXTRA_QUERIES) - set(suite.EXTRA_ORACLES)
    assert extra_rows_only == set(), f"extra rows without oracles: {extra_rows_only}"


@pytest.mark.parametrize(
    "name", sorted(suite.QUERIES) + sorted(suite.EXTRA_QUERIES)
)
def test_query_runs_and_has_schema(spark, sf_dir, name):
    df = {**suite.QUERIES, **suite.EXTRA_QUERIES}[name](spark, sf_dir)
    assert df.columns, name
    assert df.count() >= 0


def test_registry_respects_driver_row_budget():
    """The driver's correctness gate checks at most 50 rows per round
    (CORRECTNESS_r02 stopped at 50 of 54) — growing past 50 silently
    unchecks tail queries; shrinking loses declared coverage."""
    assert len(suite.QUERIES) == 50
    # past-budget operators live in the EXTRA registry (same oracle
    # contract, checked by the local gate) and must not leak into the
    # driver-checked 50
    assert not set(suite.EXTRA_QUERIES) & set(suite.QUERIES)
