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


def test_q14_pruned_build_matches_unpruned(spark, sf_dir):
    """q14 builds its docs from column-pruned states (guide §2.3 —
    project before the exchange); the output must be row-identical to
    the same projections over an unpruned full-document build."""
    from pyspark.sql import functions as F

    from southpaw_spark.operators.denormalize import denormalize
    from southpaw_spark.relations import load_relations

    rel = load_relations(suite.ORDER_TREE_2LEVEL_JSON)[0]
    states = {
        e: spark.read.parquet(f"{sf_dir}/{e}.parquet")
        for e in ("orders", "customer", "lineitem")
    }
    docs = denormalize(states, rel, suite.ORDER_TREE_KEYS)
    li = F.col("doc.Children.lineitem")
    unpruned = docs.select(
        "o_orderkey",
        F.size(li).cast("long").alias("n_lineitems"),
        F.element_at(F.col("doc.Children.customer"), 1)["Record"][
            "c_name"
        ].alias("customer_name"),
        F.aggregate(
            li, F.lit(0.0), lambda acc, x: acc + x["Record"]["l_quantity"]
        ).alias("total_qty"),
        F.array_join(
            F.sort_array(
                F.transform(li, lambda x: x["Record"]["l_linenumber"])
            ).cast("array<string>"),
            ",",
        ).alias("line_pks"),
    )
    pruned = suite.q14_doc_projection(spark, sf_dir)
    assert pruned.exceptAll(unpruned).count() == 0
    assert unpruned.exceptAll(pruned).count() == 0
