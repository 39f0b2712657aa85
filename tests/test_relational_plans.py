"""Physical-plan assertions for the TPC-shape relational queries: dim
joins must be broadcast (never shuffle the fact side for a dimension) and
scan-level predicate/column pruning must reach the parquet reader —
the two properties that decide whether these plans survive 100 TB."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from identity_matching_spark import queries as Q

SF = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_supplier_region_revenue_broadcasts_all_dims(spark):
    plan = _physical_plan(Q.q_supplier_region_revenue(spark, SF))
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_brand_yearly_profit_broadcasts_both_dims(spark):
    plan = _physical_plan(Q.q_brand_yearly_profit(spark, SF))
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_order_revenue_fact_fact_shuffle_join(spark):
    """Q3 shape: the orders⋈lineitem edge must be a shuffle join (neither
    fact broadcasts at scale — the hint pins the plan the 100 TB run
    needs even though the sf0.001 sides would fit a broadcast), the
    customer dim must broadcast, and the date predicates must reach both
    parquet scans."""
    plan = _physical_plan(Q.q_order_revenue(spark, SF))
    assert "ShuffledHashJoin" in plan
    assert plan.count("BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in plan
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate" in plan
    assert "LessThan(o_orderdate" in plan
    # the top-10 must be TakeOrdered (per-partition heaps), not a global sort
    assert "TakeOrderedAndProject" in plan


def test_pricing_summary_pushdown_and_pruning(spark):
    plan = _physical_plan(Q.q_pricing_summary(spark, SF))
    # shipdate predicate reaches the parquet scan
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan must not read the join keys this query
    # never touches
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_partkey" not in read_schema and "l_suppkey" not in read_schema
    assert "l_quantity" in read_schema and "l_returnflag" in read_schema
