"""Scale evidence: bucketed tables co-locate the orders⋈lineitem join.

At 100 TB the repeated l_orderkey⋈o_orderkey joins (pricing_summary,
revenue_topn, largest_order …) should not reshuffle the fact tables
every query. Writing both sides bucketed+sorted on the join key lets
Spark's SortMergeJoin read the co-located buckets directly — the
physical plan must contain NO Exchange on either side.
"""

from __future__ import annotations

import pytest


@pytest.fixture()
def bucketed(spark, tmp_path):
    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice")
    od = spark.read.parquet(f"{sf}/orders.parquet").select(
        "o_orderkey", "o_totalprice")
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
       .option("path", str(tmp_path / "li")).saveAsTable("li_bucketed"))
    (od.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
       .option("path", str(tmp_path / "od")).saveAsTable("od_bucketed"))
    yield "li_bucketed", "od_bucketed"
    spark.sql("drop table if exists li_bucketed")
    spark.sql("drop table if exists od_bucketed")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    li_t, od_t = bucketed
    # at test scale the planner prefers a broadcast; force the
    # sort-merge path that a 100 TB fact⋈fact join would take
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li, od = spark.table(li_t), spark.table(od_t)
        j = li.join(od, li.l_orderkey == od.o_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    # and the join actually returns the right row count
    sf = "/root/testdata/sf0.001"
    pli = spark.read.parquet(f"{sf}/lineitem.parquet")
    pod = spark.read.parquet(f"{sf}/orders.parquet")
    expected = pli.join(pod, pli.l_orderkey == pod.o_orderkey).count()
    assert j.count() == expected


def test_unbucketed_join_does_shuffle(spark):
    """Control: the same join over plain parquet NEEDS two exchanges —
    proving the bucketed plan's zero-Exchange result is the bucketing,
    not a broadcast slipping in."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        sf = "/root/testdata/sf0.001"
        li = spark.read.parquet(f"{sf}/lineitem.parquet")
        od = spark.read.parquet(f"{sf}/orders.parquet")
        j = li.join(od, li.l_orderkey == od.o_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
