"""Bucketed co-located join: with broadcast ruled out (as it would be at
fact⋈fact scale), the join must read co-located buckets with NO exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from anglerfish_spark.operators.relational_ext import _bucketed_tables


def test_bucketed_join_has_no_join_exchange(spark, sf_dir):
    orders_t, lineitem_t = _bucketed_tables(spark, sf_dir)
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        # tiny test tables would legitimately broadcast; rule it out to get
        # the plan a fact⋈fact join would have at scale
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        o = spark.table(orders_t)
        li = spark.table(lineitem_t)
        joined = o.join(li, F.col("l_orderkey") == F.col("o_orderkey")).select(
            "o_orderkey", "l_linenumber"
        )
        assert joined.count() > 0  # force execution so AQE finalizes
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_compacted_write_bounds_file_sizes(spark, sf_dir, tmp_path):
    """File-size governance at the sink: maxRecordsPerFile caps every
    output file (the 100 TB small-file/giant-file guard from SCALE.md)."""
    from pyspark.sql import functions as F

    from anglerfish_spark.sources.registry import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    out = str(tmp_path / "compacted")
    (
        d.repartition(2)
        .write.option("maxRecordsPerFile", 50)
        .mode("overwrite")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    per_file = (
        back.groupBy(F.input_file_name().alias("f"))
        .count()
        .collect()
    )
    assert per_file and all(r["count"] <= 50 for r in per_file), per_file
    assert back.count() == d.count()
