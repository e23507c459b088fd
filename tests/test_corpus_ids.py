"""assign_doc_ids: contiguous, (repo, path)-ordered global ids produced
WITHOUT a single-partition shuffle (the scale-safe replacement for a bare
``row_number() OVER (ORDER BY ...)`` in the spark-submit ingest path)."""

from pyspark.sql import Row

from whoosh_spark.corpus import assign_doc_ids


def test_ids_contiguous_and_ordered(spark):
    rows = [
        Row(repo=f"org{i % 7}/r{i % 13}", path=f"src/f{i}.py", content=f"c{i}")
        for i in range(500)
    ]
    df = spark.createDataFrame(rows).repartition(8)
    out = assign_doc_ids(df, ("repo", "path"), num_partitions=6)
    got = out.select("doc_id", "repo", "path").collect()
    assert sorted(r["doc_id"] for r in got) == list(range(500))
    by_id = sorted(got, key=lambda r: r["doc_id"])
    keys = [(r["repo"], r["path"]) for r in by_id]
    assert keys == sorted(keys)


def test_no_global_window_in_plan(spark):
    rows = [Row(repo="a", path=f"p{i}", content="x") for i in range(50)]
    out = assign_doc_ids(spark.createDataFrame(rows), ("repo", "path"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the window must be partitioned (partitionBy _pid), never empty —
    # an empty partition spec is Spark's single-partition global sort
    assert "windowspecdefinition(_pid" in plan.replace(" ", "").lower() or \
        "partitionBy" not in plan, plan
