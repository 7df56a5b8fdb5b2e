package graft

import org.apache.spark.sql.functions._

class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-by-key tables join with no Exchange below the join") {
    val buckets = 4
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (1L, 5.0))
      .toDF("k", "v")
      .write.mode("overwrite").bucketBy(buckets, "k").saveAsTable("bspec_fact")
    Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("k2", "tag")
      .write.mode("overwrite").bucketBy(buckets, "k2").saveAsTable("bspec_dim")
    val joined = spark.table("bspec_fact")
      .join(spark.table("bspec_dim").hint("merge"), col("k") === col("k2"))
    val plan = joined.queryExecution.executedPlan.toString
    // The join must consume both bucketed scans directly: a shuffle
    // before a sort-merge join would appear as an Exchange node.
    assert(!plan.contains("Exchange"),
      s"bucketed join should be shuffle-free, got:\n$plan")
    assert(joined.count() == 4)
    // correctness of the co-located join
    val rows = joined.select(col("k"), col("tag")).orderBy(col("k"), col("tag"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "a"), (1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("bucketed-by-key aggregate reuses the saved layout: zero Exchange") {
    // The Layout module's SECOND payoff: the same bucketed write that
    // co-locates joins also satisfies a groupBy on the bucket key — the
    // scan's hash clustering feeds the aggregate directly, so repeated
    // aggregations on a stable key never re-shuffle the table.
    val buckets = 4
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (1L, 5.0), (2L, 7.0))
      .toDF("k", "v")
      .write.mode("overwrite").bucketBy(buckets, "k").saveAsTable("bspec_agg")
    val agg = spark.table("bspec_agg")
      .groupBy(col("k")).agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucket-key aggregate should be shuffle-free, got:\n$plan")
    val rows = agg.orderBy(col("k"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, 15.0, 2L), (2L, 27.0, 2L), (3L, 30.0, 1L)))
  }
}
