package graft

import org.apache.spark.sql.functions._

/** 100 TB design check: pre-bucketing both sides of a recurring join on
  * the join key removes the per-query shuffle entirely (the co-located
  * join SURVEY §7.4(10) calls for on the natural-key dedup/enrich path).
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-by-key join plans with no shuffle exchange") {
    val a = (1L to 1000L).map(i => (i % 100, i, s"a$i")).toDF("k", "id", "va")
    val b = (1L to 500L).map(i => (i % 100, s"b$i")).toDF("k", "vb")
    spark.sql("DROP TABLE IF EXISTS bk_a")
    spark.sql("DROP TABLE IF EXISTS bk_b")
    a.write.bucketBy(4, "k").sortBy("k").saveAsTable("bk_a")
    b.write.bucketBy(4, "k").sortBy("k").saveAsTable("bk_b")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val j = spark.table("bk_a").join(spark.table("bk_b"), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(j.count() == 1000 * 5) // each key: 10 x 5 matches, 100 keys

      // control: the same join over unbucketed data DOES shuffle
      val plain = a.join(b, "k").queryExecution.executedPlan.toString
      assert(plain.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
