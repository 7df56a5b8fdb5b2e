package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  // key "a": buckets 0, 3 active (gap at 1, 2); key "b": bucket 10 only
  private def events = Seq(
    ("a", ts(5), 1.5), ("a", ts(8), 2.5),     // bucket 0, sum 4.0
    ("a", ts(35), 7.0),                        // bucket 3, sum 7.0
    ("b", ts(105), 9.0)                        // bucket 10
  ).toDF("k", "t", "v")

  test("gaps materialize with n_events=0, null raw sum, carried ffill") {
    val out = TimeSeries.resampleFfill(events, "k", "t", "v", 10L)
      .orderBy("k", "bucket_ts")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000,
        r.getLong(2), Option(r.get(3)), r.getDouble(4)))
    assert(out.toSeq == Seq(
      ("a", 0L, 2L, Some(4.0), 4.0),
      ("a", 10L, 0L, None, 4.0),    // gap: raw null, ffill carries 4.0
      ("a", 20L, 0L, None, 4.0),
      ("a", 30L, 1L, Some(7.0), 7.0),
      ("b", 100L, 1L, Some(9.0), 9.0)), s"got: ${out.toSeq}")
  }

  test("grid spans only each key's active range — no global calendar join") {
    val out = TimeSeries.resampleFfill(events, "k", "t", "v", 10L)
    // key b's series must not stretch back to key a's start
    assert(out.filter(col("k") === "b").count() == 1)
    assert(out.count() == 5)
  }

  test("results are partitioning-independent (decimal sums, keyed window)") {
    val a = TimeSeries.resampleFfill(events, "k", "t", "v", 10L)
      .orderBy("k", "bucket_ts").collect().toSeq
    val b = TimeSeries.resampleFfill(events.repartition(7), "k", "t", "v", 10L)
      .orderBy("k", "bucket_ts").collect().toSeq
    assert(a == b)
  }

  test("chunked ffill equals the single-window form for every chunking") {
    val plain = TimeSeries.resampleFfill(events, "k", "t", "v", 10L)
      .orderBy("k", "bucket_ts").collect().toSeq
    for (chunk <- Seq(1L, 2L, 3L, 7L, 100L)) {
      val chunked = TimeSeries.resampleFfillChunked(events, "k", "t", "v", 10L, chunk)
        .orderBy("k", "bucket_ts").collect().toSeq
      assert(chunked == plain, s"chunkBuckets=$chunk diverged:\n$chunked\n$plain")
    }
  }

  test("chunked carry crosses an all-gap chunk (value hands on through empty chunks)") {
    // key with values only in buckets 0 and 9: chunks 1 and 2 (width 3)
    // are entirely gaps — the carry must pass THROUGH them unchanged
    val sparse = Seq(("x", ts(5), 2.0), ("x", ts(95), 8.0)).toDF("k", "t", "v")
    val out = TimeSeries.resampleFfillChunked(sparse, "k", "t", "v", 10L, 3L)
      .orderBy("bucket_ts").collect()
      .map(r => (r.getTimestamp(1).getTime / 1000, r.getDouble(4)))
    assert(out.toSeq == (0L to 9L).map(b => (b * 10, if (b < 9) 2.0 else 8.0)),
      s"got ${out.toSeq}")
  }

  test("plan: grid explodes from the span aggregate, never a nested-loop calendar join") {
    val plan = TimeSeries.resampleFfill(events, "k", "t", "v", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"grid construction must not cross-join:\n$plan")
    assert(plan.contains("Generate explode"),
      s"the dense grid must come from sequence+explode:\n$plan")
  }
}
