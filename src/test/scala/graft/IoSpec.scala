package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.{Checkpoint, Jdbc}
import graft.operators.ImagesDoc

class IoSpec extends SparkSpec {
  import spark.implicits._

  private def derbyUrl() = s"jdbc:derby:memory:t${System.nanoTime()};create=true"

  test("ORC landing: partition filter prunes directories, value filter pushes into the reader") {
    val dir = graft.io.TempDirs.registered("orc-spec").toString
    Seq((1L, "click", 60.0), (2L, "click", 10.0), (3L, "view", 99.0))
      .toDF("id", "etype", "v")
      .write.mode("overwrite").partitionBy("etype").orc(dir)
    val back = spark.read.orc(dir).filter(col("etype") === "click" && col("v") > 50.0)
    assert(back.select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("etype"),
      s"partition not pruned:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(v,50.0)"),
      s"value predicate not pushed:\n$plan")
  }

  test("S2/S6: JDBC append + read round-trips rows; predicate pushes into the scan") {
    val url = derbyUrl()
    val df = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "name", "v")
    Jdbc.append(df, url, "T1")
    val back = Jdbc.read(spark, url, "T1").filter(col("v") > 15.0)
    assert(back.count() == 2)
    // pushdown: the JDBC relation's plan carries the filter
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("v"))
  }

  test("S6: writeWithQuarantine splits bad rows to parquet, writes good rows") {
    val url = derbyUrl()
    val q = Files.createTempDirectory("graft-quar").toString
    val df = Seq((1L, Some(5.0)), (2L, None), (3L, Some(-1.0))).toDF("id", "v")
    val (ok, bad) = Jdbc.writeWithQuarantine(df, col("v") > 0.0, url, "T2", q)
    assert(ok == 1 && bad == 2)
    assert(Jdbc.read(spark, url, "T2").count() == 1)
    assert(spark.read.parquet(q).count() == 2)
  }

  test("S6: writeWithQuarantine is single-pass — one job per sink, none for the counts") {
    val url = derbyUrl()
    val q = Files.createTempDirectory("graft-quar-jobs").toString
    val df = Seq((1L, Some(5.0)), (2L, None), (3L, Some(-1.0))).toDF("id", "v")
    val group = s"quarantine-jobs-${System.nanoTime()}"
    spark.sparkContext.setJobGroup(group, "quarantine single-pass check")
    val (ok, bad) = try Jdbc.writeWithQuarantine(df, col("v") > 0.0, url, "TJ", q)
      finally spark.sparkContext.clearJobGroup()
    assert(ok == 1 && bad == 2) // counts still correct, observed off the writes
    val jobs = spark.sparkContext.statusTracker.getJobIdsForGroup(group)
    assert(jobs.length == 2, s"expected 2 write jobs, saw ${jobs.length}")
  }

  test("S3: partitioned JDBC read returns the full table across range scans") {
    val url = derbyUrl()
    val df = (1L to 100L).map(i => (i, i * 2.0)).toDF("id", "v")
    Jdbc.append(df, url, "T3")
    val back = Jdbc.readPartitioned(spark, url, "T3", "id", 1L, 100L, 4)
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 100)
    assert(back.agg(sum("v")).collect()(0).getDouble(0) == (1 to 100).map(_ * 2.0).sum)
  }

  test("S7: checkpoint save/load round-trips") {
    val dir = Files.createTempDirectory("graft-ckpt").toString
    val df = Seq((1, "x"), (2, "y")).toDF("id", "v")
    Checkpoint.save(df, dir, "snap")
    assert(Checkpoint.load(spark, dir, "snap").orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
  }

  test("E3: nested document assembly groups images by section into a map") {
    val flat = Seq(
      ("m1", "Unknown", "Kitchen view", "u1", "Kitchen", 1, "d1"),
      ("m1", "Unknown", "Eat-in kitchen", "u2", "Kitchen", 2, "d2"),
      ("m1", "Unknown", "Front", "u3", "Exterior", 1, "d3"),
      ("m2", "Good", "Master bath", "u4", "Bathroom", 1, "d4"))
      .toDF("MLSNum", "Condition", "caption", "url", "section", "seq", "directory")
    val docs = ImagesDoc.assembleDocuments(flat).orderBy("MLSNum").collect()
    assert(docs.length == 2)
    val m1Images = docs(0).getMap[String, scala.collection.Seq[org.apache.spark.sql.Row]](2)
    assert(m1Images.keySet == Set("Kitchen", "Exterior"))
    assert(m1Images("Kitchen").length == 2 && m1Images("Exterior").length == 1)
    assert(m1Images("Kitchen").map(_.getString(1)).toSet == Set("u1", "u2"))
  }

  test("S8: document sink writes one JSON document per listing") {
    val out = Files.createTempDirectory("graft-docs").toString
    val flat = Seq(("m1", "Unknown", "Kitchen", "u1", "Kitchen", 1, "d1"))
      .toDF("MLSNum", "Condition", "caption", "url", "section", "seq", "directory")
    ImagesDoc.writeDocuments(ImagesDoc.assembleDocuments(flat), out)
    val back = spark.read.json(out)
    assert(back.count() == 1)
    assert(back.columns.toSet == Set("MLSNum", "Condition", "Images"))
  }

  test("F24: style split priorities and quirks") {
    val cases = Seq(
      ("Duplex,FixrUppr", "Duplex", "Unknown"),     // Duplex wins; NO condition side-set
      ("Triplex,Cluster", "Triplex", "Unknown"),
      ("OneStory,FourPlex", "FourPlex", "Unknown"),
      ("TwoStory,FixrUppr", "MultiFam", "FIXER UPPER"),
      (",Cluster", "MultiFam", "Unknown"),          // first-empty falls to second
      ("Colonial,Ranch", null, "Unknown"),          // unmatched list -> null
      ("OneStory", "MultiFam", "Unknown"),
      ("Resident", "Residential", "Unknown"),
      ("SeeRem", null, "Unknown"),
      ("FixrUppr", null, "FIXER UPPER"),
      ("Colonial", "Colonial", "Unknown"))
    val df = cases.map(_._1).toDF("style")
    val out = ImagesDoc.applyStyleSplit(df, "style")
      .collect().map(r => (r.getString(0), r.getString(2), r.getString(1))).toSeq
    assert(out == cases)
  }
}
