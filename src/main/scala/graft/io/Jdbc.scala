package graft.io

import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** JDBC source/sink adapters — SURVEY §2.1 S2/S3/S6.
  *
  * Reads are declarative scans so Catalyst pushes predicates and prunes
  * columns into the database (the reference hand-writes WHERE clauses:
  * GSMLS.py:936-955, 1556-1572; RealEstateImages.py:478). Writes mirror
  * the reference's 500-row batched append (Kafka_GSMLSConsumer.py:
  * 1220-1242) with its per-row DataError salvage re-expressed as an
  * upfront valid/quarantine split (SURVEY §7.4(7)) — Spark's JDBC sink
  * has no per-row recovery, and at scale you want bad rows quarantined
  * deterministically, not discovered mid-batch.
  */
object Jdbc {

  /** S2 — table scan with pushdown. `fetchsize` mirrors the reference's
    * server-side cursor (RealEstateImages.py:222-227). */
  def read(spark: SparkSession, url: String, table: String,
           fetchSize: Int = 1000): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("fetchsize", fetchSize)
      .load()

  /** S3 — partitioned parallel read: numPartitions concurrent range
    * scans on the partition column (the scale path for big tables). */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partitionColumn: String, lowerBound: Long, upperBound: Long,
                      numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .load()

  /** S6 — batched append with quarantine: rows failing `valid` land in a
    * parquet quarantine path instead of poisoning a JDBC batch. Returns
    * (written, quarantined) counts (A4 bookkeeping).
    *
    * Single-pass per sink: the counts ride the write jobs as observed
    * metrics ([[Observation]]) instead of separate `count()` actions —
    * eager counts would recompute the cleaned batch twice more, a real
    * tax when every consumed batch crosses this path. The quarantine
    * side is written unconditionally (an empty parquet dir, not a
    * skipped write) so its count comes off the same job too. */
  def writeWithQuarantine(df: DataFrame, valid: Column,
                          url: String, table: String,
                          quarantinePath: String,
                          batchSize: Int = 500): (Long, Long) = {
    val (ok, bad) = Relational.validSplit(df, valid)
    val okObs = Observation()
    val badObs = Observation()
    ok.observe(okObs, count(lit(1)).as("n"))
      .write.mode("append")
      .option("batchsize", batchSize)
      .jdbc(url, table, new java.util.Properties())
    bad.observe(badObs, count(lit(1)).as("n"))
      .write.mode("append").parquet(quarantinePath)
    (okObs.get("n").asInstanceOf[Long], badObs.get("n").asInstanceOf[Long])
  }

  /** Plain batched append (no validation) — GSMLS.py:1704 event-log path. */
  def append(df: DataFrame, url: String, table: String, batchSize: Int = 500): Unit =
    df.write.mode("append").option("batchsize", batchSize)
      .jdbc(url, table, new java.util.Properties())
}

/** S7 — parquet checkpoint write/read as an engine API (the reference's
  * xlsx snapshots, Kafka_GSMLSConsumer.py:130-138, 600-602). */
object Checkpoint {
  def save(df: DataFrame, dir: String, name: String): Unit =
    df.write.mode("overwrite").parquet(s"$dir/$name")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name")
}
