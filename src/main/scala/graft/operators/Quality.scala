package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-quality expectations — the gate a cleaning pipeline runs on its
  * own output (the reference's scattered domain checks through
  * Kafka_GSMLSConsumer.py's cleaning banks, made first-class; the
  * per-column statistics half lives in [[Curation.columnProfile]]).
  *
  * All row-level rules ride ONE aggregation — same scan, same map-side
  * partials — so a ten-rule report costs one pass. Output is long-form
  * (a row per rule) so reports append across tables and days.
  */
object Quality {

  /** Data-quality report over row-level expectations: for each named
    * rule, the number of rows violating it and a pass flag. A NULL
    * predicate counts as a violation (unknown is not acceptance —
    * `coalesce(pred, false)`), the same convention as a SQL CHECK
    * constraint the engine actually enforces. */
  def dqReport(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val aggs = rules.map { case (name, pred) =>
      sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)).as(s"__v_$name")
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rules.map { case (name, _) =>
        struct(lit(name).as("rule"), col(s"__v_$name").as("n_violations"),
          (col(s"__v_$name") === 0L).as("passed"))
      }: _*)).as("r"))
      .select(col("r.*"))
  }

  /** Uniqueness expectation — not expressible as a row predicate:
    * violations = rows beyond the first per key (n - n_distinct over
    * the key tuple, nulls grouped like any other value). Emitted in the
    * same (rule, n_violations, passed) shape so it unions with
    * [[dqReport]] into one report. */
  def dqUnique(df: DataFrame, keyCols: Seq[String], name: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__c"))
      .agg((sum(col("__c")) - count(lit(1))).as("__v"))
      .select(lit(name).as("rule"),
        coalesce(col("__v"), lit(0L)).cast(LongType).as("n_violations"),
        coalesce(col("__v") === 0L, lit(true)).as("passed"))
  }
}
