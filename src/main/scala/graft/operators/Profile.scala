package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table profiling and data-quality expectations — the observability
  * pass a cleaning pipeline runs before and after itself (the
  * reference's ad-hoc `df.isnull().sum()` / domain checks scattered
  * through Kafka_GSMLSConsumer.py's cleaning banks, made first-class).
  *
  * Both operators are ONE aggregation over the table — every statistic
  * and every rule rides the same scan and the same map-side partial
  * aggregation, so profiling N columns costs one pass, not N. Output is
  * long-form (a row per column / per rule) so reports append across
  * tables and days.
  */
object Profile {

  /** Per-column numeric profile: row count, null count, distinct count,
    * min, max — one row per requested column, computed in a single
    * aggregation.
    *
    * Scale note: `countDistinct` is exact (an Expand per column feeding
    * the one hash aggregate). At 100 TB swap `exact = false` to
    * HyperLogLog++ (`approx_count_distinct`) — same single-pass shape,
    * constant memory per column. */
  def profileNumeric(df: DataFrame, cols: Seq[String],
                     exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__nd_$c"),
        min(col(c).cast(DoubleType)).as(s"__mn_$c"),
        max(col(c).cast(DoubleType)).as(s"__mx_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { c =>
        struct(lit(c).as("column"), col("__n").as("n"),
          col(s"__nn_$c").as("n_null"), col(s"__nd_$c").as("n_distinct"),
          col(s"__mn_$c").as("min_v"), col(s"__mx_$c").as("max_v"))
      }: _*)).as("p"))
      .select(col("p.*"))
  }

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
