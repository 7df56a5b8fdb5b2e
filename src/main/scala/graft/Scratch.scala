package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/timing probe: runMain graft.Scratch <sfDir> <query...>
  * Times 3 materializations per query (after one warmup) and prints the
  * formatted plan for the first. Not part of the driver contract. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      println(s"\n===== $n =====")
      fn(spark, sfDir).explain("formatted")
      fn(spark, sfDir).write.mode("overwrite").format("noop").save() // warmup
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        println(f"[scratch] $n run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
