package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/timing probe: runMain graft.Scratch <sfDir> <query...>
  * Times 3 materializations per query (after one warmup) and prints the
  * formatted plan for the first. Not part of the driver contract. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val vanilla = args.contains("--vanilla")
    val rest = args.filterNot(_ == "--vanilla")
    val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (rest.drop(1).isEmpty && vanilla) SparkEntry.queries.keys.toSeq.sorted
                else rest.drop(1).toSeq
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // match Bench/ScaleProbe: a codegen-heavy chain can span >100
      // codegen units, so the default cache evicts the warmup's compiled
      // classes and the "timed" runs measure Janino, not the query
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
    val spark = (if (vanilla) b else b.config("spark.sql.extensions", "graft.GraftExtensions"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (vanilla) {
      println(s"[scratch] vanilla smoke over ${names.size} queries + entry")
      assert(SparkEntry.entry(spark).count() > 0, "entry returned no rows")
      names.foreach { n =>
        try {
          SparkEntry.queries(n)(spark, sfDir).write.mode("overwrite").format("noop").save()
          println(s"[scratch] OK $n")
        } catch {
          case e: Throwable => println(s"[scratch] VANILLA-FAIL $n: ${e.getMessage}")
        }
      }
    } else names.foreach { n =>
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
