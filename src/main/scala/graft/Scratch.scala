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
    if (rest.contains("--lloyd")) {
      // Plan capture for ONE Lloyd training round in both forms (the
      // declared queries checkpoint each round, so their own explain
      // cannot show the training shape): assignment + component means
      // for the coarse k-means and one PQ round, one-pass vs explode.
      import graft.operators.{Pq, Similarity}
      val emb = Tables.fanOut(Tables.embeddings(spark, sfDir))
      val cent = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 50, 1)
      println("\n===== kmeans Lloyd round: one-pass (after) =====")
      Similarity.kmeansRound(emb, "vec_id", "embedding", cent, onePass = true)
        .explain("formatted")
      println("\n===== kmeans Lloyd round: explode form (before) =====")
      Similarity.kmeansRound(emb, "vec_id", "embedding", cent, onePass = false)
        .explain("formatted")
      val books = Pq.codebooks(emb, "vec_id", "embedding", 4, 64, 50, 1)
      println("\n===== PQ Lloyd round: one-pass (after) =====")
      Pq.codebooksRound(emb, "vec_id", "embedding", books, 16, onePass = true)
        .explain("formatted")
      println("\n===== PQ Lloyd round: explode form (before) =====")
      Pq.codebooksRound(emb, "vec_id", "embedding", books, 16, onePass = false)
        .explain("formatted")
      // time the isolated round in both forms (warmup + 3 reps, noop sink)
      def time3(tag: String, f: () => org.apache.spark.sql.DataFrame): Unit = {
        f().write.mode("overwrite").format("noop").save()
        (1 to 3).foreach { i =>
          val t0 = System.nanoTime()
          f().write.mode("overwrite").format("noop").save()
          println(f"[lloyd] $tag run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
      }
      time3("kmeansRound onePass", () =>
        Similarity.kmeansRound(emb, "vec_id", "embedding", cent, onePass = true))
      time3("kmeansRound explode", () =>
        Similarity.kmeansRound(emb, "vec_id", "embedding", cent, onePass = false))
      time3("pqRound onePass", () =>
        Pq.codebooksRound(emb, "vec_id", "embedding", books, 16, onePass = true))
      time3("pqRound explode", () =>
        Pq.codebooksRound(emb, "vec_id", "embedding", books, 16, onePass = false))
      spark.stop()
      return
    }
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
