package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/timing probe: runMain graft.Scratch <sfDir> <query...>
  * Times 3 materializations per query (after one warmup) and prints the
  * formatted plan for the first. Not part of the driver contract. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val vanilla = args.contains("--vanilla")
    // --conf k=v pairs: applied via spark.conf.set AFTER session build
    // (runtime-settable SQL confs only) — for ad-hoc plan experiments
    val confs = args.filter(_.startsWith("--conf=")).map { a =>
      val kv = a.stripPrefix("--conf=").split("=", 2); (kv(0), kv(1))
    }
    val rest = args.filterNot(a => a == "--vanilla" || a.startsWith("--conf="))
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
    confs.foreach { case (k, v) => spark.conf.set(k, v); println(s"[scratch] conf $k=$v") }
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
    if (rest.contains("--bitext")) {
      // Stage-level timing of q_bitext_margin's plan (VERDICT r21 task 3):
      // noop-materialize each intermediate stage (reps=3 after warmup) so
      // stage deltas attribute the decade's cost/spread. Mirrors the
      // declared query's exact parameterization.
      import org.apache.spark.sql.functions.col
      import graft.operators.Similarity
      val emb = Tables.fanOut(Tables.embeddings(spark, sfDir))
      val planes = Similarity.adaptivePlanes(emb.count())
      val stages = Similarity.bitextMarginStages(emb, "vec_id", "embedding",
        col("label") % 2, planes, 64, 10200L, bucketCap = 1024)
      println(s"[bitext] planes=$planes")
      stages.foreach { case (name, df) =>
        df.write.mode("overwrite").format("noop").save() // warmup
        spark.catalog.clearCache()
        (1 to 5).foreach { i =>
          val t0 = System.nanoTime()
          df.write.mode("overwrite").format("noop").save()
          println(f"[bitext] $name%-12s run$i: ${(System.nanoTime() - t0) / 1e9}%8.3f s")
          spark.catalog.clearCache()
        }
        println(s"[bitext] $name rows: ${df.count()}")
        spark.catalog.clearCache()
      }
      // experimental window formulation of the margins stage (same
      // arithmetic; sums via unbounded windows instead of agg+join)
      locally {
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.functions._
        import org.apache.spark.sql.types.{DoubleType, LongType}
        val cand = stages.find(_._1 == "candidates").get._2
        val wA = Window.partitionBy(col("id_a"))
        val wB = Window.partitionBy(col("id_b"))
        val m2 = cand
          .withColumn("__sb", sum("cos_u").over(wB))
          .withColumn("__nb", count(lit(1)).over(wB))
          .withColumn("__sa", sum("cos_u").over(wA))
          .withColumn("__na", count(lit(1)).over(wA))
          .withColumn("margin_bp",
            floor(lit(2.0) * col("cos_u")
                / (col("__sa").cast(DoubleType) / col("__na")
                  + col("__sb").cast(DoubleType) / col("__nb"))
                * 10000.0 + 0.5)
              .cast(LongType))
          .select(col("id_a"), col("id_b"), col("cos_u"), col("margin_bp"))
        val wR = Window.partitionBy(col("id_a"))
          .orderBy(col("margin_bp").desc, col("id_b").asc)
        val mined2 = m2.withColumn("__rn", row_number().over(wR))
          .filter(col("__rn") === 1 && col("margin_bp") >= 10200L)
          .select(col("id_a"), col("id_b"), col("cos_u"), col("margin_bp"))
        mined2.write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
        (1 to 5).foreach { i =>
          val t0 = System.nanoTime()
          mined2.write.mode("overwrite").format("noop").save()
          println(f"[bitext] mined2(window) run$i: ${(System.nanoTime() - t0) / 1e9}%8.3f s")
          spark.catalog.clearCache()
        }
        val mined = stages.last._2
        println(s"[bitext] parity mined2==mined: " +
          (mined2.exceptAll(mined).isEmpty && mined.exceptAll(mined2).isEmpty))
      }
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
      spark.catalog.clearCache() // match Bench: no run serves a prior run's cache
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        println(f"[scratch] $n run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
