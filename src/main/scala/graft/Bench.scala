package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Queries are materialized through the `noop`
  * datasource (every projection/expression executes, nothing is written):
  * a bare `.count()` would let Catalyst prune all unused projections and
  * measure parquet row-counting instead of the actual expression work.
  * One untimed warmup pass precedes the timed pass so measurements are
  * steady-state (single-run numbers attribute multi-second JVM/codegen
  * warmup to whichever query happens to run first).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // The default 100-entry whole-stage-codegen cache evicts a
      // query's compiled classes between its warmup and its timed run
      // once a sweep spans enough distinct plans — the timed pass then
      // measures Janino compilation, not the query (q_pq_recall: 3.5s
      // with eviction, 2.0s without, same plan). Size the cache past
      // the sweep's plan count so the warmup's stated purpose —
      // steady-state measurement — actually holds.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // clearCache after every run: operators that persist intermediates
    // (lshJaccard's pair result, kmeansCentroids' centroid frames) would
    // otherwise leave InMemoryRelations registered, and (a) the timed pass
    // would silently substitute warmup caches for compute — q_sim_lsh_jaccard
    // once "measured" faster than its strict work-subset q_sim_lsh_pairs —
    // and (b) caches accumulating across 90 queries pressure executor
    // memory and distort later queries' numbers.
    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      try {
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
      } catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}") }
    // Optional comma-separated subset for targeted re-baselining: rerunning
    // best-of-N passes for just the queries a round touched keeps the idle
    // baseline fresh without paying a full 193-query sweep per pass.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None        => SparkEntry.queries
    }
    // Fixed-work calibration sentinel — the same data-independent query
    // (a pure-CPU hash-sum over spark.range, one task per core, no IO)
    // timed at sweep start / middle / end. On an idle box the three
    // timings agree; on a contended one they inflate, so the artifact
    // CARRIES ITS OWN CONTENTION EVIDENCE instead of needing a manual
    // re-measure to adjudicate (round 17 shipped a 1.69x sweep a healthy
    // engine could only disprove by hand). Warmed once like every query.
    def sentinel(): Double = {
      import org.apache.spark.sql.functions.{col, lit, pmod, sum, xxhash64}
      val t0 = System.nanoTime()
      // pmod bounds each term so the 64M-row ANSI sum can't overflow
      spark.range(0L, 64000000L, 1L, cpus.toInt)
        .select(sum(pmod(xxhash64(col("id")), lit(1000000L))))
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val sel = selected.toSeq
    sel.foreach { case (name, fn) => runOnce(name, fn) } // warmup
    // Sentinel warmup ×3: a single warmup leaves the FIRST recorded
    // sentinel reading ~1.7x its steady state (post-warmup GC/JIT
    // settling, observed on an idle box across every r19 subset sweep),
    // which false-flags short sweeps as contended. Three passes reach
    // the steady state the contention index assumes.
    sentinel(); sentinel(); sentinel()
    spark.catalog.clearCache()
    val sweepStartMs = System.currentTimeMillis
    // DENSE sentinel schedule — one fixed-work point every `sentEvery`
    // queries, not just start/middle/end: a contended driver box shows
    // up as inflated sentinels exactly where the inflated queries sit,
    // so the artifact LOCALIZES contention query-by-query and the 2×
    // gate can be read contention-adjusted without manual re-runs
    // (round 18 needed 13 by-hand re-measures to quantify what three
    // sentinels could only flag). ~11 points on a full 270-query sweep.
    val sentEvery = 25
    // (query index the sentinel precedes, sweep offset ms, seconds)
    val sentPoints = scala.collection.mutable.ArrayBuffer[(Int, Long, Double)]()
    def recordSentinel(i: Int): Unit =
      sentPoints += ((i, System.currentTimeMillis - sweepStartMs, sentinel()))
    recordSentinel(0)
    val startMs = scala.collection.mutable.LinkedHashMap[String, Long]()
    val results = sel.zipWithIndex.map { case ((name, fn), i) =>
      if (sel.size > 1 && i > 0 && i % sentEvery == 0) recordSentinel(i)
      startMs(name) = System.currentTimeMillis - sweepStartMs
      val t0 = System.nanoTime()
      runOnce(name, fn)
      name -> (System.nanoTime() - t0) / 1e9
    }
    recordSentinel(sel.size)
    // ---- Self-healing retry pass -------------------------------------
    // Twice in three rounds (r18 1.70x, r20 1.34x) the official sweep
    // artifact carried a contention stall some query absorbed, and the
    // round's 2x gate needed a MANUAL idle re-measure to adjudicate.
    // The sentinel schedule already localizes contention; use it: a
    // query whose reading exceeds ~2x its curated floor WHILE an
    // adjacent sentinel was inflated (>1.5x the sweep's sentinel
    // median) is re-run ONCE at sweep end, and BOTH readings land in
    // the artifact (`retries`), so it carries its own clean reading
    // instead of a stall. The `queries` map (and the total) keep the
    // first readings — floor-folding discipline is unchanged; the
    // retry is evidence, not a substitute measurement. Floors come
    // from the curated bench_full.json (SPARK_GRAFT_FLOORS to
    // override); no floors -> no retries.
    val floors: Map[String, Double] = try {
      val p = sys.env.getOrElse("SPARK_GRAFT_FLOORS", "bench_full.json")
      val s = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)), java.nio.charset.StandardCharsets.UTF_8)
      val start = s.indexOf("\"queries\"")
      // no "queries" key -> no floors -> no retries, as documented (an
      // unguarded indexOf(-1) would scan from 0 and scrape whatever
      // object comes first, fabricating floors)
      if (start < 0) Map.empty else {
        val open = s.indexOf('{', start)
        val close = s.indexOf('}', open) // flat numeric object, no nesting
        "\"([^\"]+)\":\\s*([-0-9.eE+]+)".r
          .findAllMatchIn(s.substring(open + 1, close))
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }
    } catch { case _: Throwable => Map.empty }
    val sentSecs = sentPoints.map(_._3).toSeq.sorted
    val sentMedian = sentSecs(sentSecs.size / 2)
    def contendedAround(idx: Int): Boolean = {
      val before = sentPoints.filter(_._1 <= idx).lastOption
      val after = sentPoints.find(_._1 > idx)
      (before.toSeq ++ after.toSeq).exists(_._3 > 1.5 * sentMedian)
    }
    val contentionSuspect = results.zipWithIndex.collect {
      case ((name, t), i) if floors.get(name).exists(f => t > 2.0 * f) &&
        contendedAround(i) => name -> t
    }
    // Sentinel-INDEPENDENT extreme-outlier retry: a one-query GC/spill
    // stall does not inflate the fixed-work sentinels (r21's official
    // artifact carried q_repetition at 12.2x floor with CLEAN adjacent
    // sentinels, so the gate above never fired), yet a >4x-floor reading
    // is far outside same-build drift either way. Retry those too,
    // bounded at 5 per sweep (worst offenders first) so a systematically
    // stale floors file cannot double the sweep.
    val extremeSuspect = results.collect {
      case (name, t) if floors.get(name).exists(f => t > 4.0 * f) &&
        !contentionSuspect.exists(_._1 == name) => name -> t
    }.sortBy { case (name, t) => -(t / floors(name)) }.take(5)
    val suspect = contentionSuspect ++ extremeSuspect
    val retries = if (suspect.nonEmpty) {
      // a fresh sentinel brackets the retry window so the retry
      // readings carry their own contention evidence too
      recordSentinel(sel.size)
      val byName = selected.toMap
      val r = suspect.map { case (name, first) =>
        val t0 = System.nanoTime()
        runOnce(name, byName(name))
        name -> (first, (System.nanoTime() - t0) / 1e9)
      }
      recordSentinel(sel.size)
      r
    } else Seq.empty
    // ------------------------------------------------------------------
    val sentStart = sentPoints.head._3
    val sentEnd = sentPoints.last._3
    // legacy middle = the interior point nearest the sweep midpoint
    // (-1 when a subset sweep is too short to have one)
    val interior = sentPoints.toSeq.drop(1).dropRight(1)
    val sentMiddle =
      if (interior.isEmpty) -1.0
      else interior.minBy(p => math.abs(p._1 - sel.size / 2))._3
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val starts = startMs.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val sents = sentPoints.map { case (i, off, s) =>
      s"""{"at_query":$i,"offset_ms":$off,"sec":$s}""" }
      .mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val rets = retries.map { case (k, (first, retry)) =>
      s"\"" + k + s"\":{\"first\":$first,\"retry\":$retry}" }
      .mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"""" +
      s""","sweep_start_epoch_ms":$sweepStartMs,"query_start_offset_ms":$starts""" +
      s""","sentinel_sec":{"start":$sentStart,"middle":$sentMiddle,"end":$sentEnd}""" +
      s""","sentinels":$sents,"retries":$rets}"""
    println(line)
    // The driver tail-truncates long stdout lines; persist the complete
    // per-query map as a file artifact too so no timing is ever lost.
    // NEVER default onto bench_full.json: that file is the CURATED
    // best-of-N idle baseline, only ever written via
    // tools/merge_bench.py — a raw (possibly contended) sweep landing
    // on it destroys the 2x-gate's provenance, which is exactly how
    // rounds 13/14 lost theirs. Raw passes land on untracked files;
    // fold the keepers in explicitly.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (only.isDefined) "bench_subset.json" else "bench_last_run.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[bench] write $out: ${e.getMessage}") }
    spark.stop()
  }
}
