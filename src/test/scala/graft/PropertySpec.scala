package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Cleaning
import graft.operators.{Relational, Similarity}

/** Property-style tests (SURVEY §5.2): parser totality and dedup
  * idempotence over scalacheck-generated input, evaluated in one batch
  * DataFrame per property (per-case Spark jobs would be pathological).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(42L)).get

  private val weird: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.asciiPrintableStr,
    Gen.oneOf("", " ", "---", "0x0", "12000 SF", "1.5 AC", "100x50", "$1,2,3", "NaN", "1e9 SF"),
    Gen.listOfN(5, Gen.oneOf("1", ".", "x", "$", ",", " ", "AC", "SF")).map(_.mkString))

  test("F17 lotSizeSqft is total and non-negative over arbitrary strings") {
    val inputs = sample(weird, 300)
    val out = inputs.toDF("v")
      .select(Cleaning.lotSizeSqft(col("v")).as("r")).collect().map(_.getDouble(0))
    assert(out.length == 300)
    assert(out.forall(_ >= 0.0))
  }

  test("lshJaccard ⊆ raw jaccard with equal scores on generated corpora") {
    // small vocab -> plenty of genuine near-dups for the gate to find
    val doc = Gen.listOfN(8, Gen.oneOf("a", "b", "c", "d", "e")).map(_.mkString(" "))
    val docs = sample(doc, 60).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("id", "text")
    val gated = Similarity.lshJaccard(df, "id", "text",
        shingleN = 2, numHashes = 16, rowsPerBand = 4,
        maxBucketSize = 1000, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val raw = Similarity.ngramJaccardPairs(df, "id", "text", n = 2,
        threshold = 0.3, maxShingleFreq = 100000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(gated.keySet.subsetOf(raw.keySet))
    assert(gated.forall { case (k, j) => raw(k) == j }) // same exact score
    assert(gated.nonEmpty)                              // the gate finds dups here
  }

  test("F3 parseCurrency never throws over arbitrary strings") {
    val inputs = sample(weird, 300)
    val out = inputs.toDF("v")
      .select(Cleaning.parseCurrency(col("v")).as("r")).collect()
    assert(out.length == 300) // nulls allowed (coerce), exceptions are not
  }

  test("F18 zeroPad output always has at least the requested width") {
    val inputs = sample(Gen.chooseNum(0L, 99999999L), 200)
    val out = inputs.toDF("v")
      .select(Cleaning.zeroPad(col("v"), 5).as("r")).collect().map(_.getString(0))
    assert(out.forall(_.length == 5)) // lpad truncates overlong to width, pads short
  }

  test("A5 dedup is idempotent and keeps exactly one row per key (random data)") {
    val rows = sample(for {
      k <- Gen.chooseNum(0, 30)
      ord <- Gen.chooseNum(0L, 1000L)
      v <- Gen.alphaStr
    } yield (s"k$k", ord, v), 500)
    val df = rows.toDF("key", "arr", "v")
    val once = Relational.dedupKeepLast(df, Seq("key"), col("arr"))
    val twice = Relational.dedupKeepLast(once, Seq("key"), col("arr"))
    assert(once.collect().toSet == twice.collect().toSet)
    assert(once.groupBy("key").count().filter(col("count") > 1).count() == 0)
    assert(once.select("key").distinct().count() == df.select("key").distinct().count())
  }

  test("shinglesArray is total over arbitrary text (incl. < n tokens)") {
    val inputs = sample(Gen.oneOf(weird, Gen.listOfN(10, Gen.alphaStr).map(_.mkString(" "))), 300)
    val out = inputs.toDF("t")
      .select(Similarity.shinglesArray(col("t"), 3).as("sh")).collect()
    assert(out.length == 300)
    assert(out.forall(r => !r.isNullAt(0))) // always an array, possibly empty
  }

  test("fingerprint is invariant under token permutation and duplication") {
    val docs = sample(for {
      toks <- Gen.nonEmptyListOf(Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))
      seed <- Gen.chooseNum(0, 1000)
    } yield (toks.mkString(" "),
             new scala.util.Random(seed).shuffle(toks ++ toks.headOption).mkString(" ")), 150)
    val df = docs.toDF("a", "b")
    val bad = df.filter(
      !(graft.functions.Text.fingerprint(col("a")) <=>
        graft.functions.Text.fingerprint(col("b")))).count()
    assert(bad == 0)
  }

  test("identical documents always become LSH candidate pairs") {
    val texts = sample(Gen.listOfN(6, Gen.oneOf("w1", "w2", "w3", "w4")).map(_.mkString(" ")), 20)
    val df = texts.zipWithIndex.flatMap { case (t, i) =>
      Seq((i.toLong * 2, t), (i.toLong * 2 + 1, t)) // every doc duplicated
    }.toDF("id", "text")
    val pairs = Similarity.minhashLsh(df, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every (2i, 2i+1) twin must surface (signatures are identical)
    val missing = texts.indices.map(i => (i.toLong * 2, i.toLong * 2 + 1))
      .filterNot(pairs.contains)
    assert(missing.isEmpty, s"missing twin pairs: $missing")
  }

  test("probeBuckets(radius 1) has exactly planes+1 distinct buckets") {
    val buckets = sample(Gen.listOfN(8, Gen.oneOf('0', '1')).map(_.mkString), 50)
    assert(buckets.forall(b => Similarity.probeBuckets(b, 1).size == b.length + 1))
    assert(buckets.forall(b => Similarity.probeBuckets(b, 1).toSet.size == b.length + 1))
  }

  test("F27 fillSentinels leaves no nulls in covered columns") {
    val rows = sample(Gen.option(Gen.alphaStr), 200)
    val df = rows.map(o => Tuple1(o.orNull)).toDF("c")
    val out = Cleaning.fillSentinels(df, Map("c" -> Cleaning.Sentinels.Unknown))
    assert(out.filter(col("c").isNull).count() == 0)
  }

  test("asofJoin equals the naive per-row latest-prior reference") {
    // generated (key, ts) with deliberate ts collisions across sides
    val ev = Gen.zip(Gen.choose(0, 4), Gen.choose(0L, 30L))
    val lefts = sample(ev, 80).zipWithIndex.map { case ((k, t), i) => (i.toLong, s"k$k", t) }
    val rights = sample(ev, 80).zipWithIndex.map { case ((k, t), i) => (1000L + i, s"k$k", t) }
    val l = lefts.toDF("lid", "key", "ts")
    val r = rights.toDF("rid", "key", "ts")
    val got = Relational.asofJoin(l, r, Seq("key"), "ts", Seq("rid"), "rid")
      .collect().map(x => x.getLong(0) -> (if (x.isNullAt(3)) -1L else x.getLong(3))).toMap
    val want = lefts.map { case (lid, k, t) =>
      val cands = rights.filter(x => x._2 == k && x._3 < t)
      lid -> (if (cands.isEmpty) -1L
              else { val mt = cands.map(_._3).max
                     cands.filter(_._3 == mt).map(_._1).max })
    }.toMap
    assert(got == want)
  }

  test("rangeJoin equals the naive inequality join on generated data") {
    val pts = sample(Gen.choose(-50.0, 50.0), 120).zipWithIndex
      .map { case (v, i) => (i.toLong, math.rint(v * 10) / 10) }
    val ivs = sample(Gen.zip(Gen.choose(-50.0, 40.0), Gen.choose(0.1, 25.0)), 40).zipWithIndex
      .map { case ((lo, len), i) => (i.toLong, math.rint(lo * 10) / 10, math.rint((lo + len) * 10) / 10) }
    val p = pts.toDF("pid", "v")
    val iv = ivs.toDF("wid", "lo", "hi")
    val got = Relational.rangeJoin(p, "v", iv, "lo", "hi", bucketWidth = 7.0)
      .select(col("pid"), col("wid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (pid, v) <- pts; (wid, lo, hi) <- ivs if v >= lo && v < hi
    } yield (pid, wid)).toSet
    assert(got == want)
  }

  test("connectedComponents equals naive union-find on random graphs") {
    val edgeGen = Gen.zip(Gen.choose(0L, 39L), Gen.choose(0L, 39L))
    val edges = sample(edgeGen, 50).filter { case (a, b) => a != b }
    val nodes = (0L until 40L)
    // driver-side union-find reference
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = nodes.map { n =>
      // component id = min member = root under min-merging union-find
      n -> find(n)
    }.toMap
    val got = graft.operators.Curation.connectedComponents(
        nodes.toDF("id"), "id", edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("lineDedup with an unreachable threshold reassembles every document exactly") {
    val line: Gen[String] = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.oneOf("", " x ", "shared line", "=== hdr ==="))
    val doc = Gen.listOfN(6, line).map(_.mkString("\n"))
    val docs = sample(doc, 80).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val out = graft.operators.Curation
      .lineDedup(docs.toDF("id", "text"), "id", "text", maxDocFreq = Long.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // split/reassemble must be the identity when nothing is boilerplate
    docs.foreach { case (id, t) => assert(out(id) == t, s"doc $id mangled") }
  }

  test("count-min: est >= exact always, exact when the sketch is roomy; shards merge by cell sum") {
    val key: Gen[String] = Gen.oneOf(Gen.alphaNumStr.map("u" + _.take(6)),
      Gen.choose(0, 20).map(i => s"hot$i"))
    val keys = sample(key, 200)
    val df = keys.zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val probes = keys.distinct.toDF("k")
    for (w <- Seq(8, 4096)) { // saturated and roomy widths both overcount-only
      val sk = graft.operators.Sketch.cmSketch(df, col("k"), depth = 4, width = w)
      val est = graft.operators.Sketch.cmEstimate(sk, probes, "k", depth = 4, width = w)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(exact.forall { case (k, n) => est(k) >= n }, s"width=$w must never undercount")
      if (w == 4096) assert(exact.forall { case (k, n) => est(k) == n },
        "roomy sketch should be exact on this key count")
    }
    // null keys: hashed under the sentinel, so a null probe still never
    // undercounts the null rows (parity with a coalesce-mirrored oracle)
    val withNulls = (keys.take(10).map(Option(_)) ++ Seq(None, None, None))
      .zipWithIndex.map { case (k, i) => (i.toLong, k.orNull) }.toDF("id", "k")
    val nsk = graft.operators.Sketch.cmSketch(withNulls, col("k"), 4, 4096)
    val nest = graft.operators.Sketch.cmEstimate(nsk,
      Seq[Option[String]](None).map(_.orNull).toDF("k"), "k", 4, 4096)
      .collect()
    assert(nest.length == 1 && nest.head.getLong(1) >= 3L,
      "null probe must count the null rows")
    // mergeability: sketch(all) == cellwise sum of the two shard sketches
    val (s1, s2) = (df.filter(col("id") % 2 === 0), df.filter(col("id") % 2 === 1))
    val merged = graft.operators.Sketch.cmSketch(s1, col("k"), 4, 64)
      .unionByName(graft.operators.Sketch.cmSketch(s2, col("k"), 4, 64))
      .groupBy("r", "c").agg(sum("cnt").as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = graft.operators.Sketch.cmSketch(df, col("k"), 4, 64)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
  }

  test("bloomKeepClean ≡ plain anti-join over generated corpora and tiny bitmaps") {
    val key: Gen[String] = Gen.oneOf(Gen.alphaNumStr.map("k" + _.take(8)),
      Gen.choose(0, 30).map(i => s"dup$i"))
    val corpus = sample(key, 150).zipWithIndex.map { case (k, i) => (i.toLong, k) }
    val dirtyKeys = sample(key, 40).distinct
    val df = corpus.toDF("id", "k")
    val dirty = dirtyKeys.toDF("dk")
    for (m <- Seq(64, 1 << 16)) { // saturated and roomy bitmaps agree
      val kept = graft.operators.Curation.bloomKeepClean(df, "k", dirty, "dk", mBits = m)
        .collect().map(_.getLong(0)).toSet
      val want = corpus.filter { case (_, k) => !dirtyKeys.contains(k) }.map(_._1).toSet
      assert(kept == want, s"mBits=$m")
    }
  }

  test("AUC complement law: auc(s, y) + auc(s, 1-y) = 1 on random scored data") {
    val gen = for {
      sc <- Gen.chooseNum(0, 1000)   // quantized scores force tie cases
      y  <- Gen.oneOf(0.0, 1.0)
    } yield (sc / 1000.0, y)
    val rows = sample(gen, 200)
    // regenerate until both classes present (Seed(42) gives both; guard anyway)
    assert(rows.exists(_._2 == 1.0) && rows.exists(_._2 == 0.0))
    val df = rows.toDF("s", "y")
    def auc(label: org.apache.spark.sql.Column): Double =
      graft.operators.Learn.auc(df.select(col("s"), label.as("y")), "s", "y")
        .collect().head.getDouble(2)
    val a = auc(col("y"))
    val b = auc(lit(1.0) - col("y"))
    assert(math.abs(a + b - 1.0) < 2e-6, // each side rounds to 6 once
      s"auc=$a, inverted=$b, sum=${a + b}")
  }

  test("PQ ADC distances are non-negative and zero only for exact codeword hits") {
    val dims = 4
    val vecs = sample(Gen.listOfN(dims, Gen.chooseNum(-8, 8)), 30)
      .zipWithIndex.map { case (v, i) => (i.toLong, v.map(_ / 8f).toArray) }
    val df = vecs.toDF("vec_id", "embedding")
    val q = Seq(0.25, -0.5, 0.75, 0.0)
    val out = graft.operators.Pq.adcTopK(df, "vec_id", "embedding", q,
      m = 2, dims = dims, centroidStep = 1, iters = 0, k = 30)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.length == 30)
    assert(out.forall(_._2 >= 0.0), s"negative ADC distance: ${out.toSeq}")
    // zero iff the vector equals the query exactly (codebook = corpus)
    out.foreach { case (id, d) =>
      val exact = vecs.find(_._1 == id).get._2.toSeq.map(_.toDouble) == q
      assert((d == 0.0) == exact, s"vec $id d=$d exactMatch=$exact")
    }
  }

  test("triangleStats and kCore match brute force on random graphs") {
    val edgeGen = for {
      a <- Gen.chooseNum(0L, 11L); b <- Gen.chooseNum(0L, 11L)
    } yield (a, b)
    for (seedShift <- 0 until 3) {
      val raw = Gen.listOfN(28, edgeGen)
        .apply(Gen.Parameters.default, Seed(42L + seedShift)).get
      val canon = raw.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b)) }.distinct
      val adj = canon.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      // brute-force triangles — yield the TUPLE: comprehending through
      // Set generators with a constant yield dedupes the counts away
      val bruteTri = (for {
        (u, ns) <- adj.toSeq; v <- ns.toSeq if v > u; w <- adj(v).toSeq if w > v
        if ns(w)
      } yield (u, v, w)).size
      val df = raw.toDF("a", "b")
      val st = graft.operators.Graph.triangleStats(df, "a", "b").collect().head
      assert(st.getLong(0) == adj.size && st.getLong(1) == canon.size &&
        st.getLong(2) == bruteTri,
        s"seed+$seedShift: got (${st.toSeq}) want nodes=${adj.size} " +
          s"edges=${canon.size} tri=$bruteTri")
      // brute-force 2-core peel
      var keep = adj.keySet
      var changed = true
      while (changed) {
        val next = keep.filter(u => adj(u).count(keep) >= 2)
        changed = next != keep; keep = next
      }
      val core = graft.operators.Graph.kCore(df, "a", "b", 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(core.keySet == keep, s"seed+$seedShift: core ${core.keySet} want $keep")
      keep.foreach { u =>
        assert(core(u) == adj(u).count(keep).toLong, s"degree of $u in core")
      }
    }
  }

  test("trainOrder is a complete dense permutation for arbitrary sizes/epochs/shards") {
    // one Spark job per config, brute-checked driver-side: every doc
    // appears exactly once per epoch, positions are dense 1..n within
    // each (epoch, shard), and shard = key mod nShards
    for ((n, epochs, shards, salt) <- Seq((1, 1, 1, "a"), (7, 3, 5, "b"),
        (64, 2, 8, "c"), (100, 1, 17, "d"))) {
      val out = graft.operators.Curation
        .trainOrder((0 until n).map(_.toLong).toDF("id"), "id", salt, epochs, shards)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(out.length == n * epochs, s"$n x $epochs rows")
      for (e <- 0L until epochs.toLong) {
        val ep = out.filter(_._2 == e)
        assert(ep.map(_._1).toSet == (0L until n.toLong).toSet, s"epoch $e complete")
        ep.groupBy(_._3).foreach { case (s, rows) =>
          assert(s >= 0 && s < shards, s"shard $s in range")
          assert(rows.map(_._4).sorted.toSeq == (1L to rows.length).toSeq,
            s"dense positions in (epoch=$e, shard=$s)")
        }
      }
    }
  }

  test("curriculumAnneal: kept budget is the brute-force filter at every epoch") {
    // generated qualities with deliberate threshold-boundary ties
    val qs = sample(Gen.chooseNum(0, 10000), 200).map(_ / 10000.0)
    val docs = qs.zipWithIndex.map { case (q, i) =>
      (i.toLong, s"s${i % 3}", q, (i % 7 + 1).toLong) }
    val df = docs.toDF("id", "source", "q", "n")
    val epochs = 4
    val out = graft.operators.Curation
      .curriculumAnneal(df, "id", "source", col("q"), col("n"), epochs, 0.1, 0.9)
      .collect().map(r => (r.getLong(0), r.getString(2)) -> (r.getLong(3), r.getLong(4)))
      .toMap
    val sched = graft.operators.Curation.annealSchedule(epochs, 0.1, 0.9)
    for ((e, thr) <- sched; src <- Seq("s0", "s1", "s2")) {
      val kept = docs.filter { case (_, s, q, _) =>
        s == src && math.floor(q * 10000.0 + 0.5).toLong >= thr }
      val got = out.get((e.toLong, src))
      if (kept.isEmpty) assert(got.isEmpty, s"epoch $e $src should be absent")
      else assert(got.contains((kept.size.toLong, kept.map(_._4).sum)),
        s"epoch $e $src: got $got want (${kept.size}, ${kept.map(_._4).sum})")
    }
  }
}
