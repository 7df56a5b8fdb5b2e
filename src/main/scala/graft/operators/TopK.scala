package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-key top-k as a typed [[Aggregator]] (UDAF) — the scale-correct
  * alternative to the `row_number` window for small k.
  *
  * The window plan shuffles EVERY row to its key's partition and sorts
  * whole partitions just to keep k rows; the aggregator keeps a k-element
  * buffer per key, so map-side partial aggregation reduces each key to at
  * most k rows BEFORE the exchange — on a 100 TB fact table with k=3 the
  * shuffle shrinks by |rows per key|/3. Buffers merge associatively and
  * the ordering (score desc, id asc) is total, so the result is
  * deterministic under any partitioning.
  *
  * Kept sorted-array-of-k (k is small: insertion into a k-array beats
  * heap constant factors and gives deterministic iteration order).
  */
object TopK {

  /** (score, id) with the total order: higher score first, then lower id. */
  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  class TopKAgg(k: Int) extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    override def zero: Seq[(Double, Long)] = Seq.empty

    private def insert(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] = {
      if (buf.size >= k && better(buf.last, x)) buf
      else {
        val (pre, post) = buf.span(better(_, x))
        (pre :+ x) ++ post.take(k - pre.size - 1)
      }
    }

    override def reduce(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
      insert(buf, x)

    override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      b.foldLeft(a)(insert)

    override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r

    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  // ---------------------------------------------------------------------
  // Frequency heavy hitters — Misra-Gries sketch + exact recount.
  //
  // A plain groupBy-count top-k holds ONE hash entry per distinct key;
  // at web scale (URLs, hosts, n-grams) that table spills. Misra-Gries
  // caps the state at c entries per partition with the classic
  // guarantee: any key with true count > N/(c+1) survives every
  // decrement, so the sketch's key set is a SUPERSET of the true heavy
  // hitters (merge subtracts the (c+1)-th count — the mergeable-
  // summaries form, same bound). The sketch's counts are then thrown
  // away: a broadcast semi-join recounts ONLY the candidate keys
  // exactly, so the final top-k is EXACT (oracle-checkable) whenever
  // the skew condition holds — and the full-cardinality aggregation
  // state never exists anywhere.
  // ---------------------------------------------------------------------
  class MisraGriesAgg(c: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    override def zero: Map[String, Long] = Map.empty

    override def reduce(m: Map[String, Long], x: String): Map[String, Long] =
      if (m.contains(x)) m.updated(x, m(x) + 1L)
      else if (m.size < c) m.updated(x, 1L)
      else m.flatMap { case (k, v) => if (v > 1L) Some(k -> (v - 1L)) else None }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val s = (a.keySet ++ b.keySet).iterator
        .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
      if (s.size <= c) s
      else {
        val cut = s.values.toIndexedSeq.sorted(Ordering[Long].reverse)(c)
        s.flatMap { case (k, v) => if (v > cut) Some(k -> (v - cut)) else None }
      }
    }

    override def finish(r: Map[String, Long]): Map[String, Long] = r

    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Sketch candidate keys only (counts discarded — they are estimates). */
  def mgCandidates(df: DataFrame, keyCol: String, c: Int): DataFrame = {
    val mg = udaf(new MisraGriesAgg(c), Encoders.STRING)
    df.agg(mg(col(keyCol).cast("string")).as("__mg"))
      .select(explode(map_keys(col("__mg"))).as(keyCol))
  }

  /** Exact top-k keys by frequency through the sketch: MG candidates →
    * broadcast semi-join → exact recount → top-k. Exact whenever the
    * k-th true frequency exceeds N/(c+1) (size c accordingly); the
    * superset bound is pinned by TopKSpec. Output: (keyCol, n, rank). */
  def heavyHittersExact(df: DataFrame, keyCol: String, c: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = df.select(col(keyCol).cast("string").as(keyCol))
    keyed.join(broadcast(mgCandidates(keyed, keyCol, c)), Seq(keyCol), "left_semi")
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(keyCol).asc).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n").desc, col(keyCol).asc)).cast("long"))
  }

  /** Per-key top-k rows of (scoreCol, idCol), exploded back to long form
    * with a 1-based rank. Output: keys ++ (idCol, scoreCol, rank). */
  def topKPerKey(df: DataFrame, keys: Seq[String], idCol: String,
                 scoreCol: String, k: Int): DataFrame = {
    val agg = udaf(new TopKAgg(k), Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
    val packed = df.groupBy(keys.map(col): _*)
      .agg(agg(col(scoreCol).cast("double"), col(idCol).cast("long")).as("__top"))
    packed
      .select((keys.map(col) :+ posexplode(col("__top")).as(Seq("__pos", "__row"))): _*)
      .select((keys.map(col) :+
        col("__row._2").as(idCol) :+
        col("__row._1").as(scoreCol) :+
        (col("__pos") + 1).cast("long").as("rank")): _*)
  }
}
