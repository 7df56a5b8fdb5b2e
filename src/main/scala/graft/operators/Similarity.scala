package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication & similarity-search operators for training-data
  * pipelines: exact hash dedup, MinHash+LSH, SimHash, n-gram Jaccard,
  * embedding-cosine brute-force and LSH-bucketed ANN.
  *
  * Design notes for 100 TB:
  *  - Shingling/minhashing are per-row projections (no shuffle).
  *  - LSH banding turns the O(n²) pair space into a single hash-shuffle
  *    on band keys; bucket sizes bound the join fan-out.
  *  - All hashes are engine-portable (md5 over deterministic strings),
  *    so results are reproducible across engines and runs — no
  *    Math.random / JVM-hash dependence.
  */
object Similarity {

  // ---------------------------------------------------------------------
  // Shingling: word n-grams via a per-document window (lead) — identical
  // semantics are expressible in any SQL engine, and in Spark the window
  // is per-document so the shuffle key is the doc id (well distributed).
  // For pure-projection shingling (no shuffle at all) use shinglesArray.
  // ---------------------------------------------------------------------
  def shinglesArray(text: Column, n: Int): Column = {
    val toks = split(text, "\\s+")
    // Guard: a document with fewer than n tokens yields an empty shingle
    // set. Without the guard sequence(0, size-n) would produce a
    // DESCENDING [0,-1] array and slice(toks, 0, n) throws (SQL array
    // indices are 1-based).
    when(size(toks) >= n,
      filter(
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))),
        s => s =!= ""))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** Exploded (id, shingle) pairs, distinct per doc. */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol), explode(array_distinct(shinglesArray(col(textCol), n))).as("shingle"))

  // ---------------------------------------------------------------------
  // Exact dedup — hash-groupBy on content hash, keep lowest id.
  // One shuffle on the 128-bit content key; partial (map-side) min().
  // ---------------------------------------------------------------------
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  // ---------------------------------------------------------------------
  // MinHash signatures — k independent permutations approximated by
  // min(md5(seed || shingle)). Portable and deterministic.
  // ---------------------------------------------------------------------
  def minhashSignature(shingled: DataFrame, idCol: String, numHashes: Int): DataFrame = {
    val aggs = (0 until numHashes).map(s => min(md5(concat(lit(s"s$s:"), col("shingle")))).as(s"mh$s"))
    shingled.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: split the signature into bands of `rowsPerBand` hashes;
    * docs sharing any band key are candidate near-duplicates. */
  def lshCandidatePairs(sig: DataFrame, idCol: String,
                        numHashes: Int, rowsPerBand: Int): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val bands = (0 until numBands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"mh$i"))
      sig.select(col(idCol), lit(b).as("band"), md5(concat_ws("|", cols: _*)).as("band_key"))
    }
    val banded = bands.reduce(_.unionAll(_))
    val l = banded.as("l")
    val r = banded.as("r")
    l.join(r, col("l.band") === col("r.band") && col("l.band_key") === col("r.band_key") &&
              col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"))
      .distinct()
  }

  /** End-to-end MinHash-LSH near-dup candidates over (id, text). */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 shingleN: Int = 3, numHashes: Int = 8, rowsPerBand: Int = 4): DataFrame =
    lshCandidatePairs(minhashSignature(shingles(df, idCol, textCol, shingleN), idCol, numHashes),
                      idCol, numHashes, rowsPerBand)

  // ---------------------------------------------------------------------
  // SimHash — 16-bit fingerprint from token hashes. Bit j's weight for a
  // token is +1 when hex digit j of md5(token) is >= '8' (top bit of the
  // nibble), else −1; fingerprint bit j = (sum over tokens > 0).
  // Pure projection + one groupBy(doc) — portable across engines.
  // ---------------------------------------------------------------------
  val simhashBits = 16

  def simhashFingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol), explode(split(col(textCol), "\\s+")).as("tok"))
      .withColumn("h", md5(col("tok")))
    val bitSums = (0 until simhashBits).map { j =>
      sum(when(substring(col("h"), j + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1)
            .otherwise(-1)).as(s"b$j")
    }
    toks.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol),
        concat((0 until simhashBits).map(j => when(col(s"b$j") > 0, lit("1")).otherwise(lit("0"))): _*)
          .as("simhash"))
  }

  // ---------------------------------------------------------------------
  // N-gram Jaccard — exact set similarity via shingle co-occurrence join:
  // |A∩B| from a self-join on shingle, |A∪B| = |A|+|B|−|A∩B|.
  // The shingle join IS the LSH-free exact path; at scale, gate it behind
  // minhashLsh candidates to bound the pair space.
  // ---------------------------------------------------------------------
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double): DataFrame = {
    val sh = shingles(df, idCol, textCol, n)
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val co = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    co.join(sizes.withColumnRenamed(idCol, "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed(idCol, "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard", round(col("inter") / (col("sz_a") + col("sz_b") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // ---------------------------------------------------------------------
  // Embedding cosine similarity — double-precision dot/norms over
  // Array[Float] columns with zip_with/aggregate (codegen'd; no UDF).
  // ---------------------------------------------------------------------
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
              lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast(DoubleType) * x.cast(DoubleType)),
                   lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force top-k nearest neighbours of one query vector.
    * Per-row projection + TakeOrderedAndProject: the right baseline at any
    * scale (no shuffle; k-heap per partition). */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
                     queryVec: Column, k: Int, excludeId: Option[Long] = None): DataFrame = {
    val scored = emb
      .withColumn("cosine_sim", round(cosine(col(vecCol), queryVec), 6))
    val base = excludeId.map(x => scored.filter(col(idCol) =!= x)).getOrElse(scored)
    base.orderBy(col("cosine_sim").desc, col(idCol).asc)
      .select(col(idCol), col("cosine_sim"))
      .limit(k)
  }

  // ---------------------------------------------------------------------
  // LSH-bucketed ANN — random-hyperplane signs over a deterministic set of
  // coordinate planes (dims 0..p-1): vectors in the query's bucket are the
  // only candidates. At 100 TB: bucket id becomes the partition key; the
  // probe is a broadcast of the query bucket id(s).
  // ---------------------------------------------------------------------
  def signBucket(vec: Column, planes: Int): Column =
    concat((0 until planes).map(i =>
      when(element_at(vec, i + 1) >= 0, lit("1")).otherwise(lit("0"))): _*)

  def lshAnnTopK(emb: DataFrame, idCol: String, vecCol: String,
                 queryVec: Column, planes: Int, k: Int): DataFrame = {
    val bucketed = emb.withColumn("bucket", signBucket(col(vecCol), planes))
    bucketed
      .filter(col("bucket") === signBucket(queryVec, planes))
      .withColumn("cosine_sim", round(cosine(col(vecCol), queryVec), 6))
      .orderBy(col("cosine_sim").desc, col(idCol).asc)
      .select(col(idCol), col("bucket"), col("cosine_sim"))
      .limit(k)
  }

  private implicit class UnionOps(df: DataFrame) {
    def unionAll(other: DataFrame): DataFrame = df.union(other)
  }
}
