package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Scale shape: queries are the SMALL side (broadcast — zero shuffle of the
  * corpus); per-query top-k is a WindowGroupLimit (rank ≤ k pushes the
  * limit into the shuffle). Brute force is the exact baseline; the
  * hyperplane-LSH variant buckets the corpus once (linear scan per bucket)
  * and re-ranks exactly inside matched buckets — the standard
  * recall/throughput trade for billion-row corpora.
  */
object Similarity {

  /** Exact top-k by cosine for every query row: broadcast(queries) ⋈ corpus. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      roundTo: Int = 5): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("corpus_id") =!= col("query_id"))
      // round before ranking so cross-engine float noise can't flip ties;
      // ties broken deterministically by corpus_id
      .select(col("query_id"), col("corpus_id"),
        round(vec_cosine(col("cvec"), col("qvec")), roundTo).as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("corpus_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("query_id", "corpus_id", "cos_sim", "rk")
  }

  /** Deterministic random hyperplanes: plane p, dim d → ±1 from md5 parity.
    * Portable across engines and runs (no RNG state).
    */
  private def planeSign(p: Int, d: Int): Double =
    if (java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s"plane:$p:$d").substring(0, 8), 16) % 2 == 0) 1.0 else -1.0

  /** Hyperplane-LSH bucket code (SimHash for cosine): `planes`-bit code per
    * row. Rows sharing a code are near-neighbors with high probability.
    * `seed` selects an independent plane set (seed 0 keeps the original
    * plane family) — multiple seeds give the banded/multi-table LSH shape.
    */
  def withLshBucket(
      df: DataFrame, vecCol: String, dims: Int, planes: Int = 8,
      seed: Int = 0): DataFrame = {
    val code = (0 until planes).map { p =>
      val signs = (0 until dims).map(d =>
        if (seed == 0) planeSign(p, d) else planeSign(seed * 10007 + p, d))
      val proj = (0 until dims).map { d =>
        element_at(col(vecCol), d + 1).cast("double") * lit(signs(d))
      }.reduce(_ + _)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    df.withColumn("lsh_bucket", code)
  }

  /** Approximate top-k: candidates from matching LSH buckets, exact cosine
    * re-rank inside. Recall < 1 by construction (standard ANN trade).
    *
    * Multi-probe: each QUERY also probes every Hamming-distance-1 bucket
    * (a near-neighbor that lands just across one hyperplane is the common
    * recall-loss mode) — `planes`+1 probe codes per query row. Probes
    * expand the broadcast query side only, never the corpus: the corpus
    * is still bucketed once, scanned once.
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int, dims: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      planes: Int = 8, multiProbe: Boolean = true): DataFrame = {
    val c = withLshBucket(corpus, vecCol, dims, planes)
      .select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"), col("lsh_bucket"))
    val q0 = withLshBucket(queries, vecCol, dims, planes)
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"), col("lsh_bucket"))
    val q =
      if (!multiProbe) q0
      else {
        val probes = array(
          (col("lsh_bucket") +: (0 until planes).map(p =>
            col("lsh_bucket").bitwiseXOR(lit(1L << p)))): _*)
        q0.select(col("query_id"), col("qvec"),
          explode(probes).as("lsh_bucket"))
      }
    val scored = c.join(broadcast(q), Seq("lsh_bucket"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        round(vec_cosine(col("cvec"), col("qvec")), 5).as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("corpus_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("query_id", "corpus_id", "cos_sim", "rk")
  }

  /** Embedding near-duplicate pairs above a cosine threshold, via banded
    * multi-table LSH (never all-pairs). Same scale topology as
    * `Dedup.lshCandidatePairs`: each of `bands` independent plane sets
    * buckets the corpus; buckets above `maxBucket` are DROPPED before the
    * self-join, so no bucket can materialize O(n²) pairs (a mega-bucket of
    * 10⁷ rows at corpus scale would otherwise emit ~10¹⁴ candidates in one
    * join — the cap bounds the worst bucket at maxBucket²/2 while the
    * other bands still recover its genuinely-close pairs with independent
    * planes). Candidates are deduped across bands BEFORE vectors are
    * re-joined, so the cosine kernel runs once per distinct pair.
    */
  def nearDupPairs(
      df: DataFrame, threshold: Double, dims: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      planes: Int = 8, bands: Int = 3, maxBucket: Int = 200): DataFrame = {
    val src = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val perBand = (0 until bands).map { band =>
      val coded = withLshBucket(src, "v", dims, planes, seed = band)
        .select(col("id"), col("lsh_bucket"))
      val small = coded.groupBy("lsh_bucket").agg(count(lit(1)).as("n"))
        .filter(col("n") <= maxBucket)
        .select("lsh_bucket")
      val inb = coded.join(small, "lsh_bucket")
      inb.as("a").join(inb.as("b"),
          col("a.lsh_bucket") === col("b.lsh_bucket") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    }
    perBand.reduce(_ unionAll _).distinct()
      .join(src.select(col("id").as("id_a"), col("v").as("va")), "id_a")
      .join(src.select(col("id").as("id_b"), col("v").as("vb")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(vec_cosine(col("va"), col("vb")), 5).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
