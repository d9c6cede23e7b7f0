package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines
  * (SURVEY §7 M4; exact + MinHash-LSH + n-gram Jaccard; SimHash lives in
  * [[Simhash]]).
  *
  * Design for 100 TB: every step is a hash-partitioned shuffle on a
  * signature/band key — never an all-pairs comparison. The LSH band join
  * only materializes pairs inside small buckets; mega-buckets are dropped
  * with a per-bucket cap (the standard guard against degenerate shingles —
  * one viral boilerplate string otherwise yields O(n²) pairs in a single
  * bucket).
  *
  * The md5 hash family keeps signatures engine-portable (the duckdb oracle
  * computes identical signatures); for throughput-critical runs swap to
  * xxhash64 — same topology, cheaper hash.
  *
  * Dynamic-start `substring` inside lambdas is not expressible in the
  * Column DSL, so the shingle kernels are built with SQL `expr` over a
  * column name.
  */
object Dedup {

  /** Character k-shingle set (distinct) of a text column. */
  def shingleSet(textCol: String, k: Int = 8): Column =
    expr(s"""array_distinct(transform(
            |  sequence(1, greatest(length($textCol) - ${k - 1}, 1)),
            |  i -> substring($textCol, i, $k)))""".stripMargin)

  /** Deterministic 60-bit XOR masks deriving the minhash family from ONE
    * base hash per shingle (md5 runs once per shingle, not once per hash
    * function — 8× fewer digest calls than the naive md5(shingle||seed)
    * family at identical LSH quality).
    */
  def mask(i: Int): Long = graft.functions.TextHash.mask(i)

  /** 60-bit base hash per k-shingle: first 15 hex chars of md5. */
  def shingleBases(textCol: String, k: Int = 8): Column =
    expr(s"""transform(
            |  transform(sequence(1, greatest(length($textCol) - ${k - 1}, 1)),
            |            i -> substring($textCol, i, $k)),
            |  s -> CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT))""".stripMargin)

  /** Minhash i over a precomputed base-hash array column. */
  def minhashFromBases(basesCol: String, i: Int): Column =
    expr(s"array_min(transform($basesCol, b -> b ^ ${mask(i)}L))")

  /** Adds band_1..band_b signature columns: b bands of r minhashes each.
    * The signature comes from the one-pass MinhashSignature expression
    * (same md5+XOR family as [[shingleBases]]/[[minhashFromBases]], which
    * remain as the SQL-expressible reference implementation the spec
    * cross-checks against).
    */
  def withBands(df: DataFrame, textCol: String, bands: Int, rowsPerBand: Int,
      k: Int = 8): DataFrame = {
    val n = bands * rowsPerBand
    val withSig = df.withColumn("_sig",
      graft.functions.TextHash.minhashSignature(col(textCol), k, n))
    val banded = (1 to bands).foldLeft(withSig) { (d, b) =>
      val hs = (1 to rowsPerBand).map(r =>
        element_at(col("_sig"), (b - 1) * rowsPerBand + r))
      d.withColumn(s"band_$b", md5(concat_ws("-", hs: _*).cast("binary")))
    }
    banded.drop("_sig")
  }

  /** LSH candidate pairs (id_a < id_b), bucket-capped, deduped across bands.
    * Default 4 bands x 2 rows: detect prob 1-(1-J^2)^4 — 98% at J=0.8,
    * the high-recall shape for near-dup detection (verification prunes
    * false positives downstream).
    */
  def lshCandidatePairs(
      docs: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, rowsPerBand: Int = 2, k: Int = 8,
      maxBucket: Int = 100): DataFrame = {
    val sig = withBands(docs.select(idCol, textCol), textCol, bands, rowsPerBand, k)
    // One-pass shape, same topology as Similarity.nearDupPairs: a single
    // posexplode turns all band codes into (id, band, bucket) rows, so ONE
    // groupBy + ONE self-join serve every band (the per-band formulation
    // ran bands× the stage count — band b is just a column of the same
    // scan). The bucket cap is a window count over (band, bucket): fully
    // distributed, zero driver state (minhash band codes are md5 values,
    // so ANY collected bucket list — even the small-bucket side — grows
    // linearly with the corpus and would OOM the driver at 100 TB), and
    // the window's hash partitioning on (band, bucket) is exactly the
    // distribution the self-join below needs, so the filter costs no
    // extra exchange.
    val coded = sig.select(col(idCol).as("id"),
      posexplode(array((1 to bands).map(b => col(s"band_$b")): _*))
        .as(Seq("band", "bucket")))
    val inb = coded
      .withColumn("_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket")))
      .filter(col("_n") <= maxBucket)
      .drop("_n")
    inb.as("a").join(inb.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Exact Jaccard over distinct character-k-shingle sets of two texts
    * (columns must be plain names valid in SQL scope).
    */
  def shingleJaccard(textColA: String, textColB: String, k: Int = 8): Column = {
    def sset(c: String) =
      s"""array_distinct(transform(
         |  sequence(1, greatest(length($c) - ${k - 1}, 1)),
         |  i -> substring($c, i, $k)))""".stripMargin
    expr(s"""CAST(size(array_intersect(${sset(textColA)}, ${sset(textColB)})) AS DOUBLE) /
            |size(array_union(${sset(textColA)}, ${sset(textColB)}))""".stripMargin)
  }

  /** Word n-gram Jaccard between two text columns. */
  def wordNgramJaccard(textColA: String, textColB: String, n: Int = 1): Column = {
    def grams(c: String) =
      if (n == 1) s"array_distinct(split(lower($c), '\\\\s+'))"
      else
        s"""array_distinct(transform(
           |  sequence(1, greatest(size(split(lower($c), '\\\\s+')) - ${n - 1}, 1)),
           |  i -> array_join(slice(split(lower($c), '\\\\s+'), i, $n), ' ')))""".stripMargin
    expr(s"""CAST(size(array_intersect(${grams(textColA)}, ${grams(textColB)})) AS DOUBLE) /
            |size(array_union(${grams(textColA)}, ${grams(textColB)}))""".stripMargin)
  }

  /** Exact duplicate groups by normalized content hash — one shuffle. */
  def exactDuplicates(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("content_hash", md5(lower(trim(col(textCol)))))
      .groupBy("content_hash")
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_copies"))

  /** Duplicate-cluster formation: connected components over the
    * near-dup pair graph — the step real dedup pipelines run after pair
    * generation (pick one canonical doc per component). Alternating
    * large-star / small-star (Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC'14): each round rewrites the EDGE set so
    * every node hooks onto the minimum of its neighborhood, which
    * contracts path lengths geometrically — O(log n) rounds even for a
    * long chain (a 10k-doc boilerplate ladder converges in ~14 rounds,
    * where plain min-label propagation needs ~10k). Per round: two
    * key-partitioned groupBy+join shuffles over the edge set only.
    * Fixpoint: every surviving edge is (node → component min).
    */
  def dupClusters(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b"): DataFrame =
    dupClustersWithRounds(pairs, idA, idB)._1

  /** [[dupClusters]] plus the number of star rounds it took to converge —
    * exposed so specs can pin the O(log n) bound (a 64-deep chain must
    * close in well under 64 rounds).
    */
  def dupClustersWithRounds(
      pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
      maxRounds: Int = 64): (DataFrame, Int) = {
    import org.apache.spark.sql.graft.LocalPlans

    // canonical edge direction: u > v (self-edges dropped)
    def canon(e: DataFrame): DataFrame = e
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))

    // large-star: symmetric neighborhoods; every neighbor LARGER than u
    // hooks onto min(Γ(u) ∪ {u}) — long tails collapse toward the min
    def largeStar(e: DataFrame): DataFrame = {
      val nbrs = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
      val mins = nbrs.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      nbrs.join(mins, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
    }

    // small-star: canonical (u > v) neighborhoods; u and all its smaller
    // neighbors hook onto their minimum
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy("u").agg(min("v").as("m"))
      e.join(mins, "u").filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionAll(mins.select(col("u"), col("m").as("v")))
    }

    // set fingerprint for the fixpoint test: (row count, XOR of 64-bit
    // edge hashes under TWO independent seeds — overflow-free under
    // ANSI). One aggregate job per round — the previous round's value
    // is carried, replacing the former two-`except` anti-joins per
    // round. Star rounds are deterministic set→set functions, so the
    // fixpoint is exact set equality; the fingerprint proxies it with
    // ~2^-128 collision odds (a collision needs two distinct edge sets
    // with equal count whose symmetric difference XORs to zero under
    // BOTH argument orders — xxhash64(u,v) and xxhash64(v,u) mix the
    // columns through different internal states).
    def fingerprint(e: DataFrame): (Long, Long, Long) = {
      val r = e.agg(count(lit(1)),
        expr("bit_xor(xxhash64(u, v))"),
        expr("bit_xor(xxhash64(v, u))")).head
      (r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))
    }

    var edges = canon(pairs.select(col(idA).as("u"), col(idB).as("v")))
      .distinct().localCheckpoint()
    var fp = fingerprint(edges)
    var rounds = 0
    var done = fp._1 == 0L
    while (!done && rounds < maxRounds) {
      val next = smallStar(largeStar(edges)).distinct().localCheckpoint()
      rounds += 1
      val fpNext = fingerprint(next)
      done = fpNext == fp
      fp = fpNext
      LocalPlans.releaseCheckpoint(edges)
      edges = next
    }
    if (!done) throw new IllegalStateException(
      s"dupClusters did not converge in $maxRounds star rounds")
    // at the fixpoint every edge is (member → component min); the min
    // itself labels as its own component
    val labels = edges.select(col("u").as("id"), col("v").as("label"))
      .unionAll(edges.select(col("v").as("id"), col("v").as("label")))
      .groupBy("id").agg(min("label").as("label"))
    (labels, rounds)
  }

  /** Span-level (substring) dedup: k-token spans appearing in more than
    * one document — the distributed shape of suffix-array training-data
    * dedup (Lee et al. 2021, "Deduplicating Training Data Makes Language
    * Models Better"): instead of one global suffix array, every sliding
    * k-token window becomes a row and one hash-partitioned groupBy finds
    * cross-document repeats.
    *
    * Scale shape: the explode is k× the token volume but map-side
    * combines into (span, doc) partial counts before the single shuffle;
    * at 100 TB you would group on xxhash64(span) and re-derive the text
    * for the survivors only — the fixture keeps the span text so the
    * DuckDB oracle can reproduce the result exactly.
    */
  def duplicatedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      topN: Int = 50): DataFrame = {
    // split ONCE, explode window indexes, slice per exploded row — the
    // lambda formulation (array_join(slice(split(text)...)) inside a
    // transform) re-tokenized the document for EVERY window (no CSE
    // inside lambda bodies): O(len · windows) splitting, measured 1.9×
    // slower at sf0.1 (0.59 → 0.31 s)
    val spans = docs
      .select(col(idCol).as("doc_id"),
        split(lower(col(textCol)), "\\s+").as("_toks"))
      .select(col("doc_id"), col("_toks"),
        explode(sequence(lit(1),
          greatest(size(col("_toks")) - (k - 1), lit(1)))).as("_i"))
      .select(col("doc_id"),
        array_join(slice(col("_toks"), col("_i"), lit(k)), " ").as("span"))
    // pre-group on (span, doc): the distinct-doc count then falls out of
    // a plain second aggregate — no two-phase Expand for countDistinct,
    // and the map-side combine collapses within-doc repeats before the
    // shuffle
    spans
      .groupBy("span", "doc_id")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("span")
      .agg(sum("cnt").cast("bigint").as("n_occ"), count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > 1)
      .orderBy(col("n_occ").desc, col("n_docs").desc, col("span"))
      .limit(topN)
  }
}
