package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Hyperplane-LSH kernel (called from generated code): the sign matrix is
  * derived from md5("plane:p:d") exactly like the SQL formulation in
  * graft.pipeline.Similarity (which the specs pin), precomputed once per
  * (planes, dims, seed) family — the expression-tree formulation built
  * planes×dims element_at nodes whose ANALYSIS+CODEGEN time dwarfed the
  * 5k-row compute at bench scale.
  */
object VecHash {

  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]()

  private def planeSign(p: Int, d: Int): Double =
    if (java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s"plane:$p:$d").substring(0, 8),
      16) % 2 == 0) 1.0 else -1.0

  /** Flattened [planes][dims] sign matrix for one plane family. */
  def signs(planes: Int, dims: Int, seed: Int): Array[Double] =
    signCache.computeIfAbsent((planes, dims, seed), _ => {
      val out = new Array[Double](planes * dims)
      var p = 0
      while (p < planes) {
        val pEff = if (seed == 0) p else seed * 10007 + p
        var d = 0
        while (d < dims) { out(p * dims + d) = planeSign(pEff, d); d += 1 }
        p += 1
      }
      out
    })

  /** `planes`-bit bucket code of a float/double vector. */
  def lshBucket(v: ArrayData, planes: Int, dims: Int, seed: Int,
      isFloat: Boolean): Long = {
    val sg = signs(planes, dims, seed)
    val n = math.min(dims, v.numElements())
    var code = 0L
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var d = 0
      val base = p * dims
      while (d < n) {
        val x = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
        dot += x * sg(base + d)
        d += 1
      }
      if (dot >= 0) code |= (1L << p)
      p += 1
    }
    code
  }
}
