package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.{Bridge, MinhashSignature, SimHash64}
import org.apache.spark.unsafe.types.UTF8String

/** SimHash kernel (called from generated code). */
object TextHash {

  /** First 8 bytes of md5(token) as a big-endian long. */
  private def tokenHash(bytes: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    var h = 0L; var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  /** 64-bit SimHash: bitwise majority vote over token hashes. */
  def simhash64(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    var t = 0
    val n = tokens.numElements()
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = tokenHash(tokens.getUTF8String(t).getBytes)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      t += 1
    }
    var out = 0L; var j = 0
    while (j < 64) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  def simhash(tokens: Column): Column = Bridge.column(SimHash64(Bridge.expression(tokens)))

  /** XOR masks for the minhash family, 1-based hash index i:
    * first 60 bits of md5("graft-minhash-i"). Cached per family size.
    */
  private val maskCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()

  def mask(i: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"graft-minhash-$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L; var j = 0
    while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
    h >>> 4 // first 15 hex chars = top 60 bits
  }

  private def masksFor(n: Int): Array[Long] =
    maskCache.computeIfAbsent(n, m => Array.tabulate(m)(i => mask(i + 1)))

  /** One-pass minhash signature kernel (called from generated code):
    * per char-k-shingle, base = first 60 bits of md5(shingle) — identical
    * to SQL `conv(substr(md5(s),1,15),16,10)` — then element-wise min of
    * base^mask over all shingles. Empty/short texts hash the whole text
    * once, matching `sequence(1, greatest(len-k+1, 1))`.
    */
  def minhashSignature(text: UTF8String, k: Int, n: Int): ArrayData = {
    val s = text.toString
    val len = s.length
    val masks = masksFor(n)
    val mins = Array.fill(n)(Long.MaxValue)
    val md = java.security.MessageDigest.getInstance("MD5")
    val numShingles = math.max(len - k + 1, 1)
    var i = 0
    while (i < numShingles) {
      val sh = s.substring(i, math.min(i + k, len))
      val d = md.digest(sh.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L; var j = 0
      while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
      val base = h >>> 4
      var m = 0
      while (m < n) {
        val v = base ^ masks(m)
        if (v < mins(m)) mins(m) = v
        m += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(mins)
  }

  def minhashSignature(text: Column, k: Int, n: Int): Column =
    Bridge.column(MinhashSignature(Bridge.expression(text), k, n))
}
