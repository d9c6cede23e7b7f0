package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.{Bridge, SimHash64}

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
}
