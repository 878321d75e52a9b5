package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator[IN, BUF, OUT]` computing a k-wide MinHash signature
  * over a group's shingles in ONE pass — the user-facing aggregate
  * extension surface (SURVEY.md §7.3). Semantically identical to the k
  * separate `min(md5(seed||shingle))` aggregates in
  * [[graft.operators.DedupOps.minhashSignature]] (same md5-hex
  * permutations), but carries all k minima in a single buffer, so a
  * custom sketch that built-ins can't express plugs in the same way.
  *
  * Buffers merge associatively/commutatively (element-wise min), so
  * map-side partial aggregation applies — the shuffle carries one
  * k-string buffer per (partition, key).
  */
class MinHashAggregator(k: Int)
    extends Aggregator[String, Array[String], Array[String]] {

  // "￿" sorts after every hex digest → identity for min
  private val Sentinel = "￿"

  override def zero: Array[String] = Array.fill(k)(Sentinel)

  override def reduce(buf: Array[String], shingle: String): Array[String] = {
    var s = 0
    while (s < k) {
      val h = MinHashAggregator.md5Hex(s"$s|$shingle")
      if (h < buf(s)) buf(s) = h
      s += 1
    }
    buf
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[String]): Array[String] =
    buf.map(h => if (h == Sentinel) null else h)

  override def bufferEncoder: Encoder[Array[String]] =
    Encoders.javaSerialization[Array[String]]
  override def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}

object MinHashAggregator {
  private[functions] def md5Hex(s: String): String = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** Column-level UDAF over a shingle column. */
  def minhash(k: Int): org.apache.spark.sql.expressions
      .UserDefinedFunction = udaf(new MinHashAggregator(k), Encoders.STRING)
}
