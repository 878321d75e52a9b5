package graft.streaming

import com.fasterxml.jackson.databind.ObjectMapper

/** Shared JSON helpers for the sink/state layer (one escaper for the
  * whole package — BatchPacker, LocalFileQueue and FilePositionStore
  * previously each hand-rolled their own, with diverging coverage). */
object JsonUtil {

  def escape(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private val mapper = new ObjectMapper()

  /** True when `s` is a complete, parseable JSON value. */
  def isValidJson(s: String): Boolean =
    try { mapper.readTree(s); true }
    catch { case _: Exception => false }

  /** Parse a flat string-valued JSON object; empty map on failure. */
  def parseFlatObject(s: String): Map[String, String] =
    try {
      val node = mapper.readTree(s)
      val it = node.properties().iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) {
        val e = it.next()
        b += e.getKey -> e.getValue.asText()
      }
      b.result()
    } catch { case _: Exception => Map.empty }
}
