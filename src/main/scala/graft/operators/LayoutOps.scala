package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering keys
  * for write-time file organization.
  *
  * Why this exists at 100 TB: scan pruning happens at the parquet
  * FOOTER level — a file is skipped when the filter range misses the
  * file's per-column min/max. A 1-D sort key gives perfect pruning on
  * that column and ~none on every other; interleaving the bits of two
  * (or more) quantized columns bounds the per-file bounding BOX on
  * all interleaved dimensions, so 2-D range predicates prune files on
  * both axes (the Delta/Iceberg OPTIMIZE ZORDER recipe). The key is
  * pure bit arithmetic — codegen'd, shuffle-free; the only exchange
  * is the range-partition on the final key, which the write needs
  * anyway. LayoutSpec measures the claim directly: per-file bboxes
  * from footer-grain stats, probe boxes pruned under Z-order vs a
  * 1-D sort of the same data.
  *
  * Quantization is INTEGER end-to-end (BIGINT scaling to 16-bit
  * cells, doubles first floored to fixed-point), so the key is
  * bit-identical across engines and partitionings — the doc23
  * determinism doctrine applied to layout.
  */
object LayoutOps {

  /** Spread the low 16 bits of `x` to the even bit positions of a
    * 32-bit lane (the classic mask ladder; BIGINT-safe). */
  def spreadBits(x: Column): Column = {
    val s8 = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    val s4 = (s8.bitwiseOR(shiftleft(s8, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s2 = (s4.bitwiseOR(shiftleft(s4, 2))).bitwiseAND(lit(0x33333333L))
    (s2.bitwiseOR(shiftleft(s2, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Morton interleave of two 16-bit quantized coordinates: x takes
    * the even bits, y the odd bits of the 32-bit key. */
  def mortonKey(qx: Column, qy: Column): Column =
    spreadBits(qx).bitwiseOR(shiftleft(spreadBits(qy), 1))

  /** Z-order layout keys for the events table over (user_id,
    * fixed-point value): per-row quantized cells + the Morton key the
    * writer range-partitions on. The corpus min/max aggregate is one
    * 1-row broadcast — no second scan shape, no window.
    *
    * The ×65535 quantization multiply runs in DECIMAL(38,0): in
    * BIGINT it silently overflows once the key range exceeds
    * ~1.4e14 (snowflake-style 64-bit ids are well past that),
    * corrupting the Morton key for exactly the wide-id tables that
    * need layout most. The integral divide brings the cell back to
    * BIGINT; operands are nonnegative, so Spark's truncating `div`
    * and DuckDB's floor `//` agree bit for bit. */
  def zorderEvents(events: DataFrame): DataFrame = {
    val fixed = events.select(col("event_id"),
      col("user_id").cast("long").as("x"),
      floor(col("value") * 1000).cast("long").as("y"))
    val ext = fixed.agg(min("x").as("xlo"), max("x").as("xhi"),
      min("y").as("ylo"), max("y").as("yhi"))
    fixed.join(broadcast(ext))
      .withColumn("qx",
        expr("(cast(x - xlo as decimal(38,0)) * 65535)" +
          " div greatest(1, xhi - xlo)"))
      .withColumn("qy",
        expr("(cast(y - ylo as decimal(38,0)) * 65535)" +
          " div greatest(1, yhi - ylo)"))
      .select(col("event_id"), col("qx"), col("qy"),
        mortonKey(col("qx"), col("qy")).as("zkey"))
  }
}
