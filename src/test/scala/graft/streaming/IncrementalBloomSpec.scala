package graft.streaming

import graft.SparkSpec
import graft.operators.SketchOps
import org.apache.spark.sql.functions._

/** IncrementalBloom: maintained bits == one-shot bits exactly (set
  * union); replay-safe TWICE over (watermark no-op AND idempotent
  * union even when the watermark is bypassed — the HLL-class
  * guarantee, the contrast with CMS). Bloom semantics: no false
  * negative ever; false positives exist at tight sizing (it is a
  * filter, not a set). */
class IncrementalBloomSpec extends SparkSpec {

  private val table = "bloomspec_bits"

  private def freshTable(): Unit =
    Seq(table, s"${table}_stage", s"${table}_old")
      .foreach(CdcMerge.dropStateTable(spark, _))

  private def members = {
    import spark.implicits._
    (0L until 300L).map(i => (i, s"member-$i")).toDF("id", "item")
  }

  private def bitsOf(df: org.apache.spark.sql.DataFrame) =
    SketchOps.bloomBits(df, "item").collect()
      .map(_.getLong(0)).toSet

  test("batched fold == one-shot bits; no member ever missed") {
    import spark.implicits._
    freshTable()
    def part(i: Int) = members.filter(pmod($"id", lit(3)) === i)
    (0 to 2).foreach(i => IncrementalBloom.applyBatch(spark, table,
      part(i), "item", i.toLong))
    val got = IncrementalBloom.readBits(spark, table).collect()
      .map(_.getLong(0)).toSet
    assert(got == bitsOf(members))
    assert(got.nonEmpty)
    // EVERY member answers might_contain — the no-false-negative
    // guarantee, from the maintained bits
    val mc = SketchOps.bloomMightContain(
        IncrementalBloom.readBits(spark, table), members, "item")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(mc.size == 300 && mc.values.forall(identity))
  }

  test("false positives exist at tight sizing; absent at generous") {
    import spark.implicits._
    val nonMembers = (0L until 300L).map(i => (i, s"other-$i"))
      .toDF("id", "item")
    // tight: 300 members × 3 hashes into 256 bits — nearly all bits
    // set, so non-members collide (the filter is doing real work,
    // not memorizing the set)
    val tight = SketchOps.bloomMightContain(
        SketchOps.bloomBits(members, "item", m = 256),
        nonMembers, "item", m = 256)
      .filter(col("might_contain")).count()
    assert(tight > 0, "no false positive at 256 bits — suspicious")
    // generous: 1M bits — collisions essentially impossible, every
    // non-member correctly rejected
    val generous = SketchOps.bloomMightContain(
        SketchOps.bloomBits(members, "item", m = 1000000),
        nonMembers, "item", m = 1000000)
      .filter(col("might_contain")).count()
    assert(generous == 0L)
  }

  test("replay: watermark no-op AND idempotent even bypassed") {
    import spark.implicits._
    freshTable()
    def part(i: Int) = members.filter(pmod($"id", lit(3)) === i)
    IncrementalBloom.applyBatch(spark, table, part(0), "item", 0L)
    val before = IncrementalBloom.readBits(spark, table).collect()
      .map(_.getLong(0)).toSet
    // same id: skipped wholesale
    IncrementalBloom.applyBatch(spark, table, part(0), "item", 0L)
    assert(IncrementalBloom.readBits(spark, table).collect()
      .map(_.getLong(0)).toSet == before)
    // bypassed watermark (same content under a NEW id): set union is
    // idempotent, bits cannot drift — the HLL-class second layer
    IncrementalBloom.applyBatch(spark, table, part(0), "item", 99L)
    assert(IncrementalBloom.readBits(spark, table).collect()
      .map(_.getLong(0)).toSet == before)
  }
}
