package graft.streaming

import graft.SparkSpec
import graft.operators.DedupOps
import org.apache.spark.sql.functions._

/** IncrementalCC: batched label maintenance equals one-shot connected
  * components; cross-batch merges relabel existing members; replays
  * (by watermark AND by content) change nothing. */
class IncrementalCCSpec extends SparkSpec {

  private val table = "ccspec_labels"

  private def freshTable(): Unit =
    IncrementalCC.dropTables(spark, table)

  private def labels(): Map[Long, Long] =
    IncrementalCC.readLabels(spark, table).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("arbitrary batching equals one-shot CC; order cannot matter") {
    import spark.implicits._
    freshTable()
    // two chains and a triangle, pairs deliberately interleaved so
    // every batch touches several clusters and merges span batches
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), // chain 1-2-3-4
      (10L, 11L), (11L, 12L),       // chain 10-11-12
      (20L, 21L), (21L, 22L), (20L, 22L)) // triangle
      .toDF("doc_a", "doc_b")
    def part(i: Int) =
      pairs.filter(pmod($"doc_a" + $"doc_b", lit(3)) === i)
    (0 to 2).foreach(i =>
      IncrementalCC.applyBatch(spark, table, part(i), i.toLong))
    val oneShot = DedupOps.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels() == oneShot)
    assert(oneShot.values.toSet == Set(1L, 10L, 20L))
  }

  test("cross-batch merge relabels existing members") {
    import spark.implicits._
    freshTable()
    IncrementalCC.applyBatch(spark, table,
      Seq((5L, 6L)).toDF("doc_a", "doc_b"), 0L)
    IncrementalCC.applyBatch(spark, table,
      Seq((7L, 8L)).toDF("doc_a", "doc_b"), 1L)
    assert(labels() == Map(5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 7L))
    // the bridge pair merges BOTH existing clusters: every member of
    // {7,8} must relabel to the global min 5
    IncrementalCC.applyBatch(spark, table,
      Seq((6L, 7L)).toDF("doc_a", "doc_b"), 2L)
    assert(labels() == Map(5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 5L))
  }

  test("replay under the same or a new batch id is a content no-op") {
    import spark.implicits._
    freshTable()
    val batch = Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
    IncrementalCC.applyBatch(spark, table, batch, 0L)
    val before = spark.table(table).collect().toSet
    // same id redelivered: endpoints already share components →
    // self-edges only → both upserts empty, bytes untouched
    IncrementalCC.applyBatch(spark, table, batch, 0L)
    assert(spark.table(table).collect().toSet == before)
    // same pairs under a NEW id: also a content no-op — the
    // at-least-once convergence claim needs no watermark at all
    IncrementalCC.applyBatch(spark, table, batch, 1L)
    assert(spark.table(table).collect().toSet == before)
    assert(labels() == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("inverted index prunes the relabel scan; crash order is safe") {
    import spark.implicits._
    freshTable()
    // two clusters in far-apart buckets, then a bridge pair
    IncrementalCC.applyBatch(spark, table,
      Seq((1L, 2L), (50L, 51L)).toDF("doc_a", "doc_b"), 0L)
    val idx = IncrementalCC.indexTable(table)
    // index lists, per component, exactly the label-table buckets
    // holding its members (the pruning contract)
    def idxMap(): Map[Long, Set[Long]] = spark.table(idx)
      .select($"component", $"kbs").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val trueKbs = spark.table(table)
      .groupBy($"component").agg(collect_set($"_kb").as("kbs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
      .toMap
    assert(idxMap() == trueKbs)
    // merge: survivor's set must absorb the absorbed component's set
    IncrementalCC.applyBatch(spark, table,
      Seq((2L, 50L)).toDF("doc_a", "doc_b"), 1L)
    assert(labels() == Map(1L -> 1L, 2L -> 1L, 50L -> 1L, 51L -> 1L))
    val after = idxMap()
    assert(after(1L) == trueKbs(1L) ++ trueKbs(50L),
      "survivor set must be the union of the merged sets")
    // the absorbed component's stale entry may remain (never looked
    // up again — no doc maps to it); the SURVIVOR set is what must
    // cover every member bucket
    val memberKbs = spark.table(table)
      .filter($"component" === 1L).select($"_kb").collect()
      .map(_.getLong(0)).toSet
    assert(memberKbs.subsetOf(after(1L)))
  }

  test("pre-index table migrates: index rebuilt once, then maintained") {
    import spark.implicits._
    freshTable()
    IncrementalCC.applyBatch(spark, table,
      Seq((3L, 4L), (8L, 9L)).toDF("doc_a", "doc_b"), 0L)
    // simulate a table created by the pre-index code
    CdcMerge.dropStateTable(spark,
      IncrementalCC.indexTable(table))
    IncrementalCC.applyBatch(spark, table,
      Seq((4L, 8L)).toDF("doc_a", "doc_b"), 1L)
    assert(labels() == Map(3L -> 3L, 4L -> 3L, 8L -> 3L, 9L -> 3L))
    assert(spark.catalog.tableExists(IncrementalCC.indexTable(table)))
  }

  test("new doc joining an existing cluster adopts its label") {
    import spark.implicits._
    freshTable()
    IncrementalCC.applyBatch(spark, table,
      Seq((2L, 3L)).toDF("doc_a", "doc_b"), 0L)
    IncrementalCC.applyBatch(spark, table,
      Seq((3L, 9L), (40L, 41L)).toDF("doc_a", "doc_b"), 1L)
    assert(labels() == Map(2L -> 2L, 3L -> 2L, 9L -> 2L,
      40L -> 40L, 41L -> 40L))
    // a new doc with a SMALLER id than the cluster min drags the
    // whole cluster's label down
    IncrementalCC.applyBatch(spark, table,
      Seq((1L, 9L)).toDF("doc_a", "doc_b"), 2L)
    assert(labels() == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L,
      40L -> 40L, 41L -> 40L))
  }
}
