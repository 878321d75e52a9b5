package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Schema drift: report classification, quarantine split, widened
  * typed view with old readers unaffected. */
class SchemaDriftSpec extends SparkSpec {

  private lazy val rows = {
    import spark.implicits._
    Seq(
      (1L, """{"k":1}"""),
      (2L, """{"k":2,"surge":true}"""),
      (3L, """{"ts_ms":333}"""),
      (4L, """{"k":4}""")).toDF("id", "content")
  }

  test("driftReport classifies declared, new and missing keys") {
    val got = SchemaDrift
      .driftReport(rows, "content", Seq("k", "user_agent"))
      .orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq(
      ("k", 3L, "declared"),
      ("surge", 1L, "new"),
      ("ts_ms", 1L, "new"),
      ("user_agent", 0L, "missing")))
  }

  test("quarantine splits drifted rows; clean rows keep their schema") {
    val (clean, bad) = SchemaDrift.quarantine(rows, "content", Seq("k"))
    assert(clean.select("id").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 4L))
    assert(clean.columns.toSeq == rows.columns.toSeq)
    val badKeys = bad.select(explode(col("undeclared_keys")))
      .collect().map(_.getString(0)).sorted
    assert(badKeys.toSeq == Seq("surge", "ts_ms"))
  }

  test("monitorStream reports drift within the batch it appears in") {
    import spark.implicits._
    graft.streaming.CdcMerge.dropStateTable(spark, "drift_reports")
    val src = tmpDir("drift-src")
    // batch 1: clean; batch 2: a new key appears upstream
    Seq((1L, """{"k":1}"""), (2L, """{"k":2}"""))
      .toDF("id", "content").coalesce(1).write.parquet(s"$src/f1")
    Seq((3L, """{"k":3,"surge":true}"""))
      .toDF("id", "content").coalesce(1).write.parquet(s"$src/f2")
    val stream = spark.readStream
      .schema(rows.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.parquet")
      .parquet(src)
    val q = SchemaDrift.monitorStream(stream, "content", Seq("k"),
      "drift_reports", tmpDir("drift-ck"))
    try q.awaitTermination() finally q.stop()
    val reports = spark.table("drift_reports")
    // one report row per (batch, key); the new key surfaces in exactly
    // one batch's report, flagged new
    assert(reports.select("_batch_id").distinct().count() == 2)
    val surge = reports.filter($"key" === "surge").collect()
    assert(surge.length == 1 &&
      surge(0).getAs[String]("status") == "new")
    // declared key reported in every batch
    assert(reports.filter($"key" === "k" && $"status" === "declared")
      .count() == 2)
  }

  test("monitor report write is idempotent under batch replay") {
    import spark.implicits._
    graft.streaming.CdcMerge.dropStateTable(spark, "drift_replay")
    def report(df: org.apache.spark.sql.DataFrame) =
      SchemaDrift.driftReport(df, "content", Seq("k"))
    val b0 = Seq((1L, """{"k":1}""")).toDF("id", "content")
    val b1 = Seq((2L, """{"k":2,"surge":true}""")).toDF("id", "content")
    SchemaDrift.writeBatchIdempotent(report(b0), "drift_replay", 0L)
    SchemaDrift.writeBatchIdempotent(report(b1), "drift_replay", 1L)
    val before = spark.table("drift_replay").collect().toSet
    // crash-before-offset-commit: batch 1 is REPLAYED with identical
    // content — the write must overwrite its own partition, not append
    // duplicate rows that double per-key n_events
    SchemaDrift.writeBatchIdempotent(report(b1), "drift_replay", 1L)
    assert(spark.table("drift_replay").collect().toSet == before)
    assert(spark.table("drift_replay")
      .groupBy("key", "_batch_id").count()
      .filter($"count" > 1).count() == 0)
  }

  test("quarantine stream: clean/dead-letter split, replay-idempotent") {
    import spark.implicits._
    Seq("dlq_clean", "dlq_bad").foreach(
      graft.streaming.CdcMerge.dropStateTable(spark, _))
    val src = tmpDir("dlq-src")
    Seq((1L, """{"k":1}"""), (2L, """{"k":2}"""))
      .toDF("id", "content").coalesce(1).write.parquet(s"$src/f1")
    Seq((3L, """{"k":3,"surge":true}"""), (4L, """{"k":4}"""))
      .toDF("id", "content").coalesce(1).write.parquet(s"$src/f2")
    val stream = spark.readStream
      .schema(rows.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.parquet")
      .parquet(src)
    val q = SchemaDrift.startQuarantineStream(stream, "content",
      Seq("k"), "dlq_clean", "dlq_bad", tmpDir("dlq-ck"))
    try q.awaitTermination() finally q.stop()
    // clean rows flow through with the original schema (+_batch_id);
    // the drifted row is held back with its evidence column
    assert(spark.table("dlq_clean").select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 4L))
    val bad = spark.table("dlq_bad").collect()
    assert(bad.map(_.getAs[Long]("id")).toSeq == Seq(3L))
    assert(bad(0).getAs[scala.collection.Seq[String]]("undeclared_keys")
      == Seq("surge"))
    // replay of the drifted batch: both tables unchanged
    val cleanBefore = spark.table("dlq_clean").collect().toSet
    val badBefore = spark.table("dlq_bad").collect().toSet
    val replay = Seq((3L, """{"k":3,"surge":true}"""), (4L, """{"k":4}"""))
      .toDF("id", "content")
    val (c2, b2) = SchemaDrift.quarantine(replay, "content", Seq("k"))
    SchemaDrift.writeBatchIdempotent(c2, "dlq_clean", 1L)
    SchemaDrift.writeBatchIdempotent(b2.drop("has_drift"), "dlq_bad", 1L)
    assert(spark.table("dlq_clean").collect().toSet == cleanBefore)
    assert(spark.table("dlq_bad").collect().toSet == badBefore)
  }

  test("widenedView grows new keys as strings; old readers keep working") {
    val declared = StructType(Seq(StructField("k", IntegerType)))
    val (view, newKeys) = SchemaDrift.widenedView(rows, "content", declared)
    assert(newKeys == Seq("surge", "ts_ms"))
    // declared field keeps its declared type...
    assert(view.schema("k").dataType == IntegerType)
    // ...and an OLD reader's projection is untouched by the widening:
    // same rows as parsing with the pre-drift schema alone
    val oldReader = view.select("id", "k").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1 else r.getInt(1)))
    assert(oldReader.sorted.toSeq ==
      Seq((1L, 1), (2L, 2), (3L, -1), (4L, 4)))
    // new keys parse as nullable strings only where present
    val surge = view.select("id", "surge").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(surge.count(_._2 != null) == 1 &&
      surge.find(_._1 == 2L).get._2 == "true")
  }
}
