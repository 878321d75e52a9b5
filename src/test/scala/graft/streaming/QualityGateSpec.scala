package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming quality gate: per-rule split, audit evidence on rejects,
  * replay idempotence on both tables. */
class QualityGateSpec extends SparkSpec {

  private def doc(n: Int, stop: Boolean = true): String = {
    val filler = Seq.tabulate(n)(i => s"word$i")
    (if (stop) "the of " else "") + filler.mkString(" ")
  }

  test("gate stream splits by rule battery; replay lands exactly once") {
    import spark.implicits._
    Seq("qg_ok", "qg_bad").foreach(CdcMerge.dropStateTable(spark, _))
    val src = tmpDir("qg-src")
    val batch1 = Seq(
      (1L, doc(60)),               // passes everything
      (2L, doc(5)))                // too short → rejected
    val batch2 = Seq(
      (3L, doc(70)),               // passes
      (4L, doc(60, stop = false))) // no stopwords → rejected
    batch1.toDF("doc_id", "text").coalesce(1).write.parquet(s"$src/f1")
    batch2.toDF("doc_id", "text").coalesce(1).write.parquet(s"$src/f2")
    val stream = spark.readStream
      .schema(batch1.toDF("doc_id", "text").schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.parquet")
      .parquet(src)
    val q = QualityGate.startGateStream(stream, "qg_ok", "qg_bad",
      tmpDir("qg-ck"))
    try q.awaitTermination() finally q.stop()

    // accepted rows keep the input schema (+ _batch_id)
    assert(spark.table("qg_ok").select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    assert(spark.table("qg_ok").columns.sorted.toSeq ==
      Seq("_batch_id", "doc_id", "text"))
    // rejects carry the per-rule audit
    val bad = spark.table("qg_bad").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("pass_len"), r.getAs[Boolean]("pass_stop")))
      .toMap
    assert(bad.keySet == Set(2L, 4L))
    assert(bad(2L)._1 == false) // killed by length
    assert(bad(4L)._2 == false) // killed by stopword floor
    // replayed batch overwrites its own partition: no duplicates
    val okBefore = spark.table("qg_ok").collect().toSet
    val badBefore = spark.table("qg_bad").collect().toSet
    val (ok2, bad2) = QualityGate.split(batch2.toDF("doc_id", "text"))
    graft.operators.SchemaDrift.writeBatchIdempotent(ok2, "qg_ok", 1L)
    graft.operators.SchemaDrift.writeBatchIdempotent(bad2, "qg_bad", 1L)
    assert(spark.table("qg_ok").collect().toSet == okBefore)
    assert(spark.table("qg_bad").collect().toSet == badBefore)
  }
}
