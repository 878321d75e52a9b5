package graft.streaming

import graft.SparkSpec
import graft.operators.DedupOps
import org.apache.spark.sql.functions._

/** IncrementalSpans (append-shaped fold): batched fold == one-shot
  * span-level report; replay is a no-op (watermark) and stays
  * idempotent through the crash window (generation overwrite); a fold
  * APPENDS — existing files are never rewritten; compaction folds
  * generations without changing the report; nBuckets drift fails
  * fast. */
class IncrementalSpansSpec extends SparkSpec {

  private val table = "spanspec_grid"

  private def freshTable(): Unit =
    IncrementalSpans.tables(table)
      .foreach(CdcMerge.dropStateTable(spark, _))

  // groups of 4 docs share an 8-token template plus unique filler
  private def docs = {
    import spark.implicits._
    (0L until 24L).map { i =>
      val g = i % 6
      val filler = (0 until 6).map(j => s"u${i}_$j").mkString(" ")
      val tmpl = (0 until 8).map(j => s"g${g}_$j").mkString(" ")
      (i, s"$filler $tmpl")
    }.toDF("doc_id", "text")
  }

  private def oneShot = DedupOps.repeatedSpans(docs, spanLen = 8)
    .groupBy("span_key")
    .agg(max("n_docs").as("n_docs"), max("n_occ").as("n_occ"))
    .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    .toSet

  private def report() = IncrementalSpans.spanReport(spark, table)
    .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    .toSet

  test("batched fold == one-shot span report; replay no-op; crash-" +
      "window replay idempotent") {
    import spark.implicits._
    freshTable()
    def part(i: Int) = docs.filter(pmod($"doc_id", lit(3)) === i)
    (0 to 2).foreach(i =>
      IncrementalSpans.applyBatch(spark, table, part(i), batchId = i))
    val before = report()
    assert(before == oneShot && before.nonEmpty)
    // clean replay: the watermark short-circuits before any job
    IncrementalSpans.applyBatch(spark, table, part(1), batchId = 1)
    assert(report() == before)
    // CRASH-WINDOW replay: batch 2's grid write landed but its
    // watermark write was lost (rewound to batch 1), so the fold
    // re-runs — the generation overwrite of the batch's own _b
    // subtree must replace, not duplicate, its rows
    TableSwap.writeStaged(spark, Seq(1L).toDF("_batch"),
      s"${table}_wm")
    IncrementalSpans.applyBatch(spark, table, part(2), batchId = 2)
    assert(report() == before)
  }

  test("a fold APPENDS: existing grid files are never rewritten") {
    import spark.implicits._
    freshTable()
    IncrementalSpans.applyBatch(spark, table, docs, batchId = 0,
      nBuckets = 16)
    val filesBefore = spark.table(table).inputFiles.toSet
    // a trickle doc with MANY distinct fresh spans — the uniform-hash
    // worst case that made the merge-shaped grid rewrite every
    // bucket: 33 spans over 40 tokens hash across ~all 16 buckets,
    // yet the append fold must leave every existing file untouched
    val trickle = Seq((100L,
      (0 until 40).map(j => s"z_$j").mkString(" ")))
      .toDF("doc_id", "text")
    IncrementalSpans.applyBatch(spark, table, trickle, batchId = 1,
      nBuckets = 16)
    val filesAfter = spark.table(table).inputFiles.toSet
    assert(filesBefore.subsetOf(filesAfter),
      s"append fold rewrote ${(filesBefore -- filesAfter).size} " +
        "existing files")
    assert((filesAfter -- filesBefore).nonEmpty)
    assert(report().nonEmpty)
  }

  test("compact folds generations; report unchanged") {
    import spark.implicits._
    freshTable()
    def part(i: Int) = docs.filter(pmod($"doc_id", lit(3)) === i)
    (0 to 2).foreach(i =>
      IncrementalSpans.applyBatch(spark, table, part(i), batchId = i,
        nBuckets = 8))
    val before = report()
    val gensBefore = spark.table(table).select("_b").distinct().count()
    assert(gensBefore == 3)
    IncrementalSpans.compact(spark, table)
    assert(spark.table(table).select("_b").distinct().count() == 1)
    assert(report() == before)
    // post-compaction fold still works and still skips folded batches
    IncrementalSpans.applyBatch(spark, table, part(1), batchId = 1,
      nBuckets = 8)
    assert(report() == before)
  }

  test("compactBuckets folds ONLY fragmented buckets: report and " +
      "removalView unchanged, selected buckets drop to one live " +
      "partition, UNSELECTED buckets' files are byte-identical, " +
      "re-run is a no-op") {
    import spark.implicits._
    freshTable()
    // base batch covers every bucket; three 9-token trickle batches
    // (2 spans each) fragment only the few buckets their spans hash to
    IncrementalSpans.applyBatch(spark, table, docs, batchId = 0,
      nBuckets = 16)
    (1 to 3).foreach { i =>
      val trickle = Seq((100L + i,
        (0 until 9).map(j => s"t${i}_$j").mkString(" ")))
        .toDF("doc_id", "text")
      IncrementalSpans.applyBatch(spark, table, trickle, batchId = i,
        nBuckets = 16)
    }
    val before = report()
    val viewBefore = IncrementalSpans.removalView(spark, table, docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    def bucketFiles(): Map[Long, Set[String]] = spark.table(table)
      .inputFiles.toSeq.groupBy(f =>
        "_kb=([0-9]+)".r.findFirstMatchIn(f).get.group(1).toLong)
      .map { case (k, fs) => k -> fs.toSet }
    val filesBefore = bucketFiles()
    // minParts=3: only buckets holding base + ≥2 trickle generations
    val compacted = IncrementalSpans.compactBuckets(spark, table,
      minParts = 3)
    assert(compacted.nonEmpty &&
      compacted.size < filesBefore.size,
      s"expected a strict subset of buckets, got $compacted of " +
        s"${filesBefore.size}")
    val filesAfter = bucketFiles()
    filesBefore.keys.filterNot(compacted.contains).foreach { kb =>
      assert(filesAfter(kb) == filesBefore(kb),
        s"untouched bucket $kb was rewritten")
    }
    compacted.foreach { kb =>
      assert(filesAfter(kb).size == 1,
        s"compacted bucket $kb holds ${filesAfter(kb).size} files")
    }
    assert(report() == before)
    assert(IncrementalSpans.removalView(spark, table, docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet == viewBefore)
    // convergence: nothing fragmented remains at this threshold
    assert(IncrementalSpans.compactBuckets(spark, table,
      minParts = 3).isEmpty)
    // post-compaction folds and whole-grid compact still work
    IncrementalSpans.applyBatch(spark, table,
      Seq((200L, (0 until 9).map(j => s"p_$j").mkString(" ")))
        .toDF("doc_id", "text"), batchId = 4, nBuckets = 16)
    IncrementalSpans.compact(spark, table)
    assert(spark.table(table).select("_b").distinct().count() == 1)
  }

  test("compactBuckets crash window: the merged partition lands but " +
      "the source drops are lost — reads stay exact throughout " +
      "(shadowing), and the next run converges") {
    import spark.implicits._
    freshTable()
    def part(i: Int) = docs.filter(pmod($"doc_id", lit(3)) === i)
    (0 to 2).foreach(i =>
      IncrementalSpans.applyBatch(spark, table, part(i), batchId = i,
        nBuckets = 8))
    val before = report()
    // simulate the crash state compactBuckets can leave: bucket 0's
    // merged partition written (coverage = fence 2), its shadowed
    // sources NOT dropped
    val merged = spark.table(table).filter(col("_kb") === 0)
      .groupBy("span_key", "doc_id").agg(sum("n_occ").as("n_occ"))
    merged.localCheckpoint().createOrReplaceTempView("spanspec_crash_src")
    spark.sql(s"INSERT OVERWRITE TABLE $table " +
      "PARTITION (_b='-3', _kb='0') " +
      "SELECT span_key, doc_id, n_occ FROM spanspec_crash_src")
    spark.catalog.dropTempView("spanspec_crash_src")
    spark.catalog.refreshTable(table)
    // duplicated rows exist on disk; resolved shadowing hides them
    assert(report() == before)
    // the next run detects the leftovers and converges
    IncrementalSpans.compactBuckets(spark, table, minParts = 2)
    assert(report() == before)
    val bucket0Parts = spark.sql(s"SHOW PARTITIONS $table").collect()
      .map(_.getString(0)).count(_.endsWith("_kb=0"))
    assert(bucket0Parts == 1, s"bucket 0 holds $bucket0Parts parts")
  }

  test("compactBuckets ADVANCES the _rep summary incrementally first " +
      "(∝ residual, no grid-sized job): the late second owner of a " +
      "compacted singleton lands in the summary, the serve stays " +
      "exact and ∝-repeated-mass through bucket compaction") {
    import spark.implicits._
    val t4 = "spanspec_grid_adv"
    IncrementalSpans.tables(t4)
      .foreach(CdcMerge.dropStateTable(spark, _))
    val tmpl = (0 until 8).map(j => s"A_$j").mkString(" ")
    val single = (0 until 8).map(j => s"B_$j").mkString(" ")
    val b0 = Seq(
      (0L, s"a_1 a_2 a_3 $tmpl"),
      (1L, s"b_1 b_2 b_3 $tmpl"),
      (2L, s"c_1 c_2 c_3 $single")).toDF("doc_id", "text")
    IncrementalSpans.applyBatch(spark, t4, b0, batchId = 0,
      nBuckets = 8)
    IncrementalSpans.compact(spark, t4) // summary born at gen 0
    // two post-summary batches: doc 3 makes `single` repeated ACROSS
    // the summary boundary (the case-2 shape advanceRepSummary must
    // point-probe), doc 4 is fresh noise
    IncrementalSpans.applyBatch(spark, t4,
      Seq((3L, s"d_1 d_2 d_3 $single")).toDF("doc_id", "text"),
      batchId = 1, nBuckets = 8)
    IncrementalSpans.applyBatch(spark, t4,
      Seq((4L, (0 until 12).map(j => s"n_$j").mkString(" ")))
        .toDF("doc_id", "text"),
      batchId = 2, nBuckets = 8)
    IncrementalSpans.compactBuckets(spark, t4, minParts = 2)
    // summary advanced to the fence without a full compact
    assert(CdcMerge.tableProp(spark, s"${t4}_rep", "graft.repgen")
      .contains("2"))
    val all = b0.unionByName(
      Seq((3L, s"d_1 d_2 d_3 $single"),
        (4L, (0 until 12).map(j => s"n_$j").mkString(" ")))
        .toDF("doc_id", "text"))
    val served = IncrementalSpans.removalView(spark, t4, all)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    val oneShotAll = DedupOps.removeRepeatedSpans(all, spanLen = 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(served == oneShotAll)
    // the cross-boundary repeat specifically (both owners cut)
    assert(served.contains((2L, "c_1 c_2 c_3", 8L)))
    assert(served.contains((3L, "d_1 d_2 d_3", 8L)))
    // and the summary itself holds the late repeat: the serve's
    // residual above the advanced generation is EMPTY, so the cut
    // can only have come from the summary
    assert(spark.table(t4).filter(col("_b") > 2).count() == 0)
    IncrementalSpans.tables(t4)
      .foreach(CdcMerge.dropStateTable(spark, _))
  }

  test("compactBuckets is FENCED on the committed watermark: an open " +
      "crash window's generation is left alone, and its re-delivery " +
      "lands cleanly beside the compacted partition") {
    import spark.implicits._
    freshTable()
    def part(i: Int) = docs.filter(pmod($"doc_id", lit(3)) === i)
    (0 to 2).foreach(i =>
      IncrementalSpans.applyBatch(spark, table, part(i), batchId = i,
        nBuckets = 8))
    val committedAll = report()
    // reopen batch 2's crash window
    TableSwap.writeStaged(spark, Seq(1L).toDF("_batch"),
      s"${table}_wm")
    IncrementalSpans.compactBuckets(spark, table, minParts = 2)
    // generation 2 must survive uncompacted (its replay will
    // overwrite _b=2, which must not be inside a compacted partition)
    assert(spark.sql(s"SHOW PARTITIONS $table").collect()
      .map(_.getString(0)).exists(_.startsWith("_b=2/")))
    // re-deliver the in-flight batch: full state serves again
    IncrementalSpans.applyBatch(spark, table, part(2), batchId = 2,
      nBuckets = 8)
    assert(report() == committedAll)
  }

  test("removalView == one-shot removeRepeatedSpans; a LATE repeat " +
      "cuts an EARLY doc") {
    import spark.implicits._
    freshTable()
    def part(i: Int) = docs.filter(pmod($"doc_id", lit(3)) === i)
    (0 to 2).foreach(i =>
      IncrementalSpans.applyBatch(spark, table, part(i), batchId = i))
    def viewRows(d: org.apache.spark.sql.DataFrame) =
      IncrementalSpans.removalView(spark, table, d)
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getLong(2))).toSet
    val oneShot = DedupOps.removeRepeatedSpans(docs, spanLen = 8)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2))).toSet
    assert(viewRows(docs) == oneShot)

    // the case a per-batch one-shot gets WRONG: the early doc's
    // template is unique when IT arrives; only a later batch makes
    // it repeated — the view must cut it then (the grid remembers)
    val t2 = "spanspec_grid_late"
    IncrementalSpans.tables(t2)
      .foreach(CdcMerge.dropStateTable(spark, _))
    val tmpl = (0 until 8).map(j => s"T_$j").mkString(" ")
    val early = Seq((0L, s"e_1 e_2 e_3 $tmpl")).toDF("doc_id", "text")
    val late = Seq((1L, s"l_1 l_2 l_3 $tmpl")).toDF("doc_id", "text")
    def earlyView() = IncrementalSpans
      .removalView(spark, t2, early).collect()
      .map(r => (r.getString(1), r.getLong(2))).head
    IncrementalSpans.applyBatch(spark, t2, early, batchId = 0)
    assert(earlyView() == ((s"e_1 e_2 e_3 $tmpl", 0L))) // nothing yet
    IncrementalSpans.applyBatch(spark, t2, late, batchId = 1)
    assert(earlyView() == (("e_1 e_2 e_3", 8L))) // late repeat cut
    IncrementalSpans.tables(t2)
      .foreach(CdcMerge.dropStateTable(spark, _))
  }

  test("after compact, removalView serves from the _rep summary + " +
      "residual generations — and still catches the LATE SECOND " +
      "OWNER of a compacted singleton (case 2: one owner compacted, " +
      "one residual, key absent from the summary)") {
    import spark.implicits._
    val t3 = "spanspec_grid_rep"
    IncrementalSpans.tables(t3)
      .foreach(CdcMerge.dropStateTable(spark, _))
    val tmpl = (0 until 8).map(j => s"R_$j").mkString(" ")
    val single = (0 until 8).map(j => s"Q_$j").mkString(" ")
    // batch 0: tmpl repeated (docs 0,1) — lands in the summary;
    // `single` owned once (doc 2) — a compacted singleton
    val b0 = Seq(
      (0L, s"a_1 a_2 a_3 $tmpl"),
      (1L, s"b_1 b_2 b_3 $tmpl"),
      (2L, s"c_1 c_2 c_3 $single")).toDF("doc_id", "text")
    IncrementalSpans.applyBatch(spark, t3, b0, batchId = 0)
    IncrementalSpans.compact(spark, t3)
    assert(spark.catalog.tableExists(s"${t3}_rep"))
    // batch 1 (post-compact, residual): doc 3 repeats `single` —
    // repeated only ACROSS the summary boundary
    val b1 = Seq((3L, s"d_1 d_2 d_3 $single")).toDF("doc_id", "text")
    IncrementalSpans.applyBatch(spark, t3, b1, batchId = 1)
    val all = b0.unionByName(b1)
    val served = IncrementalSpans.removalView(spark, t3, all)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    val oneShot = DedupOps.removeRepeatedSpans(all, spanLen = 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(served == oneShot)
    // the case-2 cuts specifically: both owners of `single` lost it
    assert(served.contains((2L, "c_1 c_2 c_3", 8L)))
    assert(served.contains((3L, "d_1 d_2 d_3", 8L)))
    // and the probeCap fallback path returns the same answer
    val servedFb = IncrementalSpans.removalView(spark, t3, all,
        probeCap = 0)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(servedFb == oneShot)
    // a second compact folds the residual into the summary; the
    // serve stays exact and the probe set empties
    IncrementalSpans.compact(spark, t3)
    val served2 = IncrementalSpans.removalView(spark, t3, all)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(served2 == oneShot)
    IncrementalSpans.tables(t3)
      .foreach(CdcMerge.dropStateTable(spark, _))
  }

  test("serve paths are SNAPSHOT-CONSISTENT: an open crash window's " +
      "generation (grid written, watermark not) is invisible to " +
      "spanReport and removalView until its batch commits") {
    import spark.implicits._
    freshTable()
    def part(i: Int) = docs.filter(pmod($"doc_id", lit(3)) === i)
    IncrementalSpans.applyBatch(spark, table, part(0), batchId = 0)
    val afterB0 = report()
    IncrementalSpans.applyBatch(spark, table, part(1), batchId = 1)
    val afterB1 = report()
    assert(afterB1 != afterB0)
    // reopen batch 1's crash window: its generation is on disk but
    // the watermark is rewound to batch 0 — serves must show the
    // PRE-batch state, not batch 1's deltas against batch 0's state
    TableSwap.writeStaged(spark, Seq(0L).toDF("_batch"),
      s"${table}_wm")
    assert(report() == afterB0)
    // re-deliver (commit) batch 1: the full state serves again
    IncrementalSpans.applyBatch(spark, table, part(1), batchId = 1)
    assert(report() == afterB1)

    // removalView honors the same snapshot: the late-repeat cut
    // appears only once the late batch COMMITS
    val t2 = "spanspec_grid_snap"
    IncrementalSpans.tables(t2)
      .foreach(CdcMerge.dropStateTable(spark, _))
    val tmpl = (0 until 8).map(j => s"S_$j").mkString(" ")
    val early = Seq((0L, s"e_1 e_2 e_3 $tmpl")).toDF("doc_id", "text")
    val late = Seq((1L, s"l_1 l_2 l_3 $tmpl")).toDF("doc_id", "text")
    def earlyCut() = IncrementalSpans
      .removalView(spark, t2, early).collect()
      .map(r => r.getLong(2)).head
    IncrementalSpans.applyBatch(spark, t2, early, batchId = 0)
    IncrementalSpans.applyBatch(spark, t2, late, batchId = 1)
    assert(earlyCut() == 8L)
    TableSwap.writeStaged(spark, Seq(0L).toDF("_batch"), s"${t2}_wm")
    assert(earlyCut() == 0L) // batch 1 uncommitted → no cut yet
    IncrementalSpans.applyBatch(spark, t2, late, batchId = 1)
    assert(earlyCut() == 8L)
    IncrementalSpans.tables(t2)
      .foreach(CdcMerge.dropStateTable(spark, _))
  }

  test("nBuckets drift fails fast") {
    freshTable()
    IncrementalSpans.applyBatch(spark, table, docs, batchId = 0,
      nBuckets = 8)
    val e = intercept[IllegalArgumentException] {
      IncrementalSpans.applyBatch(spark, table,
        docs.limit(0), batchId = 1, nBuckets = 16)
    }
    assert(e.getMessage.contains("nBuckets"))
  }

  test("spanLen drift fails fast on fold AND on removalView (a " +
      "drifted spanLen probes a disjoint md5 keyspace silently)") {
    freshTable()
    IncrementalSpans.applyBatch(spark, table, docs, batchId = 0,
      spanLen = 8)
    val e = intercept[IllegalArgumentException] {
      IncrementalSpans.applyBatch(spark, table, docs.limit(0),
        batchId = 1, spanLen = 10)
    }
    assert(e.getMessage.contains("spanLen"))
    val e2 = intercept[IllegalArgumentException] {
      IncrementalSpans.removalView(spark, table, docs, spanLen = 10)
    }
    assert(e2.getMessage.contains("spanLen"))
  }

  test("compact REFUSES while a batch's crash window is open (its " +
      "replay would overwrite the compacted generation)") {
    import spark.implicits._
    freshTable()
    def part(i: Int) = docs.filter(pmod($"doc_id", lit(3)) === i)
    (0 to 1).foreach(i =>
      IncrementalSpans.applyBatch(spark, table, part(i), batchId = i))
    val before = report()
    // simulate the crash window: grid holds _b=1 but the watermark
    // write was lost (rewound to batch 0)
    TableSwap.writeStaged(spark, Seq(0L).toDF("_batch"),
      s"${table}_wm")
    val e = intercept[IllegalArgumentException] {
      IncrementalSpans.compact(spark, table)
    }
    assert(e.getMessage.contains("crash window"))
    // re-deliver the in-flight batch (idempotent), then compact works
    IncrementalSpans.applyBatch(spark, table, part(1), batchId = 1)
    IncrementalSpans.compact(spark, table)
    assert(report() == before)
    // and the fenced danger is real no more: replaying batch 1 after
    // compaction is a watermark no-op
    IncrementalSpans.applyBatch(spark, table, part(1), batchId = 1)
    assert(report() == before)
  }

  test("a crash between compact's renames is recovered: the grid " +
      "comes back (with its lifetime properties) instead of being " +
      "silently recreated one-batch-sized") {
    import spark.implicits._
    freshTable()
    def part(i: Int) = docs.filter(pmod($"doc_id", lit(3)) === i)
    (0 to 1).foreach(i =>
      IncrementalSpans.applyBatch(spark, table, part(i), batchId = i,
        nBuckets = 8))
    val before = report()
    // simulate a crash after rename(grid -> old) and before
    // rename(compacting -> grid): stage the compacted copy, then
    // rename the grid away
    spark.table(table)
      .write.mode("overwrite").format("parquet")
      .partitionBy("_b", "_kb").saveAsTable(s"${table}_compacting")
    CdcMerge.setNBuckets(spark, s"${table}_compacting", 8)
    CdcMerge.setTableProp(spark, s"${table}_compacting",
      "graft.spanlen", "8")
    spark.sql(s"ALTER TABLE $table RENAME TO ${table}_old")
    // any entry point recovers: the report is intact...
    assert(report() == before)
    // ...the lifetime guards still fire (properties survived)...
    val e = intercept[IllegalArgumentException] {
      IncrementalSpans.applyBatch(spark, table, docs.limit(0),
        batchId = 2, nBuckets = 16)
    }
    assert(e.getMessage.contains("nBuckets"))
    // ...and folding continues where the watermark left off
    IncrementalSpans.applyBatch(spark, table, part(2), batchId = 2,
      nBuckets = 8)
    assert(report() == oneShot)
  }
}
