package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Bucketed lakehouse sink: layout metadata, no-Exchange read-back
  * joins/aggs, streaming append with batch ids, compaction. */
class LakehouseSinkSpec extends SparkSpec {

  private def noBroadcast[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed write: join AND aggregation read back with no Exchange") {
    LakehouseSink.writeBucketed(
      Tables.load(spark, sf("sf0.001"), "orders"),
      "lh_orders", "o_custkey", 8)
    LakehouseSink.writeBucketed(
      Tables.load(spark, sf("sf0.001"), "customer"),
      "lh_customer", "c_custkey", 8)
    noBroadcast {
      val joined = spark.table("lh_orders")
        .join(spark.table("lh_customer"),
          col("o_custkey") === col("c_custkey"))
      assert(!joined.queryExecution.executedPlan.toString
        .contains("Exchange"), "bucketed join still shuffles")
      assert(joined.count() ==
        Tables.load(spark, sf("sf0.001"), "orders").count())
    }
    // aggregation on the bucket key also reuses the layout
    val agg = spark.table("lh_orders").groupBy("o_custkey")
      .agg(count(lit(1)))
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
      "bucketed aggregation still shuffles")
  }

  test("partitioned+bucketed write: partition pruning in the scan") {
    LakehouseSink.writeBucketed(
      Tables.load(spark, sf("sf0.001"), "orders"),
      "lh_orders_part", "o_custkey", 4, Seq("o_orderstatus"))
    val pruned = spark.table("lh_orders_part")
      .filter(col("o_orderstatus") === "F")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("o_orderstatus"), scan)
    assert(pruned.count() ==
      Tables.load(spark, sf("sf0.001"), "orders")
        .filter(col("o_orderstatus") === "F").count())
  }

  test("streaming append: batches land with _batch_id, layout intact") {
    val src = tmpDir("lh-src")
    Tables.load(spark, sf("sf0.001"), "events")
      .repartition(3).write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(CdcPipeline.eventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(src)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
    val q = LakehouseSink.startBucketedStream(stream, "lh_events",
      "user_id", 4, Nil, tmpDir("lh-ck"))
    try q.awaitTermination() finally q.stop()
    val got = spark.table("lh_events")
    assert(got.count() ==
      Tables.load(spark, sf("sf0.001"), "events").count())
    // one _batch_id per micro-batch (3 source files -> 3 batches)
    assert(got.select("_batch_id").distinct().count() == 3)
    // still a no-Exchange aggregation on the bucket key
    val agg = got.groupBy("user_id").agg(count(lit(1)))
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("repartitionForTarget sizes partitions from plan stats") {
    val orders = Tables.load(spark, sf("sf0.001"), "orders")
    // tiny target -> many partitions; huge target -> one
    val small = LakehouseSink.repartitionForTarget(orders, targetMB = 1)
    val big = LakehouseSink.repartitionForTarget(orders, targetMB = 10000)
    assert(big.rdd.getNumPartitions == 1)
    assert(small.rdd.getNumPartitions >= 1 &&
      small.rdd.getNumPartitions < 1000)
    assert(small.count() == orders.count())
  }

  test("compaction rewrites to minimal files, layout and data preserved") {
    val before = spark.table("lh_events").count()
    val filesBefore = spark.table("lh_events").inputFiles.length
    LakehouseSink.compact(spark, "lh_events", "user_id", 4)
    assert(spark.table("lh_events").count() == before)
    val filesAfter = spark.table("lh_events").inputFiles.length
    assert(filesAfter < filesBefore,
      s"compaction did not reduce files: $filesBefore -> $filesAfter")
    val agg = spark.table("lh_events").groupBy("user_id")
      .agg(count(lit(1)))
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("replayed batch dedups to exactly-once: zero duplicate events") {
    // depends on "streaming append" above having built lh_events;
    // snapshot the clean rows BEFORE the replay (spark.table is lazy)
    val cleanRows = spark.table("lh_events").collect().toSet
    val nClean = cleanRows.size
    // crash-before-checkpoint replay: the batch re-appends with the
    // SAME _batch_id and byte-identical rows
    val replayed = spark.table("lh_events")
      .filter(col("_batch_id") === 1L).collect()
    assert(replayed.nonEmpty)
    val replayDf = spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(replayed: _*)),
      spark.table("lh_events").schema)
    LakehouseSink.writeBucketed(replayDf, "lh_events", "user_id", 4,
      mode = "append")
    val dirty = spark.table("lh_events")
    assert(dirty.count() > nClean, "replay simulation appended nothing")
    val deduped = LakehouseSink.dedupReplayedBatches(
      dirty, Seq("event_id"))
    // zero duplicate keys survive
    assert(deduped.groupBy("event_id").count()
      .filter(col("count") > 1).count() == 0)
    // and the surviving rows are exactly the pre-replay table
    assert(deduped.collect().toSet == cleanRows)
  }

  test("compact swap is staged: recoverable leftovers, no stale tables") {
    import spark.implicits._
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .write.mode("overwrite").bucketBy(2, "k").sortBy("k")
      .saveAsTable("lh_swap")
    // simulate a previous crashed compaction leaving both stages behind
    Seq((9L, "stale")).toDF("k", "v")
      .write.bucketBy(2, "k").sortBy("k").saveAsTable("lh_swap_compacting")
    Seq((8L, "stale")).toDF("k", "v")
      .write.bucketBy(2, "k").sortBy("k").saveAsTable("lh_swap_old")
    LakehouseSink.compact(spark, "lh_swap", "k", 2)
    // data intact under the original name, stale stages cleared
    assert(spark.table("lh_swap").as[(Long, String)].collect().sorted
      .toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    assert(!spark.catalog.tableExists("lh_swap_compacting"))
    assert(!spark.catalog.tableExists("lh_swap_old"))
    // and the swap is re-runnable immediately (idempotent staging)
    LakehouseSink.compact(spark, "lh_swap", "k", 2)
    assert(spark.table("lh_swap").count() == 3)
  }

  test("compact recovers the half-swapped crash state without data loss") {
    import spark.implicits._
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .write.mode("overwrite").bucketBy(2, "k").sortBy("k")
      .saveAsTable("lh_half")
    // crash BETWEEN the two renames: `table` is gone, the original
    // rows live only under _old, the compacted copy under _compacting
    spark.sql("ALTER TABLE lh_half RENAME TO lh_half_old")
    spark.table("lh_half_old")
      .write.bucketBy(2, "k").sortBy("k").saveAsTable("lh_half_compacting")
    assert(!spark.catalog.tableExists("lh_half"))
    // a recovery re-run must restore the name and complete — not drop
    // the only surviving copies
    LakehouseSink.compact(spark, "lh_half", "k", 2)
    assert(spark.table("lh_half").as[(Long, String)].collect().sorted
      .toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    assert(!spark.catalog.tableExists("lh_half_compacting"))
    assert(!spark.catalog.tableExists("lh_half_old"))

    // deeper crash: only _compacting survives (original already
    // renamed away and dropped mid-recovery) — still recoverable
    spark.sql("ALTER TABLE lh_half RENAME TO lh_half_compacting")
    LakehouseSink.compact(spark, "lh_half", "k", 2)
    assert(spark.table("lh_half").count() == 3)

    // nothing to recover from -> explicit failure, not a silent create
    intercept[IllegalStateException] {
      LakehouseSink.compact(spark, "lh_half_missing", "k", 2)
    }
  }

  /** Per-file (min, max) of long column `c` from the parquet footers. */
  private def fileRanges(table: String, c: String): Seq[(Long, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    spark.table(table).inputFiles.toSeq.map { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(f), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val ranges = reader.getFooter.getBlocks.toArray.toSeq.map { b =>
          val cc = b.asInstanceOf[org.apache.parquet.hadoop.metadata
            .BlockMetaData].getColumns.toArray.toSeq
            .map(_.asInstanceOf[org.apache.parquet.hadoop.metadata
              .ColumnChunkMetaData])
            .find(_.getPath.toDotString == c).get
          val st = cc.getStatistics
          (st.genericGetMin.asInstanceOf[Long],
            st.genericGetMax.asInstanceOf[Long])
        }
        (ranges.map(_._1).min, ranges.map(_._2).max)
      } finally reader.close()
    }
  }

  test("clusterBy rewrites files into disjoint ranges that prune scans") {
    import spark.implicits._
    val t = "lh_cluster"
    Seq(t, s"${t}_clustering", s"${t}_old")
      .foreach(CdcMerge.dropStateTable(spark, _))
    // round-robin layout: every file spans ~the full key range
    val rnd = new scala.util.Random(7)
    rnd.shuffle((0L until 1000L).toList).toDF("k")
      .withColumn("payload", col("k") * 17)
      .repartition(4)
      .write.format("parquet").saveAsTable(t)
    def scannedRows(): Long = {
      val df = spark.table(t).filter(col("k") >= 100 && col("k") < 150)
      df.collect()
      val scan = df.queryExecution.executedPlan.collectLeaves().head
      scan.metrics("numOutputRows").value
    }
    val before = fileRanges(t, "k")
    assert(before.forall { case (mn, mx) => mn < 100 && mx >= 900 },
      s"expected overlapping pre-cluster files, got $before")
    val scannedBefore = scannedRows()

    LakehouseSink.clusterBy(spark, t, Seq("k"), nFiles = 4)
    assert(spark.table(t).count() == 1000)
    assert(!spark.catalog.tableExists(s"${t}_clustering"))
    assert(!spark.catalog.tableExists(s"${t}_old"))
    val after = fileRanges(t, "k").sorted
    after.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax < bMin, s"file ranges overlap after clusterBy: $after")
      case _ =>
    }
    // row-group stats now exclude the predicate in all but one file
    val scannedAfter = scannedRows()
    assert(scannedAfter < scannedBefore,
      s"clustering did not prune the scan: $scannedBefore -> $scannedAfter")

    // half-swapped crash state recovers through the shared skeleton
    spark.sql(s"ALTER TABLE $t RENAME TO ${t}_old")
    LakehouseSink.clusterBy(spark, t, Seq("k"), nFiles = 4)
    assert(spark.table(t).count() == 1000)
  }

  test("curriculum reader: clusterBy(sort_key) files are stage-disjoint") {
    import spark.implicits._
    // the doc33 contract end-to-end: curriculumOrder ships ONE BIGINT
    // sort key; the reader service materializes the training order by
    // range-clustering on it — each file then holds a contiguous,
    // pairwise-disjoint slice of the curriculum (stage-major), so a
    // sequential trainer streams files in name-range order and a
    // stage-filtered scan prunes to the matching files, with no
    // global-rank window anywhere
    val t = "lh_curriculum"
    Seq(t, s"${t}_clustering", s"${t}_old")
      .foreach(CdcMerge.dropStateTable(spark, _))
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    graft.operators.CurationOps.curriculumOrder(docs)
      .repartition(4) // round-robin: every file spans ~all stages
      .write.format("parquet").saveAsTable(t)
    val before = fileRanges(t, "sort_key").sorted
    assert(before.sliding(2).exists {
      case Seq((_, aMax), (bMin, _)) => aMax >= bMin
      case _ => false
    }, s"expected overlapping pre-cluster files, got $before")
    LakehouseSink.clusterBy(spark, t, Seq("sort_key"), nFiles = 4)
    val after = fileRanges(t, "sort_key").sorted
    assert(after.size > 1)
    after.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax < bMin,
          s"curriculum file ranges overlap after clusterBy: $after")
      case _ =>
    }
    // content preserved and the order is stage-major: the first file's
    // keys all precede the last file's keys, so stages never interleave
    // across the file sequence
    assert(spark.table(t).count() == docs.count())
    val stages = spark.table(t)
      .select((col("sort_key") / lit(1L << 40)).cast("long").as("stage"))
      .distinct().collect().map(_.getLong(0)).sorted
    assert(stages.length > 1, "need >1 stage for a meaningful ordering")
    // a stage-predicate scan prunes: stage s occupies a contiguous
    // sort_key range, so row-group stats exclude non-matching files
    val lastStage = stages.max
    val dfStage = spark.table(t)
      .filter(col("sort_key") >= lastStage * (1L << 40))
    dfStage.collect()
    val scan = dfStage.queryExecution.executedPlan.collectLeaves().head
    val scanned = scan.metrics("numOutputRows").value
    val total = spark.table(t).count()
    assert(scanned < total,
      s"stage predicate did not prune the clustered scan: $scanned/$total")
  }

  test("zorderBy: files get tight envelopes on BOTH columns; either prunes") {
    import spark.implicits._
    val t = "lh_zorder"
    Seq(t, s"${t}_zordering", s"${t}_old")
      .foreach(CdcMerge.dropStateTable(spark, _))
    // a 64x64 grid of independent (x, y) — shuffled so every pre-
    // rewrite file spans both full ranges
    val rnd = new scala.util.Random(11)
    rnd.shuffle((0L until 4096L).toList).toDF("i")
      .select((col("i") % 64).as("x"), (col("i") / 64).as("y"))
      .repartition(4)
      .write.format("parquet").saveAsTable(t)
    def scanned(c: String): Long = {
      val df = spark.table(t).filter(col(c) >= 10 && col(c) < 14)
      df.collect()
      df.queryExecution.executedPlan.collectLeaves().head
        .metrics("numOutputRows").value
    }
    val (xBefore, yBefore) = (scanned("x"), scanned("y"))

    LakehouseSink.zorderBy(spark, t, "x", "y", nFiles = 16, bits = 6)
    assert(spark.table(t).count() == 4096)
    assert(!spark.catalog.tableExists(s"${t}_zordering"))
    assert(!spark.catalog.tableExists(s"${t}_old"))
    // each of the 16 files covers a z-range of ~256 cells = a 16x16
    // tile (or a few): its x and y envelopes are each a fraction of
    // the domain, so row-group stats prune single-column predicates
    // on EITHER axis — the property lexicographic clustering lacks
    // for the second column
    val (xAfter, yAfter) = (scanned("x"), scanned("y"))
    assert(xAfter < xBefore,
      s"z-order did not prune on x: $xBefore -> $xAfter")
    assert(yAfter < yBefore,
      s"z-order did not prune on y: $yBefore -> $yAfter")
    // contrast: lexicographic clusterBy on (x, y) prunes x but leaves
    // y un-prunable (every file spans the full y range)
    LakehouseSink.clusterBy(spark, t, Seq("x", "y"), nFiles = 16)
    assert(scanned("y") == 4096L,
      "lexicographic files unexpectedly pruned the second column")

    // half-swapped crash state recovers through the shared skeleton
    spark.sql(s"ALTER TABLE $t RENAME TO ${t}_old")
    LakehouseSink.zorderBy(spark, t, "x", "y", nFiles = 16, bits = 6)
    assert(spark.table(t).count() == 4096)
    // constant column degrades gracefully (quantizes to 0, no div-0)
    val tc = "lh_zorder_const"
    Seq(tc, s"${tc}_zordering", s"${tc}_old")
      .foreach(CdcMerge.dropStateTable(spark, _))
    (0L until 10L).toDF("x").withColumn("y", lit(5L))
      .write.format("parquet").saveAsTable(tc)
    LakehouseSink.zorderBy(spark, tc, "x", "y", nFiles = 2, bits = 4)
    assert(spark.table(tc).count() == 10)
  }

  test("zorderByRank: quantile grid keeps pruning under skew where " +
      "min-max collapses") {
    import spark.implicits._
    val t = "lh_zorder_rank"
    Seq(t, s"${t}_zordering", s"${t}_old")
      .foreach(CdcMerge.dropStateTable(spark, _))
    // the same 64x64 grid as the zorderBy test, plus ONE outlier x —
    // min-max quantization then maps every regular x into cell 0 (the
    // range is [0, 1e9]), so the curve degenerates to ordering by y
    // and x predicates stop pruning; quantile grid lines ignore the
    // outlier's LOCATION (it is one row = one quantile step)
    val rnd = new scala.util.Random(13)
    val base = (0L until 4096L).map(i => (i % 64, i / 64))
    val rows = rnd.shuffle((base :+ ((1000000000L, 0L))).toList)
    rows.toDF("x", "y").repartition(4)
      .write.format("parquet").saveAsTable(t)
    def scanned(c: String): Long = {
      val df = spark.table(t).filter(col(c) >= 10 && col(c) < 14)
      df.collect()
      df.queryExecution.executedPlan.collectLeaves().head
        .metrics("numOutputRows").value
    }
    LakehouseSink.zorderBy(spark, t, "x", "y", nFiles = 16, bits = 6)
    val xMinMax = scanned("x")

    LakehouseSink.zorderByRank(spark, t, "x", "y", nFiles = 16, bits = 6)
    assert(spark.table(t).count() == 4097)
    assert(!spark.catalog.tableExists(s"${t}_zordering"))
    assert(!spark.catalog.tableExists(s"${t}_old"))
    val (xRank, yRank) = (scanned("x"), scanned("y"))
    // min-max left x un-prunable (every file spans the full x range);
    // the rank grid restores it, and keeps y pruning too
    assert(xMinMax == 4097L,
      s"expected min-max to collapse under the outlier, scanned $xMinMax")
    assert(xRank < xMinMax, s"rank grid did not prune x: $xRank")
    assert(yRank < 4097L, s"rank grid did not prune y: $yRank")
    // correctness is unchanged by the re-layout
    assert(spark.table(t).filter($"x" >= 10 && $"x" < 14).count() == 256)
  }

  test("clusterBy refuses partitioned/bucketed layouts it would destroy") {
    import spark.implicits._
    // a _kb-partitioned merge state table: rewriting it plain would
    // turn the merge's dynamic partition overwrite into a whole-table
    // overwrite (silent data loss on the next applyBatch)
    val t = "lh_cluster_guard"
    Seq(t, s"${t}_stage").foreach(CdcMerge.dropStateTable(spark, _))
    (1L to 10L).toDF("k").withColumn("_kb", pmod(col("k"), lit(4)))
      .write.format("parquet").partitionBy("_kb").saveAsTable(t)
    val e = intercept[IllegalArgumentException] {
      LakehouseSink.clusterBy(spark, t, Seq("k"), nFiles = 2)
    }
    assert(e.getMessage.contains("_kb"))
    assert(spark.table(t).count() == 10) // untouched
    // bucketed layout refused too
    val tb = "lh_cluster_guard_b"
    CdcMerge.dropStateTable(spark, tb)
    (1L to 10L).toDF("k")
      .write.bucketBy(2, "k").sortBy("k").saveAsTable(tb)
    intercept[IllegalArgumentException] {
      LakehouseSink.clusterBy(spark, tb, Seq("k"), nFiles = 2)
    }
  }

  test("crashed compact leftovers recover and clear through clusterBy") {
    import spark.implicits._
    val t = "lh_cross_service"
    Seq(t, s"${t}_old", s"${t}_compacting", s"${t}_clustering")
      .foreach(CdcMerge.dropStateTable(spark, _))
    (1L to 20L).toDF("k").write.format("parquet").saveAsTable(t)
    // a crashed compact left its stage behind; a later clusterBy must
    // clear it (no orphan copy) while rewriting correctly
    (1L to 20L).toDF("k").write.format("parquet")
      .saveAsTable(s"${t}_compacting")
    LakehouseSink.clusterBy(spark, t, Seq("k"), nFiles = 2)
    assert(spark.table(t).count() == 20)
    assert(!spark.catalog.tableExists(s"${t}_compacting"),
      "other service's crashed stage left orphaned")
    assert(!spark.catalog.tableExists(s"${t}_clustering"))
    // degenerate crash: only the OTHER service's stage survives —
    // recovery must still find it rather than failing
    spark.sql(s"ALTER TABLE $t RENAME TO ${t}_compacting")
    LakehouseSink.clusterBy(spark, t, Seq("k"), nFiles = 2)
    assert(spark.table(t).count() == 20)
  }
}
