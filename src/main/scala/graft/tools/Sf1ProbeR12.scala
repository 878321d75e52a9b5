package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.GraphOps
import graft.streaming.{CdcMerge, IncrementalRetention}

/** Round-12 scale probes — rows land in SCALE.md.
  *
  * retention_scan: the cdc38 bucketed-grid claim MEASURED. Before
  * round 12 every batch rewrote the WHOLE activity grid through a
  * single `coalesce(1)` task (write ∝ state, one task); now the grid
  * is a CdcMerge-bucketed table and a trickle batch upserts only its
  * users' buckets. Protocol: build the grid at 1× and 10× users
  * (nBuckets scaled ∝ users — the rebucket discipline, bucket size
  * constant), fold one 5-user trickle batch, read scanned bytes off
  * `inputMetrics.bytesRead` and written bytes off
  * `outputMetrics.bytesWritten`. Flat bytes at 10× grid = the claim;
  * the old code scanned AND wrote the full grid per batch.
  *
  * graph_iters: the GraphOps iteration-proofing claim MEASURED.
  * Before round 12 the rank/label/dist loops unrolled — plan depth,
  * Catalyst analysis time and the re-shuffled edge side all grew
  * with `iters`; now each round localCheckpoints (and frees the
  * superseded round) and the edge side is repartitioned once and
  * persisted. Protocol: synthetic 2-out-regular graph (n = 200k,
  * 400k edges), pageRank at iters 5 / 10 / 20 — wall per ROUND must
  * stay flat as iters grows (the unrolled form grew superlinearly).
  *
  * Usage: sbt "runMain graft.tools.Sf1ProbeR12 [probe...]"
  * (no args = all probes)
  */
object Sf1ProbeR12 {

  def main(args: Array[String]): Unit = {
    val which =
      if (args.isEmpty) Set("retention_scan", "graph_iters",
        "skyline_bigshell", "span_scan")
      else args.toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val inBytes = new AtomicLong
    val outBytes = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          inBytes.addAndGet(m.inputMetrics.bytesRead)
          outBytes.addAndGet(m.outputMetrics.bytesWritten)
        }
        ()
      }
    })
    def measured[T](f: => T): (T, Double, Long, Long) = {
      Thread.sleep(100) // drain straggler task-end events
      val b0 = inBytes.get
      val w0 = outBytes.get
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(100)
      (r, wall, inBytes.get - b0, outBytes.get - w0)
    }

    if (which("retention_scan")) {
      import spark.implicits._
      // nUsers users × 20 active weeks each — the grid; built in 3
      // event batches, then one 5-user trickle batch with a NEW week
      def events(nUsers: Long, slice: Int) = spark.range(nUsers * 20)
        .select((col("id") % nUsers).as("user_id"),
          expr("timestamp_seconds(1704067200 + (id div " +
            s"$nUsers) * 604800)").as("ts"))
        .filter(pmod(col("user_id"), lit(3)) === slice)
      val trickle = (0L until 5L)
        .map(u => (u * 101, java.sql.Timestamp.valueOf(
          "2025-06-02 00:00:00")))
        .toDF("user_id", "ts")
      Seq((20000L, 32), (200000L, 320)).foreach { case (n, nb) =>
        val table = s"r12probe_grid_$nb"
        Seq(table, s"${table}_stage")
          .foreach(CdcMerge.dropStateTable(spark, _))
        val (_, tBuild, _, _) = measured {
          (0 until 3).foreach(i => IncrementalRetention
            .applyBatch(spark, table, events(n, i), nb))
        }
        val tableBytes = spark.table(table).inputFiles
          .map(f => new java.io.File(
            new java.net.URI(f)).length()).sum
        val (_, tTrickle, scanned, written) = measured {
          IncrementalRetention.applyBatch(spark, table, trickle, nb)
        }
        val gridRows = IncrementalRetention.readGrid(spark, table)
          .count()
        println(f"PROBE retention_scan users=$n%7d nBuckets=$nb%4d  " +
          f"build: $tBuild%6.1f s  grid: $gridRows%9d rows " +
          f"${tableBytes / 1e6}%7.1f MB  trickle: $tTrickle%5.1f s  " +
          f"scanned: ${scanned / 1e6}%7.2f MB " +
          f"(${scanned * 100.0 / math.max(tableBytes, 1)}%5.1f%% of " +
          f"table)  written: ${written / 1e6}%7.2f MB")
        Seq(table, s"${table}_stage")
          .foreach(CdcMerge.dropStateTable(spark, _))
      }
    }

    if (which("graph_iters")) {
      // fixed synthetic 2-out-regular graph: no sinks, n·2 edges
      val n = 200000L
      val verts = spark.range(n).select(col("id").as("vid"))
      val edges = spark.range(n).select(col("id").as("vid"))
        .select(col("vid"),
          explode(array((col("vid") * 7 + 3) % n,
            (col("vid") + 1) % n)).as("dst"))
        .select(col("vid").as("src"), col("dst"))
      Seq(5, 10, 20).foreach { iters =>
        val (total, wall, _, _) = measured {
          GraphOps.pageRank(edges, verts, iters = iters)
            .agg(sum("pr")).head().getLong(0)
        }
        println(f"PROBE graph_iters n=$n iters=$iters%3d  " +
          f"wall: $wall%6.1f s  per-round: ${wall / iters}%5.2f s  " +
          f"mass: $total%14d / 1000000000000")
      }
    }

    if (which("skyline_bigshell")) {
      // ADVERSARIALLY ANTI-CORRELATED corpus: 150k points on the
      // x + y = 10^7 diagonal (nothing dominates anything — the
      // frontier IS the corpus half) + 150k strictly-dominated noise.
      // |shell| ≈ 150k > the 100k broadcast gate → the exact stage
      // must take the grid-partitioned path and still return exactly
      // the diagonal. The old code would broadcast a 150k-row build
      // side into a |shell|² nested loop.
      val nF = 150000L
      val diag = spark.range(nF).select(col("id"),
        (col("id") * 66).as("x"), (lit(10000000L) - col("id") * 66)
          .as("y"))
      val noise = spark.range(nF).select((col("id") + nF).as("id"),
        (col("id") * 66 - col("id") % 7 - 1).as("x"),
        (lit(10000000L) - col("id") * 66 - col("id") % 5 - 1).as("y"))
      val pts = diag.unionByName(noise)
      val (nFront, wall, _, _) = measured {
        graft.operators.SkylineOps
          .skyline(pts, "id", Seq("x", "y"), Nil).count()
      }
      graft.operators.SkylineOps.unpersistShellCaches(blocking = true)
      assert(nFront == nF, s"frontier $nFront != $nF")
      println(f"PROBE skyline_bigshell n=${2 * nF}%7d frontier=" +
        f"$nFront%7d  wall: $wall%6.1f s  (partitioned exact stage, " +
        "no broadcast)")
    }

    if (which("span_scan")) {
      // synthetic template corpus: each doc = 15 unique tokens + a
      // 12-token template shared by its (doc_id % 97) group + 15 more
      // unique tokens — exactly the 5 pure-template 8-windows per doc
      // repeat cross-doc; every boundary window contains a unique
      // token and must NOT be reported. Output volume ∝ docs, work ∝
      // corpus tokens — the linearity claim measured at 10×.
      def corpus(nDocs: Long) = spark.range(nDocs)
        .select(col("id").as("doc_id"),
          concat_ws(" ",
            expr("transform(sequence(1, 15), " +
              "i -> concat('u', id, '_', i))"),
            expr("transform(sequence(1, 12), " +
              "i -> concat('g', id % 97, '_', i))"),
            expr("transform(sequence(16, 30), " +
              "i -> concat('u', id, '_', i))")).as("text"))
      Seq(200000L, 2000000L).foreach { n =>
        val (occ, wall, _, _) = measured {
          graft.operators.DedupOps.repeatedSpans(corpus(n), 8).count()
        }
        assert(occ == 5L * n, s"expected ${5 * n} occurrences, $occ")
        println(f"PROBE span_scan n=$n%8d docs  repeated-span " +
          f"occurrences: $occ%9d (= 5/doc, boundary windows " +
          f"excluded)  wall: $wall%6.1f s")
      }
    }

    spark.stop()
  }
}
