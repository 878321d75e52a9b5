package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps
import graft.sources.Tables
import graft.streaming.IncrementalCC

/** Round-11 scale probes — rows land in SCALE.md.
  *
  * cc_scan: the [[IncrementalCC]] pruning claim MEASURED. Before
  * round 11 a trickle batch broadcast-joined the FULL label table
  * (scan bytes ∝ table); now endpoint lookups prune to endpoint
  * buckets and merged-member lookups prune via the component→buckets
  * inverted index (scan bytes ∝ touched components × bucket size).
  * Protocol: build a star-cluster corpus at 1× and at 10× docs, with
  * nBuckets scaled ∝ corpus (the CdcMerge rebucket discipline —
  * bucket size constant, as a real table service would keep it),
  * then apply one tiny 2-pair merge batch and read the bytes the
  * batch actually scanned off `inputMetrics.bytesRead`. Flat bytes
  * at 10× table = the claim; the old code would read ≥3× the table.
  *
  * Usage: sbt "runMain graft.tools.Sf1ProbeR11 [probe...]"
  * (no args = all probes)
  */
object Sf1ProbeR11 {

  def main(args: Array[String]): Unit = {
    val which =
      if (args.isEmpty) Set("cc_scan", "knn_skew", "ivf_build",
        "view_soak")
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
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) inBytes.addAndGet(m.inputMetrics.bytesRead)
        ()
      }
    })
    def measured[T](f: => T): (T, Double, Long) = {
      Thread.sleep(100) // drain straggler task-end events
      val b0 = inBytes.get
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(100)
      (r, wall, inBytes.get - b0)
    }

    if (which("cc_scan")) {
      // star clusters: docs [base, base+9] pair to their base —
      // component = base, size 10, diameter 1
      def starPairs(nDocs: Long) = spark.range(nDocs)
        .filter(col("id") % 10 =!= 0)
        .select((col("id") - col("id") % 10).as("doc_a"),
          col("id").as("doc_b"))
      // trickle: merge clusters 0↔10 and 1000↔1010 — 2 pairs, 4
      // touched components, constant at every corpus size
      import spark.implicits._
      val trickle = Seq((0L, 10L), (1000L, 1010L))
        .toDF("doc_a", "doc_b")
      Seq((200000L, 64), (2000000L, 640)).foreach { case (n, nb) =>
        val table = s"r11probe_cc_$nb"
        IncrementalCC.dropTables(spark, table)
        val (_, tBuild, _) = measured {
          (0 until 3).foreach { i =>
            IncrementalCC.applyBatch(spark, table,
              starPairs(n).filter(pmod(col("doc_b"), lit(3)) === i),
              i.toLong, nb)
          }
        }
        val tableBytes = spark.table(table).inputFiles
          .map(f => new java.io.File(
            new java.net.URI(f)).length()).sum
        val (_, tTrickle, scanned) = measured {
          IncrementalCC.applyBatch(spark, table, trickle, 3L, nb)
        }
        val labels = IncrementalCC.readLabels(spark, table)
        val merged = labels.filter(col("component") === 0L).count()
        assert(merged == 20L, s"merge failed: $merged")
        println(f"PROBE cc_scan n=$n%8d nBuckets=$nb%4d  " +
          f"build: $tBuild%6.1f s  table: ${tableBytes / 1e6}%8.1f MB  " +
          f"trickle: $tTrickle%5.1f s  scanned: ${scanned / 1e6}%7.1f MB " +
          f"(${scanned * 100.0 / math.max(tableBytes, 1)}%5.1f%% of table)")
        IncrementalCC.dropTables(spark, table)
      }
    }

    if (which("knn_skew")) {
      // ADVERSARIALLY SKEWED corpus: 90% of sf0.1's 20k vectors are
      // pulled to one hot cluster (0.9·centroid0 + 0.1·own — all land
      // in centroid 0's cell under nearest-assignment). This is the
      // corpus shape that breaks the uncapped cell-quadratic:
      // Σ|cell|² degenerates to ~n².
      val embs = Tables.load(spark, "/root/testdata/sf0.1",
        "embeddings")
      val c0 = embs.filter(col("vec_id") === 0L)
        .select(col("embedding").as("c0"))
      val skewed = embs.crossJoin(broadcast(c0))
        .withColumn("embedding",
          when(col("vec_id") % 10 =!= 0,
            expr("zip_with(embedding, c0, (x, y) -> " +
              "CAST(0.1 * x + 0.9 * y AS FLOAT))"))
            .otherwise(col("embedding")))
        .drop("c0")
        .localCheckpoint()
      val n = skewed.count()
      val cap = (n + 7) / 8
      // probe-side cell demand is identical both ways (rn <= 2)
      val probesPerCell = SimilarityOps
        .rankedCellAssignments(skewed).filter(col("rn") <= 2)
        .groupBy("cid").agg(count(lit(1)).as("p"))
      def cells(capacity: Option[Long]): (Long, Long, Double) = {
        val t0 = System.nanoTime()
        val m = SimilarityOps.cellMembers(skewed, 64, 8, capacity)
          .groupBy("cid").agg(count(lit(1)).as("m"))
          .join(probesPerCell, Seq("cid"))
          .agg(max(col("m")), sum(col("m") * col("p")))
          .head()
        (m.getLong(0), m.getLong(1),
          (System.nanoTime() - t0) / 1e9)
      }
      val (maxU, candU, tU) = cells(None)
      val (maxC, candC, tC) = cells(Some(cap))
      println(f"PROBE knn_skew n=$n%6d hot=90%% cap=$cap%5d  " +
        f"uncapped: maxcell=$maxU%6d cand=${candU / 1e6}%7.1f M " +
        f"($tU%5.1f s)  capped: maxcell=$maxC%5d " +
        f"cand=${candC / 1e6}%5.1f M ($tC%5.1f s)")
      assert(maxC <= cap, s"cap violated: $maxC > $cap")
      // the capped graph itself, end to end (wall + edges)
      val t0 = System.nanoTime()
      val edges = SimilarityOps
        .knnGraph(skewed, capacity = Some(cap)).count()
      println(f"PROBE knn_skew capped knnGraph: " +
        f"${(System.nanoTime() - t0) / 1e9}%5.1f s  edges=$edges%d")
    }

    if (which("ivf_build")) {
      // the end-to-end IVF build (IvfBuild: k-means‖ seeds → Lloyd →
      // strict balanced cells → serving table) at REAL nlist — the
      // inverted-file sizing rule nlist ≈ √n — plus the recall/probe
      // ladder over the BUILT index. Build wall should grow mildly
      // with nlist (seeding scans are nlist-independent; Lloyd's
      // broadcast and the balancer's rounds are the nlist terms).
      import graft.streaming.{CdcMerge, IvfBuild}
      val embs = Tables.load(spark, "/root/testdata/sf0.1",
        "embeddings").localCheckpoint()
      val n = embs.count() // 2000 → √n ≈ 45
      Seq(8, 45, 90).foreach { nlist =>
        val tab = s"r11probe_ivf_$nlist"
        Seq(tab, s"${tab}_centroids")
          .foreach(CdcMerge.dropStateTable(spark, _))
        val (rep, wall, _) = measured {
          IvfBuild.build(spark, tab, embs, nlist = nlist,
            oversample = math.max(16, nlist), capacitySlack = 1.3)
        }
        assert(rep.maxCell <= rep.capacity, s"cap violated: $rep")
        println(f"PROBE ivf_build n=$n%6d nlist=$nlist%3d  " +
          f"build: $wall%6.1f s  cap=${rep.capacity}%4d " +
          f"maxcell=${rep.maxCell}%4d cells=${rep.nCells}%3d " +
          f"spilled=${rep.spilled}%4d")
      }
      val queries = embs.filter(col("vec_id") % 100 === 7)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("q_emb"))
      Seq(1, 2, 4, 8, 16, 45).foreach { p =>
        val r = IvfBuild.recallAt(spark, "r11probe_ivf_45", embs,
          queries, nProbe = p, k = 10).head()
        println(f"PROBE ivf_recall nlist=45 nProbe=$p%2d  " +
          f"recall_ppm=${r.getLong(1)}%7d")
      }
      Seq(8, 45, 90).foreach { nlist =>
        val tab = s"r11probe_ivf_$nlist"
        Seq(tab, s"${tab}_centroids")
          .foreach(graft.streaming.CdcMerge.dropStateTable(spark, _))
      }
    }

    if (which("view_soak")) {
      // maintained JOIN / NEAREST-join views (the cdc26/cdc27 family)
      // soaked at 10× state with a CONSTANT trickle batch: marginal
      // batch wall and scan bytes must stay flat while the view grows
      // 10× — the dirty-key discipline measured, not asserted.
      // nBuckets scales ∝ corpus (constant bucket size, the CdcMerge
      // rebucket doctrine).
      import graft.streaming.{CdcMerge, IncrementalJoin,
        IncrementalNearestJoin}
      val epoch = 1600000000000000L

      // --- cdc26 shape: latest purchase ⋈ latest click per user
      Seq((50000L, 64), (500000L, 640)).foreach { case (nUsers, nb) =>
        val (lt, rt, vt) =
          (s"r11soak_p_$nb", s"r11soak_c_$nb", s"r11soak_v_$nb")
        val all = Seq(lt, rt, vt) ++
          Seq(lt, rt, vt).map(t => s"${t}_stage")
        all.foreach(CdcMerge.dropStateTable(spark, _))
        def purch(ids: org.apache.spark.sql.DataFrame) = ids.select(
          (col("id") % nUsers).as("user_id"),
          lit("Insert").as("p_op"), col("id").as("p_event_id"),
          timestamp_micros(lit(epoch) + col("id") * 1000L).as("p_ts"),
          (col("id") % 97).cast("double").as("p_value"))
        def click(ids: org.apache.spark.sql.DataFrame) = ids.select(
          (col("id") % nUsers).as("user_id"),
          lit("Insert").as("c_op"), col("id").as("c_event_id"),
          timestamp_micros(lit(epoch) + col("id") * 1000L).as("c_ts"))
        val rows = spark.range(nUsers * 4).toDF()
        val (_, tBuild, _) = measured {
          (0 until 3).foreach { i =>
            IncrementalJoin.applyBatch(spark, lt, rt, vt,
              Some(purch(rows.filter(col("id") % 3 === i))),
              Some(click(rows.filter(col("id") % 3 === i))),
              "user_id", Seq("p_ts", "p_event_id"),
              Seq("c_ts", "c_event_id"), nBuckets = nb,
              leftOpCol = "p_op", rightOpCol = "c_op")
          }
        }
        val viewBytes = spark.table(vt).inputFiles
          .map(f => new java.io.File(new java.net.URI(f)).length()).sum
        // trickle: 20 users get one new purchase + click (newer ts)
        val fresh = spark.range(20).select(
          (col("id") * (nUsers / 20)).as("id"))
        val late = fresh.select(col("id").as("user_id"),
          lit("Insert").as("p_op"),
          (col("id") + 10000000L).as("p_event_id"),
          timestamp_micros(lit(epoch) + lit(999999999999L)).as("p_ts"),
          lit(1.0).as("p_value"))
        val lateC = fresh.select(col("id").as("user_id"),
          lit("Insert").as("c_op"),
          (col("id") + 10000000L).as("c_event_id"),
          timestamp_micros(lit(epoch) + lit(999999999999L)).as("c_ts"))
        val (_, tTrickle, scanned) = measured {
          IncrementalJoin.applyBatch(spark, lt, rt, vt,
            Some(late), Some(lateC), "user_id",
            Seq("p_ts", "p_event_id"), Seq("c_ts", "c_event_id"),
            nBuckets = nb, leftOpCol = "p_op", rightOpCol = "c_op")
        }
        val vrows = spark.table(vt).count()
        assert(vrows == nUsers, s"view incomplete: $vrows")
        println(f"PROBE join_soak    users=$nUsers%7d nBuckets=$nb%4d  " +
          f"build: $tBuild%6.1f s  view: ${viewBytes / 1e6}%7.1f MB  " +
          f"trickle: $tTrickle%5.1f s  scanned: ${scanned / 1e6}%7.1f MB")
        all.foreach(CdcMerge.dropStateTable(spark, _))
      }

      // --- cdc27 shape: events enriched with nearest order-day agg
      Seq((200000L, 64), (2000000L, 640)).foreach { case (nEv, nb) =>
        val nUsers = nEv / 10
        val (lt, rt, vt) =
          (s"r11soak_e_$nb", s"r11soak_o_$nb", s"r11soak_nv_$nb")
        val all = Seq(lt, rt, vt) ++
          Seq(lt, rt, vt).map(t => s"${t}_stage")
        all.foreach(CdcMerge.dropStateTable(spark, _))
        def ev(ids: org.apache.spark.sql.DataFrame) = ids.select(
          (col("id") % nUsers).as("user_id"),
          lit("Insert").as("e_op"), col("id").as("event_id"),
          timestamp_micros(lit(epoch) + col("id") * 1000L).as("ts"))
        def ord(ids: org.apache.spark.sql.DataFrame) = ids.select(
          (col("id") % nUsers).as("user_id"),
          lit("Insert").as("o_op"), col("id").as("o_orderkey"),
          date_add(lit(java.sql.Date.valueOf("2020-09-13")),
            (col("id") % 200).cast("int")).as("o_orderdate"))
        val evRows = spark.range(nEv).toDF()
        val ordRows = spark.range(nEv / 5).toDF()
        def prep(r: org.apache.spark.sql.DataFrame) =
          r.groupBy(col("user_id"), col("o_orderdate"))
            .agg(count(lit(1)).as("n_orders"))
        val (_, tBuild, _) = measured {
          (0 until 3).foreach { i =>
            IncrementalNearestJoin.applyBatch(spark, lt, rt, vt,
              Some(ev(evRows.filter(col("id") % 3 === i))),
              Some(ord(ordRows.filter(col("id") % 3 === i))),
              "user_id", "event_id", "o_orderkey",
              Seq("ts", "event_id"), Seq("o_orderdate", "o_orderkey"),
              "ts", "o_orderdate", Seq("o_orderdate", "n_orders"),
              rightPrep = prep, nBuckets = nb,
              leftOpCol = "e_op", rightOpCol = "o_op")
          }
        }
        val viewBytes = spark.table(vt).inputFiles
          .map(f => new java.io.File(new java.net.URI(f)).length()).sum
        // trickle: 2 new orders for 2 users — invalidates those
        // users' events only
        val lateOrd = spark.range(2).select(
          (col("id") * (nUsers / 2)).as("user_id"),
          lit("Insert").as("o_op"),
          (col("id") + 20000000L).as("o_orderkey"),
          lit(java.sql.Date.valueOf("2021-06-01")).as("o_orderdate"))
        val (_, tTrickle, scanned) = measured {
          IncrementalNearestJoin.applyBatch(spark, lt, rt, vt,
            None, Some(lateOrd),
            "user_id", "event_id", "o_orderkey",
            Seq("ts", "event_id"), Seq("o_orderdate", "o_orderkey"),
            "ts", "o_orderdate", Seq("o_orderdate", "n_orders"),
            rightPrep = prep, nBuckets = nb,
            leftOpCol = "e_op", rightOpCol = "o_op")
        }
        val vrows = spark.table(vt).count()
        assert(vrows == nEv, s"view incomplete: $vrows")
        println(f"PROBE nearest_soak events=$nEv%7d nBuckets=$nb%4d  " +
          f"build: $tBuild%6.1f s  view: ${viewBytes / 1e6}%7.1f MB  " +
          f"trickle: $tTrickle%5.1f s  scanned: ${scanned / 1e6}%7.1f MB")
        all.foreach(CdcMerge.dropStateTable(spark, _))
      }
    }

    spark.stop()
  }
}
