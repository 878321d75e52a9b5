package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Randomized conformance: for arbitrary envelope sequences, arbitrary
  * batch splits and arbitrary redelivery schedules, the merged state
  * must equal the reference latest-state reduction and the incremental
  * aggregate must equal a recompute over the live state. Few
  * iterations (Spark jobs per case), broad case space.
  */
class CdcMergePropsSpec extends SparkSpec {

  private case class Ev(key: Long, i: Int, op: String, grp: String,
      value: Double)

  private val evsGen: Gen[List[Ev]] = for {
    nKeys <- Gen.chooseNum(1, 6)
    n <- Gen.chooseNum(1, 40)
    evs <- Gen.sequence[List[Ev], Ev]((0 until n).toList.map { i =>
      for {
        k <- Gen.chooseNum(1L, nKeys.toLong)
        op <- Gen.frequency(5 -> Gen.const("Insert"),
          3 -> Gen.const("Update"), 2 -> Gen.const("Delete"))
        g <- Gen.oneOf("a", "b")
      } yield Ev(k, i, op, g, i * 0.25)
    })
  } yield evs

  private val caseGen
      : Gen[(List[Ev], List[Int], List[Int], Option[Int])] = for {
    evs <- evsGen
    nBatches <- Gen.chooseNum(1, 4)
    assign <- Gen.listOfN(evs.size, Gen.chooseNum(0, nBatches - 1))
    replays <- Gen.someOf(0 until nBatches)
    // sometimes re-bucket the state table between the live batches and
    // the redeliveries — the table service must be invisible to both
    rebucketTo <- Gen.option(Gen.oneOf(2, 8, 16))
  } yield (evs, assign, replays.toList, rebucketTo)

  private var runId = 0

  test("random batches + replays: state and aggregate match reference") {
    val prop = Prop.forAll(caseGen) {
      case (evs, assign, replays, rebucketTo) =>
      runId += 1
      val st = s"prop_state_$runId"
      val ag = s"prop_agg_$runId"
      val tables = Seq(st, s"${st}_stage", s"${st}_rebucketing",
        s"${st}_old", ag, s"${ag}_stage")
      tables.foreach(CdcMerge.dropStateTable(spark, _))
      import spark.implicits._
      def toDf(es: Seq[Ev]) = es
        .map(e => (e.key,
          Timestamp.valueOf(f"2026-01-01 00:${e.i / 60}%02d:${e.i % 60}%02d"),
          e.op, e.i.toLong, e.grp, e.value))
        .toDF("k", "ts", "event_type", "event_id", "grp", "value")
      // clamp: shrinking may shrink tuple components independently
      val asg = assign.padTo(evs.size, 0)
      val nBatches = if (asg.isEmpty) 1 else asg.max + 1
      val batches = (0 until nBatches).map { b =>
        b.toLong -> evs.zip(asg).collect { case (e, a) if a == b => e }
      }
      val valid = replays.filter(b => b >= 0 && b < nBatches)
      batches.foreach { case (id, es) =>
        IncrementalAgg.applyBatch(spark, st, ag, toDf(es), "k",
          Seq("ts", "event_id"), 4, "grp", "value", id)
      }
      // service window: re-partition the state, then redeliver against
      // the NEW bucket count — neither may change visible state
      val buckets = rebucketTo match {
        case Some(nb) if spark.catalog.tableExists(st) =>
          CdcMerge.rebucket(spark, st, "k", nb); nb
        case _ => 4
      }
      valid.map(b => batches(b)).foreach { case (id, es) =>
        IncrementalAgg.applyBatch(spark, st, ag, toDf(es), "k",
          Seq("ts", "event_id"), buckets, "grp", "value", id)
      }

      // reference: per key the max-(ts ~ i) event; deletes drop out
      val expectedLive = evs.groupBy(_.key)
        .map { case (k, es) => k -> es.maxBy(_.i) }
        .filter(_._2.op != "Delete")
      val gotState = CdcMerge.readState(spark, st)
        .select("k", "event_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val stateOk = gotState ==
        expectedLive.map { case (k, e) => k -> e.i.toLong }

      val expectedAgg = expectedLive.values.groupBy(_.grp)
        .map { case (g, es) =>
          g -> (es.size.toLong,
            es.map(e => BigDecimal(e.value).setScale(2)).sum)
        }
      val gotAgg =
        if (spark.catalog.tableExists(ag))
          IncrementalAgg.readAgg(spark, ag).collect()
            .map(r => r.getAs[String]("grp") ->
              (r.getAs[Long]("n_live"),
                BigDecimal(r.getAs[java.math.BigDecimal]("sum_value"))
                  .setScale(2)))
            .toMap
        else Map.empty[String, (Long, BigDecimal)]
      val aggOk = gotAgg == expectedAgg

      tables.foreach(CdcMerge.dropStateTable(spark, _))
      stateOk && aggOk
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
