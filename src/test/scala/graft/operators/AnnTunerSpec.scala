package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.sources.Tables

/** ANN auto-tuning: target-recall selection on the embeddings corpus
  * and on a skewed synthetic one; ladder-order cost monotonicity. */
class AnnTunerSpec extends SparkSpec {

  private lazy val embs: DataFrame =
    Tables.load(spark, sf("sf0.001"), "embeddings")

  /** Deterministic synthetic corpus with heavy cluster skew: ids
    * 0..nClustered-1 are tiny per-id perturbations of ONE base pattern
    * (near-dup pile — every query's true neighbors live in it); ids
    * nClustered.. are spread pseudo-random vectors. No RNG: integer
    * formulas only. */
  private def skewed(nClustered: Int, nSpread: Int,
      dim: Int = 16): DataFrame = {
    import spark.implicits._
    val rows = (0 until (nClustered + nSpread)).map { id =>
      val emb = (0 until dim).map { i =>
        if (id < nClustered)
          (if (i % 3 == 0) 1.0f else 0.2f) + ((id * 7 + i) % 5) * 0.01f
        else
          (((id * 31 + i * 17) % 13) - 6) * 0.3f
      }.toArray
      (id.toLong, emb)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("tuneLsh meets the target on the embeddings corpus") {
    val tuned = AnnTuner.tuneLsh(embs, targetRecall = 0.3)
    assert(tuned.recall >= 0.3,
      s"best rung only reached ${tuned.recall}")
    // the audit path reproduces the tuner's measurement
    val audited = AnnTuner.measuredLshRecall(embs, tuned.planes,
      tuned.tables)
    assert(math.abs(audited - tuned.recall) < 1e-9)
  }

  test("harder targets never pick a cheaper rung (ladder monotone)") {
    val easy = AnnTuner.tuneLsh(embs, targetRecall = 0.05)
    val hard = AnnTuner.tuneLsh(embs, targetRecall = 0.45)
    assert(easy.ladderRung <= hard.ladderRung)
    assert(hard.recall >= easy.recall - 1e-9)
  }

  test("tuneLsh hits a high target on the skewed clustered corpus") {
    // every true neighbor is a near-identical cluster member → LSH
    // buckets them together at any rung; the tuner should meet a high
    // target on an early (cheap) rung
    val tuned = AnnTuner.tuneLsh(skewed(40, 160), targetRecall = 0.9,
      dim = 16, nQueries = 4)
    assert(tuned.recall >= 0.9)
    assert(tuned.ladderRung == 0, "paid for amplification it didn't need")
  }

  test("tuneIvf walks nProbe upward and meets the target") {
    val probe1 = AnnTuner.tuneIvf(embs, targetRecall = 0.0)
    assert(probe1.nProbe == 1, "target 0 must not pay for extra probes")
    val tuned = AnnTuner.tuneIvf(embs, targetRecall = 0.5)
    assert(tuned.recall >= 0.5 || tuned.nProbe == 4,
      s"stopped early below target: $tuned")
    assert(tuned.recall >= probe1.recall - 1e-9)
  }

  test("chooseK stops at the smallest k meeting assignment quality") {
    // trivial target -> the cheapest rung wins outright
    val loose = AnnTuner.chooseK(embs, targetMeanCos = -1.0,
      ladder = Seq(2, 4, 8))
    assert(loose.k == 2, s"target -1 must not pay for extra centroids")
    // skewed corpus: the near-dup pile + spread tail needs more
    // centroids for tight assignments; the walk must end on a rung
    // whose measured quality meets the target (or the last rung)
    val tuned = AnnTuner.chooseK(skewed(40, 40), targetMeanCos = 0.6,
      dim = 16, ladder = Seq(2, 4, 8))
    assert(tuned.meanCos >= 0.6 || tuned.k == 8,
      s"stopped early below target: $tuned")
    assert(tuned.meanCos >= loose.meanCos - 1.0) // both are defined
    intercept[IllegalArgumentException] {
      AnnTuner.chooseK(embs, 0.5, ladder = Seq(8, 2))
    }
  }

  test("tunePq widens the ADC pool until recall passes, never overpays") {
    import graft.operators.SimilarityOps
    val cb = SimilarityOps.pqFirstKCodebook(embs, 64, 8, 4)
    // a full-width pool reproduces brute force exactly (the spec'd
    // limit case), so recall 1.0 is reachable and the walk must stop
    // at the FIRST rung that passes the target
    val n = embs.count().toInt
    val tuned = AnnTuner.tunePq(embs, targetRecall = 1.0, cb,
      ladder = Seq(10, n))
    assert(tuned.recall == 1.0 && tuned.candidates == n)
    // trivial target -> cheapest rung wins outright
    val loose = AnnTuner.tunePq(embs, targetRecall = 0.0, cb,
      ladder = Seq(10, n))
    assert(loose.candidates == 10,
      s"target 0 must not pay for a wider pool: $loose")
    // unreachable target -> falls back to the widest rung, reporting
    // the measured recall so the caller sees the saturation
    val capped = AnnTuner.tunePq(embs, targetRecall = 2.0, cb,
      ladder = Seq(10, 20))
    assert(capped.candidates == 20 && capped.recall <= 1.0)
    intercept[IllegalArgumentException] {
      AnnTuner.tunePq(embs, 0.5, cb, ladder = Seq(50, 25))
    }
  }
}
