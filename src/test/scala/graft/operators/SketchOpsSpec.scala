package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** KMV sketch: set-function determinism, k-smallest contract, exact
  * fallback for undersized sketches, intersection estimator. */
class SketchOpsSpec extends SparkSpec {

  test("kmvSketch: exactly the k smallest distinct hashes") {
    import spark.implicits._
    val vals = (1L to 500L).toDF("v")
    val k = 16
    val got = SketchOps.kmvSketch(vals, "v", k).collect()
      .map(_.getLong(0)).toSeq
    val all = vals.select(SketchOps.u40($"v").as("h")).distinct()
      .collect().map(_.getLong(0)).sorted.take(k).toSeq
    assert(got.sorted == all)
    // set function: partitioning cannot matter
    val got2 = SketchOps.kmvSketch(vals.repartition(7), "v", k)
      .collect().map(_.getLong(0)).toSeq
    assert(got2.sorted == all)
  }

  test("kmvStats: undersized sketch gets theta = 2^40 (exact mode)") {
    import spark.implicits._
    val small = (1L to 10L).toDF("v")
    val sk = SketchOps.kmvSketch(small, "v", 64)
      .withColumn("seg", lit("s"))
    val st = SketchOps.kmvStats(sk, "seg", 64).collect().head
    assert(st.getAs[Long]("theta") == SketchOps.Theta40)
    assert(st.getAs[Long]("n") == 10L)
    // uniform estimator returns the exact count: all hashes < 2^40
    val est = sk.filter($"h" < SketchOps.Theta40).count() *
      SketchOps.Theta40 / SketchOps.Theta40
    assert(est == 10L)
  }

  test("kmv estimate: within 3/sqrt(k) of exact on a real id space") {
    import spark.implicits._
    val n = 5000L
    val k = 256
    val vals = (1L to n).toDF("v")
    val sk = SketchOps.kmvSketch(vals, "v", k).withColumn("seg", lit("s"))
    val st = SketchOps.kmvStats(sk, "seg", k).collect().head
    val theta = st.getAs[Long]("theta")
    val c = sk.filter($"h" < theta).count()
    val est = c * SketchOps.Theta40 / theta
    val err = math.abs(est - n).toDouble / n
    assert(err < 3.0 / math.sqrt(k.toDouble),
      s"estimate $est vs exact $n: err $err")
  }
}
