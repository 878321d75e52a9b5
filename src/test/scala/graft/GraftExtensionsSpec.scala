package graft

import org.apache.spark.sql.SparkSession

import graft.SparkSpec

/** SQL-surface parity: the native expressions registered through
  * GraftExtensions must be callable from spark.sql text and agree
  * with the Column API. */
class GraftExtensionsSpec extends SparkSpec {

  test("extensions register the native functions in the SQL surface") {
    // extensions apply only at session construction: build a fresh
    // session over the existing context, restore the default after
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import s2.implicits._
      val df = Seq(
        (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f), "hello world"))
        .toDF("a", "b", "s")
      df.createOrReplaceTempView("ext_probe")
      val row = s2.sql("""
        SELECT vec_dot(a, b) AS d, vec_norm(a) AS n,
               vec_lsh_bucket(a, 4) AS bucket,
               text_rolling_hash(s) AS rh,
               seeded_mix_hash(3, s) AS mh
        FROM ext_probe""").collect()(0)
      assert(row.getAs[Double]("d") == (4.0 + 10.0 + 18.0))
      assert(math.abs(row.getAs[Double]("n") - math.sqrt(14.0)) < 1e-12)
      assert(row.getAs[String]("bucket").length == 4)
      assert(row.getAs[Long]("rh") ==
        graft.functions.VectorExpressions.rollingHashRef("hello world"))
      val expectedMix = {
        var h = 0L
        "3|hello world".getBytes("UTF-8").foreach(b => h = h * 31L + (b & 0xff))
        graft.functions.VectorExpressions.SeededMixHash.fmix64(h)
      }
      assert(row.getAs[Long]("mh") == expectedMix)
      // non-literal seed is rejected with an actionable error
      val e = intercept[Exception] {
        s2.sql("SELECT seeded_mix_hash(CAST(s AS INT), s) FROM ext_probe")
          .collect()
      }
      assert(e.getMessage.contains("integer literal"))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }
}
