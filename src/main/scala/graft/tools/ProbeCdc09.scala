package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.sources.Tables

/** Dev scratch: cdc09 plan experiment — get_json_object prefilter +
  * from_json (parse survivors twice) vs single from_json + struct
  * filter (parse everything once). */
object ProbeCdc09 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val events = Tables.load(spark, sfDir, "events")
    val schema = StructType(Seq(StructField("k", LongType)))

    def gjoPrefilter: DataFrame =
      events
        .filter(get_json_object(col("props"), "$.k").cast("long") >= 50)
        .withColumn("payload", from_json(col("props"), schema))
        .select(col("event_id"), col("payload.k").as("k"),
          upper(col("event_type")).as("event_type_uc"))
        .orderBy(col("event_id"))

    def singleParse: DataFrame =
      events
        .withColumn("payload", from_json(col("props"), schema))
        .filter(col("payload.k") >= 50)
        .select(col("event_id"), col("payload.k").as("k"),
          upper(col("event_type")).as("event_type_uc"))
        .orderBy(col("event_id"))

    def time(name: String)(df: => DataFrame): Unit = {
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"VARIANT $name%-14s ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    time("gjo-prefilter") { gjoPrefilter }
    time("single-parse") { singleParse }
    time("gjo-prefilter") { gjoPrefilter }
    time("single-parse") { singleParse }
    spark.stop()
  }
}
