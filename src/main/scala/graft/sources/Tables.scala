package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bounded table loader over the driver's parquet star schema
  * (`/root/testdata/sf*`; see TESTDATA.md).
  *
  * Design notes for scale: we load each table as a plain parquet scan and
  * declare everything else (filters, projections) on top, so Catalyst's
  * parquet pushdown / column pruning / partition pruning apply. Nothing is
  * cached here — at 100 TB a hidden `.cache()` is a foot-gun; callers decide.
  *
  * Reference analogue: the component registry `DataSourceFactory`
  * (reference `stream_cdc/datasources/factory.py:16-60`) — name → source.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table from an sf directory. Timestamps are forced to LTZ so
    * `unix_millis`/window functions behave identically regardless of the
    * writer's parquet annotations (session TZ is pinned to UTC).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    // The events table carries TIMESTAMP(NANOS) which Spark's vectorized
    // parquet reader rejects; read nanos as long and convert to micros
    // (integer div — a double division would lose precision above 2^53).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(_.name == "ts") match {
      case Some(f) if f.dataType == org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
      case _ => df
    }
  }

  /** Register every table as a temp view so `spark.sql` surfaces
    * (GROUPING SETS, EXISTS subqueries) can be exercised too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n => load(spark, dir, n).createOrReplaceTempView(n) }
}
