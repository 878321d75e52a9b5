package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** File-format source/sink helpers. The reference has no file formats at
  * all (SURVEY §2.2); the engine exposes the lakehouse set. Parquet is
  * the performance path (columnar, predicate pushdown, page pruning);
  * CSV/JSON exist for interchange — both lose types (JSON keeps more
  * than CSV), which the round-trip spec documents explicitly.
  */
object Formats {

  val supported: Seq[String] = Seq("parquet", "orc", "json", "csv")

  def write(df: DataFrame, format: String, path: String,
      partitionBy: Seq[String] = Nil): Unit = {
    require(supported.contains(format), s"unsupported format: $format")
    val w = df.write.mode(SaveMode.Overwrite).format(format)
      .option("header", "true")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .save(path)
  }

  def read(spark: SparkSession, format: String, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    require(supported.contains(format), s"unsupported format: $format")
    val r = spark.read.format(format)
      .option("header", "true").option("inferSchema", "true")
    schema.fold(r)(r.schema).load(path)
  }
}
