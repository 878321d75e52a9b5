package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: can a parent-session localCheckpoint cross into the
  * dynamic-overwrite session clone through a GLOBAL temp view, and
  * does the insert stay dynamic (touched partitions only)? Decides
  * whether CdcMerge's staged-table round-trip can be retired. */
object DynBridgeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", java.nio.file.Files
        .createTempDirectory("graft-dynbridge-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    Seq((1L, "a", 0L), (2L, "b", 1L), (3L, "c", 2L))
      .toDF("id", "v", "_kb")
      .write.format("parquet").partitionBy("_kb").saveAsTable("t")
    // rewrite bucket 1 only, through a parent-built checkpoint
    val merged = Seq((2L, "B2", 1L)).toDF("id", "v", "_kb")
      .repartition(col("_kb")).localCheckpoint()
    merged.createOrReplaceGlobalTempView("bridge")
    graft.streaming.CdcMerge.withDynamicOverwrite(spark) { w =>
      w.table("global_temp.bridge").select("id", "v", "_kb")
        .write.mode("overwrite").insertInto("t")
    }
    spark.catalog.refreshTable("t")
    val rows = spark.table("t").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    println(s"ROWS=$rows")
    val ok = rows == Seq((1L, "a"), (2L, "B2"), (3L, "c"))
    println(if (ok) "DYN-BRIDGE OK (untouched partitions survived)"
      else "DYN-BRIDGE BROKEN")
    spark.stop()
  }
}
