package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Schema-drift handling for schema-carrying CDC envelopes.
  *
  * The reference's envelope transports the payload schema per event
  * (`stream_cdc/datasources/mysql.py:413-426`), so upstream DDL shows
  * up downstream as NEW keys appearing in `content` (or declared keys
  * going missing) — never as a broken pipeline. The consumer-side
  * contract here mirrors that:
  *
  *  - [[driftReport]]: the monitoring signal — per-key observation
  *    counts classified `declared` / `new` / `missing` against the
  *    consumer's declared view. One vocab-sized aggregate over the
  *    content keys (map-side combined; key cardinality is schema-sized,
  *    not data-sized) joined with the tiny declared list.
  *  - [[withDriftFlag]] / [[quarantine]]: the containment policy —
  *    rows carrying undeclared keys are flagged (a codegen'd
  *    `array_except` against the declared-set literal, no shuffle) and
  *    can be split off for quarantine while clean rows flow on.
  *  - [[widenedView]]: the widen policy — the typed view grows the
  *    new keys as nullable STRING columns (the lossless parse of any
  *    JSON scalar) while every declared field keeps its declared type,
  *    so existing readers keep working untouched. New-key discovery is
  *    a distinct over the key vocab collected driver-side — schema
  *    inference is inherently a metadata-sized operation.
  */
object SchemaDrift {

  private def keysOf(contentCol: String) =
    json_object_keys(col(contentCol))

  /** Per-key drift report: `(key, n_events, status)` where status is
    * `declared` (observed, in the view), `new` (observed, undeclared)
    * or `missing` (declared, never observed — n_events 0). */
  def driftReport(df: DataFrame, contentCol: String,
      declared: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val observed = df
      .select(explode(keysOf(contentCol)).as("key"))
      .groupBy("key").agg(count(lit(1)).as("n_events"))
    // the declared list is schema-sized; the full-outer join runs on
    // the vocab-sized aggregate, not the data
    val decl = declared.toDF("key").withColumn("_declared", lit(1))
    observed.join(decl, Seq("key"), "full_outer")
      .select(col("key"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        when(col("_declared").isNull, "new")
          .when(col("n_events").isNull, "missing")
          .otherwise("declared").as("status"))
  }

  /** Flag rows whose content carries keys outside the declared set.
    * Pure codegen (array_except against a literal), no shuffle. */
  def withDriftFlag(df: DataFrame, contentCol: String,
      declared: Seq[String]): DataFrame =
    df.withColumn("undeclared_keys",
      array_except(keysOf(contentCol),
        array(declared.map(lit): _*)))
      .withColumn("has_drift", size(col("undeclared_keys")) > 0)

  /** Split (clean, quarantined): rows with undeclared keys are held
    * back; clean rows flow on with their original schema. */
  def quarantine(df: DataFrame, contentCol: String,
      declared: Seq[String]): (DataFrame, DataFrame) = {
    val flagged = withDriftFlag(df, contentCol, declared)
    (flagged.filter(!col("has_drift"))
       .drop("undeclared_keys", "has_drift"),
     flagged.filter(col("has_drift")))
  }

  /** Continuous drift monitoring: every micro-batch writes its drift
    * report (tagged with the batch id) to a monitoring table — the
    * streaming half of the consumer contract, catching upstream DDL
    * within one batch of it appearing instead of at the next full-scan
    * audit. The report per batch is vocab-sized, so the monitor's
    * footprint is metadata-scale regardless of stream volume.
    *
    * The write is IDEMPOTENT per batch: the report table is
    * directory-partitioned on `_batch_id` and each batch dynamically
    * overwrites only its own partition, so Spark's at-least-once batch
    * replay (crash between write and offset commit) rewrites the same
    * partition with the same rows instead of appending duplicates that
    * would inflate per-key `n_events` — the same replay tolerance
    * [[graft.streaming.CdcMerge]] gives the state table. */
  def monitorStream(df: DataFrame, contentCol: String,
      declared: Seq[String], reportTable: String, checkpointDir: String,
      availableNow: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch {
        (batch: DataFrame, batchId: Long) =>
          writeBatchIdempotent(driftReport(batch, contentCol, declared),
            reportTable, batchId)
      }
    (if (availableNow)
       writer.trigger(
         org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else writer).start()
  }

  /** Idempotent per-batch table write: the rows overwrite their own
    * `_batch_id = batchId` partition, so an at-least-once replayed
    * batch rewrites the same partition with the same rows instead of
    * appending duplicates. The batch id is the whole partition spec,
    * so the existing-table path is a fully-STATIC
    * `INSERT OVERWRITE ... PARTITION (_batch_id=<id>)` — no
    * dependence on the session-global `partitionOverwriteMode` conf
    * (the [[graft.streaming.AppendGrid.writeGeneration]] doctrine).
    * The create path clears any stale warehouse location a crashed
    * first write left behind before re-creating the table. Shared by
    * the drift monitor, the quarantine stream and the dedup pair
    * log. */
  def writeBatchIdempotent(rows: DataFrame, table: String,
      batchId: Long): Unit = {
    val spark = rows.sparkSession
    if (spark.catalog.tableExists(table)) {
      val dataCols = spark.table(table).columns.toSeq
        .filterNot(_ == "_batch_id")
      val view = s"${table}_batch_src"
      rows.createOrReplaceTempView(view)
      try spark.sql(
        s"INSERT OVERWRITE TABLE $table " +
          s"PARTITION (_batch_id=$batchId) " +
          s"SELECT ${dataCols.mkString(", ")} FROM $view")
      finally spark.catalog.dropTempView(view)
      spark.catalog.refreshTable(table)
    } else {
      graft.streaming.CdcMerge.dropStateTable(spark, table)
      rows.withColumn("_batch_id", lit(batchId))
        .write.mode("overwrite").format("parquet")
        .partitionBy("_batch_id").saveAsTable(table)
    }
  }

  /** Continuous containment: every micro-batch is SPLIT — rows whose
    * content stays inside the declared key set flow to `cleanTable`,
    * rows carrying undeclared keys (with their `undeclared_keys`
    * evidence column) land in `quarantineTable`, the dead-letter side
    * of the drift contract: upstream DDL never stops the pipeline and
    * never silently pollutes the clean table, and the quarantined rows
    * keep enough context to re-ingest after the consumer widens its
    * view. Both writes are per-batch idempotent
    * ([[writeBatchIdempotent]]), so a replayed batch lands exactly
    * once in EACH table. */
  def startQuarantineStream(df: DataFrame, contentCol: String,
      declared: Seq[String], cleanTable: String, quarantineTable: String,
      checkpointDir: String, availableNow: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch {
        (batch: DataFrame, batchId: Long) =>
          val (clean, bad) = quarantine(batch, contentCol, declared)
          writeBatchIdempotent(clean, cleanTable, batchId)
          writeBatchIdempotent(bad.drop("has_drift"), quarantineTable,
            batchId)
      }
    (if (availableNow)
       writer.trigger(
         org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else writer).start()
  }

  /** Typed view widened by the NEW keys observed in the data: declared
    * fields keep their declared types; new keys parse as nullable
    * strings. Old readers (selecting declared fields) are unaffected.
    * Returns (view, newKeys). */
  def widenedView(df: DataFrame, contentCol: String,
      declared: StructType): (DataFrame, Seq[String]) = {
    val declaredNames = declared.fieldNames.toSeq
    val newKeys = df
      .select(explode(keysOf(contentCol)).as("key"))
      .filter(!col("key").isin(declaredNames: _*))
      .distinct().collect().map(_.getString(0)).sorted.toSeq
    val widened = StructType(
      declared.fields ++ newKeys.map(StructField(_, StringType)))
    // payload field names are assumed disjoint from the envelope's own
    // column names (the usual CDC layout: typed payload beside metadata)
    val view = df
      .withColumn("_parsed", from_json(col(contentCol), widened))
      .select(df.columns.toSeq.map(col) ++
        widened.fieldNames.map(n =>
          col("_parsed").getField(n).as(n)): _*)
      .drop("_parsed")
    (view, newKeys)
  }
}
