package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Core CDC dataflow operators, re-expressed as declarative
  * `DataFrame => DataFrame` transforms (SURVEY.md §2.1 O1-O9).
  *
  * The reference applies these per-event in a Python loop
  * (`stream_cdc/processing/processors.py:17-35`); here each is a Catalyst
  * expression inside whole-stage codegen, so the same logic runs columnar
  * and distributed with no per-row interpreter overhead. All of them work
  * identically on bounded DataFrames and on Structured Streaming inputs
  * (used by [[graft.streaming.CdcPipeline]]).
  */
object CdcOps {

  /** O1 — event classification (reference `mysql.py:344-352`).
    *
    * Maps an application event label onto the CDC operation taxonomy.
    * Labels with no mapping classify as "Skip" — the analogue of
    * QueryEvents that the reference decodes then discards
    * (`mysql.py:354-365,387-389`).
    */
  def classifyOp(eventType: Column): Column =
    when(eventType === "signup", "Insert")
      .when(eventType === "purchase", "Insert")
      .when(eventType === "click", "Update")
      .when(eventType === "error", "Delete")
      .otherwise("Skip") // e.g. "view" — the QueryEvent analogue

  /** O2+O3 — envelope projection (reference `mysql.py:404-426`): one
    * envelope row per change, carrying a transaction position. The
    * bounded replay source already has one row per change (the binlog
    * multi-row flatten is `explode` when needed), so this is a pure
    * projection; `gtid` is synthesized from the source's own ordering
    * key exactly like GtidEvent inheritance (`mysql.py:380-384`).
    */
  def toEnvelope(events: DataFrame, serverUuid: String = "srv-1",
      database: String = "app", table: String = "events"): DataFrame =
    events.select(
      classifyOp(col("event_type")).as("event_type"),
      concat(lit(serverUuid + ":"), col("event_id")).as("gtid"),
      lit(database).as("database"),
      lit(table).as("table"),
      col("props").as("content"),
      col("event_id"), col("ts"), col("user_id"), col("value"))

  /** O4 — skip filter: drop events classified as Skip, the analogue of
    * DDL/COMMIT passthrough (`mysql.py:387-389`). */
  def dropSkipped(df: DataFrame): DataFrame =
    df.filter(col("event_type") =!= "Skip")

  /** O5 — empty-event filter (`mysql.py:391-393`). */
  def dropEmpty(df: DataFrame): DataFrame =
    df.filter(col("content").isNotNull && length(col("content")) > 0)

  /** O6 — serializer parity (reference `utils/serializer.py:15-37`):
    * JSON-normalize a set of columns into a single string payload.
    * `to_json` degrades timestamps/decimals to strings/numbers just like
    * the reference's `json.dumps(default=str)` round-trip. */
  def serialize(cols: Column*): Column = to_json(struct(cols: _*))

  /** Sequence-gap audit over a dense id (lost-event detection — the
    * CDC consumer's "did I miss a binlog position" check). The
    * SCALABLE formulation, fully partitioned at every level:
    *
    *  1. bucket the id space with integer `div` (exact at any id
    *     magnitude — a double division loses precision above 2^53 and
    *     rounds toward zero for negatives) and aggregate (count, min,
    *     max) per bucket — one partial-aggregated shuffle over the
    *     row-level data;
    *  2. group buckets into superbuckets of `superSize` buckets;
    *     within-superbucket boundary gaps come from a lag window
    *     PARTITIONED by superbucket (≤ superSize bucket-rows per task);
    *  3. the carry across superbucket boundaries (max id of all earlier
    *     superbuckets — i.e. the previous non-empty bucket's max, since
    *     bucket maxima are monotone in bucket id) comes from a
    *     broadcast theta-join over the superbucket aggregate, whose
    *     cardinality is idRange / (bucketSize·superSize) — e.g. ~95
    *     rows for 1e13 ids at the defaults.
    *
    * No operator anywhere in the plan funnels more than `superSize`
    * rows through one task; a naive global-sort + lag (or even a
    * bucket-level global window) would — PlanQualitySpec asserts no
    * registered plan contains a partition-less window.
    */
  def sequenceGaps(df: DataFrame, idCol: String,
      bucketSize: Long = 100L, superSize: Long = 1L << 20): DataFrame = {
    val agg = df
      .select(expr(s"`$idCol` div $bucketSize").as("bucket"),
        col(idCol).as("id"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("id").as("mn"), max("id").as("mx"))
      .withColumn("sb", expr(s"bucket div $superSize"))
    val sbAgg = agg.groupBy("sb").agg(max("mx").as("sb_mx"))
    // prev_sb_mx(sb) = max id of ALL earlier superbuckets; tiny side,
    // broadcast non-equi join (work ∝ S², S = superbucket count)
    val carry = sbAgg.toDF("sb", "sb_mx")
      .join(broadcast(sbAgg.toDF("sb_b", "sb_mx_b")),
        col("sb") > col("sb_b"), "left")
      .groupBy("sb").agg(max("sb_mx_b").as("prev_sb_mx"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy("sb").orderBy("bucket")
    agg.join(broadcast(carry), Seq("sb"), "left")
      .withColumn("missing_inside", col("mx") - col("mn") + 1 - col("n"))
      .withColumn("gap_before",
        col("mn") -
          coalesce(lag(col("mx"), 1).over(wIn), col("prev_sb_mx")) - 1)
      .filter(col("missing_inside") > 0 || col("gap_before") > 0)
      .select("bucket", "n", "mn", "mx", "missing_inside", "gap_before")
  }

  /** Typed before/after projection over Update envelopes (SURVEY §1.4
    * two-tier contract; reference `tests/unit/datasources/test_mysql.py:
    * 354-359`). The write side serializes Update content as
    * `{"before": <payload|null>, "after": <payload>}` (cdc10); this is
    * the schema-carrying read back OUT of that envelope: one `from_json`
    * with a declared payload schema yields nullable `before`/`after`
    * structs whose fields project as typed columns (`$"before.k"`).
    * A first-change event has `"before": null` → a null struct → null
    * typed fields, exactly like the reference's None before-image.
    */
  def typedUpdateView(df: DataFrame,
      payload: org.apache.spark.sql.types.StructType,
      contentCol: String = "content"): DataFrame = {
    val envSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("before", payload),
      org.apache.spark.sql.types.StructField("after", payload)))
    df.withColumn("_env", from_json(col(contentCol), envSchema))
      .withColumn("before", col("_env.before"))
      .withColumn("after", col("_env.after"))
      .drop("_env")
  }

  /** O7/O8 — composable filter chain (reference `filters/base.py:58-98`,
    * `filters/factory.py:14-25`). The reference folds a message through an
    * ordered list of `Message -> Message` transforms; the Spark-native
    * chain is function composition over DataFrames — Catalyst then fuses
    * the whole chain into one codegen stage, so an N-step chain costs the
    * same as one. An empty chain is the identity (`base.py:92-94`).
    */
  final case class FilterChain(steps: Seq[DataFrame => DataFrame]) {
    def apply(df: DataFrame): DataFrame =
      steps.foldLeft(df)((d, f) => f(d))
    def andThen(f: DataFrame => DataFrame): FilterChain =
      FilterChain(steps :+ f)
  }

  object FilterChain {
    val identity: FilterChain = FilterChain(Seq.empty)
    /** Factory parity: build a chain from a list (`factory.py:14-25`). */
    def of(fs: (DataFrame => DataFrame)*): FilterChain = FilterChain(fs)
  }
}
