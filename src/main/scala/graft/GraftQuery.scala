package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query of the engine's declared surface (SURVEY.md §2.3).
  *
  * @param run    Spark-side implementation; `dir` is an sf directory from
  *               TESTDATA.md (e.g. /root/testdata/sf0.01).
  * @param oracle equivalent ANSI SQL runnable by DuckDB over the same parquet
  *               tables; None for ops whose semantics aren't SQL-expressible
  *               (the driver then records a weaker rows-only check).
  *
  * Determinism contract (so the DuckDB hash-compare is meaningful):
  *  - every query ends in a total ORDER BY (unique key tiebreaker);
  *  - float aggregation is done in exact DECIMAL arithmetic and the final
  *    value is CAST to DOUBLE on both sides (bit-identical, order-independent);
  *  - counts/ranks are BIGINT on both sides.
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
