package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CROSS-INDEX SNAPSHOT CONSISTENCY for multi-index pipelines — the
  * r15 verdict's one named correctness risk: a fused serve (cdc48's
  * RRF over the BM25 grid + the IVF index) reads each state family at
  * its OWN watermark, so a paused or lagging ingest stream on one
  * family silently fuses two different corpus versions. Exact
  * per-index, version-skewed across indexes.
  *
  * The fix is ONE committed wave marker per pipeline: after ALL
  * families fold a wave's batches, the pipeline commits a wave row
  * naming each family's included batch id AND delete epoch
  * ([[commitWave]], a [[TableSwap]] staged swap — atomic,
  * crash-recoverable, 1 row per family). A wave-pinned serve then
  * [[requireAtWave]]: every family's CURRENT version must equal the
  * wave's recorded one — batch id (a fold skew) and delete epoch (an
  * erasure landed after the wave: deletes mutate a served index
  * without moving its watermark, see [[FamilyVersion]]) —
  * else the serve REFUSES with the skew spelled out (hold-to-wave
  * semantics — the families that can rewind do so through their own
  * `_b <=` fences, but the IVF index has no row stamps, so refusal
  * is the honest contract: the caller either pauses serves until the
  * lagging family catches up, or serves per-index knowingly).
  *
  * Reference shape: reference/stream_cdc's flush→checkpoint ordering
  * (stream/worker.py) is the single-family version of the same
  * fence; Delta Lake users know this as multi-table transaction
  * scope, rebuilt here on plain parquet.
  */
object WaveMark {

  /** All tables the marker maintains — for test/registration
    * cleanup. */
  def tables(waveTable: String): Seq[String] =
    Seq(waveTable, s"${waveTable}_stage", s"${waveTable}_old")

  /** A family's version at a point in time: its committed fold batch
    * id PLUS its delete epoch. The epoch matters because erasure
    * ([[IncrementalBm25.deleteDocs]]'s tombstones,
    * [[IncrementalAnn.deleteVectors]]'s physical rewrite) mutates a
    * served index WITHOUT moving its fold watermark — pinning batch
    * ids alone would let a post-wave erasure on one family silently
    * version-skew the fused serve (the same hazard
    * [[IncrementalPageRank]] closes for derived views). Grid families
    * read the epoch from [[AppendGrid.mutationEpoch]]; the stampless
    * IVF index from [[IncrementalAnn.mutationEpoch]]. */
  final case class FamilyVersion(batch: Long, epoch: Long) {
    override def toString: String = s"batch $batch epoch $epoch"
  }

  /** Commit a wave: AFTER every family's folds for the wave have
    * committed, record (wave id, family → (included batch id, delete
    * epoch)). One staged swap — a crash before it leaves the previous
    * wave served (consistent), never a mixed one. */
  def commitWave(spark: SparkSession, waveTable: String, waveId: Long,
      families: Map[String, FamilyVersion]): Unit = {
    require(families.nonEmpty, "a wave must name at least one family")
    import spark.implicits._
    // monotone commit key `_wave`, all of a wave's family rows in ONE
    // appended file (atomic at job commit — a crash leaves the
    // previous wave served whole, never a mixed one); the reader
    // takes the max-wave rows only — TableSwap.appendCommit
    TableSwap.appendCommit(spark,
      families.toSeq.sortBy(_._1)
        .map { case (f, v) => (waveId, f, v.batch, v.epoch) }
        .toDF("_wave", "family", "batch", "epoch"),
      waveTable)
  }

  /** The committed wave: (wave id, family → version), None before
    * the first commit. */
  def committedWave(spark: SparkSession, waveTable: String)
      : Option[(Long, Map[String, FamilyVersion])] = {
    TableSwap.recover(spark, waveTable, s"${waveTable}_stage")
    if (!spark.catalog.tableExists(waveTable)) None
    else {
      spark.catalog.refreshTable(waveTable)
      val rows = spark.table(waveTable)
        .select("_wave", "family", "batch", "epoch").collect()
      if (rows.isEmpty) None
      else {
        // append-committed marker: only the MAX wave's rows are the
        // committed wave — older waves are dead history
        val wave = rows.map(_.getLong(0)).max
        Some((wave,
          rows.filter(_.getLong(0) == wave).map(r => r.getString(1) ->
            FamilyVersion(r.getLong(2), r.getLong(3))).toMap))
      }
    }
  }

  /** Assert every family's CURRENT version (committed batch id AND
    * delete epoch) equals the wave's recorded one; returns the wave
    * id. `current` maps family → its live version (each family's own
    * watermark + epoch read). Throws with the full skew picture when
    * any family ran ahead of (or behind) the wave, folded OR erased —
    * the wave-pinned serve's refusal. */
  def requireAtWave(spark: SparkSession, waveTable: String,
      current: Map[String, FamilyVersion]): Long = {
    val (wave, pinned) = committedWave(spark, waveTable).getOrElse(
      throw new IllegalStateException(
        s"$waveTable: no committed wave — commitWave after the " +
          "first wave's folds before serving wave-pinned"))
    val skew = pinned.toSeq.sortBy(_._1).flatMap { case (f, v) =>
      current.get(f) match {
        case Some(c) if c == v => None
        case Some(c) => Some(s"$f at $c, wave $wave pins $v")
        case None => Some(s"$f missing from the serve's current map")
      }
    }
    if (skew.nonEmpty) throw new IllegalStateException(
      s"$waveTable: version skew across index families — " +
        skew.mkString("; ") + ". Hold serves until the lagging " +
        "family folds the wave (an epoch skew means an ERASURE " +
        "landed after the wave — re-commit the wave over the erased " +
        "state), or serve per-index knowingly.")
    wave
  }
}
