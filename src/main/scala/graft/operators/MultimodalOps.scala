package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads ride as opaque `binary`
  * columns with a typed metadata struct; decode/feature-extraction runs
  * batch-wise per partition on the executors (the Scala analogue of
  * `mapInPandas`: one iterator of records in, one iterator of features
  * out — no per-row driver involvement, no partition materialization).
  *
  * The actual byte decode is a STUB (this container has no image/audio
  * codecs): `decodeStub` derives deterministic fake features from the
  * bytes. The Spark-side plumbing — schema, encoders, partitioning,
  * batch shape — is real and tested; swapping `decodeStub` for a JNI
  * codec changes nothing structurally.
  */
object MultimodalOps {

  final case class MediaRecord(
      doc_id: Long, content: Array[Byte], format: String, n_bytes: Long)

  final case class MediaFeatures(
      doc_id: Long, n_bytes: Long, first_byte: Int,
      width: Int, height: Int, checksum: Long)

  /** Attach binary content + metadata struct to the documents table. */
  def toMediaColumns(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("content"),
      struct(
        lit("text/plain").as("format"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        col("source").as("origin")).as("media_meta"))

  /** STUB decode — deterministic fake standing in for a codec.
    * Features are pure functions of the bytes so tests are exact. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int, Long) = {
    val first = if (bytes.isEmpty) 0 else bytes(0) & 0xff
    val n = bytes.length
    var sum = 0L
    var i = 0
    while (i < n) { sum = sum * 31 + (bytes(i) & 0xff); i += 1 }
    (first, n % 640, (n * 7) % 480, sum)
  }

  /** Declarative frame-sampling + resize planning over the media
    * metadata — the video/image preprocessing half that is pure
    * arithmetic on the (stub) decoded dimensions, so it stays inside
    * whole-stage codegen with no UDF. The stub frame count derives
    * from payload size (a real decoder would read the container
    * header); sampling picks ≤ `maxFrames` evenly spaced frame
    * indices; resize fits the stub WxH into a square `target` box
    * preserving aspect (integer arithmetic, no float drift).
    */
  def sampleAndResizePlan(media: DataFrame, maxFrames: Int = 8,
      target: Int = 224): DataFrame =
    // all arithmetic in `div` (integer division) — Spark's `/` on
    // longs is DOUBLE division, which both breaks sequence() typing
    // and would put float drift into an exactly-replayable plan
    media
      .select(col("doc_id"), col("media_meta.n_bytes").as("n"))
      .withColumn("w", expr("n % 640"))
      .withColumn("h", expr("(n * 7) % 480"))
      .withColumn("n_frames", expr("n div 1000 + 1"))
      .withColumn("frame_step",
        expr(s"greatest(1L, (n_frames + ${maxFrames - 1}) div $maxFrames)"))
      .withColumn("longest", expr("greatest(w, h, 1L)"))
      .select(
        col("doc_id"),
        col("n_frames"),
        col("frame_step"),
        expr("transform(sequence(0L, (n_frames - 1) div frame_step)," +
          " i -> i * frame_step)").as("sampled_frames"),
        col("w").as("src_w"), col("h").as("src_h"),
        expr(s"w * $target div longest").as("out_w"),
        expr(s"h * $target div longest").as("out_h"))

  /** Overlapped byte-range chunk plan for large media payloads — the
    * sharding step before parallel decode/transcribe of blobs too big
    * for one task (long audio, video segments): each blob splits into
    * `chunkBytes` ranges overlapping by `overlapBytes` (so a feature
    * window crossing a boundary is fully contained in some chunk —
    * the audio-transcription seam contract). One row per (doc, chunk):
    * chunk_id, byte_start, byte_len, is_last. Pure integer codegen
    * arithmetic (sequence + transform, `div` division); a downstream
    * decoder maps each row to `substr(content, byte_start+1,
    * byte_len)` — chunk rows repartition freely, which IS the point:
    * decode parallelism stops being bounded by blob count. */
  def chunkPlan(media: DataFrame, chunkBytes: Long = 65536,
      overlapBytes: Long = 4096): DataFrame = {
    require(overlapBytes < chunkBytes,
      s"overlap $overlapBytes must be < chunk $chunkBytes")
    val step = chunkBytes - overlapBytes
    media
      .select(col("doc_id"), col("media_meta.n_bytes").as("n"))
      // chunk count: ceil((n - overlap) / step), min 1 — the last
      // chunk may be short; empty payloads still get one empty chunk
      .withColumn("n_chunks",
        expr(s"greatest(1L, (greatest(n - $overlapBytes, 0L) + " +
          s"${step - 1}) div $step)"))
      .select(col("doc_id"), col("n"), col("n_chunks"),
        explode(expr("sequence(0L, n_chunks - 1)")).as("chunk_id"))
      .select(
        col("doc_id"), col("chunk_id"),
        expr(s"chunk_id * $step").as("byte_start"),
        expr(s"least($chunkBytes, n - chunk_id * $step)").as("byte_len"),
        (col("chunk_id") === col("n_chunks") - 1).as("is_last"))
  }

  /** Modality-aware training-batch assembly over a chunk plan: each
    * modality's chunk stream packs into byte-budgeted batches via a
    * running-total window — the [[graft.operators.CurationOps.packSequences]]
    * packer lifted to multimodal byte budgets, where each modality
    * carries its OWN budget (image batches are byte-bound by decode
    * memory, text by token count; one global budget starves one side
    * or the other). Input needs (modality, doc_id, chunk_id,
    * byte_len); output adds `batch_id` per chunk. Deterministic: the
    * pack order is (doc_id, chunk_id) within modality, the running
    * sum is exact integers, batch boundaries are truncating division.
    * The window partitions by modality — bounded partitions at any
    * corpus size require pre-sharding exactly like doc12's `shards`
    * (compose with a shard column in the partitionBy at 100 TB). */
  def batchAssembly(chunks: DataFrame, budgets: Map[String, Long],
      defaultBudget: Long = 65536L): DataFrame = {
    require(budgets.values.forall(_ > 0) && defaultBudget > 0,
      "budgets must be positive")
    val budgetCol = budgets.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultBudget)) { case (acc, (m, b)) =>
        when(col("modality") === m, lit(b)).otherwise(acc)
      }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("modality"))
      .orderBy(col("doc_id"), col("chunk_id"))
    chunks
      .withColumn("_budget", budgetCol)
      .withColumn("_cum", sum(col("byte_len")).over(w))
      .withColumn("batch_id",
        expr("greatest(_cum - 1, 0L) div _budget"))
      .drop("_budget", "_cum")
  }

  /** Batch feature extraction: partition-iterator in/out, mirroring a
    * vectorized decode UDF's batch shape. */
  def extractFeatures(spark: SparkSession, media: DataFrame)
      : Dataset[MediaFeatures] = {
    import spark.implicits._
    media
      .select(col("doc_id"), col("content"),
        col("media_meta.format").as("format"),
        col("media_meta.n_bytes").as("n_bytes"))
      .as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          val (first, w, h, sum) = decodeStub(r.content)
          MediaFeatures(r.doc_id, r.n_bytes, first, w, h, sum)
        }
      }
  }

  /** Perceptual-hash stand-in for media payloads: 32-bit SimHash over
    * byte 4-grams — similarity-PRESERVING (near-identical payloads
    * land at small Hamming distance), which is what an image pHash /
    * audio chromaprint gives and an avalanche checksum (mm02) cannot.
    * The bit votes ride on the first 32 md5 bits of each gram (exact
    * integer shift/mask arithmetic, engine-replayable); a real pHash
    * swaps the gram hash for DCT coefficients and changes nothing
    * structurally. Payloads shorter than `gram` bytes have no signal
    * and are excluded (the doc36 minShingles doctrine).
    * Returns (doc_id, n_grams, phash) with phash a `bits`-bit LONG. */
  def mediaSimhash(media: DataFrame, gram: Int = 4,
      bits: Int = 32): DataFrame = {
    require(bits >= 8 && bits <= 32, "phash width must be 8..32 bits")
    // 32-bit gram hash as a LONG (first 8 md5 hex chars) — the bit
    // votes below are integer shift/mask sums, NOT per-bit substring
    // compares (32 string probes per gram measured ~4× slower than
    // the arithmetic path on the same corpus)
    val grams = media
      .select(col("doc_id"), col("content").cast("string").as("txt"))
      .withColumn("n", length(col("txt")))
      .filter(col("n") >= gram)
      .withColumn("i", explode(expr(s"sequence(1, n - ${gram - 1})")))
      .withColumn("g",
        conv(substring(
          md5(expr(s"substring(txt, i, $gram)").cast("binary")),
          1, 8), 16, 10).cast("long"))
    val voteAggs = (0 until bits).map { b =>
      sum(shiftright(col("g"), b).bitwiseAND(lit(1L)) * 2 - 1)
        .as(s"_v$b")
    }
    val phash = (0 until bits).map { b =>
      shiftleft((col(s"_v$b") > 0).cast("long"), b)
    }.reduce(_ bitwiseOR _)
    grams.groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"), voteAggs: _*)
      .select(col("doc_id"), col("n_grams"), phash.as("phash"))
  }

  /** Media near-duplicate pairs via banded pHash LSH: the image-dedup
    * recipe — band the `bits`-bit hash into `bands` equal slices, an
    * EQUI-join on (band, slice) yields every pair within Hamming
    * distance < bands by pigeonhole (candidates, never all-pairs),
    * then exact Hamming (bit_count over the XOR of the numeric
    * hashes, codegen'd) verifies ≤ `maxHam`. Same LSH scale shape as
    * doc04: work tracks bucket collisions, not n². */
  def mediaNearDups(media: DataFrame, maxHam: Int = 3,
      gram: Int = 4, bits: Int = 32, bands: Int = 4): DataFrame =
    pairsFromBanded(bandedPhash(media, gram, bits, bands), maxHam,
      bands)

  /** The banded pHash postings of each payload: one row per
    * (doc, band) with the band's `key` slice of the hash —
    * (doc_id, phash, band, key). Shared by the one-shot
    * [[mediaNearDups]] join and the maintained index's append grid
    * ([[graft.streaming.IncrementalMediaDedup]]), so the two paths
    * cannot drift semantically. */
  def bandedPhash(media: DataFrame, gram: Int = 4, bits: Int = 32,
      bands: Int = 4): DataFrame = {
    require(bits % bands == 0, "bands must divide bits")
    val width = bits / bands
    val mask = (1L << width) - 1
    mediaSimhash(media, gram, bits)
      .withColumn("band", explode(array((0 until bands).map(lit): _*)))
      .withColumn("key",
        expr(s"shiftright(phash, band * $width)")
          .bitwiseAND(lit(mask)))
      .select(col("doc_id"), col("phash"), col("band"), col("key"))
  }

  /** Near-dup pairs from banded pHash postings: equi-join on
    * (band, key) → distinct candidate pairs → exact Hamming verify
    * (lossless for `maxHam < bands` by pigeonhole). The `lookup` side
    * defaults to the probe side (full self-join); the maintained
    * index passes its stored postings as the probe and serves batch
    * lookups with a restricted probe side. */
  def pairsFromBanded(banded: DataFrame, maxHam: Int, bands: Int,
      lookup: Option[DataFrame] = None): DataFrame = {
    require(maxHam < bands,
      "banded LSH is lossless only for maxHam < bands (pigeonhole)")
    // pairs NORMALIZED (doc_a < doc_b, phashes following), not
    // filtered a < b: an asymmetric probe/lookup split must keep
    // collisions where the probe doc carries the LARGER id
    val cands = banded.as("a")
      .join(lookup.getOrElse(banded).as("b"), Seq("band", "key"))
      .filter(col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"),
        when(col("a.doc_id") < col("b.doc_id"), col("a.phash"))
          .otherwise(col("b.phash")).as("ph_a"),
        when(col("a.doc_id") < col("b.doc_id"), col("b.phash"))
          .otherwise(col("a.phash")).as("ph_b"))
      .distinct()
    cands
      .withColumn("hamming",
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).cast("long"))
      .filter(col("hamming") <= maxHam)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Frame-grain fingerprints of a media payload: fixed `frameBytes`
    * slices (up to `maxFrames`, full slices only — a real pipeline
    * samples decoded video frames; the slice stands in for the frame
    * raster exactly like the rest of the stub decode), each hashed to
    * the 40-bit doc08 fingerprint. Distinct per (doc, fingerprint):
    * a frame repeated WITHIN one video counts once. */
  def frameFingerprints(media: DataFrame, frameBytes: Int = 16,
      maxFrames: Int = 16): DataFrame =
    media
      .select(col("doc_id"), col("content").cast("string").as("txt"))
      .withColumn("n", length(col("txt")))
      .withColumn("i",
        explode(expr(s"sequence(0, ${maxFrames - 1})")))
      .filter(col("n") >= (col("i") + 1) * frameBytes)
      .select(col("doc_id"),
        SketchOps.u40(expr(
          s"substring(txt, 1 + i * $frameBytes, $frameBytes)"))
          .as("fprint"))
      .distinct()

  /** Video-style near-dup via shared frame fingerprints — the
    * third rung of the media-dedup ladder (mm02 checksum = exact
    * payload, mm06 pHash = near-identical payload, this = re-cut /
    * re-encoded content sharing FRAMES): two media match when they
    * share ≥ `minMatch` distinct frame fingerprints. The equi-join on
    * the fingerprint is doc36's inverted-index shape at frame grain,
    * with the same absolute df cap killing universal frames
    * (boilerplate intros/black frames at scale) before they go
    * quadratic — candidate volume ≤ kept-fingerprint rows · maxDf.
    * Returns (doc_a, doc_b, n_match). */
  def frameNearDups(media: DataFrame, frameBytes: Int = 16,
      maxFrames: Int = 16, minMatch: Int = 3,
      maxDf: Int = 100): DataFrame = {
    val fps = frameFingerprints(media, frameBytes, maxFrames)
    val kept = fps.join(
      fps.groupBy("fprint").agg(count(lit(1)).as("_df"))
        .filter(col("_df") <= maxDf).select("fprint"),
      Seq("fprint"))
    kept.as("a").join(kept.as("b"), Seq("fprint"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_match"))
      .filter(col("n_match") >= minMatch)
  }
}
