package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.PolyHash
import graft.io.Sources.{table, tableWide}

/** [EXT] Multimodal-column plumbing: media payloads as opaque `binary`
  * columns with typed metadata, batch feature extraction via
  * `mapPartitions` over a typed Dataset (the Scala analogue of
  * `mapInPandas` batch UDFs).
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB (`fakeDecode`); everything Spark —
  * schema, binary handling, partitioning, batch shape, typed encoders —
  * is real and tested (`MultimodalSpec`).
  */
object Multimodal {

  /** Binary metadata extraction with pure built-ins (oracled): byte
    * length, content md5, first-8-bytes hex. `documents.text` stands in
    * for the media payload (cast to its UTF-8 bytes).
    */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .withColumn("payload", col("text").cast("binary"))
      .select(col("doc_id"),
        length(col("payload")).as("byte_len"),
        md5(col("payload")).as("content_md5"),
        hex(expr("substring(payload, 1, 8)")).as("head_hex"))
      .orderBy(col("doc_id"))

  private val mediaMetaSql =
    """SELECT doc_id,
       CAST(octet_length(encode(text)) AS INT) AS byte_len,
       md5(text) AS content_md5,
       substring(hex(encode(text)), 1, 16) AS head_hex
       FROM documents ORDER BY doc_id"""

  /** A "media" row: opaque payload + typed metadata. */
  case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String,
      n_bytes: Int)

  /** Extracted per-frame features. */
  case class MediaFeatures(doc_id: Long, n_bytes: Int, n_frames: Int,
      mean_byte: Double, frame_hash: Long)

  /** STUB decoder: a real implementation would decode image/audio frames
    * here (codecs are absent in this environment). Deterministic fake:
    * 256-byte "frames", per-payload byte stats, rolling hash. The
    * surrounding Spark plumbing (typed Dataset, mapPartitions batching,
    * partition-preserving) is the real, tested contract.
    */
  def fakeDecode(payload: Array[Byte]): (Int, Double, Long) = {
    val frames = math.max(1, payload.length / 256)
    val mean =
      if (payload.isEmpty) 0.0
      else payload.map(b => (b & 0xff).toDouble).sum / payload.length
    (frames, mean, PolyHash.hashBytes(payload))
  }

  /** Batch feature extraction: one decoder invocation per partition
    * iterator (amortized setup — the mapInPandas batch shape), payloads
    * never collected to the driver.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder setup would go here (model/codec init)
      rows.map { r =>
        val (frames, mean, hash) = fakeDecode(r.payload)
        MediaFeatures(r.doc_id, r.n_bytes, frames,
          graft.functions.Rounding.jvm(mean, 2), hash)
      }
    }
  }

  /** t2 entry (rows-only; decode is engine-specific): documents as fake
    * media payloads -> typed Dataset -> batch feature extraction,
    * repartitioned by doc_id bucket as a 100 TB-shaped media pipeline
    * would be.
    */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = tableWide(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit("text/plain").as("mime"),
        length(col("text").cast("binary")).as("n_bytes"))
      .as[MediaRow]
    extractFeatures(media).toDF().orderBy(col("doc_id"))
  }

  /** Frame sampling: slice the opaque payload into fixed-size frames
    * and keep every 4th (the video/audio "sample k frames per clip"
    * shape, done with pure binary expressions — no decode needed for
    * sampling). Map-only: sequence-with-step + substring slices, no
    * shuffle until the oracle sort. Frame identity is md5 over the hex
    * encoding (hex, not raw bytes: frame boundaries can split UTF-8
    * sequences and blob→string casts differ across engines).
    */
  def mediaFrames(spark: SparkSession, dir: String): DataFrame =
    tableWide(spark, dir, "documents")
      .withColumn("ph", hex(col("text").cast("binary")))
      .withColumn("nf", expr("int(ceil(length(ph) / 128.0))"))
      .filter(col("nf") >= 1)
      .select(col("doc_id"), explode_outer(expr(
        """transform(sequence(0, nf - 1, 4),
           i -> struct(i AS frame_idx,
                       substring(ph, i * 128 + 1, 128) AS frame))"""))
        .as("f"))
      .select(col("doc_id"), col("f.frame_idx").cast("int").as("frame_idx"),
        (length(col("f.frame")) / 2).cast("int").as("frame_len"),
        md5(expr("cast(f.frame AS binary)")).as("frame_md5"))
      .orderBy(col("doc_id"), col("frame_idx"))

  private val mediaFramesSql =
    """WITH d AS (SELECT doc_id, hex(encode(text)) AS ph FROM documents),
       f AS (SELECT doc_id, ph,
               unnest(range(0, CAST(ceil(length(ph) / 128.0) AS INT), 4))
                 AS frame_idx
             FROM d WHERE length(ph) >= 1)
       SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
         CAST(length(substring(ph, CAST(frame_idx * 128 + 1 AS BIGINT), 128))
           / 2 AS INT) AS frame_len,
         md5(substring(ph, CAST(frame_idx * 128 + 1 AS BIGINT), 128))
           AS frame_md5
       FROM f ORDER BY doc_id, frame_idx"""

  /** Rolling-hash fingerprint via the custom codegen Expression
    * [[graft.functions.PolyHash]]. The hash is mod-prime
    * (`(h*131 + byte) mod 1e9+7`) so every intermediate product fits a
    * 64-bit integer — which makes it exactly replayable in ANSI SQL:
    * the DuckDB oracle hex-decodes the UTF-8 bytes and folds the same
    * recurrence with `list_reduce`, byte for byte.
    */
  def rollingFingerprint(spark: SparkSession, dir: String): DataFrame = {
    PolyHash.register(spark)
    tableWide(spark, dir, "documents")
      .select(col("doc_id"), expr("poly_hash(text)").as("fingerprint"))
      .orderBy(col("doc_id"))
  }

  /** The PolyHash recurrence replayed in DuckDB: hex() exposes the
    * UTF-8 bytes two chars at a time; list_reduce folds
    * `(h*131 + byte) mod 1_000_000_007` with a prepended 0 seed (an
    * empty document hashes to 0, matching the Scala reference).
    */
  private val rollingFingerprintSql =
    """WITH d AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents)
       SELECT doc_id,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(range(0, CAST(length(hx)//2 AS BIGINT)),
               i -> CAST((strpos('0123456789ABCDEF',
                            substr(hx, CAST(2*i+1 AS BIGINT), 1))-1)*16
                    + (strpos('0123456789ABCDEF',
                            substr(hx, CAST(2*i+2 AS BIGINT), 1))-1)
                    AS BIGINT))),
           (h, b) -> (h*131 + b) % 1000000007) AS fingerprint
       FROM d ORDER BY doc_id"""

  /** The mapPartitions feature extractor IS oracle-checkable: the stub
    * decode is deterministic arithmetic over the payload bytes (frame
    * count, unsigned-byte mean, PolyHash), all of which DuckDB replays
    * from the hex-exposed bytes — same decode trick as
    * [[rollingFingerprintSql]]. The byte sum is a sum of integers
    * (< 2^53), so the Scala double accumulation is exact and the
    * division + half-up rounding agree bit-for-bit. This makes the
    * typed-Dataset/mapPartitions plumbing itself driver-hash-checked,
    * not just row-counted; a real codec would drop the oracle and keep
    * the invariant tests.
    */
  private val mediaFeaturesSql =
    """WITH d AS (SELECT doc_id, hex(encode(text)) AS hx,
                    CAST(octet_length(encode(text)) AS INT) AS n_bytes
                  FROM documents),
       b AS (SELECT doc_id, n_bytes,
               list_transform(range(0, CAST(length(hx)//2 AS BIGINT)),
                 i -> CAST((strpos('0123456789ABCDEF',
                              substr(hx, CAST(2*i+1 AS BIGINT), 1))-1)*16
                      + (strpos('0123456789ABCDEF',
                              substr(hx, CAST(2*i+2 AS BIGINT), 1))-1)
                      AS BIGINT)) AS bytes
             FROM d)
       SELECT doc_id, n_bytes,
         CAST(greatest(1, n_bytes // 256) AS INT) AS n_frames,
         CASE WHEN n_bytes = 0 THEN 0.0
              ELSE floor(CAST(list_sum(bytes) AS DOUBLE) / n_bytes * 100
                     + 0.5) / 100 END AS mean_byte,
         list_reduce(list_prepend(CAST(0 AS BIGINT), bytes),
           (h, bb) -> (h*131 + bb) % 1000000007) AS frame_hash
       FROM b ORDER BY doc_id"""

  val qs: Seq[Q] = Seq(
    Q("x_media_meta", mediaMeta, Some(mediaMetaSql)),
    Q("x_media_features", mediaFeatures, Some(mediaFeaturesSql)),
    Q("x_media_frames", mediaFrames, Some(mediaFramesSql)),
    Q("x_rolling_fingerprint", rollingFingerprint,
      Some(rollingFingerprintSql)))
}
