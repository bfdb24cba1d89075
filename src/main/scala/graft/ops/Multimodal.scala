package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing — north-star tier X (BASELINE.json): media
  * payloads as opaque binary columns with typed metadata, plus a
  * decode/feature-extract stage whose Spark-side plumbing (schema,
  * partitioning, batch shape) is real while the codec itself is a
  * clearly-marked deterministic STUB (no image/audio libraries ship in this
  * environment).
  *
  * Scale design: media bytes stay in executor space end to end — the decode
  * stage is mapPartitions over a typed Dataset (one iterator pass per
  * partition, the Scala analogue of a Pandas-UDF `mapInPandas` batch), never
  * a collect. Partition counts follow the input splits, so a 100 TB media
  * corpus fans out across executors with no driver involvement. Metadata
  * lives in ordinary columns so filters on it prune before any decode work.
  */
object Multimodal {

  /** One media record: opaque payload + typed metadata (the schema a real
    * image/audio table would carry; here synthesized from `documents`). */
  final case class MediaRecord(
      doc_id: Long, fmt: String, n_bytes: Long, payload: Array[Byte])

  /** Extracted features (the output schema of the decode stage).
    * thumb_bytes/thumb_mean come from the "resize" step: a stride-4
    * downsample of the payload (the byte-level stand-in for image resize). */
  final case class MediaFeatures(
      doc_id: Long, fmt: String, n_bytes: Long, n_frames: Int,
      mean_byte: Double, first_byte: Int, thumb_bytes: Int,
      thumb_mean: Double)

  /** `documents` re-materialized as a media table: payload = utf-8 bytes of
    * the text (standing in for encoded media), fmt derived from the source
    * column. This is the real plumbing a binary-column pipeline needs —
    * binary type, metadata columns, partition-preserving map. */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        concat(lit("fake/"), col("source")).as("fmt"),
        encode(col("text"), "UTF-8").as("payload"))
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))

  /** The pluggable codec seam: a real deployment implements this with a
    * JNI or pure-JVM media decoder and passes it to [[extractFeatures]] —
    * the binary schema, metadata pruning, partition-wise batching, and
    * typed output are all codec-independent. `open()` runs once per
    * partition before the first record (where a real codec amortizes
    * native-context/thread-local setup); implementations must be
    * Serializable — the instance is constructed on the driver and shipped
    * to executors inside the mapPartitions closure. */
  trait MediaCodec extends Serializable {
    /** Per-partition initialization hook; default no-op. */
    def open(): Unit = ()
    def decode(r: MediaRecord): MediaFeatures
  }

  /** The declared STUB codec (the one piece of this module that is fake):
    * no media libraries ship in this environment, so it derives
    * deterministic features from the raw bytes. Everything it plugs into
    * is real. */
  object StubCodec extends MediaCodec {
    override def decode(r: MediaRecord): MediaFeatures = decodeStub(r)
  }

  /** STUB decode: a real deployment would decode image/audio frames here
    * (e.g. via a JNI codec); this environment has no media libraries, so the
    * "decoder" derives deterministic fake features from the bytes. The
    * iterator/batch shape is exactly what a real codec plugs into. */
  private def decodeStub(r: MediaRecord): MediaFeatures = {
    val frameSize = 256
    val nFrames = ((r.n_bytes + frameSize - 1) / frameSize).toInt
    val mean =
      if (r.payload.isEmpty) 0.0
      else r.payload.map(b => (b & 0xff).toLong).sum.toDouble / r.payload.length
    val first = if (r.payload.isEmpty) -1 else r.payload(0) & 0xff
    // "resize": stride-4 downsample (a real codec would rescale pixels here)
    val thumb = r.payload.indices.collect {
      case i if i % 4 == 0 => r.payload(i) & 0xff
    }
    val thumbMean =
      if (thumb.isEmpty) 0.0 else thumb.map(_.toLong).sum.toDouble / thumb.length
    MediaFeatures(r.doc_id, r.fmt, r.n_bytes, nFrames, mean, first,
      thumb.length, thumbMean)
  }

  /** The decode/feature-extract stage: typed mapPartitions over the media
    * table (one pass per partition — the batch shape a real codec needs).
    * `codec` defaults to the declared [[StubCodec]]; a deployment passes
    * its real decoder here and nothing else changes. */
  def extractFeatures(spark: SparkSession, sfDir: String,
      codec: MediaCodec = StubCodec): Dataset[MediaFeatures] = {
    val s = spark
    import s.implicits._
    mediaTable(spark, sfDir)
      .select(col("doc_id"), col("fmt"), col("n_bytes"), col("payload"))
      .as[MediaRecord]
      .mapPartitions { it => codec.open(); it.map(codec.decode) }
  }

  /** q80_multimodal — binary-column metadata pipeline, oracle-checked: byte
    * length, header bytes (hex), frame count at 256 B/frame — all on the
    * binary payload via built-in expressions (no decode needed, so filters
    * like these prune before the expensive stage at scale). */
  def q80Multimodal(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir)
      .select(
        col("doc_id"), col("fmt"), col("n_bytes"),
        hex(substring(col("payload"), 1, 4)).as("header_hex"),
        expr("(n_bytes + 255) div 256").as("n_frames"))
      .orderBy(col("doc_id"))

  val q80Sql: String =
    """SELECT doc_id,
      |       'fake/' || source AS fmt,
      |       octet_length(encode(text)) AS n_bytes,
      |       substring(hex(encode(text)), 1, 8) AS header_hex,
      |       (octet_length(encode(text)) + 255) // 256 AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q81_media_features — the full decode pipeline (STUB codec, real
    * plumbing). Oracle-checked: the stub's features are pure byte arithmetic
    * over `encode(text)`, which DuckDB reproduces by unpacking the hex dump
    * into byte values (the q82 hex technique); mean_byte/thumb_mean are
    * exact integer-sum / count divisions — single IEEE ops, deterministic. */
  def q81MediaFeatures(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(spark, sfDir).toDF().orderBy(col("doc_id"))

  val q81Sql: String =
    """WITH m AS (
      |  SELECT doc_id, 'fake/' || source AS fmt, hex(encode(text)) AS ph,
      |         octet_length(encode(text)) AS nb
      |  FROM documents),
      |ix AS (
      |  SELECT doc_id, ph, unnest(range(0, nb)) AS i FROM m),
      |v AS (
      |  SELECT doc_id, i,
      |         (strpos('0123456789ABCDEF',
      |                 substr(ph, CAST(i*2+1 AS BIGINT), 1)) - 1) * 16
      |         + (strpos('0123456789ABCDEF',
      |                   substr(ph, CAST(i*2+2 AS BIGINT), 1)) - 1) AS byte
      |  FROM ix),
      |agg AS (
      |  SELECT doc_id,
      |         sum(byte) AS sum_b, count(*) AS n_b,
      |         max(CASE WHEN i = 0 THEN byte END) AS first_b,
      |         sum(CASE WHEN i % 4 = 0 THEN byte END) AS sum_t,
      |         count(*) FILTER (WHERE i % 4 = 0) AS n_t
      |  FROM v GROUP BY doc_id)
      |SELECT m.doc_id, m.fmt, m.nb AS n_bytes,
      |       (m.nb + 255) // 256 AS n_frames,
      |       COALESCE(CAST(a.sum_b AS DOUBLE) / a.n_b, 0.0) AS mean_byte,
      |       COALESCE(a.first_b, -1) AS first_byte,
      |       COALESCE(a.n_t, 0) AS thumb_bytes,
      |       COALESCE(CAST(a.sum_t AS DOUBLE) / a.n_t, 0.0) AS thumb_mean
      |FROM m LEFT JOIN agg a ON a.doc_id = m.doc_id
      |ORDER BY m.doc_id""".stripMargin

  /** q82_frame_sample — frame sampling as rows: each payload splits into
    * 256-byte frames, every 4th frame is sampled (the decode-side stride a
    * video pipeline would use), emitting (doc_id, frame_id, frame length,
    * frame header). The frame slice goes through hex because the oracle
    * cannot substring BLOBs; at scale the same sequence+explode shape feeds
    * frame bytes straight into the decode stage of [[extractFeatures]].
    * Map-side only — the explode multiplies rows before any shuffle. */
  def q82FrameSample(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir)
      // n_bytes = 0 must yield NO frames: Spark's sequence(0, -1) counts
      // DOWN to [0, -1] instead of being empty, so empty payloads are
      // filtered out first (matching the oracle's empty range(0, 0)).
      .filter(col("n_bytes") > 0)
      .select(col("doc_id"), col("n_bytes"), col("payload"),
        explode(sequence(lit(0L),
          expr("(n_bytes + 255) div 256 - 1"))).as("frame_id"))
      .filter(col("frame_id") % 4 === 0)
      .select(
        col("doc_id"), col("frame_id"),
        least(col("n_bytes") - col("frame_id") * 256, lit(256L))
          .as("frame_bytes"),
        expr("substring(hex(payload), frame_id * 512 + 1, 16)")
          .as("frame_head_hex"))
      .orderBy(col("doc_id"), col("frame_id"))

  val q82Sql: String =
    """WITH m AS (
      |  SELECT doc_id, hex(encode(text)) AS ph,
      |         octet_length(encode(text)) AS nb
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, ph, nb,
      |         unnest(range(0, (nb + 255) // 256)) AS frame_id
      |  FROM m)
      |SELECT doc_id, frame_id,
      |       least(nb - frame_id * 256, 256) AS frame_bytes,
      |       substring(ph, CAST(frame_id * 512 + 1 AS BIGINT), 16)
      |         AS frame_head_hex
      |FROM f
      |WHERE frame_id % 4 = 0
      |ORDER BY doc_id, frame_id""".stripMargin

  /** q101_media_dedup — content-hash deduplication of binary media: an exact
    * full-payload hash (sha256) plus a "perceptual" thumbnail hash (md5 of
    * the first 40 payload bytes — the deterministic stand-in for a real
    * pHash over a decoded thumbnail; the fixture's texts collide on this
    * prefix, giving genuine near-dup groups). One row per thumbnail-hash
    * group: copy count, representative (min doc_id), how many DISTINCT full
    * payloads share the thumbnail, and total bytes the group pins.
    *
    * Scale: hashing is map-side; the shuffle carries (hash, doc_id, n_bytes,
    * full-hash) — never the payload bytes — and aggregates with map-side
    * combine. This is the q36-exact-dedup shape applied to binary columns;
    * a 100 TB media corpus dedups at the cost of one hash-keyed exchange of
    * ~50-byte rows. */
  def q101MediaDedup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        // Thumb key = hash of the UTF-8 encoding of the first 40
        // CHARACTERS (not bytes): the oracle's md5(substr(text,1,40))
        // hashes char-slice bytes, and slicing the payload by bytes would
        // diverge on any multi-byte character in the prefix.
        md5(encode(substring(col("text"), 1, 40), "UTF-8")).as("thumb_md5"),
        sha2(encode(col("text"), "UTF-8"), 256).as("payload_sha256"))
      .groupBy(col("thumb_md5"))
      .agg(
        count(lit(1)).as("n_copies"),
        min(col("doc_id")).as("rep_doc_id"),
        countDistinct(col("payload_sha256")).as("n_distinct_payloads"),
        sum(col("n_bytes")).as("total_bytes"))
      .orderBy(col("thumb_md5"))

  val q101Sql: String =
    // DuckDB md5/sha256 take VARCHAR and hash its UTF-8 bytes, so
    // md5(substr(text,1,40)) is the byte-faithful twin of Spark's
    // md5(encode(substring(text,1,40))) — both hash the encoded 40-CHAR
    // prefix, safe for multi-byte characters.
    """WITH h AS (
      |  SELECT doc_id, octet_length(encode(text)) AS n_bytes,
      |         md5(substr(text, 1, 40)) AS thumb_md5,
      |         sha256(text) AS payload_sha256
      |  FROM documents)
      |SELECT thumb_md5, count(*) AS n_copies, min(doc_id) AS rep_doc_id,
      |       count(DISTINCT payload_sha256) AS n_distinct_payloads,
      |       CAST(sum(n_bytes) AS BIGINT) AS total_bytes
      |FROM h GROUP BY thumb_md5 ORDER BY thumb_md5""".stripMargin
}
