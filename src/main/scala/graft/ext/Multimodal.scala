package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.sources.Tables

/** Multimodal-column plumbing: opaque `binary` payload columns with typed
  * metadata, plus a batched decode/feature-extraction stage.
  *
  * The real decode (image/audio codecs) is STUBBED — this container has no
  * media libraries — with a deterministic fake that derives "pixels" from
  * the payload bytes. What IS real and tested end-to-end is the Spark-side
  * plumbing a 100 TB media pipeline needs:
  *   - binary columns carried through scans/projections without copies,
  *   - a typed per-partition batch API ([[decodeFeatures]]) with the same
  *     shape as a vectorized decode stage (iterator-in/iterator-out per
  *     partition, so a real codec would amortize init per batch, exactly
  *     like `mapInPandas` does in PySpark),
  *   - fixed-width feature schema out, partitioning preserved (no shuffle).
  */
object Multimodal {

  // frame-count formula shared by qm01 metadata and qm03 expansion — keep
  // the Scala and SQL forms in lockstep
  private val nFramesSql = "1 + n_chars % 10"
  private def nFramesCol = expr(nFramesSql)

  final case class MediaRow(doc_id: Long, text: String)
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      f0: Double, f1: Double, f2: Double, f3: Double,
      f4: Double, f5: Double, f6: Double, f7: Double,
      feat_mean: Double)

  /** STUB decoder: a real implementation would decode `payload` with an
    * image/audio codec. The fake samples 8 evenly-spaced character codes —
    * deterministic, so the pipeline around it is fully testable. */
  private def stubDecode(text: String): Array[Double] = {
    val len = text.length
    val step = len / 8
    Array.tabulate(8)(j => text.charAt(j * step).toDouble)
  }

  /** Batched decode/feature-extract: iterator-in/iterator-out per partition
    * (codec init would live once per partition, before the iterator map). */
  def decodeFeatures(docs: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { rows =>
      // real pipeline: val codec = Codec.open() — once per batch/partition
      rows.map { r =>
        val f = stubDecode(r.text)
        val mean = (((((((f(0) + f(1)) + f(2)) + f(3)) + f(4)) + f(5)) + f(6)) + f(7)) / 8.0
        MediaFeatures(r.doc_id, r.text.getBytes("UTF-8").length,
          f(0), f(1), f(2), f(3), f(4), f(5), f(6), f(7), mean)
      }
    }
  }

  // ---------------------------------------------------------------------
  // qm01: binary payload + typed metadata — documents as stand-in media
  // blobs: binary column via encode(), metadata derived per row, content
  // fingerprint. (The blob itself is not output — the driver compare works
  // on the flat metadata columns.)
  // ---------------------------------------------------------------------
  private def qm01(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .select(
        col("doc_id"),
        octet_length(col("payload")).as("n_bytes"),
        md5(col("text")).as("content_md5"),
        (col("n_chars") % 640).as("width"),
        ((col("doc_id") * 37) % 480).as("height"),
        nFramesCol.as("n_frames"))

  private val qm01Sql =
    s"""SELECT doc_id,
       |  octet_length(encode(text)) AS n_bytes,
       |  md5(text) AS content_md5,
       |  n_chars % 640 AS width,
       |  (doc_id * 37) % 480 AS height,
       |  $nFramesSql AS n_frames
       |FROM documents""".stripMargin

  // ---------------------------------------------------------------------
  // qm02: the stubbed decode stage run through the typed batch API —
  // deterministic fake features, so the oracle can mirror the sampling
  // arithmetic with substr/unicode.
  // ---------------------------------------------------------------------
  private def qm02(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
      .filter(length(col("text")) >= 8)
      .select(col("doc_id"), col("text")).as[MediaRow]
    decodeFeatures(docs).toDF()
  }

  private val qm02Sql = {
    val feats = (0 until 8).map { j =>
      s"CAST(unicode(substr(text, 1 + $j * (length(text) // 8), 1)) AS DOUBLE) AS f$j"
    }.mkString(",\n  ")
    val mean = "(((((((f0 + f1) + f2) + f3) + f4) + f5) + f6) + f7) / 8.0"
    s"""SELECT doc_id, n_bytes, f0, f1, f2, f3, f4, f5, f6, f7, $mean AS feat_mean
       |FROM (SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       |  $feats
       |FROM documents WHERE length(text) >= 8)""".stripMargin
  }

  // ---------------------------------------------------------------------
  // qm03: frame sampling — 1→N expansion of a media blob into per-frame
  // rows (`n_frames` from the metadata), each with a deterministic frame
  // fingerprint. The explode keeps partitioning; no shuffle.
  // ---------------------------------------------------------------------
  private def qm03(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("n_frames", nFramesCol)
      .select(col("doc_id"), col("n_frames"),
        explode(expr("sequence(0L, n_frames - 1)")).as("frame_idx"))
      .withColumn("frame_md5",
        md5(concat(col("doc_id").cast("string"), lit(":"), col("frame_idx").cast("string"))))

  private val qm03Sql =
    s"""SELECT doc_id, n_frames, frame_idx,
       |  md5(CAST(doc_id AS VARCHAR) || ':' || CAST(frame_idx AS VARCHAR)) AS frame_md5
       |FROM (SELECT doc_id, $nFramesSql AS n_frames,
       |        unnest(range(0, $nFramesSql)) AS frame_idx
       |      FROM documents)""".stripMargin

  def queries: Seq[Q] = Seq(
    Q("qm01_binary_meta", qm01, Some(qm01Sql)),
    Q("qm02_decode_features", qm02, Some(qm02Sql)),
    Q("qm03_frame_sampling", qm03, Some(qm03Sql)))
}
