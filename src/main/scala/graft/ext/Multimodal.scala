package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.sources.Tables

/** Multimodal-column plumbing: opaque `binary` payload columns with typed
  * metadata, plus a batched decode/feature-extraction stage.
  *
  * The decode is REAL: qm02 round-trips every document through an actual
  * 24-bit BMP image ([[BmpCodec]] — pure JVM, since this container ships
  * no media libraries; BMP is the format a dependency-free decoder can
  * honestly implement). The image content is synthesized deterministically
  * from the document text (the stand-in for "bytes the generator wrote"),
  * so the DuckDB oracle can state the expected features from the text
  * alone — the gate then proves the decoder recovered header fields, row
  * padding, and every pixel exactly. Audio/video codecs remain out of
  * scope (no pure-JVM format of comparable ubiquity); the plumbing below
  * is codec-agnostic:
  *   - binary columns carried through scans/projections without copies,
  *   - a typed per-partition batch API ([[decodeFeatures]]) with the same
  *     shape as a vectorized decode stage (iterator-in/iterator-out per
  *     partition, so codec init amortizes per batch, exactly like
  *     `mapInPandas` does in PySpark),
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
      width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** Deterministic image synthesis for doc (id, text): a (4 + id%5) ×
    * (3 + id%3) RGB image whose pixel k samples the text at evenly-spaced
    * positions — r = code, g = 2·code mod 256, b = (code + k) mod 256.
    * This is the test-harness stand-in for "the generator wrote image
    * bytes"; the oracle restates the same arithmetic over the text. */
  private def synthPixels(id: Long, text: String): (Int, Int, Array[Int]) = {
    val w = (4 + id % 5).toInt
    val h = (3 + id % 3).toInt
    val n = w * h
    // Code points, not UTF-16 units: the qm02 oracle indexes with DuckDB
    // substr/unicode/length (all code-point based), so a non-BMP (astral)
    // character must shift positions identically on both sides.
    val cps = text.codePoints().toArray
    val step = cps.length / n
    val px = Array.tabulate(n) { k =>
      val code = cps(k * step)
      ((code % 256) << 16) | ((code * 2 % 256) << 8) | ((code + k) % 256)
    }
    (w, h, px)
  }

  /** Batched encode→decode→feature-extract through the REAL BMP codec:
    * iterator-in/iterator-out per partition (codec init amortizes per
    * partition, before the iterator map). Every output field comes from
    * the DECODED image — header width/height, payload size, per-channel
    * pixel means (exact integer sums, one IEEE division) — so the gate
    * checks the decoder, not the synthesis. */
  def decodeFeatures(docs: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = synthPixels(r.doc_id, r.text)
        val payload = BmpCodec.encode(w, h, px)
        val img = BmpCodec.decode(payload)
        var sr = 0L; var sg = 0L; var sb = 0L
        img.pixels.foreach { p =>
          sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
        }
        val n = img.pixels.length
        MediaFeatures(r.doc_id, payload.length, img.width, img.height,
          sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
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
  // qm02: the REAL decode stage run through the typed batch API — each doc
  // becomes an actual 24-bit BMP (synthesized from its text, dimensions
  // varying with doc_id so row padding 0–3 bytes is exercised), decoded by
  // BmpCodec, and every output column comes from the decoded image. The
  // oracle restates the synthesis arithmetic from the text alone: a
  // mismatch anywhere in the codec (header fields, stride, BGR order,
  // bottom-up rows) breaks the hash gate.
  // ---------------------------------------------------------------------
  private def qm02(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
      .filter(length(col("text")) >= 40) // >= max npix, so step >= 1
      .select(col("doc_id"), col("text")).as[MediaRow]
    decodeFeatures(docs).toDF()
  }

  private val qm02Sql = {
    def chan(f: String, alias: String) =
      s"CAST(CAST(list_sum(list_transform(range(0, w*h), k -> $f)) AS BIGINT) AS DOUBLE) / (w*h) AS $alias"
    val code = "unicode(substr(text, 1 + k * (length(text) // (w*h)), 1))"
    s"""SELECT doc_id,
       |  CAST(54 + h * (((3*w + 3) // 4) * 4) AS INT) AS n_bytes,
       |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       |  ${chan(s"$code % 256", "mean_r")},
       |  ${chan(s"($code * 2) % 256", "mean_g")},
       |  ${chan(s"($code + k) % 256", "mean_b")}
       |FROM (SELECT doc_id, text, 4 + doc_id % 5 AS w, 3 + doc_id % 3 AS h
       |      FROM documents WHERE length(text) >= 40)""".stripMargin
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
