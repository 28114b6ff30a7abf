package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One decoded media asset entering the typed decode stage (m03). */
final case class MediaBlob(doc_id: Long, blob: Array[Byte])

/** Typed metadata produced by the (stubbed) image decoder. */
final case class ImageMeta(doc_id: Long, width: Long, height: Long, aspect: Double)

/** Multimodal-column operators: image/audio/video payloads ride through the
  * engine as opaque `binary` columns with typed metadata extracted by
  * byte-level inspection — mime sniffing from magic bytes, header-field
  * decode, content-hash dedup.
  *
  * The container has no real image/audio codecs, so the DECODE step is a
  * deterministic stub (per the build brief): the ingest stage synthesizes
  * media blobs from the `documents` table — PNG-like assets carry real
  * big-endian width/height header fields, JPEG/WAV-like assets carry their
  * magic bytes — and the decode stage parses those bytes back. Everything
  * around the stub (binary columns, schema, partition-parallel batch
  * decode via mapPartitions, metadata extraction, hash dedup) is the real
  * Spark plumbing a production pipeline would use; swapping the stub for
  * an actual codec changes only the per-record decode function.
  *
  * Cross-engine determinism: the oracle constructs byte-identical blobs
  * (same magic bytes, same big-endian header fields, same UTF-8 payload),
  * so content hashes are md5(hex(blob)) on both engines.
  */
object MultimodalQueries {

  // magic bytes: real PNG / JPEG(JFIF) / RIFF signatures
  private val PngMagic = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
  private val JpegMagic = Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte)
  private val WavMagic = "RIFF".getBytes("UTF-8")

  private val PngHex = "89504E470D0A1A0A"
  private val JpegHexSql = "FFD8FFE0"
  private val WavHexSql = "52494646"

  /** 4-byte big-endian encoding of an integral column. */
  private def be4(c: Column): Column = unhex(lpad(hex(c), 8, "0"))

  /** Deterministic width/height "pixel dims" derived from doc length. */
  private def widthCol: Column = lit(16) + col("n_chars") % 624
  private def heightCol: Column = lit(16) + (col("n_chars") * 7) % 464

  /** Synthesized media blob: modality rotates with doc_id, payload is the
    * given binary column. PNG-like blobs embed width/height as 4-byte
    * big-endian header fields (offsets 8..15), mirroring a real IHDR. */
  private def blobCol(payload: Column): Column =
    when(col("doc_id") % 3 === 0,
      concat(lit(PngMagic), be4(widthCol), be4(heightCol), payload))
      .when(col("doc_id") % 3 === 1, concat(lit(JpegMagic), payload))
      .otherwise(concat(lit(WavMagic), payload))

  /** The same blob in DuckDB SQL (byte-identical). */
  private def blobSql(payloadSql: String): String =
    s"""CASE
          WHEN doc_id % 3 = 0 THEN '\\x89PNG\\x0D\\x0A\\x1A\\x0A'::BLOB
            || unhex(lpad(to_hex(16 + (n_chars % 624)), 8, '0'))
            || unhex(lpad(to_hex(16 + ((n_chars * 7) % 464)), 8, '0'))
            || $payloadSql
          WHEN doc_id % 3 = 1 THEN unhex('$JpegHexSql') || $payloadSql
          ELSE unhex('$WavHexSql') || $payloadSql
        END"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "m01_media_metadata",
      // Binary ingest + metadata: mime type SNIFFED from the blob's magic
      // bytes (not from doc_id — the oracle derives the expected value
      // arithmetically, the engine inspects the bytes), byte size, and a
      // content hash over the full blob.
      Some(s"""
        WITH assets AS (
          SELECT doc_id, ${blobSql("encode(text)")} AS blob FROM documents)
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                    WHEN doc_id % 3 = 1 THEN 'image/jpeg'
                    ELSE 'audio/wav' END AS mime,
               CAST(octet_length(blob) AS BIGINT) AS size_bytes,
               md5(hex(blob)) AS content_md5
        FROM assets ORDER BY doc_id"""),
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .withColumn("blob", blobCol(col("text").cast("binary")))
          .select(
            col("doc_id"),
            when(hex(substring(col("blob"), 1, 8)) === PngHex, "image/png")
              .when(hex(substring(col("blob"), 1, 4)) === JpegHexSql, "image/jpeg")
              .when(substring(col("blob"), 1, 4).cast("string") === "RIFF", "audio/wav")
              .otherwise("application/octet-stream").as("mime"),
            length(col("blob")).cast("long").as("size_bytes"),
            md5(hex(col("blob")).cast("binary")).as("content_md5"))
          .orderBy("doc_id")
    ),
    QueryDef(
      "m02_media_dedup",
      // Exact dedup by content hash over binary payloads: duplicate groups
      // (same bytes under different doc ids) with the kept canonical id.
      // Payload is a 20-char prefix so the synthetic corpus actually
      // contains duplicate assets.
      Some(s"""
        WITH assets AS (
          SELECT doc_id, ${blobSql("encode(substring(text, 1, 20))")} AS blob
          FROM documents),
        hashed AS (SELECT doc_id, md5(hex(blob)) AS content_md5 FROM assets)
        SELECT content_md5, COUNT(*) AS n_copies,
               CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id
        FROM hashed
        GROUP BY content_md5 HAVING COUNT(*) > 1
        ORDER BY content_md5"""),
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .withColumn("blob", blobCol(substring(col("text"), 1, 20).cast("binary")))
          .select(col("doc_id"), md5(hex(col("blob")).cast("binary")).as("content_md5"))
          .groupBy("content_md5")
          .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper_doc_id"))
          .filter(col("n_copies") > 1)
          .orderBy("content_md5")
    ),
    QueryDef(
      "m03_image_decode_stub",
      // Partition-parallel typed decode (the mapInPandas-batch analogue):
      // PNG-like assets flow as Dataset[MediaBlob] through mapPartitions,
      // where the stub decoder parses width/height out of the header BYTES
      // (java.nio big-endian read — a real codec would replace exactly
      // this function). The oracle recomputes the expected fields from the
      // arithmetic the ingest used.
      Some("""
        SELECT doc_id,
               CAST(16 + (n_chars % 624) AS BIGINT) AS width,
               CAST(16 + ((n_chars * 7) % 464) AS BIGINT) AS height,
               round(CAST(16 + (n_chars % 624) AS DOUBLE)
                     / (16 + ((n_chars * 7) % 464)), 4) AS aspect
        FROM documents WHERE doc_id % 3 = 0 ORDER BY doc_id"""),
      (s, dir) => {
        import s.implicits._
        val blobs = Tables.load(s, dir, "documents")
          .filter(col("doc_id") % 3 === 0)
          .select(col("doc_id"), blobCol(col("text").cast("binary")).as("blob"))
          .as[MediaBlob]
        blobs.mapPartitions { it =>
          it.map { m =>
            // STUB decoder: parse the 4-byte big-endian width/height the
            // ingest wrote at offsets 8..15 (no image libs in this env).
            val bb = java.nio.ByteBuffer.wrap(m.blob, 8, 8)
            val w = bb.getInt.toLong
            val h = bb.getInt.toLong
            val aspect = BigDecimal(w.toDouble / h.toDouble)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
            ImageMeta(m.doc_id, w, h, aspect)
          }
        }.toDF().orderBy("doc_id")
      }
    ),
    QueryDef(
      "m04_frame_sample",
      // Frame sampling over video-like binary columns: fixed 16-byte
      // "frames" after a 4-byte container magic, up to 4 evenly strided
      // samples per asset (a real pipeline would hand each sampled byte
      // range to a codec — the byte-range arithmetic, explode shape and
      // per-frame hashing are the production plumbing). Pure integer
      // offset math + string hashing → bit-identical across engines;
      // linear in assets × 4, no shuffle before the final sort.
      Some("""
        WITH assets AS (
          SELECT doc_id, unhex('52494646') || encode(text) AS blob
          FROM documents),
        sized AS (
          SELECT doc_id, blob,
                 CAST((octet_length(blob) - 4) // 16 AS BIGINT) AS n_frames
          FROM assets),
        strided AS (
          SELECT *, CAST(greatest(1, n_frames // 4) AS BIGINT) AS stride
          FROM sized WHERE n_frames >= 1),
        samples AS (
          SELECT doc_id, j AS sample_idx, j * stride AS frame_no,
                 4 + j * stride * 16 AS offset_bytes, blob
          FROM strided, (VALUES (0), (1), (2), (3)) t(j)
          WHERE j * stride < n_frames)
        SELECT doc_id, CAST(sample_idx AS BIGINT) AS sample_idx,
               CAST(frame_no AS BIGINT) AS frame_no,
               CAST(offset_bytes AS BIGINT) AS offset_bytes,
               md5(substr(hex(blob), offset_bytes * 2 + 1, 32)) AS frame_md5
        FROM samples ORDER BY doc_id, sample_idx"""),
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .withColumn("blob", concat(lit(WavMagic), col("text").cast("binary")))
          .withColumn("n_frames",
            expr("CAST((length(blob) - 4) DIV 16 AS BIGINT)"))
          .filter(col("n_frames") >= 1)
          .withColumn("stride",
            greatest(lit(1L), expr("n_frames DIV 4")))
          .withColumn("sample_idx", explode(sequence(lit(0L), lit(3L))))
          .withColumn("frame_no", col("sample_idx") * col("stride"))
          .filter(col("frame_no") < col("n_frames"))
          .withColumn("offset_bytes", lit(4L) + col("frame_no") * 16L)
          .select(col("doc_id"), col("sample_idx"), col("frame_no"),
            col("offset_bytes"),
            md5(expr("CAST(substring(hex(blob), CAST(offset_bytes * 2 + 1 AS INT), 32) AS BINARY)"))
              .as("frame_md5"))
          .orderBy("doc_id", "sample_idx")
    )
  )
}
