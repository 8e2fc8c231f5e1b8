package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column support (SURVEY.md §2.11): media payloads ride as
  * opaque `binary` columns inside a typed struct
  * `{uri, mime, payload}`, with decode/feature-extraction as
  * per-partition batch functions over a typed Dataset.
  *
  * Two decode rungs:
  *
  *  - [[decodeImageMeta]] — a REAL image decoder: `javax.imageio`
  *    header decode of actual PNG/JPEG payload bytes to
  *    (width, height, channels, format), reading only the header (no
  *    pixel decode), with corrupt payloads yielding a null-metadata
  *    row instead of a task failure. [[encodeImageFixture]] is its
  *    test-fixture twin: real `ImageIO.write` PNG/JPEG encodes with
  *    dimensions derived from the doc id, so an oracle can state the
  *    expected metadata without parsing bytes.
  *  - [[decodeStub]] — the deterministic fake kept for the
  *    audio/video modalities whose codecs (FFmpeg et al.) are NOT
  *    available in this environment; the mapPartitions batching and
  *    the columnar metadata path around it are real and load-bearing.
  *
  * Scale notes: payloads dominate row size, so the media frame should
  * be stored in its own parquet files with metadata columns first —
  * metadata-only queries then read nothing but the pruned columns
  * (ReadSchema shows no `payload`). Decode fan-out partitions by
  * payload byte size, not row count, to balance executor work.
  */
object Multimodal {

  /** One media row: payload is opaque bytes, mime says how to decode. */
  final case class MediaRecord(
      doc_id: Long, uri: String, mime: String, payload: Array[Byte])

  /** Decoded (faked) media features. */
  final case class MediaFeatures(
      doc_id: Long, mime: String, n_bytes: Long,
      frame_w: Long, frame_h: Long, n_frames: Long)

  implicit val mediaRecordEnc: Encoder[MediaRecord] =
    Encoders.product[MediaRecord]
  implicit val mediaFeaturesEnc: Encoder[MediaFeatures] =
    Encoders.product[MediaFeatures]

  /** Wrap a text table as a media frame: payload = UTF-8 bytes of the
    * text (the deterministic stand-in for real image/audio blobs), a
    * mime fanned out across the four modality families, and a struct
    * `media` column carrying the multimodal triple. */
  def mediaFrame(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
  {
    val m = (col(idCol) % 4).cast("int")
    val mime = when(m === 0, "image/png")
      .when(m === 1, "audio/wav")
      .when(m === 2, "video/mp4")
      .otherwise("text/plain")
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      struct(
        concat(lit("memory://docs/"), col(idCol)).as("uri"),
        mime.as("mime"),
        encode(col(textCol), "UTF-8").as("payload")).as("media"))
      .select(col("doc_id"),
        col("media.uri").as("uri"),
        col("media.mime").as("mime"),
        col("media.payload").as("payload"))
  }

  /** STUB DECODER — deterministic fake. A real deployment replaces this
    * body with the actual codec call (e.g. ImageIO/FFmpeg over
    * `payload`); the signature and the byte-in/features-out contract
    * are the real interface. Width/height/frames are derived from the
    * payload size so tests pin the plumbing end-to-end.
    * [[featureCols]] is the columnar twin of these formulas;
    * MultimodalSpec asserts the two paths equal so they cannot drift. */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val n = r.payload.length.toLong
    MediaFeatures(
      doc_id = r.doc_id,
      mime = r.mime,
      n_bytes = n,
      frame_w = 16L + n % 1024L,
      frame_h = 16L + (n * 31L) % 768L,
      n_frames = 1L + r.doc_id % 30L)
  }

  /** Columnar twin of [[decodeStub]] for metadata-only plans (reads
    * nothing but the pruned columns; the SQL-expressible path the
    * oracle checks via q26). Keep in lockstep with decodeStub — the
    * spec enforces it. */
  def featureCols(docIdCol: Column, payloadCol: Column): Seq[Column] = {
    // widen to LONG before arithmetic: octet_length is INT32 and
    // `n * 31` overflows Int at ~69 MB payloads, silently diverging
    // from decodeStub's Long math (and the BIGINT oracle)
    val n = octet_length(payloadCol).cast("long")
    Seq(
      n.as("n_bytes"),
      (lit(16L) + n % 1024L).as("frame_w"),
      (lit(16L) + (n * 31L) % 768L).as("frame_h"),
      (lit(1L) + docIdCol.cast("long") % 30L).as("n_frames"))
  }

  /** Distributed decode: one pass per partition so a real decoder would
    * init its native context once per task, then stream records
    * through it — the mapInPandas/mapPartitions batch shape. */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] =
    media.mapPartitions { it =>
      // real impl: val codec = Codec.open(); it.map(r => codec.decode(r))
      it.map(decodeStub)
    }

  /** Image header metadata decoded from REAL payload bytes. `ok = 1`
    * when the header parsed; corrupt/unrecognized payloads keep the
    * row with `ok = 0` and null metadata (never a task failure). */
  final case class ImageMeta(
      doc_id: Long, ok: Long, width: Option[Long],
      height: Option[Long], channels: Option[Long],
      format: Option[String])

  implicit val imageMetaEnc: Encoder[ImageMeta] =
    Encoders.product[ImageMeta]

  /** Header-only image decode of one payload: find the ImageIO reader
    * claiming the byte stream's magic, read (width, height) and the
    * color-model component count from the HEADER (no pixel pass), and
    * normalize the format name to lowercase. Returns None for any
    * payload no reader claims or whose header is truncated/corrupt —
    * the decode contract is total, errors are data not exceptions. */
  def decodeImageHeader(payload: Array[Byte])
      : Option[(Long, Long, Long, String)] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          r.setInput(iis)
          try {
            val w = r.getWidth(0).toLong
            val h = r.getHeight(0).toLong
            val types = r.getImageTypes(0)
            val ch =
              if (types.hasNext)
                types.next().getColorModel.getNumComponents.toLong
              else -1L
            Some((w, h, ch,
              r.getFormatName.toLowerCase(java.util.Locale.ROOT)))
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Distributed REAL image-header decode: one `ImageIO` setup per
    * partition (disk cache off — pure in-memory streams), then each
    * record's payload through [[decodeImageHeader]]. The production
    * path for a `{uri, mime, payload}` image frame: metadata columns
    * come out typed, corrupt rows come out flagged, and no payload
    * byte ever crosses a shuffle — decode runs where the scan runs. */
  def decodeImageMeta(media: Dataset[MediaRecord]): Dataset[ImageMeta] =
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        decodeImageHeader(r.payload) match {
          case Some((w, h, ch, fmt)) =>
            ImageMeta(r.doc_id, 1L, Some(w), Some(h), Some(ch), Some(fmt))
          case None =>
            ImageMeta(r.doc_id, 0L, None, None, None, None)
        }
      }
    }

  /** REAL-BYTES image fixture: per doc id, an actual `ImageIO.write`
    * PNG (even ids) or JPEG (odd ids) encode of a
    * `(8 + id % 57) × (8 + (id·3) % 41)` 3-channel image — so the
    * decoded header metadata is a pure function of the id an oracle
    * can state WITHOUT parsing bytes, while the payload is a byte-true
    * image file. Two corruption families are injected to pin the
    * never-fail contract, each hitting BOTH formats (`% 10` parities
    * pair with the `% 2` format rule): `id % 10 ∈ {3, 4}` zeroes the
    * magic byte (no reader claims it — 3 hits a JPEG, 4 a PNG),
    * `id % 10 ∈ {6, 7}` truncates to 16 bytes (the reader claims the
    * magic, then hits EOF inside the header — 6 a PNG, 7 a JPEG). */
  def encodeImageFixture(docs: DataFrame, idCol: String)
      : Dataset[MediaRecord] = {
    val ids = docs.select(col(idCol).cast("long").as("doc_id"))
      .where(col("doc_id").isNotNull && col("doc_id") >= 0)
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    ids.as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val w = 8 + (id % 57).toInt
        val h = 8 + ((id * 3) % 41).toInt
        val png = id % 2 == 0
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, if (png) "png" else "jpg", bos)
        var bytes = bos.toByteArray
        if (id % 10 == 3 || id % 10 == 4) bytes(0) = 0
        else if (id % 10 == 6 || id % 10 == 7) bytes = bytes.take(16)
        MediaRecord(id, s"memory://img/$id",
          if (png) "image/png" else "image/jpeg", bytes)
      }
    }
  }
}
