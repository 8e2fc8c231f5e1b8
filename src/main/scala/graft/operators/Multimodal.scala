package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column support (SURVEY.md §2.11): media payloads ride as
  * opaque `binary` columns inside a typed struct
  * `{uri, mime, payload}`, with decode/feature-extraction as
  * per-partition batch functions over a typed Dataset.
  *
  * The actual codecs (image/audio/video) are NOT available in this
  * environment, so [[decodeStub]] is a clearly-marked deterministic
  * fake — but everything Spark-side is real and load-bearing: the
  * nested schema, the binary column, the mapPartitions batching (one
  * decoder init per partition, the same shape a JNI/FFmpeg binding
  * needs), and the columnar metadata path that never touches payload
  * bytes.
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
}
