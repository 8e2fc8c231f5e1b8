package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column support (SURVEY.md §2.11): media payloads ride as
  * opaque `binary` columns inside a typed struct
  * `{uri, mime, payload}`, with decode/feature-extraction as
  * per-partition batch functions over a typed Dataset.
  *
  * Three decode rungs:
  *
  *  - [[decodeImageMeta]] — a REAL image decoder: `javax.imageio`
  *    header decode of actual PNG/JPEG payload bytes to
  *    (width, height, channels, format), reading only the header (no
  *    pixel decode), with corrupt payloads yielding a null-metadata
  *    row instead of a task failure. [[encodeImageFixture]] is its
  *    test-fixture twin: real `ImageIO.write` PNG/JPEG encodes with
  *    dimensions derived from the doc id, so an oracle can state the
  *    expected metadata without parsing bytes.
  *  - [[decodeAudioMeta]] — a REAL audio decoder: the JDK's
  *    `javax.sound.sampled` SPI parsing actual WAV/AIFF container
  *    headers to (sample_rate, channels, frame_count, encoding,
  *    container), same corrupt-rows-are-data contract;
  *    [[encodeAudioFixture]] is its `AudioSystem.write` fixture twin.
  *  - [[decodeStub]] — the deterministic fake kept for the VIDEO
  *    modality only, whose codecs (FFmpeg et al.) are NOT available
  *    in this environment; the mapPartitions batching and the
  *    columnar metadata path around it are real and load-bearing.
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

  /** Fixture-side id routing (r21, guide §2.5 input skew / §2.6 idle
    * capacity): the test tables are single-row-group parquet files, so
    * their scan is ONE partition and every fixture's encode+decode
    * mapPartitions chain would otherwise run on ONE core of the
    * cluster — measured at sf0.1 the MJPEG rung spent ~6 s single-
    * threaded on a 32-core host. Hash-repartition the tiny id frame
    * (8 bytes/row) by the fixture's CONTENT-CLASS key with an EXPLICIT
    * width (`defaultParallelism`: cores locally, total executor cores
    * on a cluster — scale-adaptive, never a constant), so AQE cannot
    * coalesce the small exchange back to one partition. Routing by the
    * content class rather than the id both parallelizes the encode and
    * CO-LOCATES byte-identical fixture classes, letting the per-task
    * encode memo collapse duplicate encodes. Fixture assembly only —
    * OPERATORS never route by content class (unknowable on a real
    * lake); their parallelism is inherited from the routed fixture. */
  private def routeIds(ids: DataFrame, classKey: Column): DataFrame =
    ids.repartition(
      ids.sparkSession.sparkContext.defaultParallelism, classKey)

  /** Per-TASK bounded memo for fixture encodes (r21): the dedup
    * corpora are duplicate-heavy BY DESIGN — the aligned MJPEG/GIF
    * fixtures carry ≤ 36 distinct payloads across 5,000 ids — so
    * computing each distinct content class once per task is plain
    * common-subexpression elimination. Fresh per task: nothing
    * survives a query invocation (the bench's no-cross-run-caching
    * rule). Admission-bounded: past `maxEntries` the memo stops
    * ADMITTING (hits keep serving), so a hostile all-distinct input
    * degrades to the unmemoized path, never to executor OOM. Stored
    * arrays are shared by reference across rows and MUST NOT be
    * mutated by callers — corruption variants are part of the key. */
  private final class TaskMemo[K, V](maxEntries: Int = 4096) {
    private val m = new java.util.HashMap[K, V]()
    def get(k: K)(compute: => V): V =
      if (m.containsKey(k)) m.get(k)
      else {
        val v = compute
        if (m.size < maxEntries) m.put(k, v)
        v
      }
  }

  /** Per-TASK bounded decode memo keyed on PAYLOAD BYTES (r21):
    * decoders are pure functions of the payload, and a dedup corpus
    * repeats payloads by design, so decode-once-per-distinct-payload
    * is the content-addressed discipline a production pipeline runs
    * (checksum dedup BEFORE expensive decode). Keyed on
    * `ByteBuffer.wrap` (content hash/equality over the full bytes —
    * never a truncated digest). Doubly bounded: entry count AND total
    * retained payload bytes, so hostile all-distinct / giant-payload
    * input degrades to plain per-row decode, never OOM. Fresh per
    * task. */
  private final class PayloadMemo[V](maxEntries: Int = 4096,
      maxTotalBytes: Long = 32L << 20) {
    private val m = new java.util.HashMap[java.nio.ByteBuffer, V]()
    private var stored = 0L
    def get(payload: Array[Byte])(compute: => V): V = {
      if (payload == null) return compute
      val k = java.nio.ByteBuffer.wrap(payload)
      if (m.containsKey(k)) m.get(k)
      else {
        val v = compute
        if (m.size < maxEntries &&
            stored + payload.length <= maxTotalBytes) {
          m.put(k, v)
          stored += payload.length
        }
        v
      }
    }
  }

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
    * the decode contract is total over DATA, errors are data not
    * exceptions; a missing ImageInputStream SPI (an environment
    * fault, not a payload property) throws instead of silently
    * flagging every row corrupt. */
  def decodeImageHeader(payload: Array[Byte])
      : Option[(Long, Long, Long, String)] = {
    // createImageInputStream returning null means NO ImageInputStream
    // SPI is registered — an environment fault, not corrupt data. Let
    // it throw (NPE via the explicit check) instead of misreporting
    // the whole dataset as ok=0 corrupt rows.
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    if (iis == null)
      throw new IllegalStateException(
        "no ImageInputStream SPI registered (javax.imageio " +
          "misconfiguration) — refusing to mark payloads corrupt")
    try {
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
      } catch { case scala.util.control.NonFatal(_) => None }
    } finally iis.close()
  }

  /** Distributed REAL image-header decode: one `ImageIO` setup per
    * partition (disk cache off — pure in-memory streams), then each
    * record's payload through [[decodeImageHeader]]. The production
    * path for a `{uri, mime, payload}` image frame: metadata columns
    * come out typed, corrupt rows come out flagged, and no payload
    * byte ever crosses a shuffle — decode runs where the scan runs. */
  def decodeImageMeta(media: Dataset[MediaRecord]): Dataset[ImageMeta] =
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val memo = new PayloadMemo[Option[(Long, Long, Long, String)]]()
      it.map { r =>
        memo.get(r.payload)(decodeImageHeader(r.payload)) match {
          case Some((w, h, ch, fmt)) =>
            ImageMeta(r.doc_id, 1L, Some(w), Some(h), Some(ch), Some(fmt))
          case None =>
            ImageMeta(r.doc_id, 0L, None, None, None, None)
        }
      }
    }

  /** Audio header metadata decoded from REAL payload bytes — the
    * q206 pattern applied to the second modality: `ok = 1` when the
    * container header parsed; corrupt/unrecognized payloads keep the
    * row with `ok = 0` and null metadata (never a task failure). */
  final case class AudioMeta(
      doc_id: Long, ok: Long, sample_rate: Option[Long],
      channels: Option[Long], n_frames: Option[Long],
      encoding: Option[String], container: Option[String])

  implicit val audioMetaEnc: Encoder[AudioMeta] =
    Encoders.product[AudioMeta]

  /** The `javax.sound.sampled` SPI provider lists, resolved ONCE per
    * JVM (r21 — guide §4.5 "initialise heavyweight state once per
    * task", applied to the JDK itself): every
    * `AudioSystem.getAudioFileFormat` / `getAudioInputStream` /
    * `write` call resolves its provider list through
    * `JDK13Services.getProviders` — a global SYNCHRONIZED static —
    * and the JDK's `SoftMidiAudioFileReader` additionally consults
    * `MidiSystem` (the same lock) for every payload the sampled-audio
    * readers rejected. Under a 32-way-parallel decode stage that lock
    * serializes the whole executor: measured 5,000 parallel header
    * decodes = 0.64 s through `AudioSystem` vs 0.012 s through
    * per-JVM providers with the MThd-guarded midi reader (50×), and
    * parallel 5,000 WAV writes 0.25 s → 0.01 s. Provider instances
    * are the SAME stateless singletons `AudioSystem` hands every
    * caller — caching providers is classpath configuration, not data
    * (no result crosses queries). The midi reader is consulted ONLY
    * for payloads bearing the standard-MIDI `MThd` magic —
    * `MidiSystem`'s parsers can claim nothing else — so skipping it
    * elsewhere is result-identical and saves the MidiSystem lock
    * round-trip on every corrupt/foreign payload. All shipped
    * sampled-audio readers claim disjoint magics (RIFF/FORM/.snd),
    * so iteration order among them is immaterial; midi goes last
    * (the last-resort provider, as in the JDK's own ordering). */
  private lazy val audioReaders
      : IndexedSeq[javax.sound.sampled.spi.AudioFileReader] = {
    val out =
      IndexedSeq.newBuilder[javax.sound.sampled.spi.AudioFileReader]
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    while (it.hasNext) out += it.next()
    val (midi, sampled) =
      out.result().partition(_.getClass.getName.contains("Midi"))
    sampled ++ midi
  }

  private lazy val audioWriters
      : IndexedSeq[javax.sound.sampled.spi.AudioFileWriter] = {
    val out =
      IndexedSeq.newBuilder[javax.sound.sampled.spi.AudioFileWriter]
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
    while (it.hasNext) out += it.next()
    out.result()
  }

  private def isMidiMagic(p: Array[Byte]): Boolean =
    p.length >= 4 && p(0) == 'M' && p(1) == 'T' && p(2) == 'h' &&
      p(3) == 'd'

  /** First-claiming provider's AudioFileFormat for the payload, or
    * None — `AudioSystem.getAudioFileFormat` semantics through the
    * per-JVM provider list (see [[audioReaders]]). */
  private def audioFileFormatOf(payload: Array[Byte])
      : Option[javax.sound.sampled.AudioFileFormat] = {
    val midiOk = isMidiMagic(payload)
    val it = audioReaders.iterator
    while (it.hasNext) {
      val r = it.next()
      if (midiOk || !r.getClass.getName.contains("Midi")) {
        try return Some(r.getAudioFileFormat(
          new java.io.ByteArrayInputStream(payload)))
        catch { case scala.util.control.NonFatal(_) => () }
      }
    }
    None
  }

  /** First-claiming provider's AudioInputStream for the payload, or
    * None — `AudioSystem.getAudioInputStream` semantics through the
    * per-JVM provider list (see [[audioReaders]]). */
  private def audioInputStreamOf(payload: Array[Byte])
      : Option[javax.sound.sampled.AudioInputStream] = {
    val midiOk = isMidiMagic(payload)
    val it = audioReaders.iterator
    while (it.hasNext) {
      val r = it.next()
      if (midiOk || !r.getClass.getName.contains("Midi")) {
        try return Some(r.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload)))
        catch { case scala.util.control.NonFatal(_) => () }
      }
    }
    None
  }

  /** `AudioSystem.write` through the per-JVM provider list (first
    * writer claiming the type — the JDK's own selection rule). */
  private def writeAudio(ais: javax.sound.sampled.AudioInputStream,
      tpe: javax.sound.sampled.AudioFileFormat.Type,
      out: java.io.OutputStream): Unit = {
    val it = audioWriters.iterator
    while (it.hasNext) {
      val w = it.next()
      if (w.isFileTypeSupported(tpe, ais)) { w.write(ais, tpe, out); return }
    }
    throw new IllegalArgumentException(
      s"no AudioFileWriter supports $tpe")
  }

  /** Header-only audio decode of one payload via the JDK's
    * `javax.sound.sampled` SPI (WAV + AIFF ship with the JDK — the
    * same zero-new-dependency argument as [[decodeImageHeader]]'s
    * ImageIO): parse the container header to (sample_rate, channels,
    * frame_count, encoding, container) WITHOUT touching sample data.
    * Returns None for any payload no provider claims or whose header
    * is truncated/corrupt — total over DATA: each provider probe is
    * caught NonFatal, because the loop iterates EVERY AudioFileReader
    * SPI on the executor classpath (a real cluster often carries
    * third-party mp3/flac readers transitively), and an unusual
    * payload making any of them throw an unchecked exception must be
    * a corrupt-data row, not a stage failure — the same totality
    * argument MultimodalProps pins for all three decoders. (A missing
    * SPI is NOT silently absorbed the way ImageIO's null stream would
    * be: with zero providers every row is None → wholesale ok=0,
    * which the fixture spec catches loudly.) Providers are resolved
    * per JVM, not per call — see [[audioReaders]]. */
  def decodeAudioHeader(payload: Array[Byte])
      : Option[(Long, Long, Long, String, String)] =
    try {
      audioFileFormatOf(payload).map { aff =>
        val fmt = aff.getFormat
        (fmt.getSampleRate.toLong, fmt.getChannels.toLong,
          aff.getFrameLength.toLong,
          fmt.getEncoding.toString.toLowerCase(java.util.Locale.ROOT),
          aff.getType.toString.toLowerCase(java.util.Locale.ROOT))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Distributed REAL audio-header decode — [[decodeImageMeta]]'s
    * shape for the audio modality: header-only parse where the scan
    * runs, metadata out typed, corrupt rows flagged `ok = 0`, no
    * payload byte crossing a shuffle. */
  def decodeAudioMeta(media: Dataset[MediaRecord]): Dataset[AudioMeta] =
    media.mapPartitions { it =>
      val memo =
        new PayloadMemo[Option[(Long, Long, Long, String, String)]]()
      it.map { r =>
        memo.get(r.payload)(decodeAudioHeader(r.payload)) match {
          case Some((rate, ch, frames, enc, container)) =>
            AudioMeta(r.doc_id, 1L, Some(rate), Some(ch), Some(frames),
              Some(enc), Some(container))
          case None =>
            AudioMeta(r.doc_id, 0L, None, None, None, None, None)
        }
      }
    }

  /** REAL-BYTES audio fixture ([[encodeImageFixture]]'s twin): per doc
    * id, an actual `AudioSystem.write` WAV (even ids — 16-bit signed
    * little-endian PCM) or AIFF (odd ids — big-endian, the AIFF
    * container's requirement) encode of silence with id-derived
    * parameters — sample rate `8000 + (id % 5)·2000`, channels
    * `1 + id % 2`, frame count `50 + (id·7) % 151` — so the decoded
    * header metadata is pure id arithmetic an oracle can state without
    * parsing bytes. The image fixture's two corruption families carry
    * over, each hitting BOTH containers: `id % 10 ∈ {3, 4}` zeroes the
    * magic byte (3 an AIFF, 4 a WAV — no provider claims it),
    * `id % 10 ∈ {6, 7}` truncates to 16 bytes (6 a WAV, 7 an AIFF —
    * the provider claims the magic, then hits EOF inside the header).
    */
  def encodeAudioFixture(docs: DataFrame, idCol: String)
      : Dataset[MediaRecord] = {
    val ids = docs.select(col(idCol).cast("long").as("doc_id"))
      .where(col("doc_id").isNotNull && col("doc_id") >= 0)
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    // frame counts walk mod 151 (prime) ≫ other periods, payloads
    // effectively all-distinct: no memo, ROUTE for parallelism (r21)
    routeIds(ids, col("doc_id"))
      .as[Long].mapPartitions { it =>
      it.map { id =>
        val rate = 8000 + (id % 5).toInt * 2000
        val channels = 1 + (id % 2).toInt
        val frames = 50 + ((id * 7) % 151).toInt
        val wav = id % 2 == 0
        val fmt = new javax.sound.sampled.AudioFormat(
          rate.toFloat, 16, channels, true, !wav)
        val pcm = new Array[Byte](frames * fmt.getFrameSize)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        writeAudio(ais,
          if (wav) javax.sound.sampled.AudioFileFormat.Type.WAVE
          else javax.sound.sampled.AudioFileFormat.Type.AIFF, bos)
        var bytes = bos.toByteArray
        if (id % 10 == 3 || id % 10 == 4) bytes(0) = 0
        else if (id % 10 == 6 || id % 10 == 7) bytes = bytes.take(16)
        MediaRecord(id, s"memory://audio/$id",
          if (wav) "audio/wav" else "audio/aiff", bytes)
      }
    }
  }

  /** MODALITY ROUTER — sniff the container from MAGIC BYTES, never
    * the mime column: at lake scale the declared mime is whatever the
    * crawler guessed (wrong extensions, text/plain blobs holding
    * JPEGs), and every downstream decoder dispatch
    * ([[decodeImageMeta]]/[[decodeAudioMeta]]/[[decodeVideoMeta]])
    * wastes a full SPI probe on misrouted payloads. The router is the
    * cheap row-local pre-pass production pipelines actually run:
    * first-bytes signatures for PNG (\\x89PNG), GIF (GIF87a/GIF89a),
    * JPEG (FF D8 FF), RIFF/WAVE, RIFF/AVI (MJPEG — byte 8 splits the
    * shared RIFF prefix), FORM/AIFF, ISO-BMFF (`ftyp` at offset 4),
    * else `unknown`. ISO-BMFF payloads dispatch on the MAJOR BRAND (the
    * four bytes after `ftyp` — r16 verdict: the family is a shared
    * container, not a video format): `M4A `/`M4B `/`M4P ` are MPEG-4
    * audio (music, audiobooks, protected tracks),
    * `heic`/`heix`/`hevc`/`hevx` are HEIC stills/sequences,
    * `mif1`/`msf1` generic HEIF, `avif`/`avis` AVIF, anything
    * else (isom/mp42/qt..) routes `video/mp4` — brand-blind routing
    * would dedup M4A podcasts and HEIC photos down the video branch
    * and poison the modality profile. Pure byte comparisons —
    * codegen-friendly, exactly restatable by an oracle that knows
    * the fixture's encoder, and the disagreement count
    * (sniffed ≠ declared) is the lake-health readout. */
  def sniffModality(payload: Column): Column = {
    // substring on BINARY yields the raw bytes; compare against
    // X'..' literals (both engines define binary equality bytewise)
    def bytesAt(pos: Int, len: Int): Column =
      substring(payload, pos, len)
    when(bytesAt(1, 4) === lit(Array[Byte](0x89.toByte, 'P', 'N', 'G')),
      "image/png")
      .when(bytesAt(1, 6) === lit("GIF87a".getBytes("US-ASCII")) ||
        bytesAt(1, 6) === lit("GIF89a".getBytes("US-ASCII")),
        "image/gif")
      .when(bytesAt(1, 3) ===
        lit(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte)),
        "image/jpeg")
      .when(bytesAt(1, 4) === lit("RIFF".getBytes("US-ASCII")) &&
        bytesAt(9, 4) === lit("WAVE".getBytes("US-ASCII")), "audio/wav")
      .when(bytesAt(1, 4) === lit("RIFF".getBytes("US-ASCII")) &&
        bytesAt(9, 4) === lit("AVI ".getBytes("US-ASCII")),
        "video/x-msvideo")
      .when(bytesAt(1, 4) === lit("FORM".getBytes("US-ASCII")) &&
        bytesAt(9, 4) === lit("AIFF".getBytes("US-ASCII")), "audio/aiff")
      .when(bytesAt(5, 4) === lit("ftyp".getBytes("US-ASCII")),
        when(bytesAt(9, 4).isin(Seq("M4A ", "M4B ", "M4P ")
          .map(b => lit(b.getBytes("US-ASCII"))): _*), "audio/mp4")
          .when(bytesAt(9, 4).isin(Seq("heic", "heix", "hevc", "hevx")
            .map(b => lit(b.getBytes("US-ASCII"))): _*), "image/heic")
          .when(bytesAt(9, 4).isin(Seq("mif1", "msf1")
            .map(b => lit(b.getBytes("US-ASCII"))): _*), "image/heif")
          .when(bytesAt(9, 4).isin(Seq("avif", "avis")
            .map(b => lit(b.getBytes("US-ASCII"))): _*), "image/avif")
          .otherwise("video/mp4"))
      .otherwise("unknown")
  }

  /** One decoded audio fingerprint row: `ok = 1` with the 64-bit
    * envelope hash when the payload decoded and carried enough
    * samples; `ok = 0`/null otherwise. */
  final case class AudioFingerprint(doc_id: Long, ok: Long,
      fp: Option[Long])

  implicit val audioFingerprintEnc: Encoder[AudioFingerprint] =
    Encoders.product[AudioFingerprint]

  /** 64-bit ENERGY-ENVELOPE hash of one audio payload — the
    * dedup × audio rung (the dHash idea applied to the time axis, and
    * the standard pre-spectral audio-fingerprint baseline): decode
    * the REAL PCM sample stream (`javax.sound.sampled`, WAV/AIFF,
    * 16-bit), fold the first channel into 65 consecutive
    * `window`-sample mean-absolute-amplitude values (the energy
    * envelope), set bit w iff window w+1 is louder than window w.
    * Adjacent-window comparisons make the hash invariant to global
    * gain (volume re-normalization — the commonest re-encode
    * transform) while tracking the envelope SHAPE, which is what
    * repeats across copies of one recording.
    *
    * INTEGER-exact: sample values are exact 16-bit integers off the
    * container (endianness per the format header — WAV little, AIFF
    * big), the window mean is `sum(|s|) div window`, the bit a strict
    * integer comparison — an oracle that knows the waveform restates
    * the hash without decoding. None for unclaimable/corrupt
    * payloads, non-16-bit encodings, or streams shorter than 65 full
    * windows — data, not exceptions. */
  def audioEnvelopeHash64(payload: Array[Byte], window: Int = 256)
      : Option[Long] =
    try {
      // per-JVM provider list, not AudioSystem — the r21 SPI-lock
      // finding (see audioReaders)
      val ais = audioInputStreamOf(payload) match {
        case Some(s) => s
        case None => return None
      }
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 ||
          fmt.getEncoding !=
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) None
        else {
          val frameSize = fmt.getFrameSize
          val big = fmt.isBigEndian
          val needed = 65 * window
          val buf = new Array[Byte](needed * frameSize)
          var off = 0
          var read = 0
          while (read >= 0 && off < buf.length) {
            read = ais.read(buf, off, buf.length - off)
            if (read > 0) off += read
          }
          if (off < buf.length) None
          else {
            val env = new Array[Long](65)
            var w = 0
            while (w < 65) {
              var sum = 0L
              var j = 0
              while (j < window) {
                val base = (w * window + j) * frameSize
                val s =
                  if (big) ((buf(base) << 8) | (buf(base + 1) & 0xff))
                  else ((buf(base + 1) << 8) | (buf(base) & 0xff))
                sum += math.abs(s.toLong)
                j += 1
              }
              env(w) = sum / window
              w += 1
            }
            var fp = 0L
            w = 0
            while (w < 64) {
              if (env(w + 1) > env(w)) fp |= 1L << w
              w += 1
            }
            Some(fp)
          }
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** The envelope hash DERIVED from an energy stream —
    * [[audioEnvelopeHash64]]'s columnar twin (r18, the decode-once
    * seam): the envelope's bit `w` is exactly `env(w+1) > env(w)`
    * over the first 65 windows, and [[audioWindowEnergies]] computes
    * those identical window means — so ONE PCM pass can power the
    * envelope fingerprint (clusters, q296's decontam) AND every
    * energy consumer (q290 segments, q293 gates, q307/q309 clip
    * shingles) instead of each decoding the samples again.
    * Recordings with fewer than 65 complete windows carry no row
    * (the [[audioEnvelopeHash64]] None contract — too short to
    * fingerprint). Bit 63 rides the two's-complement sum (the
    * MIN_BIGINT composition every envelope oracle replays).
    * MultimodalSpec pins `≡ audioFingerprints` on the fixtures.
    *
    * Scale shape: one per-recording self-join on `w+1` (co-keyed —
    * the window frame is 24 bytes/row) + a reduced fold; no window
    * function, no decode. */
  def envelopeFromEnergies(energies: DataFrame): DataFrame = {
    val first = energies.select(col("doc_id"), col("w"), col("amp"))
      .where(col("w") < 65)
    val full = first.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("__n")).where(col("__n") === 65L)
      .select(col("doc_id"))
    first.join(full, Seq("doc_id"))
      .join(first.select(col("doc_id"), (col("w") - 1).as("w"),
        col("amp").as("__next")), Seq("doc_id", "w"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("__next") > col("amp"),
        expr("shiftleft(1L, cast(w as int))")).otherwise(0L))
        .as("fp"))
      .select(col("doc_id"), col("fp"))
  }

  /** One per-window energy row: window index and the EXACT
    * mean-absolute amplitude `sum(|s|) div window` (the engine's
    * fixed-point discipline — an oracle that knows the sample
    * function restates it without a float). */
  final case class AudioWindowEnergy(doc_id: Long, w: Long, amp: Long)

  implicit val audioWindowEnergyEnc: Encoder[AudioWindowEnergy] =
    Encoders.product[AudioWindowEnergy]

  /** Distributed per-window energy decode — the
    * [[audioEnvelopeHash64]] fold WITHOUT the hash: every COMPLETE
    * `window`-sample window's mean-abs amplitude of the first
    * channel, one row each, for the energy analyses that need the
    * envelope itself (silence segmentation, clipping/level audits)
    * rather than a dedup key. Total: corrupt / non-16-bit-PCM
    * payloads contribute no rows; a trailing partial window is
    * dropped (its mean is not comparable); hostile lengths cap at
    * 2²⁰ windows. One decode pass, 24 bytes/row out, payloads never
    * shuffle. */
  def audioWindowEnergies(media: Dataset[MediaRecord],
      window: Int = 256): Dataset[AudioWindowEnergy] = {
    require(window >= 1, s"need window >= 1, got $window")
    media.mapPartitions { it =>
      val memo = new PayloadMemo[IndexedSeq[Long]]()
      it.flatMap(r =>
        memo.get(r.payload)(windowEnergiesOf(r.payload, window))
          .iterator.zipWithIndex
          .map { case (amp, w) => AudioWindowEnergy(r.doc_id, w, amp) })
    }
  }

  /** The pure per-payload half of [[audioWindowEnergies]]: complete
    * windows' exact mean-abs amplitudes, in order. Empty on any
    * decode failure / non-16-bit-PCM stream — total over hostile
    * bytes (property-fuzzed). */
  private[graft] def windowEnergiesOf(payload: Array[Byte],
      window: Int): IndexedSeq[Long] =
    try {
      // per-JVM provider list, not AudioSystem — the r21 SPI-lock
      // finding (see audioReaders)
      val ais = audioInputStreamOf(payload) match {
        case Some(s) => s
        case None => return IndexedSeq.empty
      }
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 ||
          fmt.getEncoding !=
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
          IndexedSeq.empty
        else {
          val frameSize = fmt.getFrameSize
          val big = fmt.isBigEndian
          val buf = new Array[Byte](window * frameSize)
          val out = IndexedSeq.newBuilder[Long]
          var w = 0L
          var eof = false
          while (!eof && w < (1L << 20)) {
            var off = 0
            var read = 0
            while (read >= 0 && off < buf.length) {
              read = ais.read(buf, off, buf.length - off)
              if (read > 0) off += read
            }
            if (off < buf.length) eof = true // partial window drops
            else {
              var sum = 0L
              var j = 0
              while (j < window) {
                val base = j * frameSize
                val s =
                  if (big) ((buf(base) << 8) | (buf(base + 1) & 0xff))
                  else ((buf(base + 1) << 8) | (buf(base) & 0xff))
                sum += math.abs(s.toLong)
                j += 1
              }
              out += sum / window
              w += 1
            }
          }
          out.result()
        }
      } finally ais.close()
    } catch {
      case scala.util.control.NonFatal(_) => IndexedSeq.empty
    }

  /** AUDIO ENERGY SEGMENTATION — [[videoShotSegments]]' audio
    * sibling, the VAD-shaped readout a speech pipeline runs before
    * paying ASR (strip silence, meter speech mass): label each
    * window QUIET iff its mean-abs amplitude < `quietBelow`, then
    * group CONSECUTIVE same-label windows into segments. Output
    * (doc_id, seg_idx, start_w, end_w, n_windows, is_quiet) ordered.
    *
    * Scale shape: ONE window pass partitioned by recording (per-doc
    * window counts bound the partition — never a global window) +
    * the per-(doc, segment) fold; input is the 24-byte energy frame
    * ([[audioWindowEnergies]]), payloads never touched. The
    * threshold compare is integer-exact, so the oracle replays the
    * whole segment table from the fixture's amplitude function. */
  def audioEnergySegments(energies: DataFrame, idCol: String,
      winCol: String, ampCol: String, quietBelow: Long): DataFrame = {
    require(quietBelow >= 1, s"need quietBelow >= 1, got $quietBelow")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("w"))
    energies.select(col(idCol).as("doc_id"), col(winCol).as("w"),
        (col(ampCol) < quietBelow).as("is_quiet"))
      .withColumn("__prev", lag(col("is_quiet"), 1).over(w))
      .withColumn("__cut", when(col("__prev").isNull ||
        col("is_quiet") =!= col("__prev"), 1L).otherwise(0L))
      .withColumn("seg_idx", sum(col("__cut")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        - 1L)
      .groupBy(col("doc_id"), col("seg_idx"))
      .agg(min(col("w")).as("start_w"), max(col("w")).as("end_w"),
        count(lit(1)).as("n_windows"),
        // labels are equal within a segment by construction; min is
        // the deterministic pick (first() is order-dependent)
        min(col("is_quiet")).as("is_quiet"))
      .orderBy(col("doc_id"), col("seg_idx"))
  }

  /** SEGMENT-ADAPTIVE audio excerpt schedule — [[shotSampleSchedule]]'s
    * audio sibling, composed over [[audioEnergySegments]]' output:
    * a per-recording budget of `k` window seeks split across the
    * LOUD segments in proportion to length (every loud segment gets
    * at least one; quiet segments get none — the whole point: a
    * speech pipeline excerpts speech, not silence), each segment
    * seeked at its positional midpoints. Pure integer arithmetic:
    * `k_s = min(n_s, max(1, (k·n_s) div F_loud))`, seek j at window
    * `start_w + (n_s·(2j+1)) div (2·k_s)` — segments are runs of
    * CONSECUTIVE windows by construction, so the offsets address
    * real windows with no gap hazard, and the `n_s` ceiling keeps
    * every seek DISTINCT (a recording whose loud mass sits in one
    * short segment would otherwise seek the same window k times
    * under distinct sample_idx).
    *
    * Scale shape: two reduced folds (per-segment sizes ride in, a
    * per-recording loud total) re-attached by a co-keyed shuffle
    * join — the segment frame scales with the corpus and is never
    * broadcast. Input is [[audioEnergySegments]]' exact output
    * shape; output (doc_id, seg_idx, sample_idx, w) ordered. */
  def audioExcerptSchedule(segments: DataFrame, k: Int = 4,
      scope: graft.engine.CacheScope =
        graft.engine.CacheScope.unmanaged): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    // two consumers (totals, the allocation join) — persist so the
    // segment fold (and the decode pass under it) runs once
    val loud = scope.persist(segments.where(!col("is_quiet"))
      .select(col("doc_id"), col("seg_idx"), col("start_w"),
        col("n_windows")))
    val totals = loud.groupBy(col("doc_id"))
      .agg(sum(col("n_windows")).as("__f"))
    loud.join(totals, Seq("doc_id"))
      .withColumn("__k_s", least(col("n_windows"),
        greatest(lit(1L), expr(s"($k * n_windows) div __f"))))
      .select(col("doc_id"), col("seg_idx"), col("start_w"),
        col("n_windows"), col("__k_s"),
        explode(sequence(lit(0L), col("__k_s") - 1L)).as("sample_idx"))
      .select(col("doc_id"), col("seg_idx"), col("sample_idx"),
        (col("start_w") +
          expr("(n_windows * (2 * sample_idx + 1)) div (2 * __k_s)"))
          .as("w"))
      .orderBy(col("doc_id"), col("seg_idx"), col("sample_idx"))
  }

  /** One image-quality gate row: decoded dims plus the three
    * row-local drop reasons and the composed keep. */
  final case class ImageQuality(doc_id: Long, width: Long,
      height: Long, flat: Boolean, too_small: Boolean,
      extreme_aspect: Boolean, keep: Boolean)

  implicit val imageQualityEnc: Encoder[ImageQuality] =
    Encoders.product[ImageQuality]

  /** IMAGE QUALITY GATES — the keep/drop curation decision an
    * image-corpus team runs before any expensive downstream work
    * (the LAION-style pre-filter): per DECODABLE image,
    *  - `too_small`: pixel count < `minPx` (thumbnails/favicons
    *    carry no training signal),
    *  - `extreme_aspect`: `max(w,h) > aspectMax · min(w,h)` (banner
    *    strips, sprite sheets),
    *  - `flat`: the dHash carries ZERO gradient bits — a constant
    *    (blank/solid) image; an image the 9×8 grid cannot cover is
    *    treated flat too (its contrast cannot be attested),
    *  - `keep` = none of the above.
    * ONE ImageIO decode per payload computes dims AND the hash (the
    * decode-once discipline — running [[decodeImageMeta]] and
    * [[imageDhash]] separately would decode twice); undecodable
    * payloads contribute no rows (they are the router/health
    * funnel's business, not a quality judgment). All gates are
    * integer-exact, so an oracle that knows the fixture replays the
    * whole decision table. */
  def imageQualityGates(media: Dataset[MediaRecord],
      minPx: Long = 1024L, aspectMax: Int = 8)
      : Dataset[ImageQuality] = {
    require(minPx >= 1 && aspectMax >= 1,
      s"bad gates minPx=$minPx aspectMax=$aspectMax")
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      // memo carries the decode-derived triple (w, h, flat); the gate
      // arithmetic is row-local and cheap
      val memo = new PayloadMemo[Option[(Long, Long, Boolean)]]()
      it.flatMap { r =>
        val decoded = memo.get(r.payload)(try {
          Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload)))
            .map(im => (im.getWidth.toLong, im.getHeight.toLong,
              dhashImage(im).forall(_ == 0L)))
        } catch { case scala.util.control.NonFatal(_) => None })
        decoded.map { case (w, h, flat) =>
          val tooSmall = w * h < minPx
          val extreme = math.max(w, h) > aspectMax * math.min(w, h)
          ImageQuality(r.doc_id, w, h, flat, tooSmall, extreme,
            !(flat || tooSmall || extreme))
        }
      }
    }
  }

  /** KEEP-BEST-RESOLUTION canonical pick — the curation refinement on
    * top of any image cluster decision: a min-id canonical keeps an
    * ARBITRARY member of each near-dup family, but a corpus team
    * wants the best copy — the highest-resolution member, ties to
    * the smallest id. q48's keep-best discipline on the media rung:
    * the argmax is a partial-aggregable `max(struct(px, -doc_id))` —
    * NO window, no per-cluster sort; the per-cluster best frame
    * scales with the corpus and re-attaches by a co-keyed shuffle
    * join, never a broadcast. Input: `clusters` = (doc_id,
    * cluster_id) (any cluster decision), `meta` = (doc_id, width,
    * height) ([[decodeImageMeta]]'s ok rows). Members without meta
    * drop (an undecodable member cannot be the best copy — nor
    * judged against one). Output (doc_id, cluster_id, best_id,
    * is_best) ordered. */
  def keepBestResolution(clusters: DataFrame, meta: DataFrame)
      : DataFrame =
    keepBest(clusters, meta.select(col("doc_id"),
      (col("width") * col("height")).as("__px")), Seq("__px"))

  /** The MODALITY-GENERIC keep-best canonical pick —
    * [[keepBestResolution]]'s argmax lifted to ANY cluster decision
    * and ANY quality readout (r18: the q294 `max(struct(quality,
    * -id))` shape generalized so audio clusters pick their
    * highest-sample-rate copy, video/GIF clusters their
    * most-frames × largest-dims copy — never an arbitrary min-id
    * member): per cluster, the member maximizing `qualityCols`
    * LEXICOGRAPHICALLY (first column dominates), ties to the
    * smallest id. Partial-aggregable — NO window, no per-cluster
    * sort; the per-cluster best frame scales with the corpus and
    * re-attaches by a co-keyed shuffle join, never a broadcast.
    * Members without a quality row drop (a copy whose quality cannot
    * be measured cannot be the best — nor judged against one).
    * Output (doc_id, cluster_id, best_id, is_best) ordered. */
  def keepBest(clusters: DataFrame, quality: DataFrame,
      qualityCols: Seq[String]): DataFrame = {
    require(qualityCols.nonEmpty, "need at least one quality column")
    val m = clusters.select(col("doc_id"), col("cluster_id"))
      .join(quality.select(col("doc_id") +: qualityCols.map(col): _*),
        Seq("doc_id"))
    val best = m.groupBy(col("cluster_id"))
      .agg(max(struct(qualityCols.map(col) :+
        (-col("doc_id")).as("__nid"): _*)).as("__b"))
      .select(col("cluster_id"), (-col("__b.__nid")).as("best_id"))
    m.join(best, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("best_id"),
        (col("doc_id") === col("best_id")).as("is_best"))
      .orderBy(col("doc_id"))
  }

  /** REAL-BYTES image-QUALITY fixture: per doc id, a lossless PNG in
    * one of five `id % 5` families — (0) a patterned 72×64 keeper,
    * (1) a FLAT 72×64 solid, (2) a flat 16×8 thumbnail (too_small ∧
    * flat), (3) a flat 128×8 banner strip (extreme_aspect ∧ flat —
    * 1024 px, exactly AT the default minPx so only the aspect gate
    * trips), (4) zeroed magic (no rows). Lossless + flat blocks keep
    * every gate id-arithmetic. */
  def encodeQualityImageFixture(docs: DataFrame, idCol: String)
      : Dataset[MediaRecord] = {
    val ids = docs.select(col(idCol).cast("long").as("doc_id"))
      .where(col("doc_id").isNotNull && col("doc_id") >= 0)
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    // payload is a pure function of id % 5 — five distinct PNGs in
    // the whole corpus (r21 route+memo)
    routeIds(ids, pmod(col("doc_id"), lit(5L)))
      .as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val memo = new TaskMemo[Long, Array[Byte]]()
      it.map { id =>
        val payload = memo.get(id % 5L) {
          def flatImg(w: Int, h: Int, v: Int) = {
            val im = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val ras = im.getRaster
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { ras.setSample(x, y, 0, v); x += 1 }
              y += 1
            }
            im
          }
          val img = (id % 5) match {
            case 0 => flatBlockImage(_ => 0x55)
            case 1 => flatImg(72, 64, 128)
            case 2 => flatImg(16, 8, 40)
            case 3 => flatImg(128, 8, 200)
            case _ => flatImg(72, 64, 0)
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          val bytes = bos.toByteArray
          if (id % 5 == 4) { bytes(0) = 0; bytes(1) = 0 }
          bytes
        }
        MediaRecord(id, s"memory://qimg/$id", "image/png", payload)
      }
    }
  }

  /** AUDIO QUALITY GATES — the keep/drop pre-filter completing the
    * per-modality gate symmetry (text q23, image
    * [[imageQualityGates]], audio here), composed over
    * [[audioEnergySegments]]' output: per recording,
    *  - `too_short`: fewer than `minWindows` decoded windows (a clip
    *    too short to carry training signal),
    *  - `mostly_quiet`: quiet windows exceed `maxQuietNum /
    *    maxQuietDen` of the total — CROSS-MULTIPLIED
    *    (`quiet·den > total·num`), so the boundary is integer-exact
    *    and cannot float,
    *  - `keep` = neither.
    * One reduced per-recording fold over the segment frame — the
    * decode already happened upstream; this is pure decision
    * arithmetic an oracle replays. */
  def audioQualityGates(segments: DataFrame, minWindows: Long = 8L,
      maxQuietNum: Int = 1, maxQuietDen: Int = 2): DataFrame = {
    require(minWindows >= 1 && maxQuietNum >= 0 && maxQuietDen >= 1 &&
      maxQuietNum <= maxQuietDen,
      s"bad gates minWindows=$minWindows share=$maxQuietNum/$maxQuietDen")
    segments.groupBy(col("doc_id"))
      .agg(sum(col("n_windows")).as("n_windows"),
        sum(when(col("is_quiet"), col("n_windows")).otherwise(0L))
          .as("quiet_windows"))
      .select(col("doc_id"), col("n_windows"), col("quiet_windows"),
        (col("n_windows") < minWindows).as("too_short"),
        (col("quiet_windows") * maxQuietDen >
          col("n_windows") * maxQuietNum).as("mostly_quiet"))
      .withColumn("keep", !col("too_short") && !col("mostly_quiet"))
      .orderBy(col("doc_id"))
  }

  /** VIDEO QUALITY GATES — the keep/drop pre-filter closing the
    * per-modality gate symmetry (text q23, image [[imageQualityGates]],
    * audio [[audioQualityGates]], video here), composed over the ONE
    * frame-decode pass a video pipeline already ran
    * ([[videoFrameFingerprints]] / [[gifFrameFingerprints]]) plus the
    * header-only container metadata ([[decodeMjpegMeta]] — byte
    * arithmetic, no second pixel decode): per video,
    *  - `too_short`: fewer than `minFrames` DECODED frames (a clip
    *    too short to carry temporal training signal; observed frames,
    *    not the header's claim — a lying header must not vouch for
    *    frames that never decoded),
    *  - `tiny`: container pixel count `w·h < minPx` (thumbnail-sized
    *    video trains nothing, the q292 rule on the third modality),
    *  - `all_static`: ONE shot under [[videoShotSegments]]' cut rule
    *    (no consecutive frame pair moves more than `cutHamming` dHash
    *    bits) AND zero gradient bits in every frame — a solid-color
    *    dead clip (a static-camera SCENE keeps its gradient bits and
    *    survives; only flat nothing drops),
    *  - `keep` = none of the above.
    * Inputs: `frameFps` = (doc_id, frame_idx, fp) ok-filtered frame
    * fingerprints; `meta` = (doc_id, width, height) ok rows. Videos
    * whose container failed either pass have no rows (the router /
    * health funnel's business — the image-gate contract). All gates
    * are integer-exact and replayable.
    *
    * Scale shape: the q281 label pass (one per-video window, bounded
    * by per-video frame counts) + one reduced per-video fold + a
    * co-keyed join against the meta frame — 16-byte rows only. */
  def videoQualityGates(frameFps: DataFrame, meta: DataFrame,
      minFrames: Long = 4L, minPx: Long = 1024L,
      cutHamming: Int = 8): DataFrame = {
    require(minFrames >= 1 && minPx >= 1,
      s"bad gates minFrames=$minFrames minPx=$minPx")
    val folded = videoShotLabels(frameFps, "doc_id", "frame_idx",
        "fp", cutHamming)
      .join(frameFps.select(col("doc_id"), col("frame_idx"),
        col("fp")), Seq("doc_id", "frame_idx"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        (max(col("shot_idx")) + 1L).as("__n_shots"),
        max(bit_count(col("fp"))).as("__max_grad"))
    folded.join(meta.select(col("doc_id"), col("width"),
        col("height")), Seq("doc_id"))
      .select(col("doc_id"), col("n_frames"), col("width"),
        col("height"),
        (col("n_frames") < minFrames).as("too_short"),
        (col("width") * col("height") < minPx).as("tiny"),
        (col("__n_shots") === 1L && col("__max_grad") === 0)
          .as("all_static"))
      .withColumn("keep",
        !col("too_short") && !col("tiny") && !col("all_static"))
      .orderBy(col("doc_id"))
  }

  /** REAL-BYTES video-QUALITY fixture — [[encodeQualityImageFixture]]'s
    * shape on the MJPEG rung: per doc id, a real AVI in one of five
    * `id % 5` families — (0) a two-scene patterned 72×64 keeper
    * (cuts AND gradient: survives every gate), (1) an ALL-STATIC
    * 72×64 solid — six identical flat frames, zero cuts, zero
    * gradient bits, (2) a too-short two-frame patterned clip,
    * (3) a flat 24×16 thumbnail clip (tiny ∧ all_static — 384 px,
    * under the default minPx), (4) zeroed RIFF magic (no rows).
    * Flat frames quantize to a lone DC coefficient, so JPEG
    * round-trips them constant and every gate is id-arithmetic. */
  def encodeQualityMjpegFixture(docs: DataFrame, idCol: String)
      : Dataset[MediaRecord] = {
    val ids = docs.select(col(idCol).cast("long").as("doc_id"))
      .where(col("doc_id").isNotNull && col("doc_id") >= 0)
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    // payload is a pure function of id % 60 (g = id%12, family/
    // corruption by id%5; lcm(12,5) = 60) — r21 route+memo
    routeIds(ids, pmod(col("doc_id"), lit(60L)))
      .as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      def flatJpeg(w: Int, h: Int, v: Int): Array[Byte] = {
        val im = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val ras = im.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { ras.setSample(x, y, 0, v); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(im, "jpg", bos)
        bos.toByteArray
      }
      val memo = new TaskMemo[Long, Array[Byte]]()
      it.map { id =>
        val payload = memo.get(id % 60L) {
          val g = (id % 12).toInt
          def scenes(n: Int): IndexedSeq[Array[Byte]] =
            (0 until n).map { f =>
              val s = f / 3
              flatBlockJpeg(r =>
                mjpegPatterns((g * 7 + s * 5 + r) % 4))
            }
          val (jpegs, w, h) = (id % 5) match {
            case 0 => (scenes(6), 72, 64)
            case 1 => (IndexedSeq.fill(6)(flatJpeg(72, 64, 128)),
              72, 64)
            case 2 => (scenes(2), 72, 64)
            case 3 => (IndexedSeq.fill(6)(flatJpeg(24, 16, 200)),
              24, 16)
            case _ => (scenes(3), 72, 64)
          }
          val corrupt = if (id % 5 == 4) 3 else 0
          assembleMjpegAvi(jpegs, corrupt, w, h)
        }
        MediaRecord(id, s"memory://qvid/$id", "video/x-msvideo",
          payload)
      }
    }
  }

  /** REAL-BYTES SEGMENTED waveform fixture — the audio sibling of
    * [[encodeSceneMjpegFixture]]: per doc id, a mono 16-bit 8 kHz
    * WAV of `2 + id%4` segments alternating LOUD/QUIET (starting
    * loud), segment k spanning `2 + (id+k)%3` windows of 256
    * samples, amplitudes `1000 + (id%7)·100` (loud) and
    * `80 + (id%5)·10` (quiet) on the ±carrier, so every window's
    * mean-abs IS the segment amplitude exactly and the segment table
    * is pure id arithmetic at any threshold in (130, 1000].
    * Corruption: `id%10 = 3` zeroes the RIFF magic, `id%10 = 6`
    * truncates to 16 bytes. */
  def encodeSegmentedWaveformFixture(docs: DataFrame, idCol: String)
      : Dataset[MediaRecord] = {
    val ids = docs.select(col(idCol).cast("long").as("doc_id"))
      .where(col("doc_id").isNotNull && col("doc_id") >= 0)
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    // payload is a pure function of id % 420 (segments id%4/id%3,
    // amplitudes id%7/id%5, corruption id%10; lcm = 420) — r21
    // route+memo
    routeIds(ids, pmod(col("doc_id"), lit(420L)))
      .as[Long].mapPartitions { it =>
      val memo = new TaskMemo[Long, Array[Byte]]()
      it.map { id =>
        val payload = memo.get(id % 420L) {
          val window = 256
          val nSeg = (2 + id % 4).toInt
          val segLens =
            (0 until nSeg).map(k => (2 + (id + k) % 3).toInt)
          val loud = (1000 + (id % 7) * 100).toInt
          val quiet = (80 + (id % 5) * 10).toInt
          val nWin = segLens.sum
          val pcm = new Array[Byte](nWin * window * 2)
          var i = 0
          var seg = 0
          var segEnd = segLens(0) * window
          while (i < nWin * window) {
            if (i >= segEnd) {
              seg += 1; segEnd += segLens(seg) * window
            }
            val amp = if (seg % 2 == 0) loud else quiet
            val s = if (i % 4 < 2) amp else -amp
            pcm(2 * i) = (s & 0xff).toByte
            pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(
            8000f, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt,
            (nWin * window).toLong)
          val bos = new java.io.ByteArrayOutputStream()
          writeAudio(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          var bytes = bos.toByteArray
          if (id % 10 == 3) bytes(0) = 0
          else if (id % 10 == 6) bytes = bytes.take(16)
          bytes
        }
        MediaRecord(id, s"memory://segwave/$id", "audio/wav", payload)
      }
    }
  }

  /** Distributed audio fingerprinting — the decode batch shape with
    * the usual contracts (corrupt → ok = 0, payloads never shuffle). */
  def audioFingerprints(media: Dataset[MediaRecord])
      : Dataset[AudioFingerprint] =
    media.mapPartitions { it =>
      val memo = new PayloadMemo[Option[Long]]()
      it.map { r =>
        memo.get(r.payload)(audioEnvelopeHash64(r.payload)) match {
          case Some(fp) => AudioFingerprint(r.doc_id, 1L, Some(fp))
          case None => AudioFingerprint(r.doc_id, 0L, None)
        }
      }
    }

  /** One audio-container chunk row from [[audioChunks]]' walk. */
  final case class AudioChunk(doc_id: Long, chunk_idx: Long,
      container: String, fourcc: String, byte_off: Long, n_bytes: Long)

  implicit val audioChunkEnc: Encoder[AudioChunk] =
    Encoders.product[AudioChunk]

  /** AUDIO container chunk inventory — the RIFF/WAVE + FORM/AIFF
    * sibling of the ISO-BMFF box walk ([[decodeSampleTable]]): the
    * pre-decode STRUCTURE audit a media lake runs before trusting a
    * payload to a decoder — which chunks exist, where, how big (the
    * byte ranges a selective reader fetches; `data`/`SSND` is the
    * sample mass, everything else is header). Pure integer byte
    * arithmetic on the IFF layouts (RIFF little-endian, AIFF
    * big-endian, both even-padded), TOTAL over bytes: corrupt magic,
    * truncation mid-chunk, a declared size overrunning the payload,
    * or a walk that does not consume the declared extent exactly all
    * yield None — errors are data, never exceptions. Chunk count is
    * bounded (hostile headers cannot drive the walk). */
  def audioChunkList(payload: Array[Byte])
      : Option[(String, IndexedSeq[(String, Long, Long)])] = {
    def fourcc(off: Int): String =
      new String(payload, off, 4, "US-ASCII")
    def u32le(off: Int): Long =
      (payload(off) & 0xffL) | ((payload(off + 1) & 0xffL) << 8) |
        ((payload(off + 2) & 0xffL) << 16) |
        ((payload(off + 3) & 0xffL) << 24)
    def u32be(off: Int): Long =
      ((payload(off) & 0xffL) << 24) | ((payload(off + 1) & 0xffL) << 16) |
        ((payload(off + 2) & 0xffL) << 8) | (payload(off + 3) & 0xffL)
    try {
      if (payload.length < 12) return None
      val container = (fourcc(0), fourcc(8)) match {
        case ("RIFF", "WAVE") => "wave"
        case ("FORM", "AIFF") => "aiff"
        case _ => return None
      }
      val le = container == "wave"
      // the declared container extent: 8 + the size field after the
      // magic; a payload shorter than it is truncated -> malformed
      val end = (if (le) u32le(4) else u32be(4)) + 8L
      if (end > payload.length.toLong) return None
      val out = IndexedSeq.newBuilder[(String, Long, Long)]
      var off = 12L
      var n = 0
      while (off + 8 <= end) {
        val sz = if (le) u32le(off.toInt + 4) else u32be(off.toInt + 4)
        if (off + 8 + sz > end) return None
        out += ((fourcc(off.toInt), off, sz))
        off += 8 + sz + (sz & 1) // IFF even padding
        n += 1
        if (n > 64) return None // structure bound, not a data bound
      }
      // the walk must consume the declared extent exactly (one final
      // pad byte may land just past an odd extent) and find at least
      // one chunk — a bare magic is not a valid container
      if (off != end && off != end + 1) return None
      if (n == 0) return None
      Some((container, out.result()))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Distributed chunk inventory: one row per (audio, chunk) with the
    * byte range — the [[videoSampleBytes]] batch shape on the audio
    * container. Undecodable payloads have no rows (the structure
    * audit reads health from the q207 decode pass). */
  def audioChunks(media: Dataset[MediaRecord]): Dataset[AudioChunk] =
    media.mapPartitions { it =>
      it.flatMap { r =>
        audioChunkList(r.payload) match {
          case Some((c, chunks)) => chunks.iterator.zipWithIndex.map {
            case ((fc, off, sz), i) =>
              AudioChunk(r.doc_id, i.toLong, c, fc, off, sz)
          }
          case None => Iterator.empty
        }
      }
    }

  /** One PNG chunk row from [[pngChunks]]' walk. */
  final case class PngChunk(doc_id: Long, chunk_idx: Long,
      fourcc: String, byte_off: Long, n_bytes: Long)

  implicit val pngChunkEnc: Encoder[PngChunk] =
    Encoders.product[PngChunk]

  /** PNG container chunk inventory — the third leg of the structure
    * audit family ([[decodeSampleTable]] walks ISO-BMFF boxes,
    * [[audioChunkList]] walks RIFF/AIFF chunks): which chunks a PNG
    * payload declares, where, how big — the byte ranges a selective
    * reader fetches (`IDAT` is the pixel mass, everything else is
    * header/ancillary). Pure integer byte arithmetic on the PNG
    * chunk grammar (big-endian `length ‖ type ‖ data ‖ CRC`,
    * signature-prefixed), TOTAL over bytes: a corrupt signature, a
    * declared length overrunning the payload, a non-alphabetic chunk
    * type, a walk that does not open with `IHDR`, close with `IEND`,
    * or consume the payload exactly, and a hostile chunk count all
    * yield None — errors are data, never exceptions. CRCs are
    * deliberately NOT validated: this is the pre-decode STRUCTURE
    * audit (where are the bytes), not an integrity pass — the q243
    * content checksum and the decode rung own integrity. */
  def pngChunkList(payload: Array[Byte])
      : Option[IndexedSeq[(String, Long, Long)]] = {
    def u32be(off: Int): Long =
      ((payload(off) & 0xffL) << 24) | ((payload(off + 1) & 0xffL) << 16) |
        ((payload(off + 2) & 0xffL) << 8) | (payload(off + 3) & 0xffL)
    try {
      if (payload.length < 8) return None
      val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      var i = 0
      while (i < 8) {
        if ((payload(i) & 0xff) != sig(i)) return None
        i += 1
      }
      val out = IndexedSeq.newBuilder[(String, Long, Long)]
      var off = 8L
      var n = 0
      var last = ""
      while (off + 8 <= payload.length) {
        val sz = u32be(off.toInt)
        if (off + 12 + sz > payload.length.toLong) return None
        var j = 0
        while (j < 4) { // chunk types are four ASCII letters by spec
          val c = payload(off.toInt + 4 + j) & 0xff
          if (!((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')))
            return None
          j += 1
        }
        last = new String(payload, off.toInt + 4, 4, "US-ASCII")
        if (n == 0 && last != "IHDR") return None
        out += ((last, off, sz))
        off += 12 + sz
        n += 1
        // structure bound, not a data bound — sized for real encoders
        // that split IDAT every 8-64 KB (a 256 MB image at 64 KB per
        // IDAT is ~4k chunks), unlike the 64-chunk audio/RIFF bound
        // (no legitimate WAV/AIFF carries dozens of chunks)
        if (n > 4096) return None
      }
      // consume the payload exactly (no trailing bytes) and close well
      if (off != payload.length.toLong) return None
      if (n < 2 || last != "IEND") return None
      Some(out.result())
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Distributed PNG chunk inventory: one row per (image, chunk) with
    * the byte range — the [[audioChunks]] batch shape on the image
    * container. Undecodable payloads have no rows. */
  def pngChunks(media: Dataset[MediaRecord]): Dataset[PngChunk] =
    media.mapPartitions { it =>
      it.flatMap { r =>
        pngChunkList(r.payload) match {
          case Some(chunks) => chunks.iterator.zipWithIndex.map {
            case ((fc, off, sz), i) =>
              PngChunk(r.doc_id, i.toLong, fc, off, sz)
          }
          case None => Iterator.empty
        }
      }
    }

  /** STRUCTURE-EXACT PNG fixture: per doc id, a hand-assembled but
    * fully standard PNG — 8-bit grayscale `(1 + id%8) × (1 + (id·3)%5)`,
    * pixel `(x, y) = (id + x + 7y) mod 256`, one `IDAT` whose zlib
    * stream uses a single STORED deflate block — so the chunk layout
    * is pure id arithmetic an oracle can restate WITHOUT parsing
    * bytes: `IHDR(13)` at 8, `IDAT(rawlen + 11)` at 33,
    * `IEND(0)` at `56 + rawlen`, `rawlen = h·(w+1)` (stored-block
    * framing: 2-byte zlib header + 5-byte block header + raw
    * filter-0 scanlines + 4-byte Adler-32). The [[encodeImageFixture]]
    * `ImageIO.write` twin stays the DECODE rung's fixture — a
    * compressor owns its `IDAT` sizes there, which is exactly why the
    * STRUCTURE rung assembles its own deflate framing (CRCs and
    * Adler-32 are real: the JDK's own ImageIO reads these payloads
    * back pixel-exact, spec-pinned). Corruption families:
    * `id % 10 = 3` zeroes the signature, `id % 10 = 6` truncates to
    * 16 bytes (EOF inside `IHDR`), `id % 10 = 9` declares an
    * `IDAT` length of 2³²−1 (overrun — the q275 hostile-size
    * branch). */
  def encodePngFixture(docs: DataFrame, idCol: String)
      : Dataset[MediaRecord] = {
    val ids = docs.select(col(idCol).cast("long").as("doc_id"))
      .where(col("doc_id").isNotNull && col("doc_id") >= 0)
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    ids.as[Long].map { id =>
      val w = 1 + (id % 8).toInt
      val h = 1 + ((id * 3) % 5).toInt
      val raw = new Array[Byte](h * (w + 1))
      var y = 0
      while (y < h) { // raw(y·(w+1)) stays 0: filter None
        var x = 0
        while (x < w) {
          raw(y * (w + 1) + 1 + x) = ((id + x + 7L * y) % 256).toByte
          x += 1
        }
        y += 1
      }
      def be32(v: Long): Array[Byte] = Array(
        ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      def chunk(fourcc: String, data: Array[Byte]): Array[Byte] = {
        val crc = new java.util.zip.CRC32()
        val t = fourcc.getBytes("US-ASCII")
        crc.update(t); crc.update(data)
        be32(data.length.toLong) ++ t ++ data ++ be32(crc.getValue)
      }
      val ihdr = be32(w.toLong) ++ be32(h.toLong) ++
        Array[Byte](8, 0, 0, 0, 0) // 8-bit gray, deflate/none/none
      val adler = new java.util.zip.Adler32()
      adler.update(raw)
      val idat = Array(0x78, 0x01, 0x01, // zlib hdr + final stored blk
        raw.length & 0xff, (raw.length >> 8) & 0xff,
        ~raw.length & 0xff, (~raw.length >> 8) & 0xff)
        .map(_.toByte) ++ raw ++ be32(adler.getValue)
      val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte)
      var bytes = sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", idat) ++
        chunk("IEND", Array.emptyByteArray)
      if (id % 10 == 3) {
        var i = 0; while (i < 8) { bytes(i) = 0; i += 1 }
      } else if (id % 10 == 6) bytes = bytes.take(16)
      else if (id % 10 == 9) {
        var i = 0; while (i < 4) { bytes(33 + i) = 0xff.toByte; i += 1 }
      }
      MediaRecord(id, s"memory://spng/$id", "image/png", bytes)
    }
  }

  /** REAL-BYTES waveform fixture for the envelope-hash rung: per doc
    * id, a mono 16-bit 8 kHz WAV of 66 × 256 samples whose value is a
    * ±1 square carrier times a PER-WINDOW amplitude
    * `A(w) = 500 + ((id%21 + w) % 7)·300`, plus a +400 tweak on
    * window 0 when `(id div 21) % 2 = 1` — so each window's mean
    * absolute amplitude IS A(w) exactly and the envelope hash is pure
    * id arithmetic (21 envelope patterns × a ≤-1-bit tweak variant).
    * Corruption families: `id % 10 = 3` zeroes the RIFF magic,
    * `id % 10 = 6` truncates to 16 bytes.
    *
    * `rateOf` sets the DECLARED sample rate per id (default the
    * constant 8 kHz) — the PCM bytes and therefore the envelope hash
    * are rate-independent (windows are sample-indexed), so a
    * rate-variant fixture carries dup families whose members differ
    * in header QUALITY while fingerprinting identical — the
    * keep-best rung's test bed (q300). */
  def encodeWaveformFixture(docs: DataFrame, idCol: String,
      rateOf: Long => Float = _ => 8000f)
      : Dataset[MediaRecord] = {
    val ids = docs.select(col(idCol).cast("long").as("doc_id"))
      .where(col("doc_id").isNotNull && col("doc_id") >= 0)
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    // PCM/corruption are a pure function of id % 210 (pattern id%21,
    // tweak (id/21)%2 → period 42, corruption id%10; lcm = 210); the
    // caller-supplied DECLARED rate also shapes the header, so it
    // rides in the memo key — r21 route+memo
    routeIds(ids, pmod(col("doc_id"), lit(210L)))
      .as[Long].mapPartitions { it =>
      val memo = new TaskMemo[(Long, Float), Array[Byte]]()
      it.map { id =>
        val payload = memo.get((id % 210L, rateOf(id))) {
          val window = 256
          val nWin = 66
          val pcm = new Array[Byte](nWin * window * 2) // mono s16le
          var i = 0
          while (i < nWin * window) {
            val w = i / window
            val amp = 500 + (((id % 21) + w) % 7).toInt * 300 +
              (if (w == 0 && (id / 21) % 2 == 1) 400 else 0)
            val s = if (i % 4 < 2) amp else -amp
            pcm(2 * i) = (s & 0xff).toByte
            pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(
            rateOf(id), 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt,
            (nWin * window).toLong)
          val bos = new java.io.ByteArrayOutputStream()
          writeAudio(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          var bytes = bos.toByteArray
          if (id % 10 == 3) bytes(0) = 0
          else if (id % 10 == 6) bytes = bytes.take(16)
          bytes
        }
        MediaRecord(id, s"memory://wave/$id", "audio/wav", payload)
      }
    }
  }

  /** Video container metadata decoded from REAL payload bytes — the
    * third modality, same contract: `ok = 1` when the MP4 (ISO BMFF)
    * container header parsed; corrupt/unrecognized payloads keep the
    * row with `ok = 0` and null metadata. What is and is not real
    * here: the CONTAINER parse (box tree, `ftyp` brand, `mvhd`
    * timescale/duration, `trak`/`tkhd` count and dimensions) is a
    * genuine ISO 14496-12 byte-level decode, the exact metadata a
    * catalog/curation pass needs; codec-FRAME decode (pixels) is the
    * part that genuinely needs FFmpeg (absent in this environment)
    * and remains out of scope — [[decodeStub]] stays only as the
    * documented interface for that frame-level work. */
  final case class VideoMeta(
      doc_id: Long, ok: Long, brand: Option[String],
      duration_ms: Option[Long], n_tracks: Option[Long],
      width: Option[Long], height: Option[Long])

  implicit val videoMetaEnc: Encoder[VideoMeta] =
    Encoders.product[VideoMeta]

  /** Header-only MP4/ISO-BMFF decode of one payload: walk the box
    * tree, require `ftyp` first, then read `moov`→`mvhd` (timescale,
    * duration) and count `trak` boxes, taking (width, height) from
    * the FIRST `trak`'s `tkhd` (16.16 fixed point). Pure byte
    * arithmetic — no codec, no SPI. Spec coverage the happy path
    * alone would miss (ISO 14496-12 §4.2): `size == 1` boxes carry a
    * 64-bit largesize (the > 4 GB mdat case), `size == 0` means
    * box-extends-to-EOF (legal only for the LAST box — stream-written
    * files end this way); BOTH mvhd/tkhd versions are parsed — v0
    * (32-bit times) at the classic offsets and v1 (64-bit times,
    * emitted by common muxers for long or post-2038 content) at its
    * shifted ones; any OTHER version is unknown → None, never a
    * confident misparse. Returns None for anything malformed
    * (unknown first box, box size past the payload end,
    * missing/truncated mvhd or tkhd, zero timescale) — total over
    * data, errors are data not exceptions. */
  // ---- shared ISO-BMFF byte-walk helpers (decodeVideoHeader +
  // decodeSampleTable read the same tree) ------------------------------
  private def bmffU32(payload: Array[Byte], off: Int): Long =
    ((payload(off) & 0xffL) << 24) | ((payload(off + 1) & 0xffL) << 16) |
      ((payload(off + 2) & 0xffL) << 8) | (payload(off + 3) & 0xffL)
  private def bmffU64(payload: Array[Byte], off: Int): Long =
    (bmffU32(payload, off) << 32) | bmffU32(payload, off + 4)
  private def bmffFourCC(payload: Array[Byte], off: Int): String =
    new String(payload, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Children of `[start, end)`: (type, payloadStart, payloadEnd), or
    * None if any box is malformed. size==1 → 64-bit largesize after
    * the type; size==0 → to end-of-window, last box by construction. */
  private def bmffBoxes(payload: Array[Byte], start: Int, end: Int)
      : Option[Seq[(String, Int, Int)]] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var off = start
    while (off < end) {
      if (off + 8 > end) return None
      val sz32 = bmffU32(payload, off)
      val (sz, hdr) =
        if (sz32 == 1L) {
          if (off + 16 > end) return None
          (bmffU64(payload, off + 8), 16)
        } else if (sz32 == 0L) ((end - off).toLong, 8)
        else (sz32, 8)
      if (sz < hdr || off + sz > end) return None
      out += ((bmffFourCC(payload, off + 4), off + hdr, off + sz.toInt))
      off += sz.toInt
    }
    Some(out.result())
  }

  /** Container-HEALTH gate for ANY ISO-BMFF payload, brand-agnostic:
    * the top-level box walk must consume the payload exactly and the
    * first box must be a well-formed `ftyp`. This is the gate of the
    * EXACT-identity dedup tiers (M4A audio, HEIF-family images —
    * codecs the JDK cannot decode, where container health still
    * separates "a real file we keep by byte identity" from
    * truncated/corrupt junk that must drop) — deliberately WEAKER
    * than [[decodeVideoHeader]]'s moov/mvhd requirement, because
    * HEIF stills carry a `meta` box, not a movie header. Total:
    * any walk failure is `false`, never an exception. */
  def isoBmffWalks(payload: Array[Byte]): Boolean =
    try {
      bmffBoxes(payload, 0, payload.length).exists(top =>
        top.headOption.exists(b => b._1 == "ftyp" && b._3 - b._2 >= 8))
    } catch { case scala.util.control.NonFatal(_) => false }

  /** One container-health row of the exact-identity tiers. */
  final case class ContainerHealth(doc_id: Long, ok: Long)

  implicit val containerHealthEnc: Encoder[ContainerHealth] =
    Encoders.product[ContainerHealth]

  /** Distributed [[isoBmffWalks]] — the decode-gate pass of the
    * exact tiers; payload bytes never cross a shuffle (8 bytes of
    * verdict do). */
  def isoContainerHealth(media: Dataset[MediaRecord])
      : Dataset[ContainerHealth] =
    media.mapPartitions { it =>
      it.map(r => ContainerHealth(r.doc_id,
        if (isoBmffWalks(r.payload)) 1L else 0L))
    }

  /** One ISO-BMFF metadata row of the EXACT-identity tiers (r18):
    * what the container walk can honestly measure for codecs the JDK
    * cannot decode — the ftyp BRAND, the `moov`→`mvhd` duration when
    * a movie header exists (M4A audio, plain video), and the HEIF
    * still-item pixel dimensions from `meta`→`iprp`→`ipco`→`ispe`
    * when an item-property tree exists (HEIC/HEIF/AVIF). Fields are
    * independently optional: a healthy container missing a box keeps
    * nulls there, never a confident misparse. */
  final case class IsoMeta(doc_id: Long, ok: Long,
      brand: Option[String], duration_ms: Option[Long],
      width: Option[Long], height: Option[Long])

  implicit val isoMetaEnc: Encoder[IsoMeta] = Encoders.product[IsoMeta]

  /** Header-only metadata walk for ANY ISO-BMFF payload — the
    * [[isoBmffWalks]] health gate upgraded to a READOUT (what the
    * q221 profile needs for the exact-tier classes, which previously
    * reported health + brand only):
    *  - brand from the well-formed first `ftyp`,
    *  - duration from `moov`→`mvhd` (both FullBox versions, the
    *    [[decodeVideoHeader]] dispatch — `duration·1000 div
    *    timescale`, zero timescale refuses),
    *  - HEIF pixel dims from `meta`→`iprp`→`ipco`→`ispe` (ISO
    *    23008-12 §6.5.3: the `meta` box is a FULLBOX — its children
    *    start 4 bytes in, the version/flags the naive walk trips
    *    over; `ispe` payload = version/flags + u32 width + u32
    *    height).
    * Pure byte arithmetic, total over data: any malformed layer
    * yields None for ITS field (or the whole row when the top walk /
    * ftyp fails), never an exception. */
  def decodeIsoMetaHeader(payload: Array[Byte])
      : Option[(String, Option[Long], Option[Long], Option[Long])] =
    try {
      for {
        top <- bmffBoxes(payload, 0, payload.length)
        ftyp <- top.headOption.filter(b =>
          b._1 == "ftyp" && b._3 - b._2 >= 8)
      } yield {
        val brand = bmffFourCC(payload, ftyp._2)
        val dur = for {
          moov <- top.find(_._1 == "moov")
          inner <- bmffBoxes(payload, moov._2, moov._3)
          mvhd <- inner.find(_._1 == "mvhd")
          tsDur <- bmffMvhdFields(payload, mvhd._2, mvhd._3)
          if tsDur._1 > 0
        } yield tsDur._2 * 1000L / tsDur._1
        val dims = for {
          meta <- top.find(_._1 == "meta")
          if meta._3 - meta._2 >= 4 // FullBox: skip version/flags
          inner <- bmffBoxes(payload, meta._2 + 4, meta._3)
          iprp <- inner.find(_._1 == "iprp")
          ipco <- bmffBoxes(payload, iprp._2, iprp._3)
            .flatMap(_.find(_._1 == "ipco"))
          ispe <- bmffBoxes(payload, ipco._2, ipco._3)
            .flatMap(_.find(_._1 == "ispe"))
          if ispe._3 - ispe._2 >= 12
        } yield (bmffU32(payload, ispe._2 + 4),
          bmffU32(payload, ispe._2 + 8))
        (brand, dur, dims.map(_._1), dims.map(_._2))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Distributed [[decodeIsoMetaHeader]] — the exact tiers' catalog
    * pass: brand + duration + HEIF dims where the scan runs, corrupt
    * rows flagged `ok = 0`, no payload byte crossing a shuffle. */
  def decodeIsoMeta(media: Dataset[MediaRecord]): Dataset[IsoMeta] =
    media.mapPartitions { it =>
      it.map { r =>
        decodeIsoMetaHeader(r.payload) match {
          case Some((brand, dur, w, h)) =>
            IsoMeta(r.doc_id, 1L, Some(brand), dur, w, h)
          case None => IsoMeta(r.doc_id, 0L, None, None, None, None)
        }
      }
    }

  /** `mvhd` FullBox version dispatch, shared by [[decodeVideoHeader]]
    * and [[decodeIsoMeta]]: (value offsets, min payload length)
    * differ between v0 (32-bit times) and v1 (64-bit); unknown
    * versions must NOT be read at guessed offsets. Returns
    * (timescale, duration). */
  private def bmffMvhdFields(payload: Array[Byte], start: Int,
      end: Int): Option[(Long, Long)] = {
    val len = end - start
    if (len < 1) None
    else payload(start) match {
      // ver/flags 4 + ctime/mtime (4+4 | 8+8) → timescale, duration
      case 0 if len >= 20 =>
        Some((bmffU32(payload, start + 12), bmffU32(payload, start + 16)))
      case 1 if len >= 28 =>
        Some((bmffU32(payload, start + 20), bmffU64(payload, start + 24)))
      case _ => None
    }
  }

  def decodeVideoHeader(payload: Array[Byte])
      : Option[(String, Long, Long, Long, Long)] = {
    def u32(off: Int): Long = bmffU32(payload, off)
    def u64(off: Int): Long = bmffU64(payload, off)
    def fourCC(off: Int): String = bmffFourCC(payload, off)
    def boxes(start: Int, end: Int): Option[Seq[(String, Int, Int)]] =
      bmffBoxes(payload, start, end)
    def mvhdFields(start: Int, end: Int): Option[(Long, Long)] =
      bmffMvhdFields(payload, start, end)
    def tkhdDims(start: Int, end: Int): Option[(Long, Long)] = {
      val len = end - start
      if (len < 1) None
      else payload(start) match {
        // ver/flags + times/id/reserved/duration (v0: 20, v1: 32) +
        // reserved 8 + layer/alt/volume/reserved 8 + matrix 36 → w, h
        case 0 if len >= 84 => Some((u32(start + 76), u32(start + 80)))
        case 1 if len >= 96 => Some((u32(start + 88), u32(start + 92)))
        case _ => None
      }
    }
    try {
      for {
        top <- boxes(0, payload.length)
        ftyp <- top.headOption.filter(b =>
          b._1 == "ftyp" && b._3 - b._2 >= 8)
        moov <- top.find(_._1 == "moov")
        inner <- boxes(moov._2, moov._3)
        mvhd <- inner.find(_._1 == "mvhd")
        (timescale, duration) <- mvhdFields(mvhd._2, mvhd._3)
        if timescale > 0
        traks = inner.filter(_._1 == "trak")
        tkhd <- traks.headOption.flatMap(t => boxes(t._2, t._3))
          .flatMap(_.find(_._1 == "tkhd"))
        (w, h) <- tkhdDims(tkhd._2, tkhd._3)
      } yield
        (fourCC(ftyp._2), duration * 1000L / timescale,
          traks.size.toLong, w >> 16, h >> 16)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Distributed REAL video-container decode — [[decodeImageMeta]]'s
    * shape for the third modality: pure-arithmetic header parse where
    * the scan runs, typed metadata out, corrupt rows flagged `ok = 0`,
    * no payload byte crossing a shuffle. */
  def decodeVideoMeta(media: Dataset[MediaRecord]): Dataset[VideoMeta] =
    media.mapPartitions { it =>
      it.map { r =>
        decodeVideoHeader(r.payload) match {
          case Some((brand, durMs, nTracks, w, h)) =>
            VideoMeta(r.doc_id, 1L, Some(brand), Some(durMs),
              Some(nTracks), Some(w), Some(h))
          case None =>
            VideoMeta(r.doc_id, 0L, None, None, None, None, None)
        }
      }
    }

  /** One decoded media sample (frame): its index, decode timestamp,
    * and the BYTE RANGE in the file — what a downstream frame
    * extractor actually fetches. */
  final case class SampleByte(doc_id: Long, sample_idx: Long,
      t_ms: Long, byte_off: Long, n_bytes: Long)

  implicit val sampleByteEnc: Encoder[SampleByte] =
    Encoders.product[SampleByte]

  /** SAMPLE-TABLE decode (stts/stsc/stsz/stco) of the FIRST track —
    * the r14 verdict's missing rung: q209 stopped at mvhd/tkhd, so
    * the q238 seek plan ended at timestamps; the sample tables give
    * each frame's BYTE offset and size in pure integer arithmetic,
    * turning the plan into ranges a downstream extractor can fetch —
    * still FFmpeg-free (the codec decode of those bytes remains the
    * one declared out-of-scope step).
    *
    * Spec-correct ISO 14496-12 §8.6-8.7 layouts: `stts` run-length
    * (sample_count, sample_delta) pairs cumulate to decode times
    * (converted by the MEDIA timescale from `mdhd` — v0 and v1, NOT
    * the movie timescale: the classic mp4 parsing bug); `stsz` either
    * uniform (sample_size ≠ 0) or per-sample u32s; `stsc` run-length
    * (first_chunk, samples_per_chunk) rows, last run extending to the
    * `stco` chunk count; per-sample offset = its chunk's `stco` base
    * plus the sizes of the samples before it IN that chunk. Returns
    * None for anything malformed or inconsistent (counts that
    * disagree between stts/stsz/stsc·stco, zero timescale,
    * non-increasing stsc first_chunk, samples left unassigned) —
    * total over data, never a confident misparse. `co64` (64-bit
    * offsets) is recognized-unsupported → None, documented like the
    * codec-frame gap. */
  def decodeSampleTable(payload: Array[Byte])
      : Option[IndexedSeq[(Long, Long, Long)]] = {
    def mdhdTimescale(start: Int, end: Int): Option[Long] = {
      val len = end - start
      if (len < 1) None
      else payload(start) match {
        case 0 if len >= 16 => Some(bmffU32(payload, start + 12))
        case 1 if len >= 24 => Some(bmffU32(payload, start + 20))
        case _ => None
      }
    }
    try {
      for {
        top <- bmffBoxes(payload, 0, payload.length)
        _ <- top.headOption.filter(b => b._1 == "ftyp" && b._3 - b._2 >= 8)
        moov <- top.find(_._1 == "moov")
        inner <- bmffBoxes(payload, moov._2, moov._3)
        trak <- inner.find(_._1 == "trak")
        tb <- bmffBoxes(payload, trak._2, trak._3)
        mdia <- tb.find(_._1 == "mdia")
        mb <- bmffBoxes(payload, mdia._2, mdia._3)
        mdhd <- mb.find(_._1 == "mdhd")
        timescale <- mdhdTimescale(mdhd._2, mdhd._3)
        if timescale > 0
        minf <- mb.find(_._1 == "minf")
        fb <- bmffBoxes(payload, minf._2, minf._3)
        stbl <- fb.find(_._1 == "stbl")
        sb <- bmffBoxes(payload, stbl._2, stbl._3)
        if !sb.exists(_._1 == "co64") // 64-bit offsets: unsupported
        stts <- sb.find(_._1 == "stts")
        stsz <- sb.find(_._1 == "stsz")
        stsc <- sb.find(_._1 == "stsc")
        stco <- sb.find(_._1 == "stco")
        samples <- assembleSamples(payload, timescale,
          stts, stsz, stsc, stco)
      } yield samples
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** The pure fold from the four parsed tables to per-sample
    * (t_ms, byte_off, n_bytes) rows; None on any inconsistency. */
  private def assembleSamples(payload: Array[Byte], timescale: Long,
      stts: (String, Int, Int), stsz: (String, Int, Int),
      stsc: (String, Int, Int), stco: (String, Int, Int))
      : Option[IndexedSeq[(Long, Long, Long)]] = {
    def u32(off: Int): Long = bmffU32(payload, off)
    def fullBoxU32s(b: (String, Int, Int), per: Int)
        : Option[IndexedSeq[IndexedSeq[Long]]] = {
      // version-0 FullBox: ver/flags, entry_count, then `per` u32s
      // per entry
      val (_, s, e) = b
      if (e - s < 8 || payload(s) != 0) return None
      val n = u32(s + 4)
      if (n < 0 || e - s < 8 + n * 4 * per) return None
      Some((0 until n.toInt).map(i =>
        (0 until per).map(j => u32(s + 8 + (i * per + j) * 4))))
    }
    // stts: (sample_count, delta) runs -> per-sample decode times
    val deltasOpt = fullBoxU32s(stts, 2)
    // stsz: ver/flags, sample_size, sample_count [, per-sample sizes]
    val sizesOpt: Option[IndexedSeq[Long]] = {
      val (_, s, e) = stsz
      if (e - s < 12 || payload(s) != 0) None
      else {
        val uniform = u32(s + 4)
        val n = u32(s + 8)
        // Bound the materialized count by the payload itself: a
        // non-zero uniform size means every sample occupies >=1 byte
        // of mdat, so sample_count > payload.length is malformed — a
        // crafted header must stay "data, not an OOM Error".
        if (n > payload.length.toLong) None
        else if (uniform != 0L) Some(IndexedSeq.fill(n.toInt)(uniform))
        else if (e - s < 12 + n * 4) None
        else Some((0 until n.toInt).map(i => u32(s + 12 + i * 4)))
      }
    }
    val runsOpt = fullBoxU32s(stsc, 3) // (first_chunk, spc, sdi)
    val offsetsOpt = fullBoxU32s(stco, 1).map(_.map(_.head))
    for {
      druns <- deltasOpt
      sizes <- sizesOpt
      runs <- runsOpt
      offsets <- offsetsOpt
      n = sizes.length
      if druns.map(_.head).sum == n.toLong
      if runs.nonEmpty && runs.head.head == 1L &&
        runs.map(_.head).sliding(2).forall(w =>
          w.length < 2 || w(0) < w(1))
      samples <- {
        // per-sample deltas -> cumulative decode time in media units.
        // Each run's declared sample_count is bounded by n (the sum
        // check above guarantees it for well-formed input; re-assert
        // per run so no single crafted u32 can drive the fill).
        if (druns.exists(r => r.head < 0L || r.head > n.toLong)) None
        else {
        val deltas = druns.flatMap { case IndexedSeq(c, d) =>
          IndexedSeq.fill(c.toInt)(d)
        }
        val times = deltas.scanLeft(0L)(_ + _).take(n)
        // chunk walk: run r covers chunks [first_chunk_r, next_first)
        val out = IndexedSeq.newBuilder[(Long, Long, Long)]
        var si = 0
        var ri = 0
        var chunk = 1
        while (chunk <= offsets.length && si < n) {
          while (ri + 1 < runs.length && runs(ri + 1).head <= chunk)
            ri += 1
          val spc = runs(ri)(1).toInt
          var off = offsets(chunk - 1)
          var j = 0
          while (j < spc && si < n) {
            out += ((times(si) * 1000L / timescale, off, sizes(si)))
            off += sizes(si)
            si += 1; j += 1
          }
          chunk += 1
        }
        if (si == n) Some(out.result()) else None
        }
      }
    } yield samples
  }

  /** Distributed sample-table decode: one row per (video, sample)
    * with the byte range — [[decodeImageMeta]]'s batch shape.
    * Undecodable payloads contribute NO rows (the q238 plan
    * contract: a seek schedule for a video you can't parse is
    * meaningless; health accounting lives in q209/q221). */
  def videoSampleBytes(media: Dataset[MediaRecord])
      : Dataset[SampleByte] =
    media.mapPartitions { it =>
      it.flatMap { r =>
        decodeSampleTable(r.payload) match {
          case Some(ss) => ss.iterator.zipWithIndex.map {
            case ((t, off, sz), i) =>
              SampleByte(r.doc_id, i.toLong, t, off, sz)
          }
          case None => Iterator.empty
        }
      }
    }

  /** FRAME-SAMPLE plan WITH BYTE RANGES — [[frameSamplePlan]]
    * completed by the sample tables: k frames per video at the
    * midpoints of k equal SAMPLE-INDEX segments
    * (`idx_j = n·(2j+1) div 2k` — the q238 midpoint discipline over
    * indices instead of time), each row carrying the sample's decode
    * timestamp AND its (byte_off, n_bytes) fetch range. Videos with
    * fewer than one sample have no rows; k > n picks duplicates of
    * the same sample only when the formula lands twice (allowed — a
    * short clip genuinely has fewer distinct frames than the budget).
    *
    * Scale shape: one \|videos\|-key partial-aggregated count, a
    * k-row explode of THAT aggregate, one equi-join back to the
    * sample frame on (doc_id, sample_idx). Row-local arithmetic
    * throughout; never a corpus window. */
  def frameSampleBytes(samples: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 1024, s"k=$k out of [1, 1024]")
    val n = samples.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_samples"))
    val targets = n
      .select(col("doc_id"), col("n_samples"),
        explode(sequence(lit(0L), lit(k - 1L))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        expr(s"(n_samples * (2 * frame_idx + 1)) div ${2L * k}L")
          .as("sample_idx"))
    targets.join(samples, Seq("doc_id", "sample_idx"))
      .select(col("doc_id"), col("frame_idx"), col("sample_idx"),
        col("t_ms"), col("byte_off"), col("n_bytes"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** REAL-BYTES video fixture: per doc id, a structurally-valid MP4
    * (ISO 14496-12) box tree — `ftyp` (isom) + `moov` holding a
    * version-0 `mvhd` (timescale 1000, duration `1000 + (id%97)·250`)
    * and `1 + id%2` `trak`/`tkhd` boxes (first track
    * `(160 + (id%8)·80) × (120 + (id%6)·60)` in 16.16 fixed point,
    * spec-correct 92-byte tkhd and 108-byte mvhd layouts) + a token
    * `mdat` — so the decoded metadata is pure id arithmetic. The two
    * corruption families, each hitting BOTH track counts: `id%10 ∈
    * {3, 4}` zeroes the `ftyp` fourCC (first box unrecognized),
    * `id%10 ∈ {6, 7}` truncates to 16 bytes (the ftyp box claims 20,
    * the walk runs past the end). */
  def encodeVideoFixture(docs: DataFrame, idCol: String)
      : Dataset[MediaRecord] = {
    val ids = docs.select(col(idCol).cast("long").as("doc_id"))
      .where(col("doc_id").isNotNull && col("doc_id") >= 0)
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    ids.as[Long].mapPartitions { it =>
      def be32(v: Long): Array[Byte] = Array(
        (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
      def be16(v: Int): Array[Byte] = Array((v >>> 8).toByte, v.toByte)
      def box(tp: String, payload: Array[Byte]): Array[Byte] =
        be32(payload.length + 8L) ++
          tp.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ payload
      val unityMatrix =
        be32(0x00010000L) ++ be32(0) ++ be32(0) ++
          be32(0) ++ be32(0x00010000L) ++ be32(0) ++
          be32(0) ++ be32(0) ++ be32(0x40000000L)
      it.map { id =>
        val duration = 1000L + (id % 97) * 250L
        val w = 160L + (id % 8) * 80L
        val h = 120L + (id % 6) * 60L
        val mvhd = box("mvhd",
          be32(0) ++ // version 0 + flags
            be32(0) ++ be32(0) ++ // creation, modification
            be32(1000L) ++ be32(duration) ++ // timescale, duration
            be32(0x00010000L) ++ be16(0x0100) ++ be16(0) ++ // rate, volume
            be32(0) ++ be32(0) ++ // reserved
            unityMatrix ++ Array.fill[Byte](24)(0) ++ // matrix, predefined
            be32(3)) // next track id
        def tkhd(trackId: Long, tw: Long, th: Long) = box("tkhd",
          be32(7) ++ // version 0 + flags (enabled|in-movie|in-preview)
            be32(0) ++ be32(0) ++ be32(trackId) ++ be32(0) ++
            be32(duration) ++ be32(0) ++ be32(0) ++ // duration, reserved
            be16(0) ++ be16(0) ++ be16(0) ++ be16(0) ++ // layer..reserved
            unityMatrix ++
            be32(tw << 16) ++ be32(th << 16)) // 16.16 fixed point
        // sample tables for track 1 (r15): n id-derived samples in TWO
        // chunks with a dead-byte gap between them, so a decoder that
        // misreads stsc/stco lands on wrong offsets for chunk-2
        // samples. mdat rides FIRST (after ftyp — legal, and how
        // faststart-less muxers write), making chunk 1's offset the
        // CONSTANT 28 = len(ftyp) + 8, so every offset is pure id
        // arithmetic the oracle restates.
        val nSamples = 4 + (id % 5).toInt
        val delta = 100L + (id % 7) * 50L
        def sz(i: Int): Long = 100L + ((id + i) % 9) * 10L
        val c1 = (nSamples + 1) / 2
        val gap = 8 + (id % 4).toInt
        val stts = box("stts",
          be32(0) ++ be32(1) ++ be32(nSamples) ++ be32(delta))
        val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(nSamples) ++
          (0 until nSamples).flatMap(i => be32(sz(i))).toArray)
        val stsc = box("stsc", be32(0) ++ be32(2) ++
          be32(1) ++ be32(c1) ++ be32(1) ++
          be32(2) ++ be32(nSamples - c1) ++ be32(1))
        val stco = box("stco", be32(0) ++ be32(2) ++ be32(28L) ++
          be32(28L + (0 until c1).map(sz).sum + gap))
        val mdhd = box("mdhd",
          be32(0) ++ be32(0) ++ be32(0) ++ // ver/flags, ctime, mtime
            be32(1000L) ++ be32(duration) ++ // media timescale, duration
            be16(0x55c4) ++ be16(0)) // language 'und', predefined
        val mdia = box("mdia",
          mdhd ++ box("minf", box("stbl", stts ++ stsc ++ stsz ++ stco)))
        val traks = box("trak", tkhd(1, w, h) ++ mdia) ++
          (if (id % 2 == 1) box("trak", tkhd(2, 320, 240)) else Array.emptyByteArray)
        val ftyp = box("ftyp",
          "isom".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
            be32(0x200) ++
            "isom".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        val mdat = box("mdat", new Array[Byte](
          (0 until nSamples).map(sz).sum.toInt + gap))
        var bytes = ftyp ++ mdat ++ box("moov", mvhd ++ traks)
        if (id % 10 == 3 || id % 10 == 4) {
          bytes(4) = 0; bytes(5) = 0; bytes(6) = 0; bytes(7) = 0
        } else if (id % 10 == 6 || id % 10 == 7) bytes = bytes.take(16)
        MediaRecord(id, s"memory://video/$id", "video/mp4", bytes)
      }
    }
  }

  /** REAL-BYTES ISO-BMFF BRAND fixture: per doc id, a minimal
    * ISO-BMFF payload whose `ftyp` MAJOR BRAND cycles by `id % 5`
    * through the container family's reuses — `M4A ` (audio),
    * `heic`/`mif1`/`avif` (HEIF-family still images), `isom` (plain
    * video) — while the DECLARED mime is always `video/mp4`, the
    * naive crawler guess for anything carrying `ftyp`. The router's
    * brand dispatch is what disagrees: brand-blind routing would
    * agree with the lie on every row. Corruption family shared with
    * the sibling fixtures: `id % 10 ∈ {3, 4}` zeroes the `ftyp`
    * fourCC (sniffs `unknown`). */
  def encodeIsoBrandFixture(docs: DataFrame, idCol: String)
      : Dataset[MediaRecord] = {
    val ids = docs.select(col(idCol).cast("long").as("doc_id"))
      .where(col("doc_id").isNotNull && col("doc_id") >= 0)
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    ids.as[Long].mapPartitions { it =>
      def be32(v: Long): Array[Byte] = Array(
        (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
      def box(tp: String, payload: Array[Byte]): Array[Byte] =
        be32(payload.length + 8L) ++
          tp.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
          payload
      val brands = IndexedSeq("M4A ", "heic", "mif1", "avif", "isom")
      it.map { id =>
        val brand = brands((id % 5).toInt)
        val ftyp = box("ftyp",
          brand.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
            be32(0) ++
            brand.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        val bytes = ftyp ++ box("mdat", new Array[Byte](8))
        if (id % 10 == 3 || id % 10 == 4) {
          bytes(4) = 0; bytes(5) = 0; bytes(6) = 0; bytes(7) = 0
        }
        MediaRecord(id, s"memory://isobrand/$id", "video/mp4", bytes)
      }
    }
  }

  /** REAL-BYTES ISO-BMFF METADATA fixture — [[encodeIsoBrandFixture]]
    * upgraded with the boxes [[decodeIsoMeta]] reads: the `id % 5`
    * brand cycle carries a `moov`→`mvhd` (v0, timescale 1000,
    * duration `500 + (id%50)·100` ms) for the movie-header brands
    * (`M4A `, `isom`) and a `meta`(FullBox)→`iprp`→`ipco`→`ispe`
    * item-property tree (width `64 + (id%9)·16`, height
    * `48 + (id%7)·16`) for the HEIF-family stills
    * (heic/mif1/avif) — every readout pure id arithmetic. Corruption
    * family shared with the siblings: `id % 10 ∈ {3, 4}` zeroes the
    * `ftyp` fourCC (ok = 0, all metadata null). */
  def encodeIsoMetaFixture(docs: DataFrame, idCol: String)
      : Dataset[MediaRecord] = {
    val ids = docs.select(col(idCol).cast("long").as("doc_id"))
      .where(col("doc_id").isNotNull && col("doc_id") >= 0)
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    ids.as[Long].mapPartitions { it =>
      def be32(v: Long): Array[Byte] = Array(
        (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
      def box(tp: String, payload: Array[Byte]): Array[Byte] =
        be32(payload.length + 8L) ++
          tp.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
          payload
      val brands = IndexedSeq("M4A ", "heic", "mif1", "avif", "isom")
      it.map { id =>
        val brand = brands((id % 5).toInt)
        val ftyp = box("ftyp",
          brand.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
            be32(0) ++
            brand.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        val body = (id % 5) match {
          case 1 | 2 | 3 =>
            // meta is a FULLBOX: version/flags precede its children
            val ispe = box("ispe", be32(0) ++
              be32(64L + (id % 9) * 16L) ++ be32(48L + (id % 7) * 16L))
            box("meta", be32(0) ++ box("iprp", box("ipco", ispe)))
          case _ =>
            // mvhd v0: ver/flags + ctime + mtime + timescale + duration
            box("moov", box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++
              be32(1000L) ++ be32(500L + (id % 50) * 100L)))
        }
        val bytes = ftyp ++ body ++ box("mdat", new Array[Byte](8))
        if (id % 10 == 3 || id % 10 == 4) {
          bytes(4) = 0; bytes(5) = 0; bytes(6) = 0; bytes(7) = 0
        }
        MediaRecord(id, s"memory://isometa/$id", "video/mp4", bytes)
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
    // dims walk lcm(57,41) ≫ corpus, so payloads are effectively
    // all-distinct: no memo, but ROUTE for encode parallelism (the
    // single-row-group scan is one partition — r21 routeIds note)
    routeIds(ids, col("doc_id"))
      .as[Long].mapPartitions { it =>
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

  /** One decoded image dHash row: `ok = 1` with the 64-bit difference
    * hash when the payload decoded, `ok = 0`/null otherwise (the
    * decoder totality contract, as [[ImageMeta]]). */
  final case class ImageDhash(doc_id: Long, ok: Long,
      dhash: Option[Long])

  implicit val imageDhashEnc: Encoder[ImageDhash] =
    Encoders.product[ImageDhash]

  /** 64-bit dHASH (difference hash) of one image payload — the
    * PERCEPTUAL near-dup fingerprint for the multimodal dedup rung:
    * decode pixels, area-average the luminance onto a 9-wide × 8-tall
    * grid, set bit `r·8 + c` iff cell (r, c+1) is brighter than cell
    * (r, c). Horizontally-adjacent comparisons make the hash invariant
    * to global brightness/contrast shifts and robust to resizing —
    * the properties that let re-encoded/rescaled copies of one image
    * land within small Hamming distance while the pipeline never
    * compares pixels across rows.
    *
    * INTEGER-EXACT by construction (the engine's fixed-point
    * discipline applied to pixels): luminance is the exact
    * `(299·R + 587·G + 114·B) div 1000` on raw RASTER samples (single
    * -band images use the sample directly — for 8-bit grayscale the
    * luma formula collapses to the identity, so gray fixtures
    * round-trip bit-exactly), the cell mean is `sum div count`, and
    * the bit is a strict integer comparison — an oracle that knows
    * the pixel function can restate the hash without any float path.
    * Raster samples, not `getRGB`: Java's gray→sRGB conversion in
    * `getRGB` is non-identity (gamma), which would un-pin the
    * arithmetic.
    *
    * None for unclaimable/corrupt payloads or images smaller than the
    * 9×8 grid (no block may be empty) — data, not exceptions. */
  def dhash64(payload: Array[Byte]): Option[Long] =
    try {
      dhashImage(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload)))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** [[dhash64]]'s in-memory half — hash an already-decoded frame
    * (the GIF rung decodes many frames per payload through one
    * reader, so the decode and the hash must separate). Palette
    * images (GIF/indexed PNG) are normalized through their
    * `IndexColorModel` first: the raster sample of an indexed image
    * is the palette INDEX, not the luminance, and hashing indices
    * would tie the fingerprint to palette ORDER (an encoder artifact
    * a re-encode shuffles) instead of pixel content. The palette
    * lookup is table-indexing, exact — for a gray palette the
    * round-trip is still the identity. */
  private[graft] def dhashImage(img: java.awt.image.BufferedImage)
      : Option[Long] =
    try {
      if (img == null || img.getWidth < 9 || img.getHeight < 8) None
      else if (img.getColorModel
          .isInstanceOf[java.awt.image.IndexColorModel]) {
        val rgb = new java.awt.image.BufferedImage(img.getWidth,
          img.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = rgb.createGraphics()
        try g.drawImage(img, 0, 0, null) finally g.dispose()
        dhashImage(rgb)
      } else {
        val ras = img.getRaster
        val bands = ras.getNumBands
        val w = img.getWidth
        val h = img.getHeight
        val cell = Array.ofDim[Long](8, 9)
        var r = 0
        while (r < 8) {
          val y0 = r * h / 8; val y1 = (r + 1) * h / 8
          var c = 0
          while (c < 9) {
            val x0 = c * w / 9; val x1 = (c + 1) * w / 9
            var sum = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                sum += (if (bands >= 3)
                  (299L * ras.getSample(x, y, 0) +
                    587L * ras.getSample(x, y, 1) +
                    114L * ras.getSample(x, y, 2)) / 1000L
                else ras.getSample(x, y, 0).toLong)
                x += 1
              }
              y += 1
            }
            cell(r)(c) = sum / ((y1 - y0).toLong * (x1 - x0))
            c += 1
          }
          r += 1
        }
        var fp = 0L
        r = 0
        while (r < 8) {
          var c = 0
          while (c < 8) {
            if (cell(r)(c + 1) > cell(r)(c)) fp |= 1L << (r * 8 + c)
            c += 1
          }
          r += 1
        }
        Some(fp)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Distributed dHash over a media frame — the [[decodeImageMeta]]
    * batch shape (mapPartitions is justified: no Catalyst expression
    * can host ImageIO) with the same contracts: corrupt rows surface
    * as `ok = 0`, payload bytes never cross a shuffle (8 bytes of
    * fingerprint do). */
  def imageDhash(media: Dataset[MediaRecord]): Dataset[ImageDhash] =
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val memo = new PayloadMemo[Option[Long]]()
      it.map { r =>
        memo.get(r.payload)(dhash64(r.payload)) match {
          case Some(fp) => ImageDhash(r.doc_id, 1L, Some(fp))
          case None => ImageDhash(r.doc_id, 0L, None)
        }
      }
    }

  /** One combined dHash + dimensions row — the decode-once readout
    * for consumers that need BOTH the perceptual fingerprint and the
    * quality metadata (the funnel's keep-best pick): `ok = 1` iff the
    * payload decoded AND hashed (the [[imageDhash]] contract —
    * images smaller than the 9×8 grid stay `ok = 0`), dims from the
    * same decoded frame. */
  final case class ImageDhashMeta(doc_id: Long, ok: Long,
      dhash: Option[Long], width: Option[Long], height: Option[Long])

  implicit val imageDhashMetaEnc: Encoder[ImageDhashMeta] =
    Encoders.product[ImageDhashMeta]

  /** Distributed dHash + dims in ONE ImageIO pass — running
    * [[imageDhash]] and [[decodeImageMeta]] separately would decode
    * every payload twice (the q283/q291 decode-once lesson, applied
    * where [[graft.etl.MediaPipeline]] needs fingerprint AND quality
    * from the same frame). Same totality contract; only 24 bytes of
    * (fp, w, h) ever cross a shuffle. */
  def imageDhashMeta(media: Dataset[MediaRecord])
      : Dataset[ImageDhashMeta] =
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val memo = new PayloadMemo[Option[(Long, Long, Long)]]()
      it.map { r =>
        val decoded = memo.get(r.payload)(try {
          Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload)))
            .flatMap(im => dhashImage(im)
              .map(fp => (fp, im.getWidth.toLong, im.getHeight.toLong)))
        } catch { case scala.util.control.NonFatal(_) => None })
        decoded match {
          case Some((fp, w, h)) => ImageDhashMeta(r.doc_id, 1L,
            Some(fp), Some(w), Some(h))
          case None => ImageDhashMeta(r.doc_id, 0L, None, None, None)
        }
      }
    }

  /** REAL-BYTES gradient-image fixture for the dHash rung: per doc id,
    * an actual grayscale PNG laid out as EXACTLY 9 × 8 constant-value
    * blocks (block size `(1 + id % 3) × (1 + id % 2)` pixels, so
    * dimensions vary but the area-average of every dHash cell equals
    * the block value EXACTLY — the downsample is replayed by stating
    * the block function). Block luminance is pure id arithmetic:
    * `v(r, c) = ((id%25)·7 + r·5 + c·11) % 6 · 40`, plus a +45 tweak
    * at cell (0,0) when `(id div 25) % 2 = 1` — 25 gradient patterns,
    * each in two variants ≤ 1 Hamming bit apart, so the fixture
    * carries exact-duplicate AND near-duplicate pairs the oracle can
    * enumerate. Corruption families pin the never-fail contract:
    * `id % 10 = 3` zeroes the PNG magic, `id % 10 = 6` truncates to
    * 16 bytes. */
  def encodeGradientImageFixture(docs: DataFrame, idCol: String)
      : Dataset[MediaRecord] = {
    val ids = docs.select(col(idCol).cast("long").as("doc_id"))
      .where(col("doc_id").isNotNull && col("doc_id") >= 0)
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    // payload is a pure function of id % 150 (pattern id%25, tweak
    // (id/25)%2 → period 50, block size id%3/id%2, corruption id%10;
    // lcm = 150) — r21 route+memo
    routeIds(ids, pmod(col("doc_id"), lit(150L)))
      .as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val memo = new TaskMemo[Long, Array[Byte]]()
      it.map { id =>
        val payload = memo.get(id % 150L) {
        val sx = 1 + (id % 3).toInt
        val sy = 1 + (id % 2).toInt
        val img = new java.awt.image.BufferedImage(
          9 * sx, 8 * sy, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val ras = img.getRaster
        var y = 0
        while (y < 8 * sy) {
          val r = y / sy
          var x = 0
          while (x < 9 * sx) {
            val c = x / sx
            val tweak =
              if (r == 0 && c == 0 && ((id / 25) % 2) == 1) 45 else 0
            ras.setSample(x, y, 0,
              (((id % 25) * 7 + r * 5 + c * 11) % 6).toInt * 40 + tweak)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        var bytes = bos.toByteArray
        if (id % 10 == 3) bytes(0) = 0
        else if (id % 10 == 6) bytes = bytes.take(16)
        bytes
        }
        MediaRecord(id, s"memory://dimg/$id", "image/png", payload)
      }
    }
  }

  /** The four per-row dHash bit patterns of the MJPEG fixture, as
    * bytes (bit `c` = the compare bit between dHash cells `c` and
    * `c+1`). Each is chosen so its ±1 level walk from the middle
    * level stays inside the 9-level alphabet — including with bit 3
    * flipped (the 1-bit tweak variant). */
  private val mjpegPatterns: Array[Int] = Array(0x55, 0xaa, 0x2b, 0xd4)

  /** REAL-BYTES Motion-JPEG video fixture — the rung that retires
    * "video near-dup is codec-blocked": MJPEG is the one mainstream
    * video coding the JDK can genuinely decode (every frame is a
    * complete baseline JPEG, read by `ImageIO`), so a hand-assembled
    * but standard RIFF/AVI container (`hdrl` with spec-correct 56-byte
    * `avih`/`strh` and 40-byte `strf` BITMAPINFOHEADER, one `movi`
    * LIST of `00dc` frame chunks, a keyframe `idx1`) around real
    * `ImageIO.write` JPEG frames is an honest end-to-end video corpus.
    *
    * Each frame is 72 × 64 grayscale laid out as 9 × 8 flat 8 × 8
    * blocks — aligned BOTH to JPEG's DCT grid (flat blocks quantize
    * to a lone DC coefficient: reconstruction error ≤ ~2 gray levels)
    * and to [[dhash64]]'s 9 × 8 cell grid (cell mean = block value
    * ± that error). Block values walk a 9-level alphabet
    * `16 + 24·k` (separation 24 ≫ 2·error, so every dHash compare is
    * decisive THROUGH the lossy codec), stepping k ±1 by the bits of
    * [[mjpegPatterns]] — so each frame's dHash is pure id arithmetic:
    * row `r` of frame `f` uses pattern
    * `(g·5 + f·3 + r + 2·[variant=2]) % 4` where `g = id % 12` is the
    * content group and `variant = (id/12) % 3` — variant 0 the base,
    * variant 1 flips bit 3 of frame 0 row 0 (a 1-bit perceptual
    * tweak: near-dup, not exact), variant 2 shifts every row's
    * pattern (48 bits per frame apart: decisively distinct). Frame
    * count is group-determined (`4 + g % 5`) so temporal alignment is
    * well-posed within a group. Corruption families:
    * `id % 10 = 3` zeroes the RIFF magic, `id % 10 = 6` truncates to
    * 16 bytes (both: no frames), `id % 10 = 9` zeroes frame 1's JPEG
    * SOI marker (the container walks; that one frame decodes to
    * `ok = 0`). */
  def encodeMjpegFixture(docs: DataFrame, idCol: String)
      : Dataset[MediaRecord] = {
    val ids = docs.select(col(idCol).cast("long").as("doc_id"))
      .where(col("doc_id").isNotNull && col("doc_id") >= 0)
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    // payload is a pure function of id % 180 (g = id%12 and
    // variant = (id/12)%3 are determined by id%36; the corruption
    // selector by id%10; lcm(36,10) = 180) — route classes together
    // and encode each once per task (r21, routeIds/TaskMemo notes)
    routeIds(ids, pmod(col("doc_id"), lit(180L)))
      .as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val memo = new TaskMemo[Long, Array[Byte]]()
      it.map { id =>
        val payload = memo.get(id % 180L) {
          val g = (id % 12).toInt
          val variant = ((id / 12) % 3).toInt
          val nFrames = 4 + g % 5
          val jpegs = (0 until nFrames).map { f =>
            flatBlockJpeg { r =>
              var pb = mjpegPatterns(
                (g * 5 + f * 3 + r + (if (variant == 2) 2 else 0)) % 4)
              if (variant == 1 && f == 0 && r == 0) pb ^= 8
              pb
            }
          }
          assembleMjpegAvi(jpegs, (id % 10).toInt)
        }
        MediaRecord(id, s"memory://mjpeg/$id", "video/x-msvideo",
          payload)
      }
    }
  }

  /** One 72 × 64 grayscale baseline-JPEG frame of 9 × 8 flat 8 × 8
    * blocks whose values walk the 9-level alphabet `16 + 24k` by the
    * bits of `rowPattern(r)` — the [[encodeMjpegFixture]] frame
    * writer, shared with the scene-structured fixture. */
  private def flatBlockJpeg(rowPattern: Int => Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(flatBlockImage(rowPattern), "jpg", bos)
    bos.toByteArray
  }

  /** The 72×64 flat-block frame shared by the MJPEG and GIF fixtures:
    * 9×8 cells of 8×8 pixels, each flat at a 24-step gray level
    * walked ±1 by the row's pattern bits — sized so the dHash row
    * byte IS the pattern byte, exactly (lossily for JPEG thanks to
    * the 24-level separation; bit-exactly for GIF's lossless
    * palette). */
  private def flatBlockImage(rowPattern: Int => Int)
      : java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      72, 64, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val ras = img.getRaster
    var r = 0
    while (r < 8) {
      val pb = rowPattern(r)
      var k = 4
      var c = 0
      while (c <= 8) { // 9 cells per row; k walks the bits
        val v = 16 + 24 * k
        var y = r * 8
        while (y < r * 8 + 8) {
          var x = c * 8
          while (x < c * 8 + 8) {
            ras.setSample(x, y, 0, v); x += 1
          }
          y += 1
        }
        if (c < 8)
          k += (if (((pb >> c) & 1) == 1) 1 else -1)
        c += 1
      }
      r += 1
    }
    img
  }

  /** Assemble a standard MJPEG AVI around complete JPEG frames, with
    * the house corruption selector (`corrupt` = id % 10): 3 zeroes
    * the RIFF magic, 6 truncates to 16 bytes, 9 zeroes frame 1's
    * JPEG SOI marker, anything else leaves the file intact. */
  private def assembleMjpegAvi(jpegs: IndexedSeq[Array[Byte]],
      corrupt: Int, w: Int = 72, h: Int = 64): Array[Byte] = {
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(fourcc: String, data: Array[Byte]): Array[Byte] =
      fcc(fourcc) ++ le32(data.length.toLong) ++ data ++
        (if (data.length % 2 == 1) Array[Byte](0)
         else Array.emptyByteArray)
    def list(listType: String, children: Array[Byte]): Array[Byte] =
      fcc("LIST") ++ le32(4L + children.length) ++ fcc(listType) ++
        children
    val nFrames = jpegs.size
    val avih = le32(40000L) ++ le32(0L) ++ le32(0L) ++
      le32(0x10L) ++ le32(nFrames.toLong) ++ le32(0L) ++
      le32(1L) ++ le32(0L) ++ le32(w.toLong) ++ le32(h.toLong) ++
      le32(0L) ++ le32(0L) ++ le32(0L) ++ le32(0L)
    val strh = fcc("vids") ++ fcc("MJPG") ++ le32(0L) ++
      le16(0) ++ le16(0) ++ le32(0L) ++ le32(1L) ++ le32(25L) ++
      le32(0L) ++ le32(nFrames.toLong) ++ le32(0L) ++
      le32(0xffffffffL) ++ le32(0L) ++
      le16(0) ++ le16(0) ++ le16(w) ++ le16(h)
    val strf = le32(40L) ++ le32(w.toLong) ++ le32(h.toLong) ++
      le16(1) ++ le16(24) ++ fcc("MJPG") ++ le32(0L) ++
      le32(0L) ++ le32(0L) ++ le32(0L) ++ le32(0L)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val frameChunks = jpegs.map(j => chunk("00dc", j))
    val movi = list("movi", frameChunks.flatten.toArray)
    // idx1 offsets are relative to the 'movi' fourcc byte
    val offsets = frameChunks.scanLeft(4L)(_ + _.length)
    val idx1 = chunk("idx1", jpegs.indices.flatMap(i =>
      fcc("00dc") ++ le32(0x10L) ++ le32(offsets(i)) ++
        le32(jpegs(i).length.toLong)).toArray)
    val body = fcc("AVI ") ++ hdrl ++ movi ++ idx1
    var bytes = fcc("RIFF") ++ le32(body.length.toLong) ++ body
    if (corrupt == 3) {
      bytes(0) = 0; bytes(1) = 0; bytes(2) = 0; bytes(3) = 0
    } else if (corrupt == 6) bytes = bytes.take(16)
    else if (corrupt == 9) {
      // the movi LIST begins after RIFF(8) + 'AVI '(4) + hdrl;
      // its 'movi' fourcc sits 8 bytes in, chunk 1's fourcc at
      // offsets(1) past that, and the JPEG payload 8 past that
      val at = (12 + hdrl.length) + 8 + offsets(1).toInt + 8
      bytes(at) = 0; bytes(at + 1) = 0
    }
    bytes
  }

  /** TRIMMED-CLIP MJPEG fixture — the test bed for the OFFSET-TOLERANT
    * sequence rungs (q305/q306), where [[encodeMjpegFixture]]'s
    * period-4 pattern walk cannot serve (any arithmetic mod 4 repeats
    * every 4 frames, collapsing the corpus to ~12 distinct shingles —
    * measured — so shingle df-caps swallow everything): ids sharing a
    * REEL (`g = id % G`, `G = ` [[clipReels]]) each record a
    * different WINDOW of it —
    * offset `(id div G) % 5`, length `5 + id % 3` — so same-reel
    * pairs overlap at genuinely NONZERO offsets (the trimmed
    * re-upload). Frame content at reel position `pos` is APERIODIC
    * via the MULTIPLICATIVE row mix
    * `P[((h·(2r+3)) mod 1000003) mod 4]` with
    * `h = (g·1500450271 + pos·2654435761) mod 1000003` (an
    * integer-exact mix both engines restate; the walk-safe 4-byte
    * alphabet keeps every row's level walk inside the 9-level
    * range), so distinct reel positions carry distinct fingerprints
    * and shingle document-frequencies stay under any sane cap. The
    * mix MUST be multiplicative in `r` (r19): the earlier additive
    * `(h + 31r) mod M mod 4` collapses — within a frame the mod-M
    * quotient is constant across r, so the row sequence reduces to
    * `(h + 3r) mod 4` and the whole corpus carried FOUR distinct
    * frame patterns (≈15 distinct shingles, 12 of 15 df-capped at
    * sf0.1 — measured — leaving the containment path nearly
    * vacuous); an r-dependent multiplier moves the quotient every
    * row, and the measured shingle space is \|G·positions\|-sized
    * with zero capped shingles at every SF.
    * Corruption family: `id % 10 = 3` zeroes the RIFF magic.
    *
    * The reel count SCALES with corpus size ([[clipReels]] —
    * `max(64, N div 64)`, the r18 advice finding): with a FIXED reel
    * count, per-shingle document frequency grows linearly in N
    * (~N/64 × window coverage), so above N ≈ 10–15k docs the default
    * `maxDf = 100` cap would swallow every shingle and the clip
    * queries would pass VACUOUSLY (engine and oracle agreeing on
    * empty); scaling reels keeps per-reel membership ≈ 64 docs —
    * under the cap at every SF — so the containment path stays
    * genuinely exercised. */
  def encodeClipMjpegFixture(docs: DataFrame, idCol: String)
      : Dataset[MediaRecord] = {
    val ids = clipIds(docs, idCol)
    val reels = clipReels(docs, idCol)
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    // route by REEL: same-reel windows overlap in positions, so the
    // per-task FRAME memo (keyed on the position mix h — the frame's
    // full content class) collapses the overlapping JPEG encodes; the
    // payload memo additionally collapses ids sharing (g, o, len,
    // corrupt) outright (r21)
    routeIds(ids, pmod(col("doc_id"), lit(reels)))
      .as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val payloadMemo = new TaskMemo[Long, Array[Byte]]()
      val frameMemo = new TaskMemo[Long, Array[Byte]]()
      it.map { id =>
        val g = id % reels
        val o = ((id / reels) % 5).toInt
        val len = (5 + id % 3).toInt
        val key = (((g * 5L + o) * 3L + (id % 3)) * 2L +
          (if (id % 10 == 3) 1L else 0L))
        val payload = payloadMemo.get(key) {
          val jpegs = (0 until len).map { f =>
            val pos = (o + f).toLong
            val h = (g * 1500450271L + pos * 2654435761L) % 1000003L
            frameMemo.get(h) {
              flatBlockJpeg { r =>
                mjpegPatterns((h * (2 * r + 3) % 1000003L % 4L).toInt)
              }
            }
          }
          assembleMjpegAvi(jpegs, if (id % 10 == 3) 3 else 0)
        }
        MediaRecord(id, s"memory://clip/$id", "video/x-msvideo",
          payload)
      }
    }
  }

  /** The clip fixtures' id universe: non-null, non-negative. */
  private def clipIds(docs: DataFrame, idCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"))
      .where(col("doc_id").isNotNull && col("doc_id") >= 0)

  /** Corpus-scaled reel count of the clip fixtures (shared by the
    * MJPEG/waveform/GIF variants and their oracles — the oracle
    * restates it as `greatest(64, count(*) // 64)` over the same id
    * filter): `max(64, N div 64)` keeps per-reel membership ≈ 64 ids
    * regardless of corpus size, so shingle document frequencies stay
    * under any sane df cap at every SF. Driver-side count of the
    * fixture's id universe — fixture assembly, not an operator. */
  private[graft] def clipReels(docs: DataFrame, idCol: String): Long =
    math.max(64L, clipIds(docs, idCol).count() / 64L)

  /** TRIMMED-CLIP waveform fixture — [[encodeClipMjpegFixture]]'s
    * audio twin for the offset-tolerant sequence rungs: ids sharing
    * a REEL (`g = id % G`, `G = ` [[clipReels]] — corpus-scaled, the
    * same vacuity argument) record different WINDOWS of it (offset
    * `(id div G) % 5`, length `baseWindows + id % 3` windows of 256
    * samples — the default 5 keeps recordings BELOW the 65-window
    * envelope minimum, the q307 scope; `baseWindows ≥ 65` makes the
    * same reels envelope-fingerprintable, the funnel's two-stage
    * audio test bed),
    * window amplitude at reel position `pos` the aperiodic
    * `500 + ((h·h) mod 1000003) mod 997` with
    * `h = (g·1500450271 + pos·2654435761) mod 1000003` on the
    * ±carrier — each window's mean-abs IS the amplitude exactly, so
    * the energy stream is pure id arithmetic and same-reel pairs
    * overlap at genuinely NONZERO offsets (trims are window-aligned
    * by construction; an arbitrary-sample trim would shift window
    * phase — the documented granularity of energy-stream matching).
    * The amplitude hash MUST be squared (r19): the earlier AFFINE
    * `(g·A + pos·B) mod M mod 997` steps by a near-constant `+86`
    * between consecutive positions (B mod M mod 997 = 86, wrap
    * corrections also positive), so the derived ENVELOPE bits were
    * almost all 1s — 173 fixture docs collapsed to 49 envelopes with
    * cross-reel Hamming-0 collisions (measured), spuriously merging
    * unrelated reels in any envelope-clustering consumer; squaring
    * makes the per-step delta depend on `h` itself, the envelope a
    * fair bit-mix, and every fixture doc's envelope distinct.
    * Corruption family: `id % 10 = 3` zeroes the RIFF magic. */
  def encodeClipWaveformFixture(docs: DataFrame, idCol: String,
      baseWindows: Int = 5): Dataset[MediaRecord] = {
    require(baseWindows >= 3, s"need baseWindows >= 3, got $baseWindows")
    val ids = clipIds(docs, idCol)
    val reels = clipReels(docs, idCol)
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    // route by REEL, memoize payloads on (g, o, nWin, corrupt) — the
    // full content class (baseWindows is fixed per invocation) — r21
    routeIds(ids, pmod(col("doc_id"), lit(reels)))
      .as[Long].mapPartitions { it =>
      val memo = new TaskMemo[Long, Array[Byte]]()
      it.map { id =>
        val window = 256
        val g = id % reels
        val o = (id / reels) % 5
        val nWin = (baseWindows + id % 3).toInt
        val key = (((g * 5L + o) * 3L + (id % 3)) * 2L +
          (if (id % 10 == 3) 1L else 0L))
        val payload = memo.get(key) {
        val pcm = new Array[Byte](nWin * window * 2)
        var i = 0
        while (i < nWin * window) {
          val pos = o + i / window
          val h = (g * 1500450271L + pos * 2654435761L) % 1000003L
          val amp = (500L + (h * h % 1000003L) % 997L).toInt
          val s = if (i % 4 < 2) amp else -amp
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          8000f, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt,
          (nWin * window).toLong)
        val bos = new java.io.ByteArrayOutputStream()
        writeAudio(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        val bytes = bos.toByteArray
        if (id % 10 == 3) bytes(0) = 0
        bytes
        }
        MediaRecord(id, s"memory://clipwav/$id", "audio/wav", payload)
      }
    }
  }

  /** SCENE-STRUCTURED MJPEG fixture for the shot-segmentation rung:
    * `2 + id % 3` scenes of 3 frames each — within a scene every
    * frame repeats the same row patterns
    * (`P[(g·7 + scene·5 + r) % 4]`, g = id % 12), so consecutive
    * intra-scene frames are dHash-IDENTICAL (Hamming 0), while a
    * scene change shifts every row's pattern by 5 ≡ 1 (mod 4) — a
    * constant, decisive Hamming-40 jump (Σ over the pattern cycle of
    * \|P[m] xor P[m+1]\| = 8+2+8+2 doubled). Cuts are therefore
    * exactly the scene boundaries at ANY threshold in (0, 40), making
    * the segmentation oracle pure id arithmetic. House corruption
    * families via [[assembleMjpegAvi]] (the zeroed-SOI family leaves
    * a mid-scene GAP in the observed frames — segmentation over
    * observed frames must bridge it). */
  def encodeSceneMjpegFixture(docs: DataFrame, idCol: String)
      : Dataset[MediaRecord] = {
    val ids = docs.select(col(idCol).cast("long").as("doc_id"))
      .where(col("doc_id").isNotNull && col("doc_id") >= 0)
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    // payload is a pure function of id % 60 (g = id%12 determines
    // id%3; corruption by id%10; lcm(12,10) = 60) — r21 route+memo
    routeIds(ids, pmod(col("doc_id"), lit(60L)))
      .as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val memo = new TaskMemo[Long, Array[Byte]]()
      it.map { id =>
        val payload = memo.get(id % 60L) {
          val g = (id % 12).toInt
          val nScenes = 2 + (id % 3).toInt
          val jpegs = (0 until nScenes * 3).map { f =>
            val scene = f / 3
            flatBlockJpeg(r =>
              mjpegPatterns((g * 7 + scene * 5 + r) % 4))
          }
          assembleMjpegAvi(jpegs, (id % 10).toInt)
        }
        MediaRecord(id, s"memory://scene/$id", "video/x-msvideo",
          payload)
      }
    }
  }

  /** SHOT segmentation over per-frame perceptual fingerprints — the
    * readout that drives a video-text pipeline's frame-sample budget
    * (sample per SHOT, not per fixed stride: a static shot wastes
    * budget, a cut-heavy segment starves): group consecutive OBSERVED
    * frames into shots, cutting wherever the frame-to-frame dHash
    * Hamming distance exceeds `cutHamming` (re-encode/level noise
    * moves a flat-ish frame pair by a few bits; a content cut moves
    * tens — the threshold sits between the two regimes). Decode
    * failures leave gaps in the observed frames; segmentation bridges
    * a gap whose flanks still agree (the shot survives a dropped
    * frame) and cuts where they do not.
    *
    * Scale shape: ONE window pass partitioned by video (per-video
    * frame counts bound the partition — never a global window) + the
    * per-(video, shot) fold; input is the 16-byte fingerprint frame
    * ([[videoFrameFingerprints]]), payloads never touched. Output
    * (doc_id, shot_idx, start_frame, end_frame, n_frames). */
  def videoShotSegments(frameFps: DataFrame, idCol: String,
      frameCol: String, fpCol: String, cutHamming: Int = 8)
      : DataFrame =
    videoShotLabels(frameFps, idCol, frameCol, fpCol, cutHamming)
      .groupBy(col("doc_id"), col("shot_idx"))
      .agg(min(col("frame_idx")).as("start_frame"),
        max(col("frame_idx")).as("end_frame"),
        count(lit(1)).as("n_frames"))
      .orderBy(col("doc_id"), col("shot_idx"))

  /** The per-frame half of [[videoShotSegments]]: each observed
    * frame's shot label — (doc_id, frame_idx, shot_idx) — before the
    * per-shot fold. Exposed so [[shotSampleSchedule]] can address
    * OBSERVED frames positionally inside a shot (a schedule written
    * off the folded (start, end) spans would seek decode-failure
    * gaps). */
  private[graft] def videoShotLabels(frameFps: DataFrame,
      idCol: String, frameCol: String, fpCol: String,
      cutHamming: Int): DataFrame = {
    require(cutHamming >= 0 && cutHamming < 64,
      s"cutHamming=$cutHamming out of range")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    val f = frameFps.select(col(idCol).as("doc_id"),
      col(frameCol).as("frame_idx"), col(fpCol).as("fp"))
    f.withColumn("__prev", lag(col("fp"), 1).over(w))
      .withColumn("__cut", when(col("__prev").isNull ||
        bit_count(col("fp").bitwiseXOR(col("__prev"))) > cutHamming,
        1L).otherwise(0L))
      .withColumn("shot_idx", sum(col("__cut")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        - 1L)
      .select(col("doc_id"), col("frame_idx"), col("shot_idx"))
  }

  /** SHOT-ADAPTIVE frame-sample schedule — the q281 ∘ q238
    * composition: a per-video budget of `k` frame seeks, split across
    * the video's shots IN PROPORTION TO SHOT LENGTH (every shot gets
    * at least one — the whole point of shot-adaptive sampling: a
    * uniform stride starves short shots and wastes budget on static
    * ones), each shot sampled at its own positional midpoints.
    * Pure integer arithmetic end-to-end:
    *  - `k_s = min(n_s, max(1, (k · n_s) div F))` seeks for a shot
    *    of `n_s` observed frames in a video of `F` (⌊·⌋ keeps
    *    Σk_s ≤ k + the short-shot floor — the floor is the policy,
    *    not rounding; the `n_s` ceiling keeps every seek DISTINCT —
    *    a budget above the shot's frame count would otherwise emit
    *    duplicate midpoints and waste real decoder seeks),
    *  - seek j lands on the shot's OBSERVED frame at position
    *    `(n_s · (2j + 1)) div (2 · k_s)` (q238's midpoint rule applied
    *    within the shot) — positions index observed frames, so a
    *    decode-failure gap can never be seeked.
    *
    * Scale shape: the q281 label pass (one per-video window) + one
    * per-(video, shot) positional window + two reduced folds
    * (per-shot sizes, per-video totals) re-attached by co-keyed
    * shuffle joins — the shot frame scales with the corpus and is
    * never broadcast. Output (doc_id, shot_idx, sample_idx,
    * frame_idx) ordered. */
  def shotSampleSchedule(frameFps: DataFrame, idCol: String,
      frameCol: String, fpCol: String, cutHamming: Int = 8,
      k: Int = 4,
      scope: graft.engine.CacheScope =
        graft.engine.CacheScope.unmanaged): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    // two consumers (positions, sizes) — persist so the per-video
    // labeling window pass runs once, not twice
    val labeled = scope.persist(videoShotLabels(frameFps, idCol,
      frameCol, fpCol, cutHamming))
    val pos = labeled.withColumn("__pos",
      row_number().over(Window.partitionBy(col("doc_id"),
        col("shot_idx")).orderBy(col("frame_idx"))) - 1L)
    val sizes = labeled.groupBy(col("doc_id"), col("shot_idx"))
      .agg(count(lit(1)).as("__n_s"))
    val totals = sizes.groupBy(col("doc_id"))
      .agg(sum(col("__n_s")).as("__f"))
    val targets = sizes.join(totals, Seq("doc_id"))
      .withColumn("__k_s", least(col("__n_s"),
        greatest(lit(1L), expr(s"($k * __n_s) div __f"))))
      .select(col("doc_id"), col("shot_idx"), col("__n_s"),
        col("__k_s"),
        explode(sequence(lit(0L), col("__k_s") - 1L))
          .as("sample_idx"))
      .select(col("doc_id"), col("shot_idx"), col("sample_idx"),
        expr("(__n_s * (2 * sample_idx + 1)) div (2 * __k_s)")
          .as("__pos"))
    targets.join(pos, Seq("doc_id", "shot_idx", "__pos"))
      .select(col("doc_id"), col("shot_idx"), col("sample_idx"),
        col("frame_idx"))
      .orderBy(col("doc_id"), col("shot_idx"), col("sample_idx"))
  }

  /** The per-frame byte ranges of an MJPEG AVI payload — (offset,
    * size) of each complete JPEG inside the `movi` LIST, in stream
    * order. TOTAL over bytes with the house walk contract: corrupt
    * magic, truncation, a chunk overrunning its parent, a walk that
    * does not consume its declared extent exactly, duplicate `movi`
    * lists, and hostile chunk counts (> 64 top-level, > 4096 frames)
    * all yield None — errors are data, never exceptions. Frame chunks
    * are the `##dc`/`##db` convention, either as direct `movi`
    * children or one level down inside interleaved `rec ` LISTs (the
    * spec's only nesting); `idx1` is deliberately not trusted (a
    * lying index must not redirect the walk — frames come from the
    * `movi` structure itself). */
  def aviFrameRanges(payload: Array[Byte])
      : Option[IndexedSeq[(Long, Long)]] = {
    def fourcc(off: Int): String =
      new String(payload, off, 4, "US-ASCII")
    def u32le(off: Int): Long =
      (payload(off) & 0xffL) | ((payload(off + 1) & 0xffL) << 8) |
        ((payload(off + 2) & 0xffL) << 16) |
        ((payload(off + 3) & 0xffL) << 24)
    try {
      if (payload.length < 12) return None
      if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
      val end = u32le(4) + 8L
      // the declared extent must be the payload (± one RIFF pad byte):
      // truncation AND trailing bytes both refuse
      if (end > payload.length.toLong) return None
      if (payload.length.toLong > end + 1) return None
      val out = IndexedSeq.newBuilder[(Long, Long)]
      var off = 12L
      var top = 0
      var sawMovi = false
      while (off + 8 <= end) {
        val sz = u32le(off.toInt + 4)
        if (off + 8 + sz > end) return None
        if (fourcc(off.toInt) == "LIST") {
          if (sz < 4) return None
          if (fourcc(off.toInt + 8) == "movi") {
            if (sawMovi) return None
            sawMovi = true
            var co = off + 12
            val cend = off + 8 + sz
            var n = 0
            def isFrame(fc: String): Boolean =
              fc(0).isDigit && fc(1).isDigit && fc(2) == 'd' &&
                (fc(3) == 'c' || fc(3) == 'b')
            while (co + 8 <= cend) {
              val csz = u32le(co.toInt + 4)
              if (co + 8 + csz > cend) return None
              val cfc = fourcc(co.toInt)
              if (isFrame(cfc)) out += ((co + 8, csz))
              else if (cfc == "LIST" && csz >= 4 &&
                fourcc(co.toInt + 8) == "rec ") {
                // interleaved AVIs wrap each frame group in a 'rec '
                // LIST (one level deep by spec) — walk its children
                var ro = co + 12
                val rend = co + 8 + csz
                while (ro + 8 <= rend) {
                  val rsz = u32le(ro.toInt + 4)
                  if (ro + 8 + rsz > rend) return None
                  if (isFrame(fourcc(ro.toInt))) out += ((ro + 8, rsz))
                  ro += 8 + rsz + (rsz & 1)
                  n += 1
                  if (n > 4096) return None
                }
                if (ro != rend && ro != rend + 1) return None
              }
              co += 8 + csz + (csz & 1)
              n += 1
              if (n > 4096) return None
            }
            if (co != cend && co != cend + 1) return None
          }
        }
        off += 8 + sz + (sz & 1)
        top += 1
        if (top > 64) return None
      }
      if (off != end && off != end + 1) return None
      if (!sawMovi) return None
      val frames = out.result()
      if (frames.isEmpty) return None
      Some(frames)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** MJPEG/AVI container metadata — [[decodeVideoMeta]]'s sibling for
    * the RIFF tier, the same pure-integer honesty level as the
    * ISO-BMFF box walk: width/height/stream-count/µs-per-frame read
    * from the spec-required `avih` header (first chunk of the `hdrl`
    * LIST), duration = frame count (from the [[aviFrameRanges]] movi
    * walk — never the header's claim) × µs-per-frame. `brand` is the
    * RIFF form type (`avi `). Total: anything the frame walk or the
    * header layout rejects is an `ok = 0` row, never an exception. */
  def decodeMjpegMeta(media: Dataset[MediaRecord])
      : Dataset[VideoMeta] =
    media.mapPartitions { it =>
      it.map { r =>
        val p = r.payload
        def u32le(off: Int): Long =
          (p(off) & 0xffL) | ((p(off + 1) & 0xffL) << 8) |
            ((p(off + 2) & 0xffL) << 16) | ((p(off + 3) & 0xffL) << 24)
        val meta = try {
          aviFrameRanges(p).flatMap { frames =>
            // hdrl must be the first LIST, avih its first chunk
            val ok = p.length >= 12 + 12 + 8 + 56 &&
              new String(p, 12, 4, "US-ASCII") == "LIST" &&
              new String(p, 20, 4, "US-ASCII") == "hdrl" &&
              new String(p, 24, 4, "US-ASCII") == "avih" &&
              u32le(28) >= 56
            if (!ok) None
            else {
              val d = 32 // avih payload offset
              val usPerFrame = u32le(d)
              Some((frames.size.toLong * usPerFrame / 1000L,
                u32le(d + 24), u32le(d + 32), u32le(d + 36)))
            }
          }
        } catch { case scala.util.control.NonFatal(_) => None }
        meta match {
          case Some((durMs, streams, w, h)) =>
            VideoMeta(r.doc_id, 1L, Some("avi "), Some(durMs),
              Some(streams), Some(w), Some(h))
          case None =>
            VideoMeta(r.doc_id, 0L, None, None, None, None, None)
        }
      }
    }

  /** One per-frame perceptual fingerprint row: `ok = 1` with the
    * frame's [[dhash64]] when the frame JPEG decoded, `ok = 0`/null
    * otherwise. Videos whose CONTAINER fails the walk have no rows
    * (the chunk-inventory contract); per-FRAME decode failures are
    * data. */
  final case class VideoFrameFp(doc_id: Long, frame_idx: Long,
      ok: Long, fp: Option[Long])

  implicit val videoFrameFpEnc: Encoder[VideoFrameFp] =
    Encoders.product[VideoFrameFp]

  /** Distributed per-frame perceptual fingerprints of MJPEG videos:
    * walk the container ([[aviFrameRanges]]), decode each frame JPEG,
    * dHash it — the decode pass a video near-dup pipeline runs ONCE,
    * after which every dedup question is answered from
    * `frames × 8 bytes` of fingerprints ([[Dedup
    * .alignedFingerprintPairs]]), never the payload. mapPartitions is
    * justified (ImageIO cannot live in a Catalyst expression); payload
    * bytes never cross a shuffle. */
  def videoFrameFingerprints(media: Dataset[MediaRecord])
      : Dataset[VideoFrameFp] =
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      // FRAME-level memo: MJPEG corpora repeat frame JPEGs massively
      // (re-uploads, overlapping clip windows) — hash each distinct
      // frame's bytes once per task (r21 PayloadMemo note); the
      // container walk itself is cheap byte arithmetic
      val memo = new PayloadMemo[Option[Long]]()
      it.flatMap { r =>
        aviFrameRanges(r.payload) match {
          case Some(ranges) => ranges.iterator.zipWithIndex.map {
            case ((o, s), i) =>
              val frame = java.util.Arrays.copyOfRange(
                r.payload, o.toInt, (o + s).toInt)
              memo.get(frame)(dhash64(frame)) match {
                case Some(fp) => VideoFrameFp(r.doc_id, i.toLong, 1L,
                  Some(fp))
                case None => VideoFrameFp(r.doc_id, i.toLong, 0L, None)
              }
          }
          case None => Iterator.empty
        }
      }
    }

  /** The decoded frames of a GIF payload — one for a static GIF, one
    * per stored frame for an animated one (the SECOND multi-frame
    * coding the JDK honestly decodes, after MJPEG/AVI; ubiquitous in
    * web crawls). TOTAL over hostile input with the house contract:
    * wrong magic (`GIF87a`/`GIF89a` checked BEFORE any reader probe),
    * truncation, any reader/decode failure, zero frames, a
    * hostile frame count (> 1024), or a hostile TOTAL PIXEL MASS
    * (Σ w·h > 2²⁴ across frames — GIF dimensions are unbounded, and
    * 1024 fully-decoded 4K frames would OOM the executor before any
    * per-frame check ran; the running sum is checked against the
    * reader's header dims BEFORE each decode) all yield None —
    * errors are data, never exceptions, including resource-
    * exhaustion errors. Frames are returned as stored (the fixtures
    * write full replacement frames; delta-composited animations
    * fingerprint their stored deltas, which is still a pure function
    * of the payload — the dedup contract needs determinism, not
    * player-perfect compositing). */
  def gifFrames(payload: Array[Byte])
      : Option[IndexedSeq[java.awt.image.BufferedImage]] =
    try {
      if (payload.length < 6) return None
      val magic = new String(payload, 0, 6, "US-ASCII")
      if (magic != "GIF87a" && magic != "GIF89a") return None
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis, false, true)
          val n = reader.getNumImages(true)
          if (n < 1 || n > 1024) return None
          // header-dims pixel budget BEFORE each decode — the cap
          // trips on the declared size, never after the allocation
          var px = 0L
          val out = IndexedSeq.newBuilder[java.awt.image.BufferedImage]
          var i = 0
          while (i < n) {
            px += reader.getWidth(i).toLong * reader.getHeight(i).toLong
            if (px > (1L << 24)) return None
            out += reader.read(i)
            i += 1
          }
          Some(out.result())
        } finally reader.dispose()
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Distributed per-frame perceptual fingerprints of GIFs — the
    * [[videoFrameFingerprints]] contract on the GIF coding: decode
    * ONCE, dHash each frame (palette-normalized — [[dhashImage]]),
    * after which every dedup question is `frames × 8 bytes`, never
    * the payload. Static GIFs emit one row (their aligned-sequence
    * signature degenerates to the single-image dHash); undecodable
    * containers emit none; a frame smaller than the 9×8 dHash grid is
    * an `ok = 0` row. */
  def gifFrameFingerprints(media: Dataset[MediaRecord])
      : Dataset[VideoFrameFp] =
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      // PAYLOAD-level memo of the fingerprint sequence: GIF frames
      // decode through one sequence reader, so the memoizable unit is
      // the whole payload's (ok, fp) list — small rows, bounded (r21)
      val memo = new PayloadMemo[Option[IndexedSeq[(Long,
        Option[Long])]]]()
      it.flatMap { r =>
        memo.get(r.payload)(gifFrames(r.payload).map(_.map(img =>
          dhashImage(img) match {
            case Some(fp) => (1L, Some(fp))
            case None => (0L, None)
          }))) match {
          case Some(frames) => frames.iterator.zipWithIndex.map {
            case ((ok, fp), i) => VideoFrameFp(r.doc_id, i.toLong, ok,
              fp)
          }
          case None => Iterator.empty
        }
      }
    }

  /** REAL-BYTES GIF fixture: per doc id, an actual `ImageIO` GIF
    * writer sequence of `1 + (id%12) % 3` flat-block frames (1 =
    * STATIC, 2–3 = animated) — the [[encodeMjpegFixture]] pattern
    * discipline on a LOSSLESS coding, so the per-frame dHash row
    * byte IS the pattern byte `P[(g·7 + f·5 + r + 2·[v=2]) % 4]`
    * bit-exactly (no 24-level codec-error argument needed; the
    * 24-step alphabet is kept anyway so the frames share the MJPEG
    * fixture's geometry). Variant structure for the dedup ladder:
    * v0/v1 differ by ONE dHash bit in frame 0 (near-dup), v2 shifts
    * the pattern phase (a different stream). Corruption families:
    * `id%10 ∈ {3,4}` zeroes the magic (router → unknown, no rows),
    * `id%10 = 6` truncates to 16 bytes (magic intact — routes — but
    * the decode refuses: no rows). */
  def encodeGifFixture(docs: DataFrame, idCol: String)
      : Dataset[MediaRecord] = {
    val ids = docs.select(col(idCol).cast("long").as("doc_id"))
      .where(col("doc_id").isNotNull && col("doc_id") >= 0)
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    // payload is a pure function of id % 180 (g/v by id%36,
    // corruption by id%10) — r21 route+memo; the memoized array is
    // never mutated (corruption is applied inside the compute, part
    // of the key)
    routeIds(ids, pmod(col("doc_id"), lit(180L)))
      .as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val memo = new TaskMemo[Long, Array[Byte]]()
      it.map { id =>
        val payload = memo.get(id % 180L) {
          val g = (id % 12).toInt
          val v = ((id / 12) % 3).toInt
          val n = 1 + g % 3
          val bos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          val writer = javax.imageio.ImageIO
            .getImageWritersByFormatName("gif").next()
          try {
            writer.setOutput(ios)
            writer.prepareWriteSequence(null)
            (0 until n).foreach { f =>
              val img = flatBlockImage { r =>
                val pb = mjpegPatterns(
                  (g * 7 + f * 5 + r + (if (v == 2) 2 else 0)) % 4)
                if (v == 1 && f == 0 && r == 0) pb ^ 8 else pb
              }
              writer.writeToSequence(
                new javax.imageio.IIOImage(img, null, null), null)
            }
            writer.endWriteSequence()
          } finally { writer.dispose(); ios.close() }
          var bytes = bos.toByteArray
          if (id % 10 == 3 || id % 10 == 4) {
            bytes(0) = 0; bytes(1) = 0; bytes(2) = 0
          } else if (id % 10 == 6) bytes = bytes.take(16)
          bytes
        }
        MediaRecord(id, s"memory://gif/$id", "image/gif", payload)
      }
    }
  }

  /** TRIMMED-CLIP GIF fixture — [[encodeClipMjpegFixture]]'s
    * animated-GIF sibling for the offset-tolerant rungs (q311/q312):
    * ids sharing a REEL (`g = id % G`, `G = ` [[clipReels]] —
    * corpus-scaled, the same vacuity argument) record different
    * WINDOWS of it (offset `(id div G) % 5`, length `5 + id % 3`
    * frames); frame content at reel position `pos` is the aperiodic
    * multiplicative row mix `P[((h·(2r+5)) mod 1000003) mod 4]` with
    * `h = (g·1500450271 + pos·2654435761) mod 1000003`
    * (`2r+5`, not the MJPEG clip fixture's `2r+3` — the two fixtures
    * are distinct streams; multiplicative in `r` for the
    * [[encodeClipMjpegFixture]] collapse reason),
    * written through the real ImageIO GIF
    * sequence writer, so the per-frame dHash row byte IS the pattern
    * byte bit-exactly (GIF is lossless — the [[encodeGifFixture]]
    * argument). A trimmed/embedded animated-GIF re-upload shifts
    * every frame index and escapes q285's aligned matching — this is
    * its test bed. Corruption family: `id % 10 = 3` zeroes the magic
    * (router → unknown, no rows). */
  def encodeClipGifFixture(docs: DataFrame, idCol: String)
      : Dataset[MediaRecord] = {
    val ids = clipIds(docs, idCol)
    val reels = clipReels(docs, idCol)
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    // route by REEL, memoize whole payloads on (g, o, len, corrupt) —
    // same-reel ids repeat the full class ~4× at any SF (r21); the
    // memoized array is never mutated (corruption inside the compute)
    routeIds(ids, pmod(col("doc_id"), lit(reels)))
      .as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val memo = new TaskMemo[Long, Array[Byte]]()
      it.map { id =>
        val g = id % reels
        val o = ((id / reels) % 5).toInt
        val len = (5 + id % 3).toInt
        val key = (((g * 5L + o) * 3L + (id % 3)) * 2L +
          (if (id % 10 == 3) 1L else 0L))
        val payload = memo.get(key) {
          val bos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          val writer = javax.imageio.ImageIO
            .getImageWritersByFormatName("gif").next()
          try {
            writer.setOutput(ios)
            writer.prepareWriteSequence(null)
            (0 until len).foreach { f =>
              val pos = (o + f).toLong
              val h = (g * 1500450271L + pos * 2654435761L) % 1000003L
              val img = flatBlockImage { r =>
                mjpegPatterns((h * (2 * r + 5) % 1000003L % 4L).toInt)
              }
              writer.writeToSequence(
                new javax.imageio.IIOImage(img, null, null), null)
            }
            writer.endWriteSequence()
          } finally { writer.dispose(); ios.close() }
          val bytes = bos.toByteArray
          if (id % 10 == 3) { bytes(0) = 0; bytes(1) = 0; bytes(2) = 0 }
          bytes
        }
        MediaRecord(id, s"memory://clipgif/$id", "image/gif", payload)
      }
    }
  }

  /** MEDIA CATALOG PROFILE — the first readout a multimodal curation
    * team asks of a freshly-decoded corpus: per modality, how healthy
    * is the decode (ok vs corrupt) and how is the catalog distributed
    * over the buckets that drive training decisions — image
    * resolution/aspect/format (thumbnails train nothing; extreme
    * aspect ratios break fixed-size patching), audio container /
    * sample rate / duration band (resample targets, padding budgets),
    * video resolution / duration band (frame-sample budgets). Long
    * format — (modality, dimension, bucket, n) — so one frame answers
    * every "how many X are Y" without a schema per modality.
    *
    * Inputs are the DECODED metadata frames ([[decodeImageMeta]] /
    * [[decodeAudioMeta]] / [[decodeVideoMeta]] outputs, or any frames
    * with those columns): the profile is a catalog pass, decoupled
    * from how the catalog was decoded. Corrupt rows (`ok = 0`) count
    * in the `health` dimension only — their metadata is NULL by the
    * decoder contract.
    *
    * Engine-exact: every bucket boundary is an integer comparison
    * (pixel counts and duration bands by cross-multiplication —
    * `frames·1000 < rate·10`, never a division); counts are exact.
    * Scale shape: all bucket assignment is row-local; the ONE shuffle
    * is the partial-aggregated count over ≤ a few dozen (modality,
    * dimension, bucket) keys. */
  def mediaProfile(images: DataFrame, audio: DataFrame,
      video: DataFrame): DataFrame = {
    def rows(df: DataFrame, modality: String,
        dims: Seq[(String, Column)]): DataFrame =
      df.where(col("ok") === 1L).select(explode(array(dims.map {
        case (d, b) => struct(lit(modality).as("modality"),
          lit(d).as("dimension"), b.as("bucket"))
      }: _*)).as("e")).select(col("e.*"))
    def health(df: DataFrame, modality: String): DataFrame =
      df.select(lit(modality).as("modality"),
        lit("health").as("dimension"),
        when(col("ok") === 1L, "ok").otherwise("corrupt").as("bucket"))
    val px = col("width") * col("height")
    val img = rows(images, "image", Seq(
      "format" -> col("format"),
      "resolution" -> when(px < 1024L, "tiny")
        .when(px < 2048L, "small").otherwise("medium"),
      "aspect" -> when(col("height") > col("width"), "portrait")
        .when(col("height") === col("width"), "square")
        .otherwise("landscape")))
    val aud = rows(audio, "audio", Seq(
      "container" -> col("container"),
      "sample_rate" -> col("sample_rate").cast("string"),
      "duration" -> when(
        col("n_frames") * lit(1000L) < col("sample_rate") * lit(10L),
        "lt_10ms")
        .when(col("n_frames") * lit(1000L) <
          col("sample_rate") * lit(20L), "lt_20ms")
        .otherwise("ge_20ms")))
    val vid = rows(video, "video", Seq(
      "resolution" -> when(px < 100000L, "lt_0_1mp")
        .when(px < 200000L, "lt_0_2mp").otherwise("ge_0_2mp"),
      "duration" -> when(col("duration_ms") < 8000L, "lt_8s")
        .when(col("duration_ms") < 16000L, "lt_16s")
        .otherwise("ge_16s")))
    Seq(img, aud, vid, health(images, "image"), health(audio, "audio"),
        health(video, "video"))
      .reduce(_.unionByName(_))
      .groupBy(col("modality"), col("dimension"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("modality"), col("dimension"), col("bucket"))
  }

  /** FRAME-SAMPLE PLAN — the deterministic "which k frames do we
    * grab" schedule a vision-training pipeline derives from
    * [[decodeVideoMeta]]'s container metadata BEFORE any expensive
    * frame extraction runs: k timestamps at the MIDPOINTS of k equal
    * duration segments (`tᵢ = duration·(2i+1) div 2k` — uniform
    * coverage, never the black first frame at t=0, never a
    * past-the-end seek at t=duration), one row per (video, frame).
    * The plan is pure integer arithmetic on the metadata row — the
    * actual decode stays in the executor-side codec path, and a
    * re-run or a different engine produces byte-identical seek lists
    * (the property that makes extracted-frame caches reusable).
    * Undecodable videos (`ok = 0`) have no plan rows by construction.
    *
    * Scale shape: row-local filter + a k-row explode per video; no
    * shuffle at all until a consumer aggregates. */
  def frameSamplePlan(videoMeta: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 1024, s"k=$k out of [1, 1024]")
    videoMeta
      .where(col("ok") === 1L && col("duration_ms").isNotNull)
      .select(col("doc_id"), col("duration_ms"),
        explode(sequence(lit(0L), lit(k - 1L))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        expr(s"(duration_ms * (2 * frame_idx + 1)) div ${2L * k}L")
          .as("t_ms"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }
}
