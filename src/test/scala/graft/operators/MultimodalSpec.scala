package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.Tables

/** Pins the two multimodal decode paths to each other (ADVICE r2): the
  * typed `mapPartitions` decode (the shape a real codec binding needs)
  * and the columnar `featureCols` metadata path (what q26's oracle
  * checks) must produce identical features for every document.
  */
class MultimodalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("decodeFeatures (typed mapPartitions) ≡ featureCols (columnar)") {
    val media = Multimodal.mediaFrame(Tables.documents(spark, sf),
      "doc_id", "text")

    val typed = Multimodal.decodeFeatures(
        media.as[Multimodal.MediaRecord](Multimodal.mediaRecordEnc))
      .toDF()
      .select("doc_id", "mime", "n_bytes", "frame_w", "frame_h", "n_frames")
      .orderBy("doc_id")
      .collect().toSeq

    val columnar = media
      .select(Seq(col("doc_id"), col("mime")) ++
        Multimodal.featureCols(col("doc_id"), col("payload")): _*)
      .orderBy("doc_id")
      .collect().toSeq

    assert(typed.nonEmpty)
    assert(typed == columnar)
  }

  test("metadata-only plan prunes the payload encode entirely") {
    val media = Multimodal.mediaFrame(Tables.documents(spark, sf),
      "doc_id", "text")
    val metaOnly = media.select(col("doc_id"), col("mime"))
    // column pruning must eliminate the payload construction (encode of
    // the text column) from a metadata-only plan — at 100 TB this is
    // the difference between reading bytes and reading a catalog
    val plan = metaOnly.queryExecution.optimizedPlan.toString()
    assert(!plan.contains("encode("), s"payload not pruned:\n$plan")
    assert(metaOnly.count() == 500)
  }

  test("decodeImageMeta round-trips real ImageIO encodes: dims, " +
    "channels and format match the id formulas") {
    val media = Multimodal.encodeImageFixture(
      Tables.documents(spark, sf), "doc_id")
    val out = Multimodal.decodeImageMeta(media).collect()
      .map(m => m.doc_id -> m).toMap
    assert(out.size == 500)
    val clean = out.values.filter(_.ok == 1L)
    assert(clean.nonEmpty)
    clean.foreach { m =>
      assert(m.width.get == 8 + m.doc_id % 57, s"width off: $m")
      assert(m.height.get == 8 + (m.doc_id * 3) % 41, s"height off: $m")
      assert(m.channels.get == 3L, s"channels off: $m")
      assert(m.format.get ==
        (if (m.doc_id % 2 == 0) "png" else "jpeg"), s"format off: $m")
    }
  }

  test("corrupt payloads (bad magic, truncated header) yield ok=0 " +
    "null-metadata rows for BOTH formats — never a task failure") {
    val media = Multimodal.encodeImageFixture(
      Tables.documents(spark, sf), "doc_id")
    val out = Multimodal.decodeImageMeta(media).collect()
    val corrupt = out.filter(m => Seq(3L, 4L, 6L, 7L).contains(m.doc_id % 10))
    assert(corrupt.nonEmpty)
    corrupt.foreach { m =>
      assert(m.ok == 0L && m.width.isEmpty && m.height.isEmpty &&
        m.channels.isEmpty && m.format.isEmpty, s"corrupt row leaked: $m")
    }
    // all four (corruption × format) combos present: magic-corrupt
    // jpeg (…3), magic-corrupt png (…4), truncated png (…6),
    // truncated jpeg (…7)
    Seq(3L, 4L, 6L, 7L).foreach { d =>
      assert(corrupt.exists(_.doc_id % 10 == d), s"no id ending $d")
    }
    assert(out.count(_.ok == 1L) == out.length - corrupt.length)
  }

  test("decodeImageHeader is total: garbage, empty and truncated " +
    "byte arrays return None instead of throwing") {
    assert(Multimodal.decodeImageHeader(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeImageHeader(Array.fill[Byte](64)(0x41)).isEmpty)
    // a real PNG signature followed by nothing: reader claims, header EOF
    val pngMagic = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47,
      0x0d, 0x0a, 0x1a, 0x0a)
    assert(Multimodal.decodeImageHeader(pngMagic).isEmpty)
  }

  test("decodeAudioMeta round-trips real AudioSystem encodes: rate, " +
    "channels, frames, encoding and container match the id formulas") {
    val media = Multimodal.encodeAudioFixture(
      Tables.documents(spark, sf), "doc_id")
    val out = Multimodal.decodeAudioMeta(media).collect()
      .map(m => m.doc_id -> m).toMap
    assert(out.size == 500)
    val clean = out.values.filter(_.ok == 1L)
    assert(clean.nonEmpty)
    clean.foreach { m =>
      assert(m.sample_rate.get == 8000 + (m.doc_id % 5) * 2000,
        s"rate off: $m")
      assert(m.channels.get == 1 + m.doc_id % 2, s"channels off: $m")
      assert(m.n_frames.get == 50 + (m.doc_id * 7) % 151,
        s"frames off: $m")
      assert(m.encoding.get == "pcm_signed", s"encoding off: $m")
      assert(m.container.get ==
        (if (m.doc_id % 2 == 0) "wave" else "aiff"), s"container off: $m")
    }
  }

  test("corrupt audio payloads (bad magic, truncated header) yield " +
    "ok=0 null-metadata rows for BOTH containers — never a failure") {
    val media = Multimodal.encodeAudioFixture(
      Tables.documents(spark, sf), "doc_id")
    val out = Multimodal.decodeAudioMeta(media).collect()
    val corrupt = out.filter(m => Seq(3L, 4L, 6L, 7L).contains(m.doc_id % 10))
    assert(corrupt.nonEmpty)
    corrupt.foreach { m =>
      assert(m.ok == 0L && m.sample_rate.isEmpty && m.channels.isEmpty &&
        m.n_frames.isEmpty && m.encoding.isEmpty && m.container.isEmpty,
        s"corrupt row leaked: $m")
    }
    // all four (corruption × container) combos present: magic-corrupt
    // aiff (…3), magic-corrupt wav (…4), truncated wav (…6),
    // truncated aiff (…7)
    Seq(3L, 4L, 6L, 7L).foreach { d =>
      assert(corrupt.exists(_.doc_id % 10 == d), s"no id ending $d")
    }
    assert(out.count(_.ok == 1L) == out.length - corrupt.length)
  }

  test("decodeAudioHeader is total: garbage, empty and truncated " +
    "byte arrays return None instead of throwing") {
    assert(Multimodal.decodeAudioHeader(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeAudioHeader(Array.fill[Byte](64)(0x41)).isEmpty)
    // a real RIFF magic followed by nothing: provider claims, then EOF
    val riffMagic = "RIFF".getBytes("US-ASCII")
    assert(Multimodal.decodeAudioHeader(riffMagic).isEmpty)
  }

  test("decodeVideoMeta round-trips the ISO-BMFF fixture: brand, " +
    "duration, track count and dimensions match the id formulas") {
    val media = Multimodal.encodeVideoFixture(
      Tables.documents(spark, sf), "doc_id")
    val out = Multimodal.decodeVideoMeta(media).collect()
      .map(m => m.doc_id -> m).toMap
    assert(out.size == 500)
    val clean = out.values.filter(_.ok == 1L)
    assert(clean.nonEmpty)
    clean.foreach { m =>
      assert(m.brand.get == "isom", s"brand off: $m")
      assert(m.duration_ms.get == 1000 + (m.doc_id % 97) * 250,
        s"duration off: $m")
      assert(m.n_tracks.get == 1 + m.doc_id % 2, s"tracks off: $m")
      assert(m.width.get == 160 + (m.doc_id % 8) * 80, s"width off: $m")
      assert(m.height.get == 120 + (m.doc_id % 6) * 60,
        s"height off: $m")
    }
  }

  test("corrupt video payloads (bad ftyp fourCC, truncated box) yield " +
    "ok=0 null-metadata rows for BOTH track counts — never a failure") {
    val media = Multimodal.encodeVideoFixture(
      Tables.documents(spark, sf), "doc_id")
    val out = Multimodal.decodeVideoMeta(media).collect()
    val corrupt = out.filter(m => Seq(3L, 4L, 6L, 7L).contains(m.doc_id % 10))
    assert(corrupt.nonEmpty)
    corrupt.foreach { m =>
      assert(m.ok == 0L && m.brand.isEmpty && m.duration_ms.isEmpty &&
        m.n_tracks.isEmpty && m.width.isEmpty && m.height.isEmpty,
        s"corrupt row leaked: $m")
    }
    Seq(3L, 4L, 6L, 7L).foreach { d =>
      assert(corrupt.exists(_.doc_id % 10 == d), s"no id ending $d")
    }
    assert(out.count(_.ok == 1L) == out.length - corrupt.length)
  }

  test("decodeVideoHeader parses VERSION-1 mvhd/tkhd (64-bit times) at " +
    "their shifted offsets, size==1 largesize and size==0 to-EOF boxes") {
    def be32(v: Long) = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    def box(tp: String, p: Array[Byte]) =
      be32(p.length + 8L) ++ tp.getBytes("US-ASCII") ++ p
    val matrix = Array.fill[Byte](36)(0)
    // v1 mvhd: ver=1, 64-bit ctime/mtime, timescale 600, 64-bit
    // duration 1200 (→ 2000 ms)
    val mvhd1 = box("mvhd", Array[Byte](1, 0, 0, 0) ++
      be64(0) ++ be64(0) ++ be32(600) ++ be64(1200) ++
      be32(0x00010000L) ++ Array[Byte](1, 0, 0, 0) ++
      be32(0) ++ be32(0) ++ matrix ++ Array.fill[Byte](24)(0) ++ be32(2))
    // v1 tkhd: ver=1, 64-bit times/duration, 640×480 in 16.16
    val tkhd1 = box("tkhd", Array[Byte](1, 0, 0, 7) ++
      be64(0) ++ be64(0) ++ be32(1) ++ be32(0) ++ be64(1200) ++
      be32(0) ++ be32(0) ++ Array.fill[Byte](8)(0) ++ matrix ++
      be32(640L << 16) ++ be32(480L << 16))
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0x200) ++
      "isom".getBytes("US-ASCII"))
    val moov = box("moov", mvhd1 ++ box("trak", tkhd1))
    // mdat via size==1 + 64-bit largesize (header 16 + 4 data bytes)
    val mdatLarge = be32(1) ++ "mdat".getBytes("US-ASCII") ++
      be64(20) ++ Array[Byte](0, 0, 0, 0)
    val v1 = Multimodal.decodeVideoHeader(ftyp ++ moov ++ mdatLarge)
    assert(v1.contains(("isom", 2000L, 1L, 640L, 480L)), v1)
    // mdat via size==0 (extends to end of payload — stream-written)
    val mdatEof = be32(0) ++ "mdat".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3)
    val v0eof = Multimodal.decodeVideoHeader(ftyp ++ moov ++ mdatEof)
    assert(v0eof.contains(("isom", 2000L, 1L, 640L, 480L)), v0eof)
    // an UNKNOWN version must be None, never a guessed-offset parse
    val mvhd9 = box("mvhd", Array[Byte](9, 0, 0, 0) ++
      Array.fill[Byte](92)(0))
    val bad = Multimodal.decodeVideoHeader(
      ftyp ++ box("moov", mvhd9 ++ box("trak", tkhd1)))
    assert(bad.isEmpty, bad)
  }

  test("decodeVideoHeader is total and strict: garbage, empty input, " +
    "a size field past the payload end, and a zero timescale all " +
    "return None instead of throwing") {
    assert(Multimodal.decodeVideoHeader(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeVideoHeader(Array.fill[Byte](64)(0x41)).isEmpty)
    // a well-formed ftyp whose declared size overruns the buffer
    val lyingSize = Array[Byte](0, 0, 1, 0) ++ "ftyp".getBytes("US-ASCII") ++
      Array.fill[Byte](8)(0)
    assert(Multimodal.decodeVideoHeader(lyingSize).isEmpty)
    // box size < 8 (would loop forever in a naive walker)
    val tinySize = Array[Byte](0, 0, 0, 4) ++ "ftyp".getBytes("US-ASCII")
    assert(Multimodal.decodeVideoHeader(tinySize).isEmpty)
  }

  test("mediaProfile: corrupt rows count in health only; bucket edges " +
    "are exact integer boundaries") {
    val s = spark; import s.implicits._
    // image: 32×32 = 1024 px is NOT tiny (strict <) — the edge case;
    // the corrupt row (ok=0, null metadata) must appear only in health
    val images = Seq(
      (0L, 1L, Some(32L), Some(32L), Some(3L), Some("png")),
      (1L, 1L, Some(31L), Some(33L), Some(3L), Some("jpeg")),
      (2L, 0L, None: Option[Long], None: Option[Long],
        None: Option[Long], None: Option[String]))
      .toDF("doc_id", "ok", "width", "height", "channels", "format")
    // audio: 100 frames at 10000 Hz = exactly 10 ms -> NOT lt_10ms
    val audio = Seq(
      (0L, 1L, Some(10000L), Some(1L), Some(100L), Some("pcm_signed"),
        Some("wave")))
      .toDF("doc_id", "ok", "sample_rate", "channels", "n_frames",
        "encoding", "container")
    val video = Seq(
      (0L, 1L, Some("isom"), Some(7999L), Some(1L), Some(320L),
        Some(240L)))
      .toDF("doc_id", "ok", "brand", "duration_ms", "n_tracks",
        "width", "height")
    val out = Multimodal.mediaProfile(images, audio, video)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2)) -> r.getLong(3)).toMap
    assert(out(("image", "resolution", "small")) == 1L)  // 1024 px
    assert(out(("image", "resolution", "tiny")) == 1L)   // 1023 px
    assert(out(("image", "aspect", "square")) == 1L)
    assert(out(("image", "aspect", "portrait")) == 1L)
    assert(out(("image", "health", "corrupt")) == 1L)
    assert(out(("image", "health", "ok")) == 2L)
    assert(!out.contains(("image", "format", "null")))
    assert(out(("audio", "duration", "lt_20ms")) == 1L)  // exactly 10ms
    assert(out(("video", "duration", "lt_8s")) == 1L)    // 7999 ms
    assert(out(("video", "resolution", "lt_0_1mp")) == 1L) // 76800 px
  }

  test("frameSamplePlan: midpoint seeks, never t=0 or t=duration; " +
    "undecodable and durationless rows emit no plan") {
    val s = spark; import s.implicits._
    val meta = Seq[(Long, Long, java.lang.Long)](
      (1L, 1L, 1000L), (2L, 0L, 1000L), (3L, 1L, null))
      .toDF("doc_id", "ok", "duration_ms")
    val out = Multimodal.frameSamplePlan(meta, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 0L, 125L), (1L, 1L, 375L),
      (1L, 2L, 625L), (1L, 3L, 875L)))
    assert(out.forall(t => t._3 > 0L && t._3 < 1000L))
  }

  test("dhash64 round-trips the gradient fixture: hash equals the " +
    "block function, corrupt rows ok=0, tweak flips at most one bit") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L, 3L, 5L, 6L, 7L, 25L, 27L, 50L).toDF("doc_id")
    val dh = Multimodal.imageDhash(
      Multimodal.encodeGradientImageFixture(ids, "doc_id"))
      .collect().map(r => r.doc_id -> r).toMap
    // id-arithmetic reference dHash (the oracle's block function)
    def refHash(id: Long): Long = {
      def v(r: Int, c: Int): Long =
        (((id % 25) * 7 + r * 5 + c * 11) % 6) * 40 +
          (if (r == 0 && c == 0 && ((id / 25) % 2) == 1) 45 else 0)
      var fp = 0L
      for (r <- 0 until 8; c <- 0 until 8)
        if (v(r, c + 1) > v(r, c)) fp |= 1L << (r * 8 + c)
      fp
    }
    for (id <- Seq(0L, 1L, 2L, 5L, 7L, 25L, 27L, 50L)) {
      assert(dh(id).ok == 1L, s"id=$id")
      assert(dh(id).dhash.contains(refHash(id)), s"id=$id")
    }
    // corruption families: magic zeroed (3), truncated (6)
    assert(dh(3L).ok == 0L && dh(3L).dhash.isEmpty)
    assert(dh(6L).ok == 0L && dh(6L).dhash.isEmpty)
    // same pattern (0 vs 25, 2 vs 27): the (0,0) tweak moves <= 1 bit
    assert(java.lang.Long.bitCount(refHash(0L) ^ refHash(25L)) <= 1)
    assert(java.lang.Long.bitCount(refHash(2L) ^ refHash(27L)) <= 1)
    // pattern identity: 0 vs 50 share pattern AND tweak parity
    assert(refHash(0L) == refHash(50L))
  }

  test("fingerprintPairs at 64 bits: exact pigeonhole recall vs " +
    "brute force, including sign-bit fingerprints") {
    import spark.implicits._
    // fingerprints engineered around the sign bit: f0/f1 differ in
    // bit 63 only; f2 differs from f0 by 4 bits (excluded at radius 3)
    val f0 = java.lang.Long.MIN_VALUE | 0x0F0FL
    val f1 = 0x0F0FL
    val f2 = f0 ^ 0xF0L // 4 bits apart from f0
    val f3 = f0 ^ 0x7L  // 3 bits apart from f0
    val fps = Seq((1L, f0), (2L, f1), (3L, f2), (4L, f3))
      .toDF("doc_id", "fp")
    val got = graft.operators.Dedup
      .fingerprintPairs(fps, "doc_id", "fp", maxHamming = 3, bits = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    val want = (for {
      (a, fa) <- Seq((1L, f0), (2L, f1), (3L, f2), (4L, f3))
      (b, fb) <- Seq((1L, f0), (2L, f1), (3L, f2), (4L, f3))
      if a < b
      h = java.lang.Long.bitCount(fa ^ fb)
      if h <= 3
    } yield (a, b, h)).toSet
    assert(got == want)
    assert(got.contains((1L, 2L, 1)) && got.contains((1L, 4L, 3)))
    assert(!got.exists(p => p._1 == 1L && p._2 == 3L))
  }

  test("decodeSampleTable round-trips the fixture: media-timescale " +
    "times, chunk-2 offsets include the stco gap, corrupt rows empty") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 3L, 5L, 6L, 12L).toDF("doc_id")
    val got = Multimodal.videoSampleBytes(
      Multimodal.encodeVideoFixture(ids, "doc_id"))
      .collect().groupBy(_.doc_id)
    // corrupt families decode to nothing
    assert(!got.contains(3L) && !got.contains(6L))
    for (id <- Seq(0L, 1L, 5L, 12L)) {
      val n = 4 + (id % 5).toInt
      val delta = 100L + (id % 7) * 50L
      def sz(i: Int): Long = 100L + ((id + i) % 9) * 10L
      val c1 = (n + 1) / 2
      val gap = 8L + id % 4
      val rows = got(id).sortBy(_.sample_idx)
      assert(rows.length == n, s"id=$id")
      var off = 28L
      for (i <- 0 until n) {
        if (i == c1) off += gap // the second chunk's dead-byte gap
        assert(rows(i).t_ms == i * delta, s"id=$id i=$i")
        assert(rows(i).byte_off == off, s"id=$id i=$i")
        assert(rows(i).n_bytes == sz(i), s"id=$id i=$i")
        off += sz(i)
      }
    }
  }

  test("decodeSampleTable is total and strict: garbage, co64, " +
    "inconsistent counts, bad stsc all decode to None") {
    assert(Multimodal.decodeSampleTable(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.decodeSampleTable(Array.emptyByteArray).isEmpty)
    // take a valid fixture payload and break it in targeted ways
    import spark.implicits._
    val payload = Multimodal.encodeVideoFixture(
      Seq(0L).toDF("doc_id"), "doc_id").collect()(0).payload
    assert(Multimodal.decodeSampleTable(payload).nonEmpty)
    def find(tag: String): Int = {
      val t = tag.getBytes("US-ASCII")
      payload.indices.indexWhere(i => i + 4 <= payload.length &&
        payload(i) == t(0) && payload(i + 1) == t(1) &&
        payload(i + 2) == t(2) && payload(i + 3) == t(3))
    }
    // stco -> co64: recognized-unsupported, must refuse not misparse
    val asCo64 = payload.clone()
    val stcoAt = find("stco")
    System.arraycopy("co64".getBytes("US-ASCII"), 0, asCo64, stcoAt, 4)
    assert(Multimodal.decodeSampleTable(asCo64).isEmpty)
    // stts sample_count inflated: totals disagree with stsz
    val badCount = payload.clone()
    val sttsAt = find("stts")
    // payload layout after tag: ver/flags(4) entry_count(4) count(4)
    badCount(sttsAt + 4 + 8 + 3) = (badCount(sttsAt + 4 + 8 + 3) + 1).toByte
    assert(Multimodal.decodeSampleTable(badCount).isEmpty)
    // stsc first_chunk not starting at 1
    val badStsc = payload.clone()
    val stscAt = find("stsc")
    badStsc(stscAt + 4 + 8 + 3) = 9 // first run's first_chunk := 9
    assert(Multimodal.decodeSampleTable(badStsc).isEmpty)
  }

  test("frameSampleBytes: k midpoint frames join back to real byte " +
    "ranges; short videos duplicate samples rather than fail") {
    import spark.implicits._
    val samples = Multimodal.videoSampleBytes(
      Multimodal.encodeVideoFixture(Seq(0L).toDF("doc_id"), "doc_id"))
      .toDF()
    // id=0: n=4 samples; k=4 -> indices (4*(2j+1)) div 8 = 1,3 wait:
    // j=0:0, j=1:1, j=2:2, j=3:3 — all four samples in order
    val out = Multimodal.frameSampleBytes(samples, k = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 0L), (1L, 1L), (2L, 2L), (3L, 3L)))
    // k = 8 over 4 samples: duplicates allowed, schedule still total
    val dup = Multimodal.frameSampleBytes(samples, k = 8)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(dup.length == 8)
    assert(dup.map(_._2).toSeq == Seq(0L, 0L, 1L, 1L, 2L, 2L, 3L, 3L))
  }

  test("fingerprintClusters == nearDupClusters over fingerprintPairs " +
    "(the fp-graph shortcut is exact)") {
    import spark.implicits._
    val ids = (0L until 60L).filter(i => i % 10 != 3 && i % 10 != 6)
    val dh = graft.operators.Multimodal.imageDhash(
      graft.operators.Multimodal.encodeGradientImageFixture(
        ids.toDF("doc_id"), "doc_id"))
      .toDF().where(col("ok") === 1L)
      .select(col("doc_id"), col("dhash").as("fp"))
      .persist()
    val fast = graft.operators.Dedup
      .fingerprintClusters(dh, "doc_id", "fp", 3, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSet
    val slow = graft.operators.Dedup.nearDupClusters(
      dh.select(col("doc_id")), "doc_id",
      graft.operators.Dedup.fingerprintPairs(dh, "doc_id", "fp", 3, 64))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSet
    assert(fast == slow)
    // sanity: real near-dup families exist in the fixture slice
    assert(fast.exists(!_._3), "expected at least one non-canonical doc")
    dh.unpersist()
  }

  test("audioEnvelopeHash64 round-trips the waveform fixture: hash " +
    "equals the amplitude function, corrupt ok=0, tweak <= 1 bit") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L, 3L, 5L, 6L, 21L, 22L, 44L).toDF("doc_id")
    val got = Multimodal.audioFingerprints(
      Multimodal.encodeWaveformFixture(ids, "doc_id"))
      .collect().map(r => r.doc_id -> r).toMap
    def refHash(id: Long): Long = {
      def a(w: Int): Long = 500L + ((id % 21 + w) % 7) * 300L +
        (if (w == 0 && (id / 21) % 2 == 1) 400L else 0L)
      var fp = 0L
      for (w <- 0 until 64) if (a(w + 1) > a(w)) fp |= 1L << w
      fp
    }
    for (id <- Seq(0L, 1L, 2L, 5L, 21L, 22L, 44L)) {
      assert(got(id).ok == 1L, s"id=$id")
      assert(got(id).fp.contains(refHash(id)), s"id=$id")
    }
    assert(got(3L).ok == 0L && got(6L).ok == 0L)
    // same pattern across the tweak boundary: <= 1 bit apart
    assert(java.lang.Long.bitCount(refHash(0L) ^ refHash(21L)) <= 1)
    assert(java.lang.Long.bitCount(refHash(1L) ^ refHash(22L)) <= 1)
    // identical pattern + tweak parity: identical hash
    assert(refHash(2L) == refHash(44L))
  }

  test("audioEnvelopeHash64 is total and strict: garbage, empty, and " +
    "too-short streams decode to None") {
    assert(Multimodal.audioEnvelopeHash64(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.audioEnvelopeHash64(Array.emptyByteArray).isEmpty)
    // a REAL but too-short wav (the q207 fixture: 50-201 frames,
    // far below the 65*256 the envelope needs)
    import spark.implicits._
    val short = Multimodal.encodeAudioFixture(
      Seq(0L).toDF("doc_id"), "doc_id").collect()(0).payload
    assert(Multimodal.audioEnvelopeHash64(short).isEmpty)
  }

  test("audioChunkList round-trips both JDK writers and is total: " +
    "WAVE fmt/data and AIFF COMM/SSND at pinned offsets; corrupt " +
    "magic, truncation, overrun sizes, hostile counts all -> None") {
    import spark.implicits._
    def payload(id: Long): Array[Byte] = Multimodal
      .encodeAudioFixture(Seq(id).toDF("doc_id"), "doc_id")
      .collect()(0).payload
    // id 0: WAV (even), mono, 50 frames -> frameSize 2
    val wav = payload(0L)
    assert(Multimodal.audioChunkList(wav).contains(
      ("wave", IndexedSeq(("fmt ", 12L, 16L), ("data", 36L, 100L)))))
    // id 1: AIFF (odd), stereo, 57 frames -> frameSize 4
    val aiff = payload(1L)
    assert(Multimodal.audioChunkList(aiff).contains(
      ("aiff", IndexedSeq(("COMM", 12L, 18L),
        ("SSND", 38L, 8L + 57L * 4L)))))
    // totality: garbage / empty / fixture corruption families
    assert(Multimodal.audioChunkList(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.audioChunkList(Array.emptyByteArray).isEmpty)
    assert(Multimodal.audioChunkList(payload(3L)).isEmpty) // magic
    assert(Multimodal.audioChunkList(payload(6L)).isEmpty) // truncate
    // a chunk size overrunning the declared extent refuses
    val overrun = wav.clone()
    overrun(16) = 0x7f // fmt size low byte -> huge
    assert(Multimodal.audioChunkList(overrun).isEmpty)
    // declared container extent beyond the payload refuses
    val beyond = wav.clone()
    beyond(4) = (beyond(4) + 1).toByte
    assert(Multimodal.audioChunkList(beyond).isEmpty)
  }

  test("encodePngFixture is a standard PNG: ImageIO reads it back " +
    "pixel-exact, and pngChunkList walks the id-arithmetic layout") {
    import spark.implicits._
    val ids = (0L until 40L).toDF("doc_id")
    val payload = Multimodal.encodePngFixture(ids, "doc_id")
      .collect().map(r => r.doc_id -> r.payload).toMap
    for (id <- 0L until 40L) {
      val w = 1 + (id % 8).toInt
      val h = 1 + ((id * 3) % 5).toInt
      val rawlen = h * (w + 1)
      Multimodal.pngChunkList(payload(id)) match {
        case Some(chunks) =>
          assert(id % 10 != 3 && id % 10 != 6 && id % 10 != 9, s"id=$id")
          assert(chunks == IndexedSeq(
            ("IHDR", 8L, 13L),
            ("IDAT", 33L, rawlen + 11L),
            ("IEND", 56L + rawlen, 0L)), s"id=$id")
          // the stored-deflate framing is REAL png: the JDK decoder
          // reads the payload back pixel-exact
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload(id)))
          assert(img.getWidth == w && img.getHeight == h, s"id=$id")
          for (y <- 0 until h; x <- 0 until w)
            assert(img.getRaster.getSample(x, y, 0) ==
              ((id + x + 7L * y) % 256).toInt, s"id=$id ($x,$y)")
        case None =>
          assert(id % 10 == 3 || id % 10 == 6 || id % 10 == 9, s"id=$id")
      }
    }
    // totality edges beyond the fixture families
    assert(Multimodal.pngChunkList(Array.emptyByteArray).isEmpty)
    assert(Multimodal.pngChunkList(Array[Byte](1, 2, 3)).isEmpty)
    val good = payload(0L)
    // trailing garbage after IEND refuses (consume-exactly)
    assert(Multimodal.pngChunkList(good ++ Array[Byte](0)).isEmpty)
    // a non-alphabetic chunk type refuses
    val badType = good.clone()
    badType(12) = '0'.toByte
    assert(Multimodal.pngChunkList(badType).isEmpty)
  }

  test("encodeMjpegFixture round-trips THROUGH the lossy codec: every " +
    "frame dHash equals the pattern arithmetic, corrupt families hold") {
    import spark.implicits._
    val ids = (0L until 80L).toDF("doc_id")
    val got = Multimodal.videoFrameFingerprints(
      Multimodal.encodeMjpegFixture(ids, "doc_id"))
      .collect().groupBy(_.doc_id)
    val patterns = Array(0x55, 0xaa, 0x2b, 0xd4)
    def refFp(id: Long, f: Int): Long = {
      val g = (id % 12).toInt
      val variant = ((id / 12) % 3).toInt
      var fp = 0L
      for (r <- 0 until 8) {
        var pb = patterns(
          (g * 5 + f * 3 + r + (if (variant == 2) 2 else 0)) % 4)
        if (variant == 1 && f == 0 && r == 0) pb ^= 8
        fp |= pb.toLong << (8 * r)
      }
      fp
    }
    for (id <- 0L until 80L) {
      val g = (id % 12).toInt
      if (id % 10 == 3 || id % 10 == 6)
        assert(!got.contains(id), s"id=$id") // container refuses
      else {
        val rows = got(id).sortBy(_.frame_idx)
        assert(rows.length == 4 + g % 5, s"id=$id")
        for (row <- rows) {
          if (id % 10 == 9 && row.frame_idx == 1L)
            assert(row.ok == 0L && row.fp.isEmpty, s"id=$id corrupt")
          else {
            assert(row.ok == 1L, s"id=$id f=${row.frame_idx}")
            assert(row.fp.contains(refFp(id, row.frame_idx.toInt)),
              s"id=$id f=${row.frame_idx}: JPEG round-trip drifted")
          }
        }
      }
    }
    // walker totality edges
    assert(Multimodal.aviFrameRanges(Array.emptyByteArray).isEmpty)
    assert(Multimodal.aviFrameRanges(Array[Byte](1, 2, 3)).isEmpty)
    val good = Multimodal.encodeMjpegFixture(Seq(0L).toDF("doc_id"),
      "doc_id").collect().head.payload
    assert(Multimodal.aviFrameRanges(good).nonEmpty)
    // trailing bytes past the declared extent refuse
    assert(Multimodal.aviFrameRanges(good ++ Array[Byte](0, 0)).isEmpty)
    // a declared size overrunning the payload refuses
    val overrun = good.clone()
    overrun(4) = (overrun(4) + 1).toByte
    assert(Multimodal.aviFrameRanges(overrun).isEmpty)
  }

  test("audioWindowEnergies: exact window means, trailing partial " +
    "window dropped, corrupt payloads no rows; segments fold by " +
    "label runs") {
    import spark.implicits._
    // hand WAV: 2.5 windows of 256 samples — amps 300, 900, (partial)
    val window = 256
    val pcm = new Array[Byte](640 * 2)
    for (i <- 0 until 640) {
      val amp = if (i < 256) 300 else 900
      val v = if (i % 4 < 2) amp else -amp
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true,
      false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 640L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val media = Seq(
      Multimodal.MediaRecord(1L, "m://1", "audio/wav", bos.toByteArray),
      Multimodal.MediaRecord(2L, "m://2", "audio/wav",
        Array[Byte](1, 2, 3))).toDS()
    val got = Multimodal.audioWindowEnergies(media).collect()
      .map(r => (r.doc_id, r.w, r.amp)).sorted.toSeq
    // 2 complete windows only; the 128-sample tail drops
    assert(got == Seq((1L, 0L, 300L), (1L, 1L, 900L)))
    // segmentation: a quiet run then a loud run
    val segs = Multimodal.audioEnergySegments(
      Seq((7L, 0L, 100L), (7L, 1L, 120L), (7L, 2L, 900L),
        (7L, 3L, 80L)).toDF("doc_id", "w", "amp"),
      "doc_id", "w", "amp", quietBelow = 500L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSeq
    assert(segs == Seq((0L, 0L, 1L, 2L, true), (1L, 2L, 2L, 1L, false),
      (2L, 3L, 3L, 1L, true)))
  }

  test("gifFrameFingerprints round-trips the GIF fixture bit-exactly: " +
    "static + animated frames hash to the pattern bytes, corrupt and " +
    "truncated containers emit no rows, router sniffs image/gif") {
    import spark.implicits._
    val ids = (0L until 80L)
    val media = Multimodal.encodeGifFixture(ids.toDF("doc_id"),
      "doc_id")
    val got = Multimodal.gifFrameFingerprints(media)
      .collect().groupBy(_.doc_id)
    val patterns = Array(0x55, 0xaa, 0x2b, 0xd4)
    def refFp(id: Long, f: Int): Long = {
      val g = (id % 12).toInt
      val v = ((id / 12) % 3).toInt
      var fp = 0L
      for (r <- 0 until 8) {
        var pb = patterns((g * 7 + f * 5 + r +
          (if (v == 2) 2 else 0)) % 4)
        if (v == 1 && f == 0 && r == 0) pb ^= 8
        fp |= pb.toLong << (8 * r)
      }
      fp
    }
    for (id <- ids) {
      val g = (id % 12).toInt
      if (id % 10 == 3 || id % 10 == 4 || id % 10 == 6)
        assert(!got.contains(id), s"id=$id must refuse")
      else {
        val rows = got(id).sortBy(_.frame_idx)
        assert(rows.length == 1 + g % 3, s"id=$id frame count")
        for (row <- rows) {
          assert(row.ok == 1L, s"id=$id f=${row.frame_idx}")
          assert(row.fp.contains(refFp(id, row.frame_idx.toInt)),
            s"id=$id f=${row.frame_idx}: GIF round-trip drifted")
        }
      }
    }
    // the router: intact GIFs sniff image/gif (incl. the truncated
    // family — magic survives), zeroed magic sniffs unknown
    val sniffed = media.toDF()
      .select(col("doc_id"), Multimodal.sniffModality(col("payload"))
        .as("sn"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for (id <- ids)
      assert(sniffed(id) ==
        (if (id % 10 == 3 || id % 10 == 4) "unknown" else "image/gif"),
        s"id=$id sniff")
    // dhash64 on a whole GIF payload (the still-image path) hashes
    // frame 0 — the two rungs agree on statics
    val stat = media.toDF().where(col("doc_id") === 12L)
      .collect().head.getAs[Array[Byte]]("payload")
    assert(Multimodal.dhash64(stat).contains(refFp(12L, 0)))
  }

  test("shotSampleSchedule: proportional integer allocation with a " +
    "1-seek floor; midpoints index OBSERVED frames, never gaps") {
    import spark.implicits._
    // one video, two shots: frames 0..5 fp=0 except frame 3 MISSING
    // (decode gap), frames 6..7 fp with Hamming 40 from shot 1
    val far = (1L << 40) - 1 // bit_count = 40
    val fps = (Seq(0L, 1L, 2L, 4L, 5L).map(f => (9L, f, 0L)) ++
      Seq((9L, 6L, far), (9L, 7L, far)))
      .toDF("doc_id", "frame_idx", "fp")
    // F = 7, k = 4: shot0 n=5 -> k_s = max(1, 20/7) = 2;
    // shot1 n=2 -> k_s = max(1, 8/7) = 1
    // shot0 midpoints: p = (5*1)/4 = 1, (5*3)/4 = 3 -> observed
    //   frames at positions 1,3 of [0,1,2,4,5] = frames 1 and 4
    //   (frame 3 is a gap and must never be seeked)
    // shot1 midpoint: p = (2*1)/2 = 1 -> frame 7
    val got = Multimodal.shotSampleSchedule(fps, "doc_id",
      "frame_idx", "fp", cutHamming = 8, k = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == Seq((0L, 0L, 1L), (0L, 1L, 4L), (1L, 0L, 7L)), got)
    // budget floor: a 3-shot video at k = 2 still seeks every shot
    val tiny = Seq((5L, 0L, 0L), (5L, 1L, far),
      (5L, 2L, far ^ ((1L << 50) - 1)))
      .toDF("doc_id", "frame_idx", "fp")
    val floor = Multimodal.shotSampleSchedule(tiny, "doc_id",
      "frame_idx", "fp", cutHamming = 8, k = 2)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSeq
    assert(floor == Seq((0L, 0L), (1L, 1L), (2L, 2L)), floor)
    // shot-size ceiling: a single 2-frame shot at k = 4 seeks each
    // frame ONCE (k_s = min(n_s, ...) — never duplicate midpoints)
    val clamp = Seq((7L, 0L, 0L), (7L, 1L, 0L))
      .toDF("doc_id", "frame_idx", "fp")
    val cg = Multimodal.shotSampleSchedule(clamp, "doc_id",
      "frame_idx", "fp", cutHamming = 8, k = 4)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSeq
    assert(cg == Seq((0L, 0L), (1L, 1L)), cg)
  }

  test("sniffModality dispatches ISO-BMFF payloads on the major " +
    "brand: M4A audio, heic/mif1/avif images, else video/mp4") {
    import spark.implicits._
    val got = Multimodal.encodeIsoBrandFixture(
      (0L until 20L).toDF("doc_id"), "doc_id").toDF()
      .select(col("doc_id"),
        Multimodal.sniffModality(col("payload")).as("sniffed"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val byBrand = Map(0 -> "audio/mp4", 1 -> "image/heic",
      2 -> "image/heif", 3 -> "image/avif", 4 -> "video/mp4")
    for (id <- 0L until 20L) {
      val want = if (id % 10 == 3 || id % 10 == 4) "unknown"
        else byBrand((id % 5).toInt)
      assert(got(id) == want, s"id=$id")
    }
    // a truncated real-MP4 keeps its ftyp+brand and still routes video
    val truncated = Multimodal.encodeVideoFixture(
      Seq(6L).toDF("doc_id"), "doc_id").toDF()
      .select(Multimodal.sniffModality(col("payload")))
      .collect().head.getString(0)
    assert(truncated == "video/mp4")
    // the long-tail brand table: sequences/codec brands and the
    // M4B/M4P audio reuses route by family, not down the video branch
    def ftyp(brand: String): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(16)
      b.putInt(16).put("ftyp".getBytes("US-ASCII"))
        .put(brand.getBytes("US-ASCII")).putInt(0)
      b.array()
    }
    val tail = Map("M4B " -> "audio/mp4", "M4P " -> "audio/mp4",
      "heix" -> "image/heic", "hevc" -> "image/heic",
      "hevx" -> "image/heic", "msf1" -> "image/heif",
      "avis" -> "image/avif", "mp42" -> "video/mp4")
    val sniffed = tail.keys.toSeq.map(b => (b, ftyp(b)))
      .toDF("brand", "payload")
      .select(col("brand"),
        Multimodal.sniffModality(col("payload")).as("m"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for ((b, want) <- tail) assert(sniffed(b) == want, s"brand=$b")
  }

  test("aviFrameRanges walks frame chunks wrapped in interleaved " +
    "'rec ' LISTs; a child overrunning the rec extent refuses") {
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(fourcc: String, data: Array[Byte]): Array[Byte] =
      fcc(fourcc) ++ le32(data.length.toLong) ++ data ++
        (if (data.length % 2 == 1) Array[Byte](0)
         else Array.emptyByteArray)
    def list(listType: String, children: Array[Byte]): Array[Byte] =
      fcc("LIST") ++ le32(4L + children.length) ++ fcc(listType) ++
        children
    val d1 = Array[Byte](1, 1, 1)
    val d2 = Array[Byte](2, 2)
    val d3 = Array[Byte](3, 3, 3, 3)
    val d4 = Array[Byte](4)
    val movi = list("movi",
      chunk("00dc", d1) ++
        list("rec ", chunk("00dc", d2) ++ chunk("JUNK", Array[Byte](9)) ++
          chunk("01db", d3)) ++
        chunk("00db", d4))
    val body = fcc("AVI ") ++ movi
    val avi = fcc("RIFF") ++ le32(body.length.toLong) ++ body
    val got = Multimodal.aviFrameRanges(avi)
    assert(got.nonEmpty, "rec-interleaved AVI must walk")
    val frames = got.get.map { case (o, s) =>
      java.util.Arrays.copyOfRange(avi, o.toInt, (o + s).toInt).toSeq }
    assert(frames == IndexedSeq(d1.toSeq, d2.toSeq, d3.toSeq, d4.toSeq),
      "frames must come back in stream order, rec children inline")
    // a rec child whose declared size overruns the rec extent refuses
    val bad = avi.clone()
    val recAt = {
      var i = 0
      while (!(bad(i) == 'L' && bad(i + 1) == 'I' && bad(i + 2) == 'S' &&
        bad(i + 3) == 'T' && bad(i + 8) == 'r')) i += 1
      i
    }
    bad(recAt + 12 + 4) = 0x7f // first rec child's size := huge
    assert(Multimodal.aviFrameRanges(bad).isEmpty)
  }

  test("alignedFingerprintPairs matches the brute-force aligned " +
    "decision on the MJPEG fixture, through all three pair paths") {
    import spark.implicits._
    val ids = (0L until 90L).toDF("doc_id")
    val fps = Multimodal.videoFrameFingerprints(
      Multimodal.encodeMjpegFixture(ids, "doc_id"))
      .toDF().where(col("ok") === 1L)
      .select(col("doc_id"), col("frame_idx"), col("fp")).persist()
    val got = graft.operators.Dedup.alignedFingerprintPairs(
      fps, "doc_id", "frame_idx", "fp", maxHamming = 3, bits = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // brute force on the collected frames
    val rows = fps.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = rows.groupBy(_._1)
    val docs = byDoc.keys.toSeq.sorted
    val ref = (for {
      i <- docs.indices.iterator
      j <- (i + 1 until docs.size).iterator
      a = docs(i); b = docs(j)
      fa = byDoc(a).map(t => t._2 -> t._3).toMap
      fb = byDoc(b).map(t => t._2 -> t._3).toMap
      nMatch = fa.keySet.intersect(fb.keySet).count(k =>
        java.lang.Long.bitCount(fa(k) ^ fb(k)) <= 3)
      if 2 * nMatch >= math.max(fa.size, fb.size)
    } yield (a, b, nMatch.toLong, fa.size.toLong, fb.size.toLong)).toSet
    assert(got == ref)
    // the fixture exercises every path: exact same-signature pairs,
    // the 1-bit tweak (cross-signature, hamming 1 on one frame), and
    // the corrupt-frame family (one missing position, still kept)
    assert(ref.exists(p => p._3 == p._4 && p._4 == p._5))
    assert(ref.exists(p => p._4 != p._5))
    fps.unpersist()
  }

  test("videoQualityGates: a static-camera SCENE (one shot, gradient " +
    "bits) keeps; flat nothing drops; a video without readable meta " +
    "has no row") {
    val s2 = spark; import s2.implicits._
    // observed-frame fingerprints: doc 1 = one-shot patterned (keeps),
    // doc 2 = one-shot flat (all_static), doc 3 = patterned but only
    // 2 frames (too_short), doc 4 = patterned, no meta row (dropped)
    val fps = Seq(
      (1L, 0L, 5L), (1L, 1L, 5L), (1L, 2L, 5L), (1L, 3L, 5L),
      (2L, 0L, 0L), (2L, 1L, 0L), (2L, 2L, 0L), (2L, 3L, 0L),
      (3L, 0L, 5L), (3L, 1L, 5L),
      (4L, 0L, 5L), (4L, 1L, 5L), (4L, 2L, 5L), (4L, 3L, 5L))
      .toDF("doc_id", "frame_idx", "fp")
    val meta = Seq((1L, 72L, 64L), (2L, 72L, 64L), (3L, 72L, 64L))
      .toDF("doc_id", "width", "height")
    val got = Multimodal.videoQualityGates(fps, meta)
      .select("doc_id", "too_short", "tiny", "all_static", "keep")
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
          r.getBoolean(4)))).toMap
    assert(got == Map(
      1L -> ((false, false, false, true)),
      2L -> ((false, false, true, false)),
      3L -> ((true, false, false, false))))
  }

  test("keepBest: lexicographic quality dominance (first column " +
    "wins), ties to the smallest id, members without a quality row " +
    "drop") {
    val s2 = spark; import s2.implicits._
    val clusters = Seq((10L, 1L), (11L, 1L), (12L, 1L), (13L, 1L),
      (20L, 2L), (21L, 2L))
      .toDF("doc_id", "cluster_id")
    // doc 12: highest primary, low secondary — must win over doc 11's
    // higher secondary; docs 20/21 tie on both — min id wins; doc 13
    // has no quality row — absent from the output
    val quality = Seq((10L, 1L, 9L), (11L, 2L, 9L), (12L, 3L, 0L),
      (20L, 5L, 5L), (21L, 5L, 5L))
      .toDF("doc_id", "q1", "q2")
    val got = Multimodal.keepBest(clusters, quality, Seq("q1", "q2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSet
    assert(got == Set(
      (10L, 1L, 12L, false), (11L, 1L, 12L, false),
      (12L, 1L, 12L, true),
      (20L, 2L, 20L, true), (21L, 2L, 20L, false)))
  }

  test("envelopeFromEnergies ≡ audioFingerprints: the envelope hash " +
    "derived from one energy pass matches the direct PCM fold, and " +
    "sub-65-window recordings carry no row") {
    val docs = Tables.documents(spark, sf).limit(150)
    // waveform fixture: 66 windows (fingerprintable); clip fixture:
    // 5-7 windows (must be absent)
    for ((media, expectAny) <- Seq(
        (Multimodal.encodeWaveformFixture(docs, "doc_id"), true),
        (Multimodal.encodeClipWaveformFixture(docs, "doc_id"), false))) {
      val direct = Multimodal.audioFingerprints(media).toDF()
        .where(col("ok") === 1L)
        .select(col("doc_id"), col("fp"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val derived = Multimodal.envelopeFromEnergies(
          Multimodal.audioWindowEnergies(media).toDF())
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(derived == direct)
      assert(direct.nonEmpty == expectAny)
    }
  }

  test("imageDhashMeta decode-once pass ≡ imageDhash + decodeImageMeta " +
    "run separately (fingerprint, ok mask, and dims all agree)") {
    val docs = Tables.documents(spark, sf).limit(120)
    val media = Multimodal.encodeGradientImageFixture(docs, "doc_id")
    val combined = Multimodal.imageDhashMeta(media).toDF()
      .select("doc_id", "ok", "dhash", "width", "height")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1),
        Option(r.get(2)), Option(r.get(3)), Option(r.get(4))))).toMap
    val dh = Multimodal.imageDhash(media).toDF()
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2))))).toMap
    val meta = Multimodal.decodeImageMeta(media).toDF()
      .select("doc_id", "ok", "width", "height")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(combined.keySet == dh.keySet)
    combined.foreach { case (id, (ok, fp, w, h)) =>
      assert((ok, fp) == dh(id), s"doc $id fingerprint")
      if (ok == 1L)
        assert((1L, w, h) == meta(id), s"doc $id dims")
    }
    assert(combined.values.exists(_._1 == 1L))
    assert(combined.values.exists(_._1 == 0L))
  }

  test("clip fixtures are NON-VACUOUS under the default df cap (the " +
    "r18 vacuity finding): every clip fixture yields containment " +
    "pairs at genuinely different trim offsets, and the MJPEG/GIF " +
    "streams are distinct") {
    val docs = Tables.documents(spark, sf)
    val D = graft.operators.Dedup
    // this SF's corpus is 500 ids → the corpus-scaled reel count is
    // the 64 floor; recompute rather than hard-code so the spec
    // survives a testdata resize
    val reels = math.max(64L, docs.where(col("doc_id").isNotNull &&
      col("doc_id") >= 0).count() / 64L)
    val mj = Multimodal.videoFrameFingerprints(
        Multimodal.encodeClipMjpegFixture(docs, "doc_id")).toDF()
      .where(col("ok") === 1L)
      .select(col("doc_id"), col("frame_idx"), col("fp"))
    val gif = Multimodal.gifFrameFingerprints(
        Multimodal.encodeClipGifFixture(docs, "doc_id")).toDF()
      .where(col("ok") === 1L)
      .select(col("doc_id"), col("frame_idx"), col("fp"))
    val wav = Multimodal.audioWindowEnergies(
        Multimodal.encodeClipWaveformFixture(docs, "doc_id")).toDF()
      .select(col("doc_id"), col("w").as("frame_idx"),
        col("amp").as("fp"))
    for ((fps, name) <- Seq((mj, "mjpeg"), (gif, "gif"), (wav, "wav"))) {
      val p = D.sequenceShingleContainment(fps, "doc_id", "frame_idx",
        "fp").cache()
      try {
        assert(p.count() > 0, s"$name containment must be non-vacuous")
        // the offset-tolerant value proposition: pairs whose fixture
        // trim offsets DIFFER (an aligned matcher cannot see these)
        val crossOffset = p.where(
          expr(s"(doc_a div $reels) % 5") =!=
            expr(s"(doc_b div $reels) % 5")).count()
        assert(crossOffset > 0,
          s"$name must pair across different trim offsets")
      } finally p.unpersist()
    }
    // 2r+3 vs 2r+5 multipliers: the two frame streams must differ
    val mjFps = mj.select(col("fp")).distinct()
      .collect().map(_.getLong(0)).toSet
    val gifFps = gif.select(col("fp")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(mjFps != gifFps, "MJPEG and GIF clip streams must differ")
  }
}
