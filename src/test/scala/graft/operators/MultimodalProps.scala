package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property: the three header decoders are TOTAL over arbitrary
  * bytes — any payload, including adversarial near-valid prefixes,
  * yields Some(metadata) or None, never a throw. This is the
  * never-a-task-failure contract the q206/q207/q209 corrupt-row
  * semantics rest on: at 100 TB, one crashing payload in a trillion
  * rows kills the stage, so totality is a correctness property, not
  * a nicety. No SparkSession needed — the decoders are plain
  * byte-array functions. */
object MultimodalProps extends Properties("MultimodalDecode") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200).withWorkers(1)

  // adversarial generator: pure noise, plus noise stamped with the
  // real magics (PNG/JPEG/RIFF/FORM/ftyp-box) so the format-specific
  // parse paths actually run, plus truncations of those
  private val noise: Gen[Array[Byte]] =
    Gen.choose(0, 256).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
        .map(_.toArray))

  private val magics: Seq[Array[Byte]] = Seq(
    Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a),
    Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte),
    "RIFF".getBytes("US-ASCII"),
    "FORM".getBytes("US-ASCII"),
    "GIF87a".getBytes("US-ASCII"),
    "GIF89a".getBytes("US-ASCII"),
    // a plausible ftyp box header claiming various sizes
    Array[Byte](0, 0, 0, 20) ++ "ftyp".getBytes("US-ASCII"),
    Array[Byte](0, 0, 0, 0) ++ "ftyp".getBytes("US-ASCII"),
    Array[Byte](0x7f, 0x7f, 0x7f, 0x7f) ++ "ftyp".getBytes("US-ASCII"))

  private val stamped: Gen[Array[Byte]] = for {
    m <- Gen.oneOf(magics)
    tail <- noise
  } yield m ++ tail

  private val payload: Gen[Array[Byte]] = Gen.frequency(
    3 -> noise, 5 -> stamped,
    2 -> stamped.flatMap(b =>
      Gen.choose(0, b.length).map(b.take)))

  property("decodeImageHeader never throws") = forAll(payload) { b =>
    Multimodal.decodeImageHeader(b); true
  }

  property("decodeAudioHeader never throws") = forAll(payload) { b =>
    Multimodal.decodeAudioHeader(b); true
  }

  property("decodeVideoHeader never throws") = forAll(payload) { b =>
    Multimodal.decodeVideoHeader(b); true
  }

  property("decodeVideoHeader only accepts payloads that start with a " +
    "well-formed ftyp box") = forAll(payload) { b =>
    val ok = Multimodal.decodeVideoHeader(b)
    ok.isEmpty || (b.length >= 8 &&
      new String(b, 4, 4, "US-ASCII") == "ftyp")
  }

  property("audioChunkList never throws, and every accepted walk " +
    "stays inside the payload with in-order offsets") =
    forAll(payload) { b =>
      Multimodal.audioChunkList(b) match {
        case None => true
        case Some((container, chunks)) =>
          (container == "wave" || container == "aiff") &&
            chunks.nonEmpty && chunks.size <= 64 &&
            chunks.forall { case (_, off, sz) =>
              off >= 12L && sz >= 0L && off + 8 + sz <= b.length.toLong
            } &&
            chunks.sliding(2).forall {
              case Seq((_, a, _), (_, c, _)) => a < c
              case _ => true
            }
      }
    }

  property("aviFrameRanges never throws, and every accepted walk " +
    "yields in-order frame ranges inside the payload") =
    forAll(payload) { b =>
      Multimodal.aviFrameRanges(b) match {
        case None => true
        case Some(frames) =>
          frames.nonEmpty && frames.size <= 4096 &&
            frames.forall { case (off, sz) =>
              off >= 20L && sz >= 0L && off + sz <= b.length.toLong
            } &&
            frames.sliding(2).forall {
              case Seq((a, _), (c, _)) => a < c
              case _ => true
            }
      }
    }

  property("pngChunkList never throws, and every accepted walk opens " +
    "IHDR, closes IEND, and stays inside the payload in order") =
    forAll(payload) { b =>
      Multimodal.pngChunkList(b) match {
        case None => true
        case Some(chunks) =>
          chunks.size >= 2 && chunks.size <= 4096 &&
            chunks.head._1 == "IHDR" && chunks.last._1 == "IEND" &&
            chunks.forall { case (fc, off, sz) =>
              fc.forall(c => (c >= 'A' && c <= 'Z') ||
                (c >= 'a' && c <= 'z')) &&
                off >= 8L && sz >= 0L && off + 12 + sz <= b.length.toLong
            } &&
            chunks.sliding(2).forall {
              case Seq((_, a, _), (_, c, _)) => a < c
              case _ => true
            }
      }
    }
  property("gifFrames never throws, only accepts GIF-magic payloads, " +
    "and bounds the frame count") = forAll(payload) { b =>
    Multimodal.gifFrames(b) match {
      case None => true
      case Some(frames) =>
        frames.nonEmpty && frames.size <= 1024 && b.length >= 6 && {
          val m = new String(b, 0, 6, "US-ASCII")
          m == "GIF87a" || m == "GIF89a"
        }
    }
  }

  property("decodeIsoMetaHeader never throws, only accepts ftyp-first " +
    "payloads, and its acceptance equals the health gate's") =
    forAll(payload) { b =>
      val got = Multimodal.decodeIsoMetaHeader(b)
      got.isDefined == Multimodal.isoBmffWalks(b) &&
        got.forall(_._1.length == 4)
    }

  property("isoBmffWalks never throws and only accepts ftyp-first " +
    "payloads") = forAll(payload) { b =>
    !Multimodal.isoBmffWalks(b) || (b.length >= 16 &&
      new String(b, 4, 4, "US-ASCII") == "ftyp")
  }

  property("dhash64 never throws; any accepted image hashes to a " +
    "long") = forAll(payload) { b =>
    Multimodal.dhash64(b); true
  }

  property("windowEnergiesOf never throws and every energy is a " +
    "nonnegative exact mean") = forAll(payload) { b =>
    Multimodal.windowEnergiesOf(b, 256).forall(_ >= 0L)
  }
}
