package graft.tools

/** Dev-only micro-benchmark: is javax.sound.sampled's provider lookup
  * (JDK13Services.getProviders — a synchronized static) a contention
  * point under parallel encode/decode? Times N AudioSystem.write +
  * getAudioFileFormat calls single-threaded vs 32-threaded, and the
  * same through per-thread ServiceLoader-resolved providers. */
object AudioBench {
  import javax.sound.sampled._

  private def silenceWav(id: Long): Array[Byte] = {
    val frames = 50 + ((id * 7) % 151).toInt
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](frames * fmt.getFrameSize)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def silenceWavDirect(id: Long,
      writers: List[javax.sound.sampled.spi.AudioFileWriter])
      : Array[Byte] = {
    val frames = 50 + ((id * 7) % 151).toInt
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](frames * fmt.getFrameSize)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    val w = writers.find(_.isFileTypeSupported(
      AudioFileFormat.Type.WAVE, ais)).get
    w.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def decode(payload: Array[Byte]): Long =
    try AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(payload)).getFrameLength.toLong
    catch { case _: Exception => -1L }

  private def decodeDirect(payload: Array[Byte],
      readers: List[javax.sound.sampled.spi.AudioFileReader]): Long = {
    val it = readers.iterator
    while (it.hasNext) {
      try return it.next().getAudioFileFormat(
        new java.io.ByteArrayInputStream(payload)).getFrameLength.toLong
      catch { case _: Exception => () }
    }
    -1L
  }

  private def loadWriters()
      : List[javax.sound.sampled.spi.AudioFileWriter] = {
    val out = List.newBuilder[javax.sound.sampled.spi.AudioFileWriter]
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
    while (it.hasNext) out += it.next()
    out.result()
  }

  private def loadReaders()
      : List[javax.sound.sampled.spi.AudioFileReader] = {
    val out = List.newBuilder[javax.sound.sampled.spi.AudioFileReader]
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    while (it.hasNext) out += it.next()
    out.result()
  }

  def main(args: Array[String]): Unit = {
    val n = 5000
    def time[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[audiobench] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    def par(threads: Int)(work: Long => Unit): Unit = {
      val ts = (0 until threads).map { t =>
        new Thread(() => {
          var i = t.toLong
          while (i < n) { work(i); i += threads }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
    }
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      time("write x5000, 1 thread")((0 until n).foreach(i => silenceWav(i.toLong)))
      time("write x5000, 32 threads")(par(32)(i => silenceWav(i)))
      time("write-direct x5000, 32 threads")(par(32) { i =>
        val w = loadWriters(); silenceWavDirect(i, w) })
      val payloads = (0 until n).map(i => silenceWav(i.toLong))
      time("decode x5000, 1 thread")(payloads.foreach(decode))
      time("decode x5000, 32 threads")(par(32)(i => decode(payloads(i.toInt))))
      time("decode-direct x5000, 32 threads")(par(32) { i =>
        val r = loadReaders(); decodeDirect(payloads(i.toInt), r) })
      // amortized: one ServiceLoader per thread, many calls
      time("write-direct-amortized 32 thr") {
        val ts = (0 until 32).map { t =>
          new Thread(() => {
            val w = loadWriters()
            var i = t.toLong
            while (i < n) { silenceWavDirect(i, w); i += 32 }
          })
        }
        ts.foreach(_.start()); ts.foreach(_.join())
      }
      time("decode-direct-amortized 32 thr") {
        val ts = (0 until 32).map { t =>
          new Thread(() => {
            val r = loadReaders()
            var i = t.toLong
            while (i < n) { decodeDirect(payloads(i.toInt), r); i += 32 }
          })
        }
        ts.foreach(_.start()); ts.foreach(_.join())
      }
      // corrupt payloads (zeroed magic) — every reader throws
      val corrupt = payloads.map { p =>
        val b = p.clone(); b(0) = 0; b
      }
      time("decode-CORRUPT x5000, 1 thread")(corrupt.foreach(decode))
      time("decode-CORRUPT x5000, 32 threads")(
        par(32)(i => decode(corrupt(i.toInt))))
      // per-thread readers, SoftMidi guarded behind an MThd magic check
      def decodeGuarded(payload: Array[Byte],
          readers: List[javax.sound.sampled.spi.AudioFileReader]): Long = {
        val isMidi = payload.length >= 4 && payload(0) == 'M' &&
          payload(1) == 'T' && payload(2) == 'h' && payload(3) == 'd'
        val it = readers.iterator
        while (it.hasNext) {
          val r = it.next()
          val skip = !isMidi &&
            r.getClass.getName.contains("SoftMidiAudioFileReader")
          if (!skip) {
            try return r.getAudioFileFormat(
              new java.io.ByteArrayInputStream(payload))
              .getFrameLength.toLong
            catch { case _: Exception => () }
          }
        }
        -1L
      }
      time("decode-guarded ok x5000, 32 thr") {
        val ts = (0 until 32).map { t =>
          new Thread(() => {
            val r = loadReaders()
            var i = t.toLong
            while (i < n) { decodeGuarded(payloads(i.toInt), r); i += 32 }
          })
        }
        ts.foreach(_.start()); ts.foreach(_.join())
      }
      time("decode-guarded CORRUPT x5000, 32 thr") {
        val ts = (0 until 32).map { t =>
          new Thread(() => {
            val r = loadReaders()
            var i = t.toLong
            while (i < n) { decodeGuarded(corrupt(i.toInt), r); i += 32 }
          })
        }
        ts.foreach(_.start()); ts.foreach(_.join())
      }
    }
  }
}
