package graft.tools

/** Dev-only micro-benchmark: where does the ImageIO GIF sequence
  * writer spend its time, and does feeding it a pre-indexed
  * (IndexColorModel) frame instead of TYPE_BYTE_GRAY change speed —
  * and does the decode round-trip (gifFrames → dhashImage) stay
  * bit-identical? */
object GifBench {
  private val patterns: Array[Int] = Array(0x55, 0xaa, 0x2b, 0xd4)

  private def grayImage(rowPattern: Int => Int)
      : java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      72, 64, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    fill(img, rowPattern); img
  }

  private val grayPalette: java.awt.image.IndexColorModel = {
    val v = (0 until 256).map(_.toByte).toArray
    new java.awt.image.IndexColorModel(8, 256, v, v, v)
  }

  private def indexedImage(rowPattern: Int => Int)
      : java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(72, 64,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
    fill(img, rowPattern); img
  }

  private def fill(img: java.awt.image.BufferedImage,
      rowPattern: Int => Int): Unit = {
    val ras = img.getRaster
    var r = 0
    while (r < 8) {
      val pb = rowPattern(r)
      var k = 4
      var c = 0
      while (c <= 8) {
        val v = 16 + 24 * k
        var y = r * 8
        while (y < r * 8 + 8) {
          var x = c * 8
          while (x < c * 8 + 8) { ras.setSample(x, y, 0, v); x += 1 }
          y += 1
        }
        if (c < 8) k += (if (((pb >> c) & 1) == 1) 1 else -1)
        c += 1
      }
      r += 1
    }
  }

  private def writeGif(
      frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(f => writer.writeToSequence(
        new javax.imageio.IIOImage(f, null, null), null))
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  def main(args: Array[String]): Unit = {
    javax.imageio.ImageIO.setUseCache(false)
    val n = 2340
    def seqOf(img: Int => (Int => Int) => java.awt.image.BufferedImage)
        : Unit = ()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[gifbench] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def patternOf(i: Int, f: Int): Int => Int = { r =>
      val h = (i.toLong * 1500450271L + f * 2654435761L) % 1000003L
      patterns((h * (2 * r + 5) % 1000003L % 4L).toInt)
    }
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val gray = time(s"gray: $n x 6-frame GIF seq, 1 thr") {
        (0 until n).map(i => writeGif(
          (0 until 6).map(f => grayImage(patternOf(i, f)))))
      }
      val idx = time(s"indexed: $n x 6-frame GIF seq, 1 thr") {
        (0 until n).map(i => writeGif(
          (0 until 6).map(f => indexedImage(patternOf(i, f)))))
      }
      // parallel versions
      def par(work: Int => Unit): Unit = {
        val ts = (0 until 32).map { t =>
          new Thread(() => {
            var i = t
            while (i < n) { work(i); i += 32 }
          })
        }
        ts.foreach(_.start()); ts.foreach(_.join())
      }
      time("gray parallel 32 thr")(par(i => writeGif(
        (0 until 6).map(f => grayImage(patternOf(i, f))))))
      time("indexed parallel 32 thr")(par(i => writeGif(
        (0 until 6).map(f => indexedImage(patternOf(i, f))))))
      // decode-equivalence: identical decoded dHash per frame
      if (round == 1) {
        var same = 0; var diff = 0; var byteEq = 0
        (0 until n).foreach { i =>
          val a = graft.operators.Multimodal.gifFrames(gray(i)).get
            .map(graft.operators.Multimodal.dhashImage)
          val b = graft.operators.Multimodal.gifFrames(idx(i)).get
            .map(graft.operators.Multimodal.dhashImage)
          if (a == b) same += 1 else diff += 1
          if (java.util.Arrays.equals(gray(i), idx(i))) byteEq += 1
        }
        println(s"[gifbench] decode dhash equal: $same / ${same + diff}, byte-equal payloads: $byteEq")
      }
    }
  }
}
