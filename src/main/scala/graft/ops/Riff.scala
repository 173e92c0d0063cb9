package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

/**
 * Minimal RIFF/AVI container support — enough to make the VIDEO decode path
 * real without any external codec. AVI is a public RIFF format
 * (`RIFF…AVI LIST hdrl(avih, strl(strh,strf)) LIST movi(00db|00dc…)`);
 * frames are either uncompressed bottom-up BGR24 device-independent bitmaps
 * (`00db`, the classic 'DIB ' handler — pure byte shuffling to decode) or
 * per-frame JPEG images (`00dc` with the MJPG handler — decodable with the
 * JDK's own JPEG reader). Professional video codecs (H.264 etc.) have no
 * JDK decoder and stay out of scope; an `00dc` payload that is not JPEG
 * simply fails that frame.
 *
 * The writer emits the same minimal structure for deterministic test/gate
 * corpora; reader and writer are independent implementations of the public
 * layout (the reader walks the chunk tree, it does not assume the writer's
 * field choices).
 */
object Riff {

  /** One parsed video frame: dimensions plus row-major ARGB pixels. */
  final case class Frame(width: Int, height: Int, argb: Array[Int])

  /** Parsed container: stream geometry plus lazily-decoded frames.
    * `topDown` carries the sign of the DIB's biHeight (negative = rows
    * stored top-down instead of the default bottom-up). `frameChunks` is an
    * IndexedSeq: decode iterates by index, and a linked list would make a
    * 10k-frame video O(n²) in pointer chasing alone. */
  final case class Avi(width: Int, height: Int, fps: Double, topDown: Boolean,
      frameChunks: IndexedSeq[(String, Array[Byte])]) {
    def nFrames: Int = frameChunks.size
    def durationS: Double = if (fps > 0) nFrames / fps else 0.0
  }

  private def fourCC(b: ByteBuffer): String = {
    val a = new Array[Byte](4); b.get(a); new String(a, "US-ASCII")
  }

  /**
   * Parse an AVI payload: geometry from `strh`/`strf`, frame chunks from
   * the `movi` list. Throws on anything that is not a well-formed AVI —
   * callers treat that as an undecodable payload.
   */
  def parseAvi(payload: Array[Byte], maxFramePixels: Long): Avi = {
    val b = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    require(b.remaining >= 12 && fourCC(b) == "RIFF", "not a RIFF container")
    b.getInt // riff size
    require(fourCC(b) == "AVI ", "not an AVI RIFF form")
    var width, height = 0
    var scale, rate = 0
    var topDown = false
    // Streams appear in declaration order; the Nth strl's chunks are
    // prefixed "0N". Geometry must come from the VIDEO stream's strf (an
    // audio-first AVI's WAVEFORMAT strf would otherwise poison the dims),
    // and only that stream's movi chunks are frames.
    var streamIdx = -1
    var videoStream = -1
    var lastStrhIsVideo = false
    val frames = Vector.newBuilder[(String, Array[Byte])]

    def walk(limit: Int, inMovi: Boolean): Unit =
      while (b.position() < limit && limit - b.position() >= 8) {
        val id = fourCC(b)
        val size = b.getInt
        // LONG arithmetic: a hostile size near Int.MaxValue would overflow
        // `position + size` negative and slip past this guard straight into
        // a ~2 GB array allocation (OutOfMemoryError is fatal — it escapes
        // the NonFatal handlers that turn bad payloads into decoded=false).
        require(size >= 0 && b.position().toLong + size <= payload.length,
          s"chunk $id overruns the container")
        // Chunks are word-aligned, but the FINAL chunk of a container may
        // legally omit the trailing pad byte — clamp so a missing last pad
        // doesn't push `next` past the buffer and reject a fully-parsed file.
        val next = math.min(b.position() + size + (size & 1), limit)
        id match {
          case "LIST" =>
            val kind = fourCC(b) // hdrl / strl / movi / rec
            walk(next, inMovi || kind == "movi")
          case "strh" =>
            streamIdx += 1
            // Through dwRate needs 28 bytes (type 4 + handler/flags/prio/
            // initial 16 + scale 4 + rate 4); a shorter declared size would
            // read the NEXT chunk's header bytes as garbage scale/rate.
            lastStrhIsVideo = size >= 28 && fourCC(b) == "vids"
            if (lastStrhIsVideo && videoStream < 0) {
              videoStream = streamIdx
              b.position(b.position() + 16) // handler, flags, prio, lang, initial
              scale = b.getInt
              rate = b.getInt
            }
          case "strf" =>
            // Only the (first) video stream's BITMAPINFOHEADER.
            if (lastStrhIsVideo && streamIdx == videoStream && width == 0 && size >= 40) {
              b.getInt // biSize
              width = b.getInt
              val bh = b.getInt
              topDown = bh < 0 // negative biHeight = top-down row order
              height = math.abs(bh)
            }
          case _ =>
            val isFrame = inMovi && size > 0 && videoStream >= 0 &&
              (id == f"$videoStream%02ddb" || id == f"$videoStream%02ddc")
            if (isFrame) {
              val data = new Array[Byte](size)
              b.get(data)
              frames += ((id.substring(2), data))
            }
        }
        b.position(next)
      }

    walk(payload.length, inMovi = false)
    require(width > 0 && height > 0, "AVI carries no video stream geometry")
    require(width.toLong * height <= maxFramePixels,
      s"frame ${width}x$height exceeds the pixel cap")
    val fps = if (scale > 0) rate.toDouble / scale else 0.0
    Avi(width, height, fps, topDown, frames.result())
  }

  /** Decode one frame chunk: `db` = uncompressed BGR24 DIB (rows padded to
    * 4 bytes, bottom-up unless the strf declared top-down), `dc` = an
    * embedded JPEG image whose OWN header is checked against
    * `maxFramePixels` before pixel allocation — the strf geometry cap does
    * not bound what a hostile compressed chunk may declare internally. */
  def decodeFrame(avi: Avi, idx: Int, maxFramePixels: Long): Frame = {
    val (kind, data) = avi.frameChunks(idx)
    if (kind == "db") {
      val (w, h) = (avi.width, avi.height)
      val stride = (w * 3 + 3) & ~3
      require(data.length >= stride * h, "DIB frame shorter than its geometry")
      val argb = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        val srcRow = if (avi.topDown) y else h - 1 - y
        val rowOff = srcRow * stride
        var x = 0
        while (x < w) {
          val o = rowOff + x * 3
          argb(y * w + x) = 0xFF000000 | ((data(o + 2) & 0xFF) << 16) |
            ((data(o + 1) & 0xFF) << 8) | (data(o) & 0xFF)
          x += 1
        }
        y += 1
      }
      Frame(w, h, argb)
    } else {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(data))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, "dc frame is not a JDK-decodable image")
        val reader = readers.next()
        reader.setInput(iis)
        try {
          require(reader.getWidth(0).toLong * reader.getHeight(0) <= maxFramePixels,
            "dc frame header exceeds the pixel cap")
          val img = reader.read(0)
          Frame(img.getWidth, img.getHeight,
            img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth))
        } finally reader.dispose()
      } finally iis.close()
    }
  }

  /**
   * Write a minimal AVI around pre-encoded frame chunks (`"db"` raw DIB /
   * `"dc"` compressed, e.g. MJPEG) — the deterministic synthesis twin of
   * [[parseAvi]] for tests and gate corpora.
   */
  def writeAvi(width: Int, height: Int, fps: Int, handler: String,
      frameChunks: Seq[(String, Array[Byte])]): Array[Byte] = {
    val stride = (width * 3 + 3) & ~3
    val frameBytes = stride * height

    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val out = ByteBuffer.allocate(8 + body.length + pad).order(ByteOrder.LITTLE_ENDIAN)
      out.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      if (pad == 1) out.put(0.toByte)
      out.array()
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ body)

    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    avih.putInt(if (fps > 0) 1000000 / fps else 0) // µs per frame
      .putInt(frameBytes * fps).putInt(0).putInt(0)
      .putInt(frameChunks.size).putInt(0).putInt(1).putInt(frameBytes)
      .putInt(width).putInt(height)
    val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    strh.put("vids".getBytes("US-ASCII")).put(handler.getBytes("US-ASCII"))
      .putInt(0).putInt(0).putInt(0) // flags, prio+lang, initialFrames
      .putInt(1).putInt(fps)         // scale, rate
      .putInt(0).putInt(frameChunks.size).putInt(frameBytes).putInt(-1).putInt(0)
      .putShort(0).putShort(0).putShort(width.toShort).putShort(height.toShort)
    val strf = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
    strf.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(frameBytes).putInt(0).putInt(0).putInt(0).putInt(0)

    val hdrl = list("hdrl",
      chunk("avih", avih.array()) ++
        list("strl", chunk("strh", strh.array()) ++ chunk("strf", strf.array())))
    val movi = list("movi",
      frameChunks.toArray.flatMap { case (k, data) => chunk("00" + k, data) })
    val form = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val out = ByteBuffer.allocate(8 + form.length).order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(form.length).put(form)
    out.array()
  }

  /** Uncompressed AVI ('DIB ' handler, bottom-up BGR24) from row-major
    * ARGB frames — raw pixels, so decode results are exact. */
  def writeUncompressedAvi(width: Int, height: Int, fps: Int,
      frames: Seq[Array[Int]]): Array[Byte] = {
    require(frames.forall(_.length == width * height), "frame pixel counts")
    val stride = (width * 3 + 3) & ~3
    val dib = frames.map { px =>
      val body = new Array[Byte](stride * height)
      var y = 0
      while (y < height) {
        val rowOff = (height - 1 - y) * stride
        var x = 0
        while (x < width) {
          val p = px(y * width + x)
          body(rowOff + x * 3) = (p & 0xFF).toByte
          body(rowOff + x * 3 + 1) = ((p >> 8) & 0xFF).toByte
          body(rowOff + x * 3 + 2) = ((p >> 16) & 0xFF).toByte
          x += 1
        }
        y += 1
      }
      ("db", body)
    }
    writeAvi(width, height, fps, "DIB ", dib)
  }
}
