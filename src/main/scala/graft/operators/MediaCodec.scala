package graft.operators

/** Pure-JVM image header codec: extracts (codec, width, height) from
  * the leading bytes of PNG / JPEG / GIF / BMP payloads — no image
  * library needed, so the multimodal feature path decodes REAL
  * dimensions even in codec-less environments. The encoders build
  * header-valid minimal files (correct magic, header chunk, CRCs) for
  * deterministic fixtures; the decoder is validated against JDK
  * ImageIO-produced files in MultimodalSpec.
  *
  * No reference counterpart (the reference has no media columns).
  */
object MediaCodec {

  // ---- decode --------------------------------------------------------

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private val pngMagic =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def hasPrefix(b: Array[Byte], p: Array[Byte]): Boolean =
    b.length >= p.length && p.indices.forall(i => b(i) == p(i))

  /** JPEG SOFn markers carrying frame dimensions (C0–CF minus the
    * non-frame C4/C8/CC).
    */
  private def isSof(m: Int): Boolean =
    m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc

  /** (codec, width, height) when the payload starts with a recognized
    * image header; None for anything else.
    */
  def decodeDims(b: Array[Byte]): Option[(String, Int, Int)] = {
    if (hasPrefix(b, pngMagic) && b.length >= 24 &&
        new String(b.slice(12, 16), "US-ASCII") == "IHDR") {
      Some(("png", be32(b, 16), be32(b, 20)))
    } else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      // walk JPEG segments to the first SOFn
      var i = 2
      while (i + 3 < b.length && (b(i) & 0xff) == 0xff) {
        val marker = b(i + 1) & 0xff
        if (marker == 0xff) { i += 1 } // fill byte
        else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) i += 2
        else if (marker == 0xd9 || marker == 0xda) return None // hit scan/EOI first
        else {
          val len = be16(b, i + 2)
          if (isSof(marker) && i + 9 < b.length)
            return Some(("jpeg", be16(b, i + 7), be16(b, i + 5)))
          i += 2 + len
        }
      }
      None
    } else if (b.length >= 10 && (new String(b.slice(0, 6), "US-ASCII") == "GIF87a" ||
        new String(b.slice(0, 6), "US-ASCII") == "GIF89a")) {
      Some(("gif", le16(b, 6), le16(b, 8)))
    } else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
      Some(("bmp", le32(b, 18), math.abs(le32(b, 22))))
    } else None
  }

  // ---- encode (header-valid minimal fixtures) ------------------------

  private def crc32(bytes: Array[Byte]): Int = {
    val c = new java.util.zip.CRC32()
    c.update(bytes)
    c.getValue.toInt
  }

  private def beBytes32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def leBytes16(v: Int): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte)

  private def leBytes32(v: Int): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)

  /** Minimal PNG: signature, IHDR (8-bit RGB, correct CRC), IEND. */
  def pngBytes(w: Int, h: Int): Array[Byte] = {
    val ihdrBody = "IHDR".getBytes("US-ASCII") ++ beBytes32(w) ++ beBytes32(h) ++
      Array[Byte](8, 2, 0, 0, 0)
    val iend = "IEND".getBytes("US-ASCII")
    pngMagic ++ beBytes32(13) ++ ihdrBody ++ beBytes32(crc32(ihdrBody)) ++
      beBytes32(0) ++ iend ++ beBytes32(crc32(iend))
  }

  /** Minimal JPEG: SOI, APP0/JFIF, SOF0 with the dimensions, EOI. */
  def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val app0 = Array[Byte](0xff.toByte, 0xe0.toByte, 0, 16) ++
      "JFIF".getBytes("US-ASCII") ++
      Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
    val sof0 = Array[Byte](0xff.toByte, 0xc0.toByte, 0, 17, 8) ++
      Array(((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
        ((w >> 8) & 0xff).toByte, (w & 0xff).toByte) ++
      Array[Byte](3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    Array[Byte](0xff.toByte, 0xd8.toByte) ++ app0 ++ sof0 ++
      Array[Byte](0xff.toByte, 0xd9.toByte)
  }

  /** Minimal GIF89a: header + logical screen descriptor + trailer. */
  def gifBytes(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes("US-ASCII") ++ leBytes16(w) ++ leBytes16(h) ++
      Array[Byte](0, 0, 0, 0x3b)

  /** Minimal BMP: file header + BITMAPINFOHEADER, no pixel data. */
  def bmpBytes(w: Int, h: Int): Array[Byte] =
    Array[Byte]('B', 'M') ++ leBytes32(54) ++ leBytes32(0) ++ leBytes32(54) ++
      leBytes32(40) ++ leBytes32(w) ++ leBytes32(h) ++
      Array[Byte](1, 0, 24, 0) ++ Array.fill[Byte](24)(0)
}
