package graft.sources

import java.io.InputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Parsed NPY array header: dtype descr (`<f4`, `<f8`, `<i4`, `<i8`)
  * and shape. Only C-order (fortran_order=False) arrays are accepted —
  * NumPy's default and the only layout the reference ever writes
  * (`generate_coco_embeddings.py:87-91`).
  */
final case class NpyHeader(descr: String, shape: Seq[Long]) {
  def elemSize: Int = descr match {
    case "<f4" | "<i4" => 4
    case "<f8" | "<i8" => 8
    case other =>
      throw new IllegalArgumentException(s"unsupported NPY descr '$other'")
  }
  def rows: Long = if (shape.isEmpty) 1L else shape.head
}

/** Minimal reader/writer for the NPY v1/v2 binary format (the payload
  * entries inside a NumPy `.npz` zip). Format spec is public:
  * `numpy/lib/format.py` — magic `\x93NUMPY`, version bytes, a
  * little-endian header length, an ASCII python-dict header padded to
  * 64 bytes, then the raw little-endian array body.
  *
  * Pure JVM, no Spark dependencies: shared by the DataSource V2
  * reader and writer and unit-testable in isolation.
  */
object Npy {
  private val Magic: Array[Byte] =
    Array(0x93.toByte, 'N'.toByte, 'U'.toByte, 'M'.toByte, 'P'.toByte, 'Y'.toByte)

  private val DescrRe = """'descr'\s*:\s*'([^']+)'""".r
  private val ShapeRe = """'shape'\s*:\s*\(([^)]*)\)""".r

  /** Parse one NPY header from the stream, leaving the stream
    * positioned at the first byte of the array body.
    */
  def readHeader(in: InputStream): NpyHeader = {
    val pre = new Array[Byte](8)
    readFully(in, pre)
    require(pre.take(6).sameElements(Magic), "not an NPY stream (bad magic)")
    val major = pre(6).toInt
    val lenBytes = new Array[Byte](if (major >= 2) 4 else 2)
    readFully(in, lenBytes)
    val bb = ByteBuffer.wrap(lenBytes).order(ByteOrder.LITTLE_ENDIAN)
    val hlen = if (lenBytes.length == 2) bb.getShort & 0xffff else bb.getInt
    require(hlen > 0 && hlen < (1 << 24), s"implausible NPY header length $hlen")
    val hb = new Array[Byte](hlen)
    readFully(in, hb)
    val h = new String(hb, StandardCharsets.US_ASCII)
    require(!h.contains("'fortran_order': True"),
      "fortran-order NPY arrays are not supported")
    val descr = DescrRe.findFirstMatchIn(h)
      .getOrElse(throw new IllegalArgumentException(s"no descr in NPY header: $h"))
      .group(1)
    val shape = ShapeRe.findFirstMatchIn(h)
      .getOrElse(throw new IllegalArgumentException(s"no shape in NPY header: $h"))
      .group(1).split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong).toSeq
    NpyHeader(descr, shape)
  }

  /** Serialize an NPY v1 header (magic + version + padded dict),
    * 64-byte aligned exactly as numpy >= 1.9 writes it.
    */
  def headerBytes(descr: String, shape: Seq[Long]): Array[Byte] = {
    val shapeStr =
      if (shape.length == 1) s"(${shape.head},)" else s"(${shape.mkString(", ")})"
    val dict = s"{'descr': '$descr', 'fortran_order': False, 'shape': $shapeStr, }"
    val base = Magic.length + 2 + 2 // magic + version (1,0) + u16 header len
    val total = ((base + dict.length + 1 + 63) / 64) * 64
    val out = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    out.put(Magic).put(1.toByte).put(0.toByte)
    out.putShort((total - base).toShort)
    out.put(dict.getBytes(StandardCharsets.US_ASCII))
    // pad with spaces up to the final newline; position is now
    // base + dict.length (base already counts the u16 length field)
    var i = base + dict.length
    while (i < total - 1) { out.put(' '.toByte); i += 1 }
    out.put('\n'.toByte)
    out.array()
  }

  /** Read a 1-D integer array body (`<i8` or `<i4`) into longs. */
  def readLongs(in: InputStream, header: NpyHeader): Array[Long] = {
    require(header.shape.length == 1,
      s"expected a 1-D id array, got shape ${header.shape}")
    val n = header.rows
    require(n <= Int.MaxValue, s"id array too large for one file: $n")
    val out = new Array[Long](n.toInt)
    val buf = new Array[Byte](header.elemSize * 8192)
    val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
    var read = 0
    while (read < out.length) {
      val batch = math.min(8192, out.length - read)
      readFully(in, buf, batch * header.elemSize)
      bb.clear()
      var i = 0
      header.descr match {
        case "<i8" => while (i < batch) { out(read + i) = bb.getLong();  i += 1 }
        case "<i4" => while (i < batch) { out(read + i) = bb.getInt().toLong; i += 1 }
        case other =>
          throw new IllegalArgumentException(s"unsupported id descr '$other'")
      }
      read += batch
    }
    out
  }

  def readFully(in: InputStream, buf: Array[Byte]): Unit =
    readFully(in, buf, buf.length)

  def readFully(in: InputStream, buf: Array[Byte], len: Int): Unit = {
    var off = 0
    while (off < len) {
      val n = in.read(buf, off, len - off)
      if (n < 0)
        throw new java.io.EOFException(s"truncated NPY body: wanted $len, got $off")
      off += n
    }
  }
}
