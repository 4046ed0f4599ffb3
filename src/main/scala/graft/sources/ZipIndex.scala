package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.{FileSystem, Path}

/** Seek-based zip central-directory reader (PKWARE APPNOTE layout,
  * zip64-aware). Purpose: NPZ entries written STORED (numpy's
  * `savez`, and this engine's own sink) are raw byte ranges, so a
  * large shard file can be row-split across tasks if we know each
  * entry's data offset. `ZipInputStream` cannot expose offsets; this
  * reads the end-of-central-directory record and central headers with
  * three positioned reads per file.
  */
object ZipIndex {

  /** method 0 = STORED (splittable), 8 = DEFLATE. */
  final case class Entry(
      name: String, method: Int, dataOffset: Long,
      compressedSize: Long, uncompressedSize: Long)

  private val EocdSig = 0x06054b50
  private val Zip64LocatorSig = 0x07064b50
  private val Zip64EocdSig = 0x06064b50
  private val CentralSig = 0x02014b50
  private val LocalSig = 0x04034b50

  def entries(fs: FileSystem, path: Path): Seq[Entry] = {
    val len = fs.getFileStatus(path).getLen
    val in = fs.open(path)
    try {
      // EOCD lives in the last 22..65557 bytes (comment can pad it)
      val tailLen = math.min(len, 65557L).toInt
      val tail = new Array[Byte](tailLen)
      in.readFully(len - tailLen, tail, 0, tailLen)
      val tb = ByteBuffer.wrap(tail).order(ByteOrder.LITTLE_ENDIAN)
      var eocd = -1
      var i = tailLen - 22
      while (i >= 0 && eocd < 0) {
        if (tb.getInt(i) == EocdSig) eocd = i else i -= 1
      }
      require(eocd >= 0, s"$path: no zip end-of-central-directory record")
      var nEntries: Long = (tb.getShort(eocd + 10) & 0xffff).toLong
      var cdSize: Long = tb.getInt(eocd + 12).toLong & 0xffffffffL
      var cdOff: Long = tb.getInt(eocd + 16).toLong & 0xffffffffL
      if (cdOff == 0xffffffffL || cdSize == 0xffffffffL || nEntries == 0xffffL) {
        val loc = eocd - 20
        require(loc >= 0 && tb.getInt(loc) == Zip64LocatorSig,
          s"$path: zip64 sizes without a zip64 locator")
        val z64Off = tb.getLong(loc + 8)
        val rec = new Array[Byte](56)
        in.readFully(z64Off, rec, 0, 56)
        val rb = ByteBuffer.wrap(rec).order(ByteOrder.LITTLE_ENDIAN)
        require(rb.getInt(0) == Zip64EocdSig, s"$path: bad zip64 EOCD record")
        nEntries = rb.getLong(32)
        cdSize = rb.getLong(40)
        cdOff = rb.getLong(48)
      }
      require(cdSize < (1L << 26), s"$path: implausible central directory size $cdSize")
      val cd = new Array[Byte](cdSize.toInt)
      in.readFully(cdOff, cd, 0, cdSize.toInt)
      val cb = ByteBuffer.wrap(cd).order(ByteOrder.LITTLE_ENDIAN)
      val out = Seq.newBuilder[Entry]
      var pos = 0
      var parsed = 0L
      while (parsed < nEntries && pos + 46 <= cd.length) {
        require(cb.getInt(pos) == CentralSig, s"$path: bad central header at $pos")
        val method = cb.getShort(pos + 10) & 0xffff
        var comp = cb.getInt(pos + 20).toLong & 0xffffffffL
        var uncomp = cb.getInt(pos + 24).toLong & 0xffffffffL
        val nameLen = cb.getShort(pos + 28) & 0xffff
        val extraLen = cb.getShort(pos + 30) & 0xffff
        val commentLen = cb.getShort(pos + 32) & 0xffff
        var lho = cb.getInt(pos + 42).toLong & 0xffffffffL
        val name = new String(cd, pos + 46, nameLen, java.nio.charset.StandardCharsets.UTF_8)
        // zip64 extra field: 8-byte values replace the 0xffffffff ones,
        // in the fixed order uncompressed, compressed, offset
        var ep = pos + 46 + nameLen
        val eEnd = ep + extraLen
        while (ep + 4 <= eEnd) {
          val id = cb.getShort(ep) & 0xffff
          val sz = cb.getShort(ep + 2) & 0xffff
          if (id == 0x0001) {
            var fp = ep + 4
            if (uncomp == 0xffffffffL) { uncomp = cb.getLong(fp); fp += 8 }
            if (comp == 0xffffffffL) { comp = cb.getLong(fp); fp += 8 }
            if (lho == 0xffffffffL) { lho = cb.getLong(fp); fp += 8 }
          }
          ep += 4 + sz
        }
        // local header's own name/extra lengths decide the data offset
        val lh = new Array[Byte](30)
        in.readFully(lho, lh, 0, 30)
        val lb = ByteBuffer.wrap(lh).order(ByteOrder.LITTLE_ENDIAN)
        require(lb.getInt(0) == LocalSig, s"$path: bad local header for $name")
        val lNameLen = lb.getShort(26) & 0xffff
        val lExtraLen = lb.getShort(28) & 0xffff
        out += Entry(name, method, lho + 30 + lNameLen + lExtraLen, comp, uncomp)
        pos += 46 + nameLen + extraLen + commentLen
        parsed += 1
      }
      out.result()
    } finally in.close()
  }
}
