package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Central-directory parse shared by [[ArchiveAudit.zipFsck]] (the
  * audit) and [[TextArchiveScan]] (central-directory-driven SPLITTABLE
  * zip reading — round 15). A zip's authoritative member list lives at
  * the END of the file: one EOCD record (backward-scanned through the
  * ≤ 64 KiB comment window) pointing at ~46+name bytes per member, each
  * carrying the member's LOCAL HEADER OFFSET. Parsing it costs
  * kilobytes-to-megabytes of tail reads on any archive size — which is
  * what makes a single 10 GiB zip splittable: the scan plans member
  * RANGES from these offsets instead of forward-walking the stream.
  *
  * Unsupported shapes (zip64 markers, torn/oversized directories) come
  * back as `Left(named error)` — the audit turns that into an `ok=false`
  * row, the scan falls back to the forward stream walk.
  */
private[sources] object ZipCentralDirectory {

  /** One central-directory entry: `name` decides dir-ness and pushdown,
    * `locOffset` is where the member's local header starts,
    * `compressedSize` sizes split planning, `uncompressedSize` is the
    * payload's declared size.
    */
  case class CdEntry(name: String, locOffset: Long, compressedSize: Long,
      uncompressedSize: Long) {
    def isDirectory: Boolean = name.endsWith("/")
  }

  /** An untrusted u32 EOCD field caps the directory we are willing to
    * buffer: ~60 B/member means 256 MiB is already >4M members.
    */
  val maxCdBytes: Long = 256L << 20

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  /** Tail-only central-directory parse; `Left` is a named error (the
    * audit's spec-pinned strings), `Right` the entries in directory
    * order (≈ ascending local-header offset for every common writer).
    */
  def parse(fs: FileSystem, hp: HPath, len: Long): Either[String, Array[CdEntry]] = {
    // ——— EOCD search window is the last 22 + 65535 bytes (22-byte
    //     fixed record + max comment)
    val tailLen = math.min(len, 22L + 65535L).toInt
    if (tailLen < 22) return Left("no EOCD: file shorter than a zip end record")
    val tail = new Array[Byte](tailLen)
    val in = fs.open(hp)
    try {
      in.readFully(len - tailLen, tail, 0, tailLen)
      // backward scan: the EOCD whose comment-length field reaches
      // exactly to EOF is the real one (comments can embed the sig)
      var i = tailLen - 22
      var found = -1
      while (i >= 0 && found < 0) {
        if (tail(i) == 0x50 && tail(i + 1) == 0x4b && tail(i + 2) == 0x05 &&
          tail(i + 3) == 0x06 && u16(tail, i + 20) == tailLen - 22 - i) found = i
        i -= 1
      }
      if (found < 0) return Left("no EOCD record in tail window")
      val totalEntries = u16(tail, found + 10)
      val cdSize = u32(tail, found + 12)
      val cdOffset = u32(tail, found + 16)
      if (totalEntries == 0xffff || cdSize == 0xffffffffL || cdOffset == 0xffffffffL)
        return Left("zip64 markers in EOCD: unsupported")
      if (cdOffset + cdSize > len)
        return Left("central directory extends past EOF")
      if (cdSize > maxCdBytes)
        return Left(s"central directory too large: $cdSize bytes")
      val cd = new Array[Byte](cdSize.toInt)
      in.readFully(cdOffset, cd, 0, cd.length)
      val entries = Array.newBuilder[CdEntry]
      var pos = 0
      var parsed = 0
      while (pos + 46 <= cd.length) {
        if (u32(cd, pos) != 0x02014b50L)
          return Left(s"corrupt central directory at offset $pos")
        val csize = u32(cd, pos + 20)
        val usize = u32(cd, pos + 24)
        val nameLen = u16(cd, pos + 28)
        val extraLen = u16(cd, pos + 30)
        val cmtLen = u16(cd, pos + 32)
        val locOffset = u32(cd, pos + 42)
        if (pos + 46 + nameLen > cd.length)
          return Left("torn central directory entry")
        val name = new String(cd, pos + 46, nameLen, StandardCharsets.UTF_8)
        // per-member zip64 markers (or a LOC offset past EOF) mean the
        // offsets cannot be trusted for seek-reading
        if (csize == 0xffffffffL || usize == 0xffffffffL || locOffset == 0xffffffffL)
          return Left(s"zip64 markers in central directory entry: $name")
        if (locOffset >= len)
          return Left(s"central directory offset past EOF: $name")
        entries += CdEntry(name, locOffset, csize, usize)
        parsed += 1
        pos += 46 + nameLen + extraLen + cmtLen
      }
      if (parsed != totalEntries)
        return Left(
          s"central directory entry count mismatch: EOCD says $totalEntries, parsed $parsed")
      Right(entries.result())
    } finally in.close()
  }
}
