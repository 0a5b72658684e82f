package graft.sources

import java.io.EOFException
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Archive fsck — the central-directory audit that closes the streaming
  * walk's one documented blind spot ([[ZipWalker]] scaladoc): a zip
  * whose local-header SIGNATURE is corrupted reads as a clean
  * end-of-stream to any forward-only reader (the JDK returns null for a
  * non-LOC signature), so members after the corruption vanish with no
  * quarantine row. The central directory at the END of the file still
  * names every member, so cross-checking the two walks detects exactly
  * that lie — the q256 `ivfFsck` discipline applied to containers.
  *
  * Per archive, one row: `central_members` (regular-file entries per
  * the central directory), `walk_members` / `walk_quarantined` (what
  * the forward stream walk produced), and `consistent` = ok ∧ counts
  * equal ∧ zero quarantines. A file whose tail has no EOCD record, has
  * zip64 markers (not written by any JDK `ZipOutputStream` path we
  * ingest; unsupported here), or whose central directory is torn gets
  * `ok=false` with a named error — never an exception.
  *
  * Scale shape: the central-directory side is TAIL-ONLY I/O — one seek
  * to the EOCD search window (≤ 64 KiB + 22), one seek to the central
  * directory (≈ 60 bytes per member), so fscking a 10 GiB archive
  * costs kilobytes-to-megabytes of reads, not a scan; the walk side
  * reuses [[ZipWalker]] with payload reads skipped (header hops). One
  * task per archive, parallel in file count — the corpus-dump layout.
  * The bounded `mapPartitions` here is the Multimodal JDK-codec
  * exemption: per-file imperative I/O no Column expression can express.
  */
object ArchiveAudit {

  case class ZipAuditRow(archive_file: String,
      central_members: java.lang.Long, walk_members: java.lang.Long,
      walk_quarantined: java.lang.Long, consistent: Boolean,
      ok: Boolean, error: String)

  /** One audit row per `.zip` file matched by `pattern` (non-zip
    * matches are ignored — tars have no central directory to audit).
    */
  def zipFsck(spark: SparkSession, pattern: String,
      maxPayload: Long = TextArchiveDataSource.defaultMaxPayload): DataFrame = {
    val conf = new SerializableHadoopConf(spark.sessionState.newHadoopConf())
    val files = ElbDataSource.expand(Seq(pattern), conf.value)
      .filter(_.toLowerCase.endsWith(".zip"))
    // same int-range clamp as TextArchiveTable: the walker materializes
    // payloads as byte arrays, so the cap must stay below Int.MaxValue
    val cappedPayload = maxPayload.min(Int.MaxValue.toLong - 8)
    import spark.implicits._
    val parts = math.max(1, math.min(files.size, 64))
    spark.createDataset(files).repartition(parts) // bounded: the file listing
      .mapPartitions(_.map(p => auditOne(p, conf, cappedPayload)))
      .toDF()
  }

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def fail(path: String, err: String): ZipAuditRow =
    ZipAuditRow(path, null, null, null, consistent = false, ok = false, err)

  private[sources] def auditOne(path: String, conf: SerializableHadoopConf,
      maxPayload: Long): ZipAuditRow = {
    try {
      val hp = new org.apache.hadoop.fs.Path(path)
      val fs = hp.getFileSystem(conf.value)
      val len = fs.getFileStatus(hp).getLen

      // ——— central-directory side: EOCD search window is the last
      //     22 + 65535 bytes (22-byte fixed record + max comment)
      val tailLen = math.min(len, 22L + 65535L).toInt
      if (tailLen < 22) return fail(path, "no EOCD: file shorter than a zip end record")
      val tail = new Array[Byte](tailLen)
      val in = fs.open(hp)
      val central = try {
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
        if (found < 0) return fail(path, "no EOCD record in tail window")
        val totalEntries = u16(tail, found + 10)
        val cdSize = u32(tail, found + 12)
        val cdOffset = u32(tail, found + 16)
        if (totalEntries == 0xffff || cdSize == 0xffffffffL || cdOffset == 0xffffffffL)
          return fail(path, "zip64 markers in EOCD: unsupported")
        if (cdOffset + cdSize > len)
          return fail(path, "central directory extends past EOF")
        // cdSize is an untrusted u32: values in (cap, 0xFFFFFFFE] pass the
        // zip64 marker check and (on a big enough file) the EOF guard, then
        // `.toInt` goes negative and the allocation throws an error no
        // IOException handler catches. A central directory is ~60 B/member,
        // so 256 MiB already means >4M members — far past anything this
        // audit ingests; a named error keeps the "never an exception"
        // contract honest against adversarial EOCDs.
        val cdCap = 256L << 20
        if (cdSize > cdCap)
          return fail(path, s"central directory too large: $cdSize bytes")
        val cd = new Array[Byte](cdSize.toInt)
        in.readFully(cdOffset, cd, 0, cd.length)
        var pos = 0
        var regular = 0L
        var parsed = 0
        while (pos + 46 <= cd.length) {
          if (u32(cd, pos) != 0x02014b50L)
            return fail(path, s"corrupt central directory at offset $pos")
          val nameLen = u16(cd, pos + 28)
          val extraLen = u16(cd, pos + 30)
          val cmtLen = u16(cd, pos + 32)
          if (pos + 46 + nameLen > cd.length)
            return fail(path, "torn central directory entry")
          val name = new String(cd, pos + 46, nameLen, StandardCharsets.UTF_8)
          if (!name.endsWith("/")) regular += 1
          parsed += 1
          pos += 46 + nameLen + extraLen + cmtLen
        }
        if (parsed != totalEntries)
          return fail(path,
            s"central directory entry count mismatch: EOCD says $totalEntries, parsed $parsed")
        regular
      } finally in.close()

      // ——— forward-walk side: payload reads skipped (wantText=false)
      val raw = fs.open(hp)
      val walker = new ZipWalker(raw, wantText = false, maxPayload, _ => true)
      var members = 0L
      var quarantined = 0L
      try {
        var m = walker.nextMember()
        while (m != null) {
          if (!m.ok) quarantined += 1
          else if (m.memberPath != null) members += 1
          m = walker.nextMember()
        }
      } finally walker.close()

      ZipAuditRow(path, central, members, quarantined,
        consistent = central == members && quarantined == 0L,
        ok = true, error = null)
    } catch {
      case e: EOFException => fail(path, s"EOF during audit: ${e.getMessage}")
      case e: java.io.IOException => fail(path, s"audit read error: ${e.getMessage}")
      // belt for the braces above: any other non-fatal surprise from an
      // adversarial archive becomes a named row, not a task failure
      case scala.util.control.NonFatal(e) =>
        fail(path, s"audit error: ${e.getClass.getSimpleName}: ${e.getMessage}")
    }
  }
}
