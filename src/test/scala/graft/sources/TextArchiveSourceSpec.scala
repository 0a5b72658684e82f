package graft.sources

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.{GZIPOutputStream, ZipOutputStream}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The text-archive container source under test: golden member walk over
  * both container encodings (ustar-in-gzip, STORED zip) producing
  * identical logical members, pruning/pushdown behavior, and — the
  * WARC/Multimodal quarantine discipline — one ok=false row with a named
  * error for every way an archive can lie (corrupt tar header checksum,
  * non-octal size, truncated payload, torn header, maxPayload breach,
  * corrupt zip stream), with tar resync proven by the healthy members
  * AFTER the corruption still arriving.
  */
class TextArchiveSourceSpec extends SparkSpec {

  private def payload(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)

  /** A tar stream (uncompressed) of the given (name, mtimeSec, text)
    * members with the canonical trailer.
    */
  private def tarBytes(members: Seq[(String, Long, String)],
      trailer: Boolean = true): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    members.foreach { case (n, mt, t) =>
      SyntheticTextArchive.tarMember(out, n, mt, payload(t)) }
    if (trailer) SyntheticTextArchive.tarTrailer(out)
    out.toByteArray
  }

  private def writeFile(name: String, content: Array[Byte]): String = {
    val dir = Files.createTempDirectory("txtar-spec")
    val f = dir.resolve(name)
    Files.write(f, content)
    f.toString
  }

  private def writeTarGz(name: String, raw: Array[Byte]): String = {
    val dir = Files.createTempDirectory("txtar-spec")
    val f = dir.resolve(name)
    val gz = new GZIPOutputStream(new FileOutputStream(f.toFile))
    gz.write(raw); gz.close()
    f.toString
  }

  private def readAll(path: String) =
    spark.read.format("textarchive").load(path)
      .orderBy("member_path").collect()

  private val golden = Seq(
    ("a/one.txt", 1748736000L, "hello archive\n"),
    ("a/two.md", 1748736001L, "# two\n\nbody text\n"),
    ("b/three.txt", 1748736002L, "third member here\n"))

  test("golden walk: tar.gz and zip yield identical logical members") {
    val tgz = writeTarGz("g.tar.gz", tarBytes(golden))
    val zdir = Files.createTempDirectory("txtar-spec")
    val zf = zdir.resolve("g.zip")
    val z = new ZipOutputStream(new FileOutputStream(zf.toFile))
    golden.foreach { case (n, mt, t) =>
      SyntheticTextArchive.zipMember(z, n, mt * 1000L, payload(t)) }
    z.close()

    val both = Seq(tgz, zf.toString).map(readAll)
    both.foreach { rows =>
      assert(rows.length == 3)
      assert(rows.forall(_.getAs[Boolean]("ok")))
      assert(rows.map(_.getAs[String]("member_path")).toSeq ==
        golden.map(_._1))
      assert(rows.map(_.getAs[String]("ext")).toSeq == Seq("txt", "md", "txt"))
      assert(rows.map(_.getAs[Long]("size_bytes")).toSeq ==
        golden.map(g => payload(g._3).length.toLong))
      assert(rows.map(_.getAs[Long]("mtime_ms")).toSeq ==
        golden.map(_._2 * 1000L))
      assert(rows.map(_.getAs[String]("text")).toSeq == golden.map(_._3))
    }
    // encodings agree field-for-field (minus the per-file path column)
    val norm = both.map(_.toSeq.map(_.toSeq.dropRight(1)))
    assert(norm(0) == norm(1))
  }

  test("plain .tar (no gzip) walks too; extension law on member basename") {
    val path = writeFile("p.tar", tarBytes(Seq(
      ("noext", 1L, "a\n"), ("d.x/inner", 2L, "b\n"),
      (".hidden", 3L, "c\n"), ("trail.", 4L, "d\n"),
      ("UPPER.TXT", 5L, "e\n"))))
    val rows = readAll(path)
    assert(rows.length == 5)
    val exts = rows.map(r => r.getAs[String]("member_path") ->
      r.getAs[String]("ext")).toMap
    assert(exts("noext") == null)       // no dot
    assert(exts("d.x/inner") == null)   // dot only in a directory part
    assert(exts(".hidden") == null)     // leading dot is not an extension
    assert(exts("trail.") == null)      // trailing dot
    assert(exts("UPPER.TXT") == "txt")  // lowercased
  }

  test("corrupt tar header checksum quarantines once, resync reaches later members") {
    val raw = tarBytes(golden)
    // flip a byte inside the SECOND member's header (first header is
    // 512B + 1 payload block = 1024; second header starts at 1024)
    raw(1024 + 10) = 'X'.toByte
    val rows = spark.read.format("textarchive")
      .load(writeFile("c.tar", raw)).collect()
    val bad = rows.filter(!_.getAs[Boolean]("ok"))
    assert(bad.length == 1)
    assert(bad.head.getAs[String]("error").startsWith("corrupt tar header"))
    // members 1 and 3 survive: resync found the third header
    val ok = rows.filter(_.getAs[Boolean]("ok")).map(_.getAs[String]("member_path"))
    assert(ok.toSet == Set("a/one.txt", "b/three.txt"))
  }

  test("non-octal tar size field quarantines and resyncs") {
    val raw = tarBytes(golden)
    // corrupt the size field of member 2 (offset 124 in its header) and
    // re-checksum so ONLY the size parse fails
    val hdr = new Array[Byte](512)
    System.arraycopy(raw, 1024, hdr, 0, 512)
    hdr(124) = 'Z'.toByte
    java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
    var sum = 0L
    (0 until 512).foreach(i => sum += (hdr(i) & 0xff))
    val ck = java.lang.Long.toOctalString(sum)
    System.arraycopy((("0" * (6 - ck.length)) + ck + "\u0000 ")
      .getBytes(StandardCharsets.US_ASCII), 0, hdr, 148, 8)
    System.arraycopy(hdr, 0, raw, 1024, 512)
    val rows = spark.read.format("textarchive")
      .load(writeFile("s.tar", raw)).collect()
    val bad = rows.filter(!_.getAs[Boolean]("ok"))
    assert(bad.length == 1)
    assert(bad.head.getAs[String]("error").startsWith("invalid tar size field"))
    assert(rows.count(_.getAs[Boolean]("ok")) == 2)
  }

  test("truncated payload quarantines with the member's metadata intact") {
    val full = tarBytes(golden, trailer = false)
    // cut inside the LAST member's payload BYTES (the member is 18
    // bytes in a 512-byte block: keep 10 of them, so the payload read
    // itself hits EOF — a shorter cut would only truncate tar padding)
    val cut = java.util.Arrays.copyOf(full, full.length - 502)
    val rows = spark.read.format("textarchive")
      .load(writeFile("t.tar", cut)).collect()
    assert(rows.length == 3)
    val bad = rows.filter(!_.getAs[Boolean]("ok"))
    assert(bad.length == 1)
    assert(bad.head.getAs[String]("error").startsWith("truncated member"))
    assert(bad.head.getAs[String]("member_path") == "b/three.txt") // header survived
    assert(bad.head.isNullAt(bad.head.fieldIndex("text")))
  }

  test("trailer-less tar ends cleanly; EOF mid-header-block quarantines as torn") {
    // clean EOF exactly at the block boundary after the last padded payload
    val noTrailer = tarBytes(golden, trailer = false)
    val rows = readAll(writeFile("n.tar", noTrailer))
    assert(rows.length == 3 && rows.forall(_.getAs[Boolean]("ok")))
    // EOF 100 bytes INTO a header block
    val torn = java.util.Arrays.copyOf(tarBytes(golden), 2 * 1024 + 100)
    val rows2 = spark.read.format("textarchive")
      .load(writeFile("torn.tar", torn)).collect()
    val bad = rows2.filter(!_.getAs[Boolean]("ok"))
    assert(bad.length == 1)
    assert(bad.head.getAs[String]("error").startsWith("torn tar header"))
    assert(rows2.count(_.getAs[Boolean]("ok")) == 2)
  }

  test("non-regular tar members (dir / pax / GNU longname) skip payload, emit no row") {
    val out = new ByteArrayOutputStream()
    // directory (typeflag 5, size 0)
    val dirHdr = SyntheticTextArchive.tarHeader("a/", 0L, 1L)
    setTypeflag(dirHdr, '5'); out.write(dirHdr)
    // pax extended header (typeflag x) with a payload to skip
    val paxPayload = payload("30 mtime=1748736000.123456789\n")
    val paxHdr = SyntheticTextArchive.tarHeader("pax", paxPayload.length.toLong, 1L)
    setTypeflag(paxHdr, 'x'); out.write(paxHdr); out.write(paxPayload)
    out.write(new Array[Byte]((512 - paxPayload.length % 512) % 512))
    // then one real member
    SyntheticTextArchive.tarMember(out, "real.txt", 2L, payload("kept\n"))
    SyntheticTextArchive.tarTrailer(out)
    val rows = readAll(writeFile("sp.tar", out.toByteArray))
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("member_path") == "real.txt")
    assert(rows.head.getAs[String]("text") == "kept\n")
  }

  private def setTypeflag(hdr: Array[Byte], tf: Char): Unit = {
    hdr(156) = tf.toByte
    java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
    var sum = 0L
    (0 until 512).foreach(i => sum += (hdr(i) & 0xff))
    val ck = java.lang.Long.toOctalString(sum)
    System.arraycopy((("0" * (6 - ck.length)) + ck + "\u0000 ")
      .getBytes(StandardCharsets.US_ASCII), 0, hdr, 148, 8)
  }

  test("maxPayload cap quarantines oversized members in both formats, keeps walking") {
    val big = ("big.txt", 1L, "x" * 1000)
    val small = ("small.txt", 2L, "ok\n")
    val tgz = writeTarGz("cap.tar.gz", tarBytes(Seq(big, small)))
    val zdir = Files.createTempDirectory("txtar-spec")
    val zf = zdir.resolve("cap.zip")
    val z = new ZipOutputStream(new FileOutputStream(zf.toFile))
    Seq(big, small).foreach { case (n, mt, t) =>
      SyntheticTextArchive.zipMember(z, n, mt * 1000L, payload(t)) }
    z.close()
    Seq(tgz, zf.toString).foreach { p =>
      val rows = spark.read.format("textarchive").option("maxPayload", "100")
        .load(p).orderBy("member_path").collect()
      assert(rows.length == 2, s"at $p")
      val bad = rows.filter(!_.getAs[Boolean]("ok"))
      assert(bad.length == 1 &&
        bad.head.getAs[String]("error").contains("exceeds maxPayload"), s"at $p")
      assert(bad.head.getAs[Long]("size_bytes") == 1000L)
      assert(bad.head.isNullAt(bad.head.fieldIndex("text")))
      val ok = rows.filter(_.getAs[Boolean]("ok"))
      assert(ok.length == 1 && ok.head.getAs[String]("text") == "ok\n", s"at $p")
    }
  }

  test("corrupt zip entry data (CRC mismatch) quarantines; CD path keeps later members, forward walk ends the file") {
    val zdir = Files.createTempDirectory("txtar-spec")
    val zf = zdir.resolve("bad.zip")
    val z = new ZipOutputStream(new FileOutputStream(zf.toFile))
    SyntheticTextArchive.zipMember(z, "first.txt", 1000L, payload("fine\n"))
    SyntheticTextArchive.zipMember(z, "second.txt", 2000L, payload("gone\n"))
    z.close()
    val raw = Files.readAllBytes(zf)
    // flip a byte of the SECOND entry's stored payload ("gone\n") so its
    // CRC check fails on read (a corrupted local-header SIGNATURE is
    // indistinguishable from the central-directory end marker to the
    // JDK's streaming reader — see the ZipWalker scaladoc)
    var idx = -1; var i = 0
    while (i < raw.length - 5 && idx < 0) {
      if (raw(i) == 'g' && raw(i + 1) == 'o' && raw(i + 2) == 'n' &&
        raw(i + 3) == 'e' && raw(i + 4) == '\n') idx = i
      i += 1
    }
    assert(idx > 0)
    raw(idx) = 'X'.toByte
    val bf = zdir.resolve("corrupt.zip")
    Files.write(bf, raw)
    // CD-driven default: the corrupt member quarantines with its
    // metadata attached, later members unaffected (each member reads
    // from its own directory offset)
    val rows = spark.read.format("textarchive").load(bf.toString).collect()
    assert(rows.count(_.getAs[Boolean]("ok")) == 1)
    val bad = rows.filter(!_.getAs[Boolean]("ok"))
    assert(bad.length == 1)
    assert(bad.head.getAs[String]("error").startsWith("zip stream error"))
    // forward walk (zipcd=false): same quarantine, but the stream cannot
    // be resynced so the file ends there — the pre-round-15 pin
    val fwd = spark.read.format("textarchive").option("zipcd", "false")
      .load(bf.toString).collect()
    assert(fwd.count(_.getAs[Boolean]("ok")) == 1)
    val fbad = fwd.filter(!_.getAs[Boolean]("ok"))
    assert(fbad.length == 1 &&
      fbad.head.getAs[String]("error").startsWith("zip stream error"))
  }

  test("invalid UTF-8 decodes with replacement, ok stays true") {
    val out = new ByteArrayOutputStream()
    val badBytes = Array[Byte]('a', 'b', 0xFF.toByte, 0xFE.toByte, 'c', '\n')
    out.write(SyntheticTextArchive.tarHeader("weird.txt", badBytes.length.toLong, 1L))
    out.write(badBytes)
    out.write(new Array[Byte]((512 - badBytes.length % 512) % 512))
    SyntheticTextArchive.tarTrailer(out)
    val rows = readAll(writeFile("u.tar", out.toByteArray))
    assert(rows.length == 1 && rows.head.getAs[Boolean]("ok"))
    assert(rows.head.getAs[String]("text") == "ab��c\n")
    assert(rows.head.getAs[Long]("size_bytes") == badBytes.length.toLong)
  }

  test("ext pushdown reaches the scan; pruning drops text from ReadSchema") {
    val glob = SyntheticTextArchive.dataset(500)
    val scan = spark.read.format("textarchive").load(glob)
      .where(col("ext") === "txt")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("ext"),
      s"pushdown missing in:\n$plan")
    // pruned scan: the scan description lists exactly the projected
    // fields (the format NAME contains "text", so match the field list)
    val pruned = spark.read.format("textarchive").load(glob)
      .select("member_path", "size_bytes")
    val prunedPlan = pruned.queryExecution.executedPlan.toString
    assert(prunedPlan.contains("files, member_path,size_bytes"),
      s"text not pruned:\n$prunedPlan")
    // generator law: every 5th member is markdown
    val counts = spark.read.format("textarchive").load(glob)
      .groupBy("ext").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("md") == 100 && counts("txt") == 400)
    // parallelism law: one partition per archive
    assert(spark.read.format("textarchive").load(glob).rdd.getNumPartitions == 16)
  }

  test("zip fsck: healthy archives consistent; corrupted LOC signature DETECTED via central directory") {
    val zdir = Files.createTempDirectory("txtar-fsck")
    val zf = zdir.resolve("good.zip")
    val z = new ZipOutputStream(new FileOutputStream(zf.toFile))
    SyntheticTextArchive.zipMember(z, "a.txt", 1000L, payload("one\n"))
    SyntheticTextArchive.zipMember(z, "b.txt", 2000L, payload("two\n"))
    z.close()
    val healthy = graft.sources.ArchiveAudit.zipFsck(spark, zf.toString).collect()
    assert(healthy.length == 1 && healthy.head.getAs[Boolean]("ok"))
    assert(healthy.head.getAs[Long]("central_members") == 2L)
    assert(healthy.head.getAs[Long]("walk_members") == 2L)
    assert(healthy.head.getAs[Boolean]("consistent"))

    // corrupt the SECOND local header signature: the forward walk sees
    // a clean end after member 1 (NO quarantine row — the documented
    // blind spot), but the central directory still says 2
    val raw = Files.readAllBytes(zf)
    var idx = -1; var found = 0; var i = 0
    while (i < raw.length - 4 && idx < 0) {
      if (raw(i) == 'P' && raw(i + 1) == 'K' && raw(i + 2) == 3 && raw(i + 3) == 4) {
        found += 1; if (found == 2) idx = i
      }
      i += 1
    }
    assert(idx > 0)
    raw(idx + 2) = 9
    val bf = zdir.resolve("sigcorrupt.zip")
    Files.write(bf, raw)
    // the FORWARD walk (zipcd=false) is provably blind to it: clean EOF
    // after member 1, no quarantine row
    val walked = spark.read.format("textarchive").option("zipcd", "false")
      .load(bf.toString).collect()
    assert(walked.length == 1 && walked.forall(_.getAs[Boolean]("ok")))
    // the DEFAULT (CD-driven) read path closes that blind spot: the
    // central directory names a member at the corrupted offset, so the
    // lie becomes a named quarantine row instead of a silent truncation
    val cdRead = spark.read.format("textarchive").load(bf.toString).collect()
    assert(cdRead.length == 2)
    val cdBad = cdRead.filter(!_.getAs[Boolean]("ok"))
    assert(cdBad.length == 1 &&
      cdBad.head.getAs[String]("error").startsWith("corrupt zip local header"))
    val audit = graft.sources.ArchiveAudit.zipFsck(spark, bf.toString).collect()
    assert(audit.length == 1 && audit.head.getAs[Boolean]("ok"))
    assert(audit.head.getAs[Long]("central_members") == 2L)
    assert(audit.head.getAs[Long]("walk_members") == 1L)
    assert(!audit.head.getAs[Boolean]("consistent"))
  }

  test("zip fsck: CRC-corrupt entry counts as quarantine; truncated tail and torn central directory quarantine the audit") {
    val zdir = Files.createTempDirectory("txtar-fsck")
    val zf = zdir.resolve("crc.zip")
    val z = new ZipOutputStream(new FileOutputStream(zf.toFile))
    SyntheticTextArchive.zipMember(z, "a.txt", 1000L, payload("fine\n"))
    SyntheticTextArchive.zipMember(z, "b.txt", 2000L, payload("gone\n"))
    z.close()
    val raw = Files.readAllBytes(zf)
    var idx = -1; var i = 0
    while (i < raw.length - 5 && idx < 0) {
      if (raw(i) == 'g' && raw(i + 1) == 'o' && raw(i + 2) == 'n' &&
        raw(i + 3) == 'e' && raw(i + 4) == '\n') idx = i
      i += 1
    }
    raw(idx) = 'X'.toByte
    val cf = zdir.resolve("crccorrupt.zip")
    Files.write(cf, raw)
    val audit = graft.sources.ArchiveAudit.zipFsck(spark, cf.toString).collect()
    assert(audit.length == 1 && audit.head.getAs[Boolean]("ok"))
    assert(audit.head.getAs[Long]("walk_quarantined") == 1L)
    assert(!audit.head.getAs[Boolean]("consistent"))

    // chop the EOCD off entirely → named audit failure, no exception
    val torn = java.util.Arrays.copyOf(Files.readAllBytes(zf),
      Files.readAllBytes(zf).length - 12)
    val tf = zdir.resolve("noeocd.zip")
    Files.write(tf, torn)
    val bad = graft.sources.ArchiveAudit.zipFsck(spark, tf.toString).collect()
    assert(bad.length == 1 && !bad.head.getAs[Boolean]("ok"))
    assert(bad.head.getAs[String]("error").contains("EOCD") ||
      bad.head.getAs[String]("error").contains("central directory"))

    // tar files are ignored by the zip fsck listing
    val tpath = writeFile("skip.tar", tarBytes(golden))
    assert(graft.sources.ArchiveAudit.zipFsck(spark,
      tpath.replace("skip.tar", "*")).count() == 0L)
  }

  test("CD-driven zip scan: one large zip splits into member-range partitions, rows identical to the forward walk") {
    val n = 400
    val zpath = SyntheticTextArchive.singleZip(n)
    // default split (128 MiB): one partition — the corpus is tiny
    val whole = spark.read.format("textarchive").load(zpath)
    assert(whole.rdd.getNumPartitions == 1)
    // forced small splits: the SAME single zip parallelizes
    val split = spark.read.format("textarchive")
      .option("zipsplitbytes", (8 * 1024).toString).load(zpath)
    assert(split.rdd.getNumPartitions > 4,
      s"expected >4 partitions, got ${split.rdd.getNumPartitions}")
    // row-for-row identical to the forward stream walk
    val fwd = spark.read.format("textarchive").option("zipcd", "false")
      .load(zpath)
    assert(split.count() == n.toLong)
    assert(split.except(fwd).isEmpty && fwd.except(split).isEmpty)
  }

  test("CD planning prunes pushed predicates before any seek: ext filter drops partitions, empty match plans zero") {
    val n = 400
    val zpath = SyntheticTextArchive.singleZip(n)
    val small = (8 * 1024).toString
    val all = spark.read.format("textarchive")
      .option("zipsplitbytes", small).load(zpath)
    // every 5th member is markdown: an ext='md' scan plans ranges over
    // ~1/5 of the compressed bytes → materially fewer partitions
    val md = spark.read.format("textarchive")
      .option("zipsplitbytes", small).load(zpath)
      .where(col("ext") === "md")
    assert(md.rdd.getNumPartitions < all.rdd.getNumPartitions,
      s"${md.rdd.getNumPartitions} !< ${all.rdd.getNumPartitions}")
    assert(md.count() == (n / 5).toLong)
    // a predicate nothing matches plans ZERO partitions — no seeks at all
    val none = spark.read.format("textarchive")
      .option("zipsplitbytes", small).load(zpath)
      .where(col("ext") === "pdf")
    assert(none.rdd.getNumPartitions == 0)
    assert(none.count() == 0L)
  }

  test("CD-driven read survives a mid-zip CRC corruption: later members still arrive (forward walk cannot)") {
    val zdir = Files.createTempDirectory("txtar-cd")
    val zf = zdir.resolve("mid.zip")
    val z = new ZipOutputStream(new FileOutputStream(zf.toFile))
    SyntheticTextArchive.zipMember(z, "a.txt", 1000L, payload("fine\n"))
    SyntheticTextArchive.zipMember(z, "b.txt", 2000L, payload("gone\n"))
    SyntheticTextArchive.zipMember(z, "c.txt", 3000L, payload("after\n"))
    z.close()
    val raw = Files.readAllBytes(zf)
    var idx = -1; var i = 0
    while (i < raw.length - 5 && idx < 0) {
      if (raw(i) == 'g' && raw(i + 1) == 'o' && raw(i + 2) == 'n' &&
        raw(i + 3) == 'e' && raw(i + 4) == '\n') idx = i
      i += 1
    }
    assert(idx > 0)
    raw(idx) = 'X'.toByte
    val bf = zdir.resolve("midcorrupt.zip")
    Files.write(bf, raw)
    val rows = spark.read.format("textarchive").load(bf.toString).collect()
    assert(rows.count(_.getAs[Boolean]("ok")) == 2) // a.txt AND c.txt
    assert(rows.filter(_.getAs[Boolean]("ok"))
      .map(_.getAs[String]("member_path")).toSet == Set("a.txt", "c.txt"))
    assert(rows.count(!_.getAs[Boolean]("ok")) == 1)
    // forward walk loses c.txt: the stream cannot resync past the error
    val fwd = spark.read.format("textarchive").option("zipcd", "false")
      .load(bf.toString).collect()
    assert(fwd.count(_.getAs[Boolean]("ok")) == 1)
  }

  test("zip64 (>65535 entries): CD scan still splits and matches the forward walk; fsck consistent") {
    val n = 70000 // past the 0xFFFF entry count → JDK writes a ZIP64 EOCD
    val zdir = Files.createTempDirectory("txtar-z64")
    val zf = zdir.resolve("big.zip")
    val z = new ZipOutputStream(new java.io.BufferedOutputStream(
      new FileOutputStream(zf.toFile), 1 << 16))
    (0 until n).foreach { i =>
      SyntheticTextArchive.zipMember(z, s"d/m$i.txt", 1000L + i, payload(s"x$i\n"))
    }
    z.close()
    val split = spark.read.format("textarchive")
      .option("zipsplitbytes", (64 * 1024).toString).load(zf.toString)
    assert(split.rdd.getNumPartitions > 4,
      s"zip64 CD plan fell back: ${split.rdd.getNumPartitions} partition(s)")
    assert(split.count() == n.toLong)
    // spot-match the forward walk on a slice (full except() on 70k tiny
    // rows is wasteful; counts + a deterministic sample pin the law)
    val a = split.where(col("member_path").endsWith("7.txt")).agg(
      count(lit(1)), sum(length(col("text")))).collect()(0)
    val b = spark.read.format("textarchive").option("zipcd", "false")
      .load(zf.toString).where(col("member_path").endsWith("7.txt")).agg(
        count(lit(1)), sum(length(col("text")))).collect()(0)
    assert(a == b)
    val audit = graft.sources.ArchiveAudit.zipFsck(spark, zf.toString).collect()
    assert(audit.length == 1 && audit.head.getAs[Boolean]("ok"),
      s"zip64 fsck failed: ${audit.head.getAs[String]("error")}")
    assert(audit.head.getAs[Long]("central_members") == n.toLong)
    assert(audit.head.getAs[Boolean]("consistent"))
  }

  test("synthetic corpus round-trips the staging table bit-exactly (both walks)") {
    val n = 300
    val glob = SyntheticTextArchive.dataset(n)
    import spark.implicits._
    val expected = spark.range(n)
      .map(i => SyntheticTextArchive.member(i))
      .select(col("path").as("member_path"), col("ext"),
        octet_length(col("text")).cast("long").as("size_bytes"),
        col("mtimeMs").as("mtime_ms"), col("text"))
    val got = spark.read.format("textarchive").load(glob)
      .select("member_path", "ext", "size_bytes", "mtime_ms", "text")
    assert(got.count() == n.toLong)
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }
}
