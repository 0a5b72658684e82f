package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Content-defined chunking dedup ([[Dedup.cdcChunkRows]] /
  * [[Dedup.cdcChunkPairs]]): boundary determinism, the re-synchronization
  * property fixed-width spans lack, and the hot-chunk cap.
  */
class CdcChunkSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

  test("cdcChunkRows: divisor=1 makes every word its own chunk") {
    val got = Dedup.cdcChunkRows(docs((1L, "Alpha beta gamma")), "text",
        "doc_id", divisor = 1)
      .orderBy("chunk_pos")
      .as[(Long, Long, String, Long)].collect()
    assert(got.length == 3)
    assert(got.map(_._2).toSeq == Seq(0L, 1L, 2L))
    assert(got.forall(_._4 == 1L))
    // chunk hash is md5 of the lowercased word itself
    val md5s = Seq("alpha", "beta", "gamma").map(w =>
      java.security.MessageDigest.getInstance("MD5").digest(w.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    assert(got.map(_._3).toSeq == md5s)
  }

  test("cdcChunkRows: chunks tile the document and word counts sum to n") {
    val text = (1 to 100).map(i => s"w$i").mkString(" ")
    val got = Dedup.cdcChunkRows(docs((7L, text)), "text", "doc_id",
        divisor = 4)
      .agg(sum("n_words"), count(lit(1))).as[(Long, Long)].head()
    assert(got._1 == 100L, "chunk word counts must sum to the doc length")
    assert(got._2 > 1L, "divisor=4 over 100 words must produce several chunks")
  }

  test("insertion re-synchronizes: one inserted word leaves most chunks shared") {
    val base = (1 to 120).map(i => s"tok${i * 37 % 101}x$i")
    val edited = (base.take(60) :+ "INSERTED") ++ base.drop(60)
    val d = docs((1L, base.mkString(" ")), (2L, edited.mkString(" ")))
    val pairs = Dedup.cdcChunkPairs(d, "text", "doc_id", divisor = 4,
        minShared = 1L, minJaccPpm = 0L)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(pairs.length == 1)
    val (a, b, shared, na, nb, jacc) = pairs.head
    assert((a, b) == ((1L, 2L)))
    // the edit can touch at most a couple of chunks; everything else
    // re-aligns — the property fixed-width spans lack
    assert(shared >= na - 3, s"shared=$shared of na=$na — no re-sync")
    assert(jacc > 500000L, s"jacc_ppm=$jacc")
  }

  test("fixed-width spans do NOT re-sync on the same edit (the contrast)") {
    val base = (1 to 120).map(i => s"tok${i * 37 % 101}x$i")
    val edited = (base.take(3) :+ "INSERTED") ++ base.drop(3)
    // q73-style fixed 8-word spans of both docs: after an insertion at
    // word 3, every span from the first onward is shifted — near-zero
    // overlap, while CDC chunks re-align after the edit chunk
    val spansA = base.grouped(8).map(_.mkString(" ")).toSet
    val spansB = edited.grouped(8).map(_.mkString(" ")).toSet
    assert((spansA & spansB).size <= 1)
    val d = docs((1L, base.mkString(" ")), (2L, edited.mkString(" ")))
    val cdcShared = Dedup.cdcChunkPairs(d, "text", "doc_id", divisor = 4,
        minShared = 1L, minJaccPpm = 0L)
      .select("shared").as[Long].head()
    assert(cdcShared > 5L, s"CDC shared only $cdcShared chunks")
  }

  test("hot-chunk cap: a boilerplate chunk shared by many docs is pruned") {
    // every doc = identical boilerplate; with maxBucket below the doc
    // count the one hot chunk is dropped and no pairs survive
    val many = (1L to 10L).map(i => (i, "same boilerplate text here")).toSeq
    val capped = Dedup.cdcChunkPairs(many.toDF("doc_id", "text"), "text",
      "doc_id", divisor = 1, maxBucket = 5, minShared = 1L, minJaccPpm = 0L)
    assert(capped.count() == 0L)
    val uncapped = Dedup.cdcChunkPairs(many.toDF("doc_id", "text"), "text",
      "doc_id", divisor = 1, minShared = 1L, minJaccPpm = 0L)
    assert(uncapped.count() == 45L) // all 10·9/2 pairs, jacc = 1e6
    assert(uncapped.select(max("jacc_ppm")).as[Long].head() == 1000000L)
  }

  test("thresholds: minShared and minJaccPpm both gate") {
    val d = docs((1L, "a b c d e f g h"), (2L, "a b c d e f g h"),
      (3L, "completely different words entirely unrelated"))
    val pairs = Dedup.cdcChunkPairs(d, "text", "doc_id", divisor = 4,
        minShared = 1L, minJaccPpm = 900000L)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
  }
}
