package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Arbitrary-alignment exact-substring dedup
  * ([[Dedup.exactSubstringSpans]]): hand cases pinning the semantics —
  * threshold boundary, alignment independence (including the
  * straddling case fixed-width span dedup provably misses), multiple
  * runs at one alignment (the min-anchor trap), interval merging, and
  * the cross-doc-only contract.
  */
class ExactSubstringSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private def spans(df: org.apache.spark.sql.DataFrame,
      minLen: Int = 50, k: Int = 25): Map[Long, Seq[(Int, Int)]] =
    Dedup.exactSubstringSpans(df, "text", "doc_id", minLen, k)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getInt(1), r.getInt(2))).sorted.toSeq)
      .toMap

  // 60 chars of shared content, unique elsewhere
  private val shared = "the quick brown fox jumps over the lazy dog near the old oak"

  test("misaligned shared run >= minLen is found at exact boundaries; < minLen is not") {
    val a = s"AAAA${shared}BBBBBBBBBB"          // run at [4, 4+len)
    val b = s"CCCCCCCCCCCCC${shared}D"          // run at [13, 13+len)
    val got = spans(docs(1L -> a, 2L -> b))
    assert(got(1L) == Seq((4, 4 + shared.length)))
    assert(got(2L) == Seq((13, 13 + shared.length)))
    // same corpus, threshold just above the run length: nothing
    assert(spans(docs(1L -> a, 2L -> b),
      minLen = shared.length + 1, k = 25).isEmpty)
  }

  test("straddling duplicate invisible to fixed-width span dedup is caught") {
    // q73-style span dedup tiles docs into fixed 8-word spans from
    // position 0: a shared run occupying words 4..11 of doc A but words
    // 0..7 of doc B never matches span-for-span (A's copy straddles its
    // span boundary at word 8). Character-level arbitrary alignment
    // does not care.
    val run = "alpha bravo charlie delta echo foxtrot golf hotel" // 8 words, 49 chars
    val a = s"one two three four $run extra tail words here"
    val b = s"$run trailing content that is entirely different"
    // q73's spanDedup at 8-word spans sees no duplicate span pair:
    val q73 = Cleaning.spanDedup(docs(10L -> a, 20L -> b), "text", "doc_id",
      spanWords = 8)
    // both docs reassemble unchanged — no span was deduped away
    val kept = q73.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kept(10L) == a && kept(20L) == b)
    // the substring operator finds the run (49 chars + the space joining
    // it to identical neighbors is not shared, so threshold 40)
    val got = spans(docs(10L -> a, 20L -> b), minLen = 40, k = 20)
    val aStart = a.indexOf(run)
    assert(got(10L).exists { case (s, e) => s <= aStart && e >= aStart + run.length })
    assert(got(20L).exists { case (s, e) => s == 0 && e >= run.length })
  }

  test("two separate runs at the SAME alignment diff are both found") {
    // both runs sit at identical offsets in both docs (diff = 0), so a
    // one-anchor-per-(pair, diff) shortcut would drop the second run
    val run1 = "first shared run with sufficiently many characters in it ok"
    val run2 = "second shared run also long enough to clear the threshold yes"
    val mid1 = "XXXXXXXXXXXXXXXXXXXX"
    val mid2 = "YYYYYYYYYYYYYYYYYYYY"
    val a = s"$run1$mid1$run2"
    val b = s"$run1$mid2$run2"
    val got = spans(docs(1L -> a, 2L -> b))
    assert(got(1L).size == 2, got(1L).toString)
    assert(got(1L).head == (0, run1.length))
    assert(got(1L)(1) == (run1.length + 20, run1.length + 20 + run2.length))
    assert(got(2L) == got(1L)) // same offsets by construction
  }

  test("overlapping runs from different partners merge into one interval") {
    val base = "abcdefghij" * 12 // 120 chars
    val a = base
    val b = "PPPPP" + base.substring(0, 70)   // shares a[0,70)
    val c = base.substring(40) + "QQQQQ"      // shares a[40,120)
    val got = spans(docs(1L -> a, 2L -> b, 3L -> c))
    // doc 1's two spans [0,70) and [40,120) merge into [0,120)...
    // except base is periodic: self-similar alignments extend further.
    // All that is pinned here: doc 1 is fully covered by ONE interval.
    assert(got(1L).size == 1)
    assert(got(1L).head == (0, 120))
  }

  test("same-doc internal repeats are out of scope; unrelated docs emit nothing") {
    val rep = "repeated block long enough to pass fifty characters easily"
    val a = s"$rep ... $rep"   // internal repeat only
    val b = "completely different content with no overlap whatsoever here"
    assert(spans(docs(1L -> a, 2L -> b)).isEmpty)
  }

  test("non-ASCII text extends by code points") {
    val run = "καλημέρα κόσμε " * 4 + "shared ünïcode tail §" // > 50 code points
    val a = s"AA$run"
    val b = s"BBBB$run"
    val got = spans(docs(1L -> a, 2L -> b), minLen = 50, k = 25)
    assert(got(1L) == Seq((2, 2 + run.length)))
    assert(got(2L) == Seq((4, 4 + run.length)))
  }

  test("exact-copy docs collapse to full-document spans; copies inherit cross-text runs") {
    val base = s"unique prefix material $shared and a unique tail section"
    val other = s"ZZZZ$shared====================="
    // doc 1 and 2 are EXACT copies; doc 3 shares only the middle run
    val got = spans(docs(1L -> base, 2L -> base, 3L -> other))
    assert(got(1L) == Seq((0, base.length))) // full-doc: an exact copy exists
    assert(got(2L) == Seq((0, base.length)))
    val oStart = other.indexOf(shared)
    assert(got(3L) == Seq((oStart, oStart + shared.length)))
    // a short exact-dup pair (< minLen) emits nothing
    assert(spans(docs(1L -> "tiny copy", 2L -> "tiny copy")).isEmpty)
  }

  test("excision removes exactly the duplicated spans, keeps everything else") {
    val a = s"KEEP-HEAD ${shared} KEEP-TAIL"
    val b = s"OTHER ${shared} OTHER2"
    val out = Dedup.exciseSubstringDups(docs(1L -> a, 2L -> b),
      "text", "doc_id").orderBy("doc_id").collect()
    // the shared run extends one space left/right of `shared` (both
    // docs have ' ' on each side), so the cut is " <shared> "
    val cut = s" $shared "
    assert(out(0).getString(1) == "KEEP-HEAD" + "KEEP-TAIL")
    assert(out(0).getLong(2) == ("KEEP-HEAD" + "KEEP-TAIL").length.toLong)
    assert(out(0).getLong(3) == cut.length.toLong)
    assert(out(1).getString(1) == "OTHER" + "OTHER2")
    // a doc with no duplication passes through verbatim
    val solo = Dedup.exciseSubstringDups(
      docs(1L -> "nothing shared here at all", 2L -> "different entirely"),
      "text", "doc_id").orderBy("doc_id").collect()
    assert(solo(0).getString(1) == "nothing shared here at all")
    assert(solo(0).getLong(3) == 0L)
    // exact copies excise to empty
    val dup = s"$shared$shared" // 120 chars, fully duplicated via its copy
    val full = Dedup.exciseSubstringDups(docs(1L -> dup, 2L -> dup),
      "text", "doc_id").collect()
    full.foreach { r =>
      assert(r.getString(1) == "" && r.getLong(2) == 0L)
    }
  }

  test("stats rollup shape") {
    val a = s"AAAA${shared}BBBBBBBBBB"
    val b = s"CCCCCCCCCCCCC${shared}D"
    val row = Dedup.exactSubstringStats(docs(1L -> a, 2L -> b),
      "text", "doc_id").orderBy("doc_id").collect().head
    assert(row.getLong(0) == 1L)
    assert(row.getLong(1) == 1L)                     // n_spans
    assert(row.getLong(2) == shared.length.toLong)   // n_dup_chars
    assert(row.getLong(3) == 4L)                     // first_start
    assert(row.getLong(4) == shared.length.toLong)   // max_span
  }
}
