package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank fixed point of a 2-cycle is uniform") {
    val nodes = Seq(0L, 1L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 0L)).toDF("src", "tgt")
    val r = Graph.pageRank(nodes, "id", edges, iters = 7)
      .as[(Long, Double)].collect().toMap
    // uniform is the exact fixed point: 0.15/2 + 0.85*0.5 = 0.5
    assert(r(0L) == 0.5 && r(1L) == 0.5)
  }

  test("dangling mass is redistributed — total rank stays 1") {
    // 0 -> 1 -> 2, node 2 dangling
    val nodes = Seq(0L, 1L, 2L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("src", "tgt")
    val r = Graph.pageRank(nodes, "id", edges, iters = 5)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-6, s"sum=${r.values.sum}")
    // the chain accumulates: 2 receives everything 1 had plus its share
    assert(r(2L) > r(1L) && r(1L) > r(0L))
  }

  test("personalizedPageRank: mass concentrates near the seed, sums to 1") {
    // ring 0→1→2→3→4→5→0 plus a chord 0→3; seed {0}
    val nodes = (0L to 5L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (5L, 0L), (0L, 3L)).toDF("src", "tgt")
    val r = Graph.personalizedPageRank(nodes, "id", edges,
      Seq(0L).toDF("id"), "id", iters = 20)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-6, s"sum=${r.values.sum}")
    // the seed outranks everything: all restart mass lands on it
    assert(r(0L) == r.values.max)
    // link distance from the seed orders the ring tail monotonically
    assert(r(1L) > r(2L) && r(4L) > r(5L))
    // node 3 takes two inbound paths (ring + chord) — above its ring
    // predecessor's successor share alone
    assert(r(3L) > r(2L))
    // uniform pageRank on the same graph would NOT put the max at 0
    val u = Graph.pageRank(nodes, "id", edges, iters = 20)
      .as[(Long, Double)].collect().toMap
    assert(u(3L) > u(0L), "fixture must distinguish PPR from uniform PR")
  }

  test("personalizedPageRank: dangling mass restarts at the seeds") {
    // 0 → 1 → 2 with 2 dangling; seed {0}: every drop of rank that
    // falls off node 2 re-enters at 0, so 0 keeps the largest share
    val nodes = Seq(0L, 1L, 2L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("src", "tgt")
    val r = Graph.personalizedPageRank(nodes, "id", edges,
      Seq(0L).toDF("id"), "id", iters = 30)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-6, s"sum=${r.values.sum}")
    assert(r(0L) > r(1L) && r(1L) > r(2L))
  }

  test("hits: star hub and authorities separate; weak component decays") {
    // star 0→{1,2,3} plus a faint chain 10→11
    val nodes = Seq(0L, 1L, 2L, 3L, 10L, 11L).toDF("id")
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (10L, 11L))
      .toDF("src", "tgt")
    val r = Graph.hits(nodes, "id", edges)
      .as[(Long, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    // the star: 0 is the pure hub (max-normalized to 1), its targets
    // are the pure authorities, and the roles never mix
    assert(r(0L) == ((0.0, 1.0)))
    Seq(1L, 2L, 3L).foreach(i => assert(r(i) == ((1.0, 0.0))))
    // the chain is real but strictly weaker, and decays each round
    // relative to the star (max norm is global)
    assert(r(10L)._2 > 0 && r(10L)._2 < r(0L)._2)
    assert(r(11L)._1 > 0 && r(11L)._1 < r(1L)._1)
  }

  test("pseudoEdges are deterministic, self-loop-free, in range") {
    val nodes = spark.range(50).toDF("doc_id")
    val e1 = Graph.pseudoEdges(nodes, "doc_id", 50).as[(Long, Long)]
      .collect().toSet
    val e2 = Graph.pseudoEdges(nodes, "doc_id", 50).as[(Long, Long)]
      .collect().toSet
    assert(e1 == e2)
    assert(e1.forall { case (s, t) => s != t && t >= 0 && t < 50 })
    assert(e1.groupBy(_._1).forall(_._2.size <= 3))
  }

  private def triangles(edges: (Long, Long)*): Long =
    Graph.triangleCount(edges.toSeq.toDF("src", "tgt")).as[Long].head()

  test("triangleCount: exact counts on hand graphs") {
    // one triangle, noisy encoding: reversed direction + parallel edge
    // + self loop must all collapse away
    assert(triangles((1L, 2L), (3L, 2L), (1L, 3L), (2L, 1L), (3L, 3L)) == 1L)
    // square without a diagonal: zero; with one diagonal: two
    assert(triangles((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)) == 0L)
    assert(triangles((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)) == 2L)
    // K4: exactly C(4,3) = 4
    assert(triangles((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)) == 4L)
  }

  test("modularity: hand Q on two triangles joined by a bridge") {
    // clusters A = {1,2,3}, B = {4,5,6}; m = 7 edges (3+3+bridge 3-4).
    // e_A = e_B = 3; d_A = d_B = 7 (degrees 2,2,3).
    // q_num = 4·7·3 − 49 = 35 per cluster; Q_c = 35/196 ≈ 0.17857 →
    // q_ppm = floor(178571.42…) = 178571; total Q ≈ 0.357 (real structure)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("src", "tgt")
    val labels = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"), (5L, "B"),
      (6L, "B")).toDF("id", "cluster")
    val got = Graph.modularity(edges, labels)
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("A", 3L, 7L, 35L, 178571L), ("B", 3L, 7L, 35L, 178571L)))
  }

  test("modularity: single-cluster labeling scores zero; unlabeled nodes get a null row") {
    // everything in one cluster: e_c = m, d_c = 2m → q_num = 4m² − 4m²
    // = 0 exactly
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "tgt")
    val one = Graph.modularity(edges,
      Seq((1L, "x"), (2L, "x"), (3L, "x")).toDF("id", "cluster"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(one == Seq(("x", 3L, 6L, 0L, 0L)))
    // node 3 unlabeled: its endpoint mass lands on the null-cluster row
    // instead of silently inflating x's share
    val part = Graph.modularity(edges,
        Seq((1L, "x"), (2L, "x")).toDF("id", "cluster"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(2))).toMap
    assert(part(Some("x")) == 4L && part(None) == 2L)
  }

  test("louvainMoves: bridged triangles converge to the triangle communities") {
    // hand-traced schedule (scaladoc): r1 moves odd ids (1→com2, 3→com1,
    // 5→com6), r2 moves even ids (4 joins {5,6}), r3 pulls 3 into {1,2} —
    // final communities are exactly the two triangles, labeled by the
    // deterministic min-score-tie ids 2 and 6; round 4 is a fixed point
    val nodes = (1L to 6L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("src", "tgt")
    val r3 = Graph.louvainMoves(nodes, "id", edges, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(r3 == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 6L, 5L -> 6L, 6L -> 6L))
    val r4 = Graph.louvainMoves(nodes, "id", edges, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(r4 == r3, "round 4 must be a fixed point on the settled labels")
    // the refinement beats the singleton start: Q(triangles) > 0
    val q = Graph.modularity(edges, Graph.louvainMoves(nodes, "id", edges))
      .agg(sum("q_ppm")).as[Long].head()
    assert(q == 2 * 178571L, "refined labels reach the hand-computed Q")
  }

  test("louvainMoves: isolated node keeps its singleton community") {
    val nodes = Seq(1L, 2L, 9L).toDF("id")
    val edges = Seq((1L, 2L)).toDF("src", "tgt")
    val got = Graph.louvainMoves(nodes, "id", edges, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(got(9L) == 9L)
    assert(got(1L) == got(2L), "an edge pair merges")
  }

  test("kCore: K4 with a pendant chain keeps exactly the clique at k=3") {
    // 0-1-2-3 complete (deg 3 each), chain 3-4-5 hangs off it. Peeling
    // at k=3 must remove 5 (deg 1), THEN 4 (deg 1 after) — a node whose
    // raw degree passes but whose support peels away — keeping the K4.
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val edges = (k4 ++ Seq((3L, 4L), (4L, 5L))).toDF("src", "tgt")
    val got = Graph.kCore(edges, k = 3).as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("kCore: k above the degeneracy empties the core; k=1 keeps all") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "tgt")
    assert(Graph.kCore(edges, k = 3).isEmpty)
    assert(Graph.kCore(edges, k = 1).count() == 3)
  }

  test("kCore fails loudly when maxRounds is below the peel depth") {
    // chain of 6: peeling at k=2 eats one node per end per round and
    // needs 3 rounds to empty — maxRounds=1 must throw, not return
    val chain = (0L to 5L).sliding(2).map(s => (s(0), s(1))).toSeq
    val e = intercept[IllegalStateException] {
      Graph.kCore(chain.toDF("src", "tgt"), k = 2, maxRounds = 1).count()
    }
    assert(e.getMessage.contains("maxRounds"))
  }

  test("ancestorClosure: hand chain with branch, exact pairs + distances") {
    //   5 → 2 → 1 → 0,  4 → 2  (child, parent) rows
    val par = Seq((5L, 2L), (4L, 2L), (2L, 1L), (1L, 0L)).toDF("c", "p")
    val got = Graph.ancestorClosure(par, "c", "p")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (5L, 2L, 1L), (5L, 1L, 2L), (5L, 0L, 3L),
      (4L, 2L, 1L), (4L, 1L, 2L), (4L, 0L, 3L),
      (2L, 1L, 1L), (2L, 0L, 2L), (1L, 0L, 1L)))
  }

  test("ancestorClosure: depth-9 chain converges (log-round doubling)") {
    val par = (1L to 9L).map(i => (i, i - 1)).toDF("c", "p")
    val n = Graph.ancestorClosure(par, "c", "p").count()
    assert(n == (1 to 9).sum) // node i has i ancestors
  }

  test("ancestorClosure: cycle fails loudly instead of spinning") {
    val par = Seq((0L, 1L), (1L, 0L)).toDF("c", "p")
    val e = intercept[IllegalStateException] {
      Graph.ancestorClosure(par, "c", "p", maxDepth = 8).count()
    }
    assert(e.getMessage.contains("cycle"))
  }

  test("labelPropagation: spreads, majority wins, seeds freeze, " +
      "unreached stay null") {
    // path 0—1—2—3—4 with seeds 0→(label 7) and 4→(label 2);
    // isolated node 9 must stay null
    val nodes = Seq(0L, 1L, 2L, 3L, 4L, 9L).toDF("id")
    val seeds = Seq((0L, 7L), (4L, 2L)).toDF("id", "label")
    val und = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "tgt")
    val got = Graph.labelPropagation(nodes, "id", seeds, "id", "label",
      edges, iters = 3).as[(Long, Option[Long])].collect().toMap
    assert(got(0L).contains(7L) && got(4L).contains(2L), "seeds frozen")
    assert(got(1L).contains(7L) && got(3L).contains(2L), "round-1 spread")
    // node 2 hears 7 (from 1) and 2 (from 3) in round 2: tie on count,
    // smaller label wins
    assert(got(2L).contains(2L), "count tie broken by smaller label")
    assert(got(9L).isEmpty, "unreached node keeps null")
  }

  test("labelPropagation: assigned labels never flip on later rounds") {
    // triangle 1-2-3 seeded 1→5; node 4 attached to 2 AND to a later
    // heavy cluster of 9s — once 4 takes 5 in round 2 it must keep it
    val nodes = (1L to 7L).toDF("id")
    val seeds = Seq((1L, 5L), (5L, 9L), (6L, 9L), (7L, 9L)).toDF("id", "label")
    val und = Seq((1L, 2L), (2L, 4L), (4L, 5L), (4L, 6L), (4L, 7L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "tgt")
    val got = Graph.labelPropagation(nodes, "id", seeds, "id", "label",
      edges, iters = 1).as[(Long, Option[Long])].collect().toMap
    // after round 1, node 4 already hears three 9s vs zero 5s
    assert(got(4L).contains(9L))
    val got3 = Graph.labelPropagation(nodes, "id", seeds, "id", "label",
      edges, iters = 3).as[(Long, Option[Long])].collect().toMap
    assert(got3(4L).contains(9L), "frozen after first assignment")
    assert(got3(2L).contains(5L))
  }

  test("subtreeRollup: sums cover self + all descendants, gaps stop chains") {
    // tree: 1 ← 2 ← 4;  3 is isolated (no parent row, nobody's parent)
    val par = Seq((2L, 1L), (4L, 2L)).toDF("c", "p")
    val facts = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))
      .toDF("id", "v")
    val rows = Graph.subtreeRollup(par, "c", "p", facts, "id", Seq("v"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows(1L) == ((3L, 70L))) // self + 2 + 4
    assert(rows(2L) == ((2L, 60L)))
    assert(rows(3L) == ((1L, 30L))) // isolated: itself only
    assert(rows(4L) == ((1L, 40L)))
  }

  test("featurePropagate: hand means over 2 rounds, no-in-edge carry, dup edge collapsed") {
    import spark.implicits._
    val nodes = Seq((1L, 10L), (2L, 20L), (3L, 32L)).toDF("nid", "feat")
    // 2→3 is duplicated: a multi-edge must not double-weight node 2
    val edges = Seq((1L, 3L), (2L, 3L), (2L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val got = Graph.featurePropagate(nodes, "nid", "feat", edges,
        "src", "dst", rounds = 2)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // r1: f(3) = (10+20) div 2 = 15; f(1) = 32; f(2) carries (no in-edge)
    // r2: f(3) = (32+20) div 2 = 26; f(1) = 15; f(2) = 20
    assert(got(1L) == ((10L, 15L)))
    assert(got(2L) == ((20L, 20L)))
    assert(got(3L) == ((32L, 26L)))
  }

  test("bfsDistances: min hop counts, shortcut wins, unreached absent") {
    import spark.implicits._
    // chain 1→2→3→4→5 plus shortcut 1→3: dist(3) must be 1, not 2
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L))
      .toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val got = Graph.bfsDistances(seeds, "node", edges, "src", "dst",
        maxHops = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 3L))
    // maxHops cuts the horizon: node 5 absent at 2 hops, no sentinel
    val cut = Graph.bfsDistances(seeds, "node", edges, "src", "dst",
        maxHops = 2)
      .as[(Long, Long)].collect().toMap
    assert(!cut.contains(5L) && cut(4L) == 2L)
    // multi-source: nearest seed wins
    val two = Graph.bfsDistances(Seq(1L, 4L).toDF("node"), "node", edges,
        "src", "dst", maxHops = 3)
      .as[(Long, Long)].collect().toMap
    assert(two(4L) == 0L && two(5L) == 1L && two(3L) == 1L)
  }

  test("featurePropagate: negative mean truncates toward zero (both engines)") {
    import spark.implicits._
    val nodes = Seq((10L, -1L), (11L, -2L), (12L, 0L)).toDF("nid", "feat")
    val edges = Seq((10L, 12L), (11L, 12L)).toDF("src", "dst")
    val got = Graph.featurePropagate(nodes, "nid", "feat", edges,
        "src", "dst", rounds = 1)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got(12L) == -1L, "(-3) div 2 must truncate to -1, not floor to -2")
  }

  private def ra(maxDeg: Int, edges: (Long, Long)*) =
    Graph.resourceAllocation(edges.toDF("src", "tgt"), maxDeg)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap

  test("resourceAllocation: path predicts its endpoints at 1/deg(mid)") {
    import spark.implicits._
    // 1—2—3: only candidate (1,3) via z=2, deg(2)=2 → 500000
    assert(ra(10000, (1L, 2L), (2L, 3L)) ==
      Map((1L, 3L) -> ((1L, 500000L))))
  }

  test("resourceAllocation: square diagonals sum both common neighbors") {
    import spark.implicits._
    // 1—2—3—4—1: diagonals (1,3) and (2,4), each via two deg-2 pivots
    val got = ra(10000, (1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(got == Map((1L, 3L) -> ((2L, 1000000L)),
      (2L, 4L) -> ((2L, 1000000L))))
  }

  test("resourceAllocation: known links are never predicted") {
    import spark.implicits._
    // triangle: every common-neighbor pair is already an edge
    assert(ra(10000, (1L, 2L), (2L, 3L), (1L, 3L)).isEmpty)
  }

  test("resourceAllocation: hub cap drops the pivot, direction collapses") {
    import spark.implicits._
    // star 0—{1,2,3,4} with mixed directions/dupes: C(4,2) pairs at
    // 10⁶ div 4; capping maxDeg=3 removes the only pivot
    val es = Seq((0L, 1L), (2L, 0L), (0L, 3L), (4L, 0L), (1L, 0L))
    val got = ra(10000, es: _*)
    assert(got.size == 6 && got((1L, 2L)) == ((1L, 250000L)))
    assert(ra(3, es: _*).isEmpty)
  }

  test("cooccurrenceProjection: shared-context weights, cap kills the hub") {
    import spark.implicits._
    // contexts 1 and 2 both hold items {a, b}; context 3 holds {a, c}
    val rows = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"))
    val got = Graph.cooccurrenceProjection(rows.toDF("ctx", "item"),
      "ctx", "item", capPerContext = 32, topPairs = 50)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map(("a", "b") -> 2L, ("a", "c") -> 1L), s"$got")
    // cap = 2 on a 3-item hub context: only the 2 strongest (by
    // incidence count, id-pinned) survive — the pair fan-out is bounded
    val hub = Seq((9L, "x"), (9L, "x"), (9L, "y"), (9L, "y"), (9L, "z"))
    val capped = Graph.cooccurrenceProjection(hub.toDF("ctx", "item"),
      "ctx", "item", capPerContext = 2, topPairs = 50)
      .as[(String, String, Long)].collect().toSeq
    assert(capped == Seq(("x", "y", 1L)), s"$capped")
  }

  test("assortativity: star = -1, regular ring = null") {
    // star K1,3: every symmetrized edge pairs deg 3 with deg 1 →
    // m=6, Sxy=18, Sx=Sy=12, Sx2=Sy2=30 → r = -36/36 = -1
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "tgt")
    val got = Graph.assortativity(star)
      .as[(Long, Option[Double])].head()
    assert(got == ((6L, Some(-1.0))), s"$got")
    // 4-cycle: all degrees 2 → zero degree variance → null
    val ring = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
      .toDF("src", "tgt")
    assert(Graph.assortativity(ring)
      .as[(Long, Option[Double])].head()._2.isEmpty)
  }

  test("adamicAdar: square graph — diagonals predicted, ln-weighted, edges excluded") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "tgt")
    val got = Graph.adamicAdar(e)
      .as[(Long, Long, Long, Long)].collect().toSet
    // diagonals (1,3) and (2,4) share two deg-2 corners each:
    // term = round(1e6 / ln 2) = 1442695, twice
    assert(got == Set((1L, 3L, 2L, 2885390L), (2L, 4L, 2L, 2885390L)))
  }

  test("richClub: triangle + pendant — full club at k=1, degenerate at k=2") {
    // triangle {1,2,3} + pendant 4-1: degrees 1:3, 2:2, 3:2, 4:1
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L)).toDF("src", "tgt")
    val got = Graph.richClub(e, maxK = 3)
      .as[(Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    // k=1: {1,2,3} fully connected → 6 directed edges / (3·2) = 1.0
    assert(got(1L) == ((1L, 3L, 6L, Some(1000000L))), s"${got(1L)}")
    // k=2: only node 1 qualifies → N<2 → null
    assert(got(2L) == ((2L, 1L, 0L, None)), s"${got(2L)}")
    assert(got(3L) == ((3L, 0L, 0L, None)), s"${got(3L)}")
  }

  test("localClustering: triangle corners vs pendant") {
    // triangle {1,2,3} + pendant 3-4: each corner owns the 1 triangle
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "tgt")
    val got = Graph.localClustering(e)
      .as[(Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    // deg-2 corners: 2000·1 div 2 = 1000 (all neighbor pairs closed)
    assert(got(1L) == ((1L, 2L, 1L, Some(1000L))), s"${got(1L)}")
    assert(got(2L) == ((2L, 2L, 1L, Some(1000L))), s"${got(2L)}")
    // node 3: deg 3 → 2000 div 6 = 333
    assert(got(3L) == ((3L, 3L, 1L, Some(333L))), s"${got(3L)}")
    // pendant: degree 1 → null coefficient, zero triangles
    assert(got(4L) == ((4L, 1L, 0L, None)), s"${got(4L)}")
  }
}
