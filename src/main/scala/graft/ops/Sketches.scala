package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic cardinality sketches. Spark ships HLL++
  * (`approx_count_distinct`), but its estimate is engine-specific — no
  * cross-engine oracle can gate it. KMV (k minimum values) gives the
  * same one-pass, mergeable, bounded-memory shape with arithmetic both
  * engines reproduce exactly: k smallest 32-bit hashes per group, and
  * the classic estimator `(k-1) · 2³² / kth_min` — one integer product
  * and one IEEE division, bit-identical everywhere.
  *
  * Scale shape: the candidate set is cut to ≤ salts·k rows per group by
  * a two-phase salted min-k (same trick as [[Web.domainDocCap]]) before
  * the exact per-group rank, so a mega-group never lands one task —
  * state is O(groups · salts · k), the sketch contract. Groups with
  * fewer than k distinct values return their EXACT count (the sketch
  * degenerates to a distinct set — standard KMV behavior).
  */
object Sketches {

  /** Per-group distinct-count estimate: (group, n_kept, est) where
    * `n_kept` = min(k, true distinct) and `est` is exact below k,
    * estimated above it (rounded to 2 d.p.).
    */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64, salts: Int = 16): DataFrame = {
    // 32-bit uniform hash of the VALUE — distinct values, not rows,
    // drive the sketch
    val h32 = graft.functions.HashExpressions.md5Prefix64(col(valueCol).cast("string"), 8)
    val hashes = df.select(col(groupCol).as("g"), h32.as("h")).distinct()
    val pre = Window.partitionBy(col("g"), col("_salt")).orderBy("h")
    val fin = Window.partitionBy(col("g")).orderBy("h")
    val kept = hashes
      .withColumn("_salt", pmod(hash(col("h")), lit(salts)))
      .withColumn("_pr", row_number().over(pre))
      .where(col("_pr") <= k) // any global top-k row survives its salt's top-k
      .withColumn("_r", row_number().over(fin))
      .where(col("_r") <= k)
    kept.groupBy("g")
      .agg(count(lit(1)).as("n_kept"), max("h").as("kth"))
      .select(col("g").as(groupCol), col("n_kept"),
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(round(lit((k - 1) * 4294967296.0) / col("kth"), 2))
          .as("est"))
  }

  /** Per-group HyperLogLog distinct estimate with every step exact and
    * cross-engine reproducible — the register table is pure integer
    * arithmetic on md5 bits, and the estimate is ONE IEEE division at
    * the very edge.
    *
    * Construction (classic Flajolet HLL, determinized):
    *  - 60-bit value hash from 15 md5 hex chars (15, not 16: the full
    *    64-bit value exceeds signed int64 on the hex-cast path BOTH
    *    engines use); bucket = low `log2(buckets)` bits; rank =
    *    leading-zero count of the remaining bits + 1, computed as
    *    `restBits + 1 − length(ltrim(bin(rest), '0'))` — `bin` renders
    *    minimally in Spark and DuckDB and the ltrim makes the rest-zero
    *    case fall out (empty string, length 0). Ranks cap at `maxRank`
    *    so the scaled sum below stays in int64.
    *  - registers: `groupBy(bucket).max(rank)` — the textbook mergeable
    *    aggregate; map-side combine collapses each partition to ≤
    *    groups·buckets rows, the sketch's whole point at 100 TB.
    *  - Σ 2^(−Mⱼ) is kept EXACT by scaling: `z_scaled = Σ 2^(maxRank −
    *    Mⱼ)` (absent registers contribute the M=0 term 2^maxRank) is an
    *    exact BIGINT — powers of two, no float summation order to
    *    disagree on. The raw estimate `α·m²·2^maxRank / z_scaled` is
    *    then one fixed-order double division, rounded to 2 d.p.
    *
    * Returns (group, n_registers, z_scaled, raw_est): the two integers
    * hash-compare exactly; the single rounded double is the estimate.
    * Small/large-range bias corrections are left to the caller — they
    * branch on libm `ln`, which is exactly the cross-engine
    * nondeterminism this family avoids (SURVEY float discipline).
    */
  def hllDistinct(df: DataFrame, groupCol: String, valueCol: String,
      buckets: Int = 1024, maxRank: Int = 40): DataFrame =
    hllEstimate(hllRegisters(df, groupCol, valueCol, buckets, maxRank),
      buckets, maxRank)
      .withColumnRenamed("g", groupCol)

  /** The HLL register table for [[hllDistinct]]: one (g, b, m) row per
    * occupied register. First-class because registers are the MERGEABLE
    * form — sketch sub-corpora independently, [[hllMergeRegisters]]
    * their tables, estimate once; union never rescans either side (the
    * property that makes the sketch a 100 TB citizen: per-partition /
    * per-day register tables combine by max, exactly like any partial
    * aggregate).
    */
  def hllRegisters(df: DataFrame, groupCol: String, valueCol: String,
      buckets: Int = 1024, maxRank: Int = 40): DataFrame = {
    require(buckets >= 16 && (buckets & (buckets - 1)) == 0,
      "buckets must be a power of two >= 16")
    require(maxRank >= 16 && maxRank <= 50, "maxRank in [16, 50]")
    val bucketBits = (math.log(buckets) / math.log(2)).round.toInt
    val restBits = 60 - bucketBits
    // 60-bit hash = 15 md5 hex chars; low bits pick the bucket so the
    // rank bits (the high end of the remainder) are independent of it
    val h = graft.functions.HashExpressions.md5Prefix64(col(valueCol).cast("string"), 15)
    val bucket = pmod(col("h"), lit(buckets.toLong))
    val rest = shiftrightunsigned(col("h"), bucketBits)
    val rank = least(
      lit(restBits + 1)
        - length(expr("trim(LEADING '0' FROM bin(rest))")),
      lit(maxRank))
    df.select(col(groupCol).as("g"), h.as("h"))
      .withColumn("b", bucket)
      .withColumn("rest", rest)
      .withColumn("r", rank)
      .groupBy("g", "b").agg(max(col("r")).as("m"))
  }

  /** Merge two register tables: per-register max — associative,
    * commutative, idempotent, so merge(regs(A), regs(B)) IS
    * regs(A ∪ B) exactly (not approximately; the estimate-level union
    * law in SketchesSpec is exact equality).
    */
  def hllMergeRegisters(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("g", "b").agg(max(col("m")).as("m"))

  /** Sliding-window distinct count from per-hour register tables — the
    * "distinct users, trailing 24 h, every hour" dashboard verb WITHOUT
    * rescanning any hour's raw data: each register row is exploded to
    * the `windowHours` window-end hours it serves (register mergeability
    * makes the union a per-bucket max), per (g, hour) registers are
    * estimated with the standard formula, and only hours that actually
    * appear in `regs` emit a row. Input `regs` is `(g, hr, b, m)` —
    * [[hllRegisters]] output keyed by (group, hour); `g` must not
    * contain `'|'` (used as the composite separator). Cost is
    * O(registers × windowHours) — linear in occupied registers,
    * independent of raw row count: the property that makes hourly
    * sketch tables the 100 TB answer to sliding cardinality.
    */
  def hllSlidingEstimate(regs: DataFrame, windowHours: Int,
      buckets: Int = 1024, maxRank: Int = 40): DataFrame = {
    require(windowHours >= 1 && windowHours <= 168,
      "windowHours in [1, 168]")
    // the register table feeds BOTH the window fan-out and the emitted-
    // hours frame; left lazy each reference re-runs the caller's whole
    // register build (a data-sized scan+aggregate). It is bounded at
    // groups × hours × buckets rows, so the lazy materialize-once is
    // scale-free — and the EXPLICIT pinned spread keeps the windowHours×
    // explode off a single AQE-coalesced partition (register rows are
    // tiny in bytes, heavy in fan-out — round-15)
    val r = regs
      .repartition(regs.sparkSession.conf
        .get("spark.sql.shuffle.partitions").toInt)
      .localCheckpoint(false)
    val served = r
      .withColumn("hr_out",
        explode(sequence(col("hr"), col("hr") + lit(windowHours - 1))))
      .groupBy("g", "hr_out", "b").agg(max(col("m")).as("m"))
    val hours = r.select(col("g"), col("hr").as("hr_out")).distinct()
    val windowed = served.join(hours, Seq("g", "hr_out"), "left_semi")
    hllEstimate(windowed.select(
        concat(col("g"), lit("|"), col("hr_out")).as("g"),
        col("b"), col("m")), buckets, maxRank)
      .select(substring_index(col("g"), "|", 1).as("g"),
        expr("cast(substring_index(g, '|', -1) as long)").as("hr"),
        col("n_registers"), col("z_scaled"), col("raw_est"))
  }

  /** Estimate from a register table (see [[hllDistinct]] for the
    * construction and the scaled-integer harmonic sum).
    */
  def hllEstimate(regs: DataFrame, buckets: Int = 1024,
      maxRank: Int = 40): DataFrame = {
    val alpha = 0.7213 / (1.0 + 1.079 / buckets) // standard HLL α for m ≥ 128
    // z_scaled = Σ_occupied 2^(maxRank−M) + (buckets − occupied)·2^maxRank
    regs
      .withColumn("term", expr(s"shiftleft(CAST(1 AS BIGINT), $maxRank - m)"))
      .groupBy("g")
      .agg(count(lit(1)).as("n_registers"), sum(col("term")).as("_zocc"),
        max(col("m")).as("_mx"), min(col("m")).as("_mn"))
      // a register table built under different (buckets, maxRank) than
      // the estimate's would silently skew z_scaled (the absent-register
      // term uses the wrong bucket count / scale) — fail by name instead
      .withColumn("n_registers",
        when(col("n_registers") > buckets || col("_mx") > maxRank
            || col("_mn") < 1,
          raise_error(concat(lit("hllEstimate: register table does not " +
            s"fit (buckets=$buckets, maxRank=$maxRank): g="),
            col("g").cast("string"), lit(", n_registers="),
            col("n_registers").cast("string"), lit(", rank range ["),
            col("_mn").cast("string"), lit(", "), col("_mx").cast("string"),
            lit("]")))).otherwise(col("n_registers")))
      .select(col("g"), col("n_registers"),
        (col("_zocc") + (lit(buckets.toLong) - col("n_registers"))
          * expr(s"shiftleft(CAST(1 AS BIGINT), $maxRank)")).as("z_scaled"))
      .withColumn("raw_est",
        round(lit(alpha * buckets.toDouble * buckets.toDouble)
          * expr(s"shiftleft(CAST(1 AS BIGINT), $maxRank)").cast("double")
          / col("z_scaled").cast("double"), 2))
  }

  /** KMV set-operation estimates over two corpora: distinct counts of
    * each side, their union, the intersection (inclusion–exclusion,
    * clamped at 0), and the Jaccard similarity — one row. The union
    * sketch is exact KMV algebra: the k minimum hashes of A ∪ B are the
    * k minimums of the two sides' kept sets, so merging sketches never
    * rescans either corpus; here all three sketches are built in ONE
    * [[kmvDistinct]] pass over a side-tagged union (groups `a`, `b`,
    * `u`), keeping the whole family inside the same salted-min-k scale
    * bound. Estimates are exact below k per standard KMV degeneration.
    *
    * The derived numbers reuse the already-rounded per-sketch estimates
    * in fixed expressions (`round(a + b − u, 2)` clamp, one division for
    * Jaccard), so both engines agree bit-for-bit.
    */
  def kmvSetOps(a: DataFrame, b: DataFrame, valueCol: String,
      k: Int = 64, salts: Int = 16): DataFrame = {
    val va = a.select(col(valueCol).cast("string").as("v"))
      .where(col("v").isNotNull)
    val vb = b.select(col(valueCol).cast("string").as("v"))
      .where(col("v").isNotNull)
    val tagged = va.select(lit("a").as("g"), col("v"))
      .unionAll(vb.select(lit("b").as("g"), col("v")))
      .unionAll(va.select(lit("u").as("g"), col("v")))
      .unionAll(vb.select(lit("u").as("g"), col("v")))
    val ests = kmvDistinct(tagged, "g", "v", k, salts)
    val inter = greatest(
      round(col("est_a") + col("est_b") - col("est_union"), 2), lit(0.0))
    ests.agg(
        max(when(col("g") === "a", col("est"))).as("est_a"),
        max(when(col("g") === "b", col("est"))).as("est_b"),
        max(when(col("g") === "u", col("est"))).as("est_union"))
      .select(col("est_a"), col("est_b"), col("est_union"),
        inter.as("est_inter"),
        round(inter / col("est_union"), 6).as("jaccard_est"))
  }

  // ——————————— deterministic mergeable quantile sketch ———————————

  /** Per-group mergeable QUANTILE sketch by threshold level-sampling —
    * the missing member of the sketch family (KMV/HLL count distincts,
    * CMS counts frequencies; this one answers percentiles at 100 TB).
    *
    * Spark ships `percentile_approx` (KLL-ish), but its compactor is
    * engine-specific and randomized — no cross-engine oracle can gate
    * it, and KLL's merge is only distributionally (not pointwise) equal
    * to a direct build. This sketch trades a constant factor of accuracy
    * for a property none of those have: the kept set is a CANONICAL
    * function of the input multiset, so `merge(sketch(A), sketch(B))`
    * equals `sketch(A ∪ B)` EXACTLY — the same register-table discipline
    * as [[hllRegisters]], provable row-for-row in a spec and replayable
    * bit-for-bit by a SQL oracle.
    *
    * Construction: each row gets a LEVEL = trailing-zero count of a
    * 60-bit md5 hash of its unique id (geometric: P(lvl ≥ L) = 2^−L,
    * capped at `maxLvl`). A group keeps exactly the rows with
    * `lvl ≥ thr`, where `thr` is the minimal threshold at which ≤ k
    * rows survive — i.e. a deterministic coin-flip sample whose rate
    * auto-adapts to the group size, the classic mergeable-summaries
    * random-sample quantile estimator with the randomness replaced by a
    * hash. Every kept row represents 2^thr input rows
    * (Horvitz–Thompson), so rank estimates are `rn · 2^thr`. Groups
    * with ≤ k rows keep everything at thr = 0: quantiles degenerate to
    * EXACT order statistics, mirroring KMV below k.
    *
    * Scale shape: the level histogram (`groups × ≤ maxLvl` rows) is a
    * map-side-combined aggregate; the threshold table broadcasts back;
    * state is O(groups · k). Build scans the input twice (histogram +
    * filter) — both scans are the same narrow projection.
    *
    * Contract: `idCol` must be unique per row (it drives the sampling
    * hash); rows with NULL `valueCol` are excluded (SQL aggregate
    * convention). Returns (g, id, v, lvl, thr, n) kept rows — `thr`/`n`
    * constant within a group; `n` is the EXACT group row count.
    */
  def quantileSketch(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, k: Int = 256, maxLvl: Int = 40): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxLvl >= 8 && maxLvl <= 50, s"maxLvl in [8, 50], got $maxLvl")
    val rows = levelRows(df, groupCol, valueCol, idCol, maxLvl)
    // ONE level-histogram pass feeds totals AND the threshold scan
    // (both are rollups of the same (g, lvl) counts); the histogram is
    // ≤ groups × maxLvl rows, so the LAZY localCheckpoint (materialize
    // once inside the consuming action, no extra barrier job) is
    // scale-free and pins the build at exactly the two documented
    // input scans —
    // previously totals/threshold/filter each re-ran the scan, and
    // downstream merge/query compositions MULTIPLIED those references
    // into q180's measured 128-scan plan (round-15).
    val hist = rows.groupBy("g", "lvl").agg(count(lit(1)).as("c"))
      .localCheckpoint(false)
    val totals = hist.groupBy("g").agg(sum("c").as("n"))
    thresholdAndKeep(rows, hist, totals,
      totals.select(col("g"), lit(0).as("ft")), k)
  }

  /** Merge two quantile sketches built with the same (k, maxLvl): union
    * the kept rows, lift the threshold to the minimal L ≥ max(thr_a,
    * thr_b) at which ≤ k rows survive, sum the exact counts. Because
    * every input row with `lvl ≥ max(thr_a, thr_b)` is present in one
    * side's kept set, the re-threshold sees exactly the full multiset's
    * level histogram above the floor — hence merge(sketch(A), sketch(B))
    * ≡ sketch(A ∪ B), exactly (SketchesSpec law). Disjoint inputs only
    * (shared ids would double-count, like any partial aggregate).
    */
  def quantileSketchMerge(a: DataFrame, b: DataFrame,
      k: Int = 256): DataFrame = {
    // Sketch inputs are already O(groups · k); materialize them once so
    // the four references below (meta sides + union) and every caller
    // reference (quantileSketchQuery reads its input twice) stop
    // re-running the upstream build — the q180 composition measured a
    // 128-scan plan from exactly this multiplication (round-15).
    val aM = a.localCheckpoint(false)
    val bM = b.localCheckpoint(false)
    val mA = aM.groupBy("g").agg(max("thr").as("ta"), max("n").as("na"))
    val mB = bM.groupBy("g").agg(max("thr").as("tb"), max("n").as("nb"))
    val meta = mA.join(mB, Seq("g"), "full")
    val totals = meta.select(col("g"),
      (coalesce(col("na"), lit(0L)) + coalesce(col("nb"), lit(0L))).as("n"))
    val floor = meta.select(col("g"),
      greatest(coalesce(col("ta"), lit(0)), coalesce(col("tb"), lit(0)))
        .as("ft"))
    val rows = aM.select("g", "id", "v", "lvl")
      .unionByName(bM.select("g", "id", "v", "lvl"))
    val hist = rows.groupBy("g", "lvl").agg(count(lit(1)).as("c"))
    // the merged sketch is O(groups · k); materialize so a consumer's
    // multiple references (quantileSketchQuery reads twice) never re-run
    // the whole merge tree
    thresholdAndKeep(rows, hist, totals, floor, k).localCheckpoint(false)
  }

  /** Percentile estimates from a [[quantileSketch]] table. Quantiles are
    * exact rationals (num, den) so the target rank `ceil(q·n / 2^thr)`
    * — clamped to [1, kept] — is pure integer arithmetic both engines
    * reproduce; the estimate is the kept VALUE at that rank under the
    * deterministic (v, id) order, a value picked from data, never
    * computed. Returns (g, q_num, q_den, n, thr, kept, est).
    */
  def quantileSketchQuery(sk: DataFrame,
      quantiles: Seq[(Int, Int)]): DataFrame = {
    require(quantiles.nonEmpty &&
      quantiles.forall { case (nu, de) => nu >= 0 && de >= 1 && nu <= de },
      "quantiles must be rationals in [0, 1]")
    // distinct column names on the rank side: both frames descend from
    // `sk`, and same-name join predicates on a self-join lineage resolve
    // trivially-true (Spark warns and guesses)
    val ranked = sk.select(col("g").as("_rg"), col("v"),
      row_number().over(
        Window.partitionBy("g").orderBy(col("v"), col("id"))).as("rn"))
    val meta = sk.groupBy("g").agg(max("thr").as("thr"), max("n").as("n"),
      count(lit(1)).as("kept"))
    val qArr = array(quantiles.map { case (nu, de) =>
      struct(lit(nu).as("q_num"), lit(de).as("q_den")) }: _*)
    val probes = meta
      .select(col("g"), col("n"), col("thr"), col("kept"),
        explode(qArr).as("q"))
      .select(col("g"), col("q.q_num").as("q_num"),
        col("q.q_den").as("q_den"), col("n"), col("thr"), col("kept"))
      .withColumn("_w", expr("q_den * shiftleft(CAST(1 AS BIGINT), thr)"))
      .withColumn("tgt", least(col("kept"),
        greatest(lit(1L), expr("(q_num * n + _w - 1) div _w"))))
    probes.join(ranked,
        col("g") === col("_rg") && col("tgt") === col("rn"))
      .select(col("g"), col("q_num"), col("q_den"), col("n"),
        col("thr"), col("kept"), col("v").as("est"))
  }

  /** (g, id, v, lvl) rows: 60-bit md5 hash of the id, level = capped
    * trailing-zero count (`length(bin) − length(rtrim '0')` — the
    * trailing twin of the HLL rank's leading-zero ltrim, rendering
    * identically in Spark and DuckDB).
    */
  private def levelRows(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, maxLvl: Int): DataFrame =
    df.where(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(idCol).cast("string").as("id"),
        col(valueCol).as("v"))
      .withColumn("_b",
        bin(graft.functions.HashExpressions.md5Prefix64(col("id"), 15)))
      .withColumn("lvl", least(
        length(col("_b"))
          - length(expr("trim(TRAILING '0' FROM _b)")),
        lit(maxLvl)).cast("int"))
      .drop("_b")

  /** Canonical minimal threshold ≥ the per-group floor at which ≤ k
    * rows survive, then the kept-row filter. `bad` = the highest level
    * whose suffix count still exceeds k (suffix sums over the caller's
    * (g, lvl, c) level histogram `hist` — ≤ groups × maxLvl rows, so the
    * threshold scan costs nothing and `rows` itself is only read once,
    * by the filter).
    */
  private def thresholdAndKeep(rows: DataFrame, hist: DataFrame,
      totals: DataFrame, floor: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("g").orderBy(col("lvl").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bad = hist
      .withColumn("s", sum(col("c")).over(w))
      .groupBy("g")
      .agg(max(when(col("s") > k, col("lvl"))).as("bad"))
    val thr = bad.join(floor, Seq("g"), "full")
      .select(col("g"), greatest(coalesce(col("bad") + 1, lit(0)),
        coalesce(col("ft"), lit(0))).as("thr"))
    rows.join(broadcast(thr), Seq("g"))
      .where(col("lvl") >= col("thr"))
      .join(broadcast(totals), Seq("g"))
      .select("g", "id", "v", "lvl", "thr", "n")
  }

  /** Count-min sketch over a token stream, probed for point-frequency
    * estimates — the sub-linear-memory answer to "how often does this
    * token occur in 100 TB of text" when the exact vocabulary count
    * (q63's shape) no longer fits. `depth` independent md5-derived hash
    * rows × `width` counters; a token's estimate is the MIN over its
    * `depth` counters — ≥ the true count always (counters only ever
    * absorb collisions), within ε·N with the standard (e/width,
    * (1/2)^depth) guarantee. Every hash and count is integer, so the
    * SQL oracle rebuilds the identical sketch bit-for-bit.
    *
    * Scale shape: the build is ONE map-side-combined aggregate — the
    * depth-fold fans each token into `depth` (row, bucket) keys in-row,
    * and partial aggregation collapses every partition to ≤ depth·width
    * counter rows before the (tiny, bounded-by-design) shuffle. The
    * sketch is mergeable by construction (counter-wise sum), so
    * per-partition / per-day sketches union with a second identical
    * aggregate — the same partial-merge algebra as q116. Probes
    * broadcast-join the depth·width-row sketch; nothing about the probe
    * path rescans the corpus.
    *
    * Probe set here: the distinct tokens of the minimum-id document —
    * deterministic, corpus-derived, bounded by one document's length.
    */
  def cmsTokenCounts(docs: DataFrame, textCol: String, idCol: String,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad CMS shape ${depth}x$width")
    val toks = docs.select(col(idCol).as("id"),
      explode(split(lower(col(textCol)), " ")).as("token"))
    def bucket(r: Column, t: Column): Column =
      pmod(graft.functions.HashExpressions.md5Prefix64(concat(r.cast("string"), lit("|"), t), 8), lit(width.toLong))
    val sketch = toks
      .select(explode(sequence(lit(0), lit(depth - 1))).as("r"), col("token"))
      .groupBy(col("r"), bucket(col("r"), col("token")).as("bkt"))
      .agg(count(lit(1)).as("c"))
    val minId = docs.agg(min(col(idCol)).as("id"))
    val probes = toks.join(broadcast(minId), Seq("id"))
      .select(col("token")).distinct()
      .select(col("token"), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .withColumn("bkt", bucket(col("r"), col("token")))
    probes.join(broadcast(sketch), Seq("r", "bkt"))
      .groupBy("token").agg(min(col("c")).as("est"))
  }

  /** Roaring-style bitmap segment membership: each segment's member set
    * packs into 32-members-per-word bitmap rows `(segment, word,
    * mask)` — the audience/cohort representation that turns
    * set-intersection analytics ("users who did A and B") from a
    * member-level join into a word-level AND. 32-bit packing in a
    * 64-bit word is deliberate: a 63-bit shift overflows DuckDB's
    * checked `<<`, so 32 keeps every mask positive and both engines'
    * bit ops in defined territory.
    *
    * Scale shape: members aggregate map-side into their word rows
    * (|members|/32 rows per segment); the pairwise overlap below joins
    * word tables co-keyed on `word` — work ∝ occupied words, never
    * |A|·|B| members. Exactly the bitmap-index trick OLAP stores use
    * for COUNT(DISTINCT) over segment intersections.
    */
  def bitmapSegments(df: DataFrame, segCol: String,
      memberCol: String): DataFrame = {
    val m = df.where(col(segCol).isNotNull && col(memberCol).isNotNull)
      .select(col(segCol).as("seg"), col(memberCol).cast("long").as("mb"))
      .withColumn("mb", when(col("mb") < 0,
        raise_error(concat(lit("bitmapSegments: negative member id: "),
          col("mb").cast("string")))).otherwise(col("mb")))
    m.select(col("seg"), expr("mb div 32").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(mb % 32 AS INT))").as("bit"))
      .groupBy("seg", "word").agg(expr("bit_or(bit)").as("mask"))
  }

  /** Pairwise segment overlap from [[bitmapSegments]] bitmaps:
    * `(seg_a, seg_b, n_a, n_b, n_both, jaccard_ppm)` for every
    * unordered segment pair — distinct-member counts via
    * `bit_count`, intersection via word-aligned AND, all integers
    * until the final floored-ppm Jaccard (ties impossible under floor,
    * the q118 discipline).
    */
  def bitmapOverlap(bitmaps: DataFrame): DataFrame = {
    val sizes = bitmaps.groupBy("seg")
      .agg(sum(bit_count(col("mask"))).as("n"))
    val l = bitmaps.select(col("seg").as("seg_a"), col("word"),
      col("mask").as("m_a"))
    val r = bitmaps.select(col("seg").as("seg_b"), col("word"),
      col("mask").as("m_b"))
    val inter = l.join(r, Seq("word"))
      .where(col("seg_a") < col("seg_b"))
      .groupBy("seg_a", "seg_b")
      .agg(sum(bit_count(col("m_a").bitwiseAND(col("m_b")))).as("n_both"))
    inter
      .join(sizes.select(col("seg").as("seg_a"), col("n").as("n_a")), Seq("seg_a"))
      .join(sizes.select(col("seg").as("seg_b"), col("n").as("n_b")), Seq("seg_b"))
      .select(col("seg_a"), col("seg_b"), col("n_a"), col("n_b"), col("n_both"),
        floor(col("n_both").cast("double") * 1e6
          / (col("n_a") + col("n_b") - col("n_both")).cast("double"))
          .cast("long").as("jaccard_ppm"))
  }

  /** Equi-join cardinality estimation from count-min sketches — the
    * planner-side use of the CMS family: |A ⋈ B| = Σ_k c_A(k)·c_B(k) is
    * estimated as min over rows of Σ_bucket cmsA·cmsB (AMS/CMS inner
    * product; each row's product sum overestimates by hash collisions,
    * the min is the standard correction). Sketching each side is one
    * grouped count over (row, bucket) — O(width·depth) state per side
    * regardless of key cardinality, buildable incrementally and
    * mergeable, which is the whole point: the true product join needs
    * both sides' full key histograms co-shuffled, the sketch needs two
    * broadcast-sized tables. Same md5 bucket lattice as
    * [[cmsTokenCounts]], so the oracle rebuilds it bit-for-bit.
    *
    * Returns one row: (est_rows, true_rows) — the exact size rides
    * along for the oracle gate and for judging the estimate.
    */
  def cmsJoinSize(a: DataFrame, aKey: String, b: DataFrame, bKey: String,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad CMS shape ${depth}x$width")
    def bucket(r: Column, k: Column): Column =
      pmod(graft.functions.HashExpressions.md5Prefix64(concat(r.cast("string"), lit("|"),
        k.cast("string")), 8), lit(width.toLong))
    def sketch(df: DataFrame, key: String): DataFrame = df
      .where(col(key).isNotNull)
      .select(explode(sequence(lit(0), lit(depth - 1))).as("r"),
        col(key).as("k"))
      .groupBy(col("r"), bucket(col("r"), col("k")).as("bkt"))
      .agg(count(lit(1)).as("c"))
    val est = sketch(a, aKey).withColumnRenamed("c", "ca")
      .join(sketch(b, bKey).withColumnRenamed("c", "cb"), Seq("r", "bkt"))
      .groupBy("r").agg(sum(col("ca") * col("cb")).as("rowEst"))
      // a sketch row with NO overlapping buckets never reaches the
      // grouped frame, but its product sum is 0 and must win the min —
      // any absent row forces the estimate to 0
      .agg(coalesce(min(col("rowEst")), lit(0L)).as("m"),
        count(lit(1)).as("nr"))
      .select(when(col("nr") < depth, lit(0L)).otherwise(col("m"))
        .as("est_rows"))
    val truth = a.where(col(aKey).isNotNull)
      .groupBy(col(aKey).as("k")).agg(count(lit(1)).as("na"))
      .join(b.where(col(bKey).isNotNull)
        .groupBy(col(bKey).as("k")).agg(count(lit(1)).as("nb")), Seq("k"))
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("true_rows"))
    est.crossJoin(truth)
  }

  /** MEMBERSHIP-based KMV intersection — the theta-sketch estimator
    * complementing [[kmvSetOps]]'s inclusion–exclusion: est_inter =
    * ρ·est_union with ρ = (union-sketch members present in BOTH
    * sketches)/|union sketch|. Inclusion–exclusion subtracts three
    * large estimates, so its error explodes when |A∩B| ≪ |A∪B|;
    * membership counts the overlap DIRECTLY in the sketch, the
    * standard theta-sketch set-operation algebra. This variant also
    * pins the arithmetic exact: 60-bit md5 hashes, `est =
    * (k−1)·2⁶⁰ div h₍ₖ₎` with the product widened to decimal(38,0) on
    * Spark / HUGEINT on DuckDB — identical integers out of the
    * integral division, no float estimator in the hash path — and
    * emits the EXACT counts beside every estimate (the q166/q205/q207
    * sketch-audit convention). Sets smaller than k estimate exactly
    * (no kth value exists to extrapolate from).
    *
    * Scale shape: one distinct-hash aggregate per side, then bottom-k
    * via TakeOrderedAndProject (per-partition top-k + driver merge —
    * never a global sort); everything after is k-sized. The exact
    * sides are the audit cost, as in every comparison gate.
    */
  def kmvMembershipIntersect(a: DataFrame, b: DataFrame, colName: String,
      k: Int): DataFrame = {
    require(k >= 2)
    val dec = "decimal(38,0)"
    val two60 = 1152921504606846976L // 2^60
    def hashes(df: DataFrame) = df
      .where(col(colName).isNotNull)
      .select(graft.functions.HashExpressions.md5Prefix64(concat(lit("kmv|"),
        col(colName).cast("string")), 15).as("h"))
      .distinct()
    def bottomK(h: DataFrame) = h.orderBy("h").limit(k)
    val (ha, hb) = (hashes(a).localCheckpoint(), hashes(b).localCheckpoint())
    val (sa, sb) = (bottomK(ha).localCheckpoint(), bottomK(hb).localCheckpoint())
    val su = bottomK(sa.union(sb).distinct()).localCheckpoint()
    // estimate from a k-sized sketch: exact when the set is smaller
    // than k (no kth value exists to extrapolate from)
    def estOf(s: DataFrame): DataFrame = s
      .agg(count(lit(1)).as("n"), max("h").as("hk"))
      .select(when(col("n") < k, col("n"))
        .otherwise(expr(
          s"CAST(${k - 1} AS $dec) * CAST($two60 AS $dec) div hk"))
        .cast("long").as("est"))
    val matched = su
      .join(sa, Seq("h"), "left_semi").join(sb, Seq("h"), "left_semi")
      .agg(count(lit(1)).as("n_match"))
    val interEst = matched.crossJoin(estOf(su).withColumnRenamed("est", "eu"))
      .crossJoin(su.agg(count(lit(1)).as("nu")))
      .select(expr(s"CAST(n_match AS $dec) * CAST(eu AS $dec) div nu")
        .cast("long").as("est_inter"))
    def exact(df: DataFrame) = df.where(col(colName).isNotNull)
      .select(col(colName)).distinct()
    val exA = exact(a).localCheckpoint()
    val exB = exact(b).localCheckpoint()
    estOf(sa).withColumnRenamed("est", "est_a")
      .crossJoin(estOf(sb).withColumnRenamed("est", "est_b"))
      .crossJoin(estOf(su).withColumnRenamed("est", "est_union"))
      .crossJoin(interEst)
      .crossJoin(exA.agg(count(lit(1)).as("exact_a")))
      .crossJoin(exB.agg(count(lit(1)).as("exact_b")))
      .crossJoin(exA.union(exB).distinct().agg(count(lit(1)).as("exact_union")))
      .crossJoin(exA.join(exB, Seq(colName), "left_semi")
        .agg(count(lit(1)).as("exact_inter")))
  }
}
