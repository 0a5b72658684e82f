package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Privacy curation: k-anonymity style suppression over quasi-identifier
  * columns — the release-gating step of a data-sharing pipeline. A row is
  * re-identifiable when its quasi-identifier combination is rare; rows in
  * groups smaller than `k` get those columns suppressed (nulled) rather
  * than dropped, so downstream counts stay intact.
  */
object Privacy {

  /** Suppress quasi-identifiers of rows whose QI group has fewer than `k`
    * members. Adds `group_size` (the pre-suppression QI group count —
    * nulls group together, as both Spark and SQL `PARTITION BY` define)
    * and `suppressed`; all other columns pass through untouched.
    *
    * Plan: one window count over the QI columns — a single exchange on
    * the QI key, no join back (the [[Dedup.pruneHotKeys]] argument: the
    * count rides the partition the data already needs). At 100 TB the QI
    * key follows normal aggregation skew rules — a degenerate QI (all
    * rows one group) is one partition, but such a group is by definition
    * ≥ k and could short-circuit via a pre-count if it ever mattered.
    */
  def kAnonymize(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    require(qiCols.nonEmpty && k >= 1)
    val w = Window.partitionBy(qiCols.map(col): _*)
    val counted = df.withColumn("group_size", count(lit(1)).over(w))
      .withColumn("suppressed", col("group_size") < k)
    qiCols.foldLeft(counted) { (acc, c) =>
      acc.withColumn(c, when(!col("suppressed"), col(c)))
    }
  }

  /** ε-differentially-private histogram release: per-group counts plus
    * Laplace(1/ε) noise — the OTHER release gate next to [[kAnonymize]]
    * (suppression hides rare rows; DP noise bounds what ANY count
    * reveals, including large ones). Count queries have sensitivity 1,
    * so scale b = 1/ε.
    *
    * The noise is deterministic-by-seed: u ∈ (0,1) comes from the
    * 60-bit md5 of `seed|group` (the repo's replayable-lattice
    * discipline — a rerun releases the SAME noise, so repeated releases
    * don't average it away; rotate `seed` to re-draw), mapped through
    * the Laplace inverse CDF `−b·sgn(u−½)·ln(1−2|u−½|)`. Both engines
    * evaluate the identical expression tree on the identical u, and the
    * release is rounded to 6 d.p. (absorbing any last-ulp libm `ln`
    * disagreement — the q113 discipline; an integer-rounded release
    * would gamble the hash on a .5 boundary).
    *
    * Returns `(group, n_true, noisy6)`; emitting n_true alongside is
    * for the oracle gate, NOT for release — callers ship (group,
    * noisy6) only. Like [[dpBoundedCounts]], this is a deterministic DP
    * SIMULATION for engine-parity testing: seed-derived noise is
    * recomputable by any seed holder, so it must not back a real
    * privacy release.
    */
  def dpNoisyCounts(df: DataFrame, groupCol: String, epsilon: Double,
      seed: Long = 1L): DataFrame = {
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    val b = 1.0 / epsilon
    val counts = df.where(col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("g")).agg(count(lit(1)).as("n_true"))
    // u strictly inside (0,1): 60-bit hash + ½, over 2⁶⁰ — never 0 or 1,
    // so the ln argument stays positive
    val u = (graft.functions.HashExpressions.md5Prefix64(concat(lit(s"dp|$seed|"),
        col("g").cast("string")), 15).cast("double")
      + lit(0.5)) / lit(math.pow(2, 60))
    counts
      .withColumn("_u", u)
      .withColumn("noisy6", round(
        col("n_true") - lit(b) * signum(col("_u") - 0.5)
          * log(lit(1.0) - lit(2.0) * abs(col("_u") - 0.5)), 6))
      .select(col("g").as(groupCol), col("n_true"), col("noisy6"))
  }

  /** USER-level ε-DP count release SIMULATION with contribution
    * bounding. NOT a real release mechanism: the "noise" here is a
    * deterministic md5 function of a caller-visible seed and the group
    * name — recomputable (and therefore subtractable) by anyone holding
    * the seed — and the output rows carry the exact n_unbounded /
    * n_bounded counts for the oracle gate. This models the MECHANICS
    * (contribution cap, sensitivity, Laplace shape) for engine-parity
    * testing; a production DP release requires cryptographically fresh
    * noise, dropping the exact-count columns, and a privacy accountant.
    *
    * The mechanics being simulated are the piece [[dpNoisyCounts]]
    * leaves open at scale: row-level DP assumes
    * each user owns ONE row, but a power user with 10⁴ events shifts a
    * histogram cell by 10⁴, so Laplace(1/ε) noise protects nothing.
    * The standard fix (Wilson et al., "Differentially Private SQL with
    * Bounded User Contribution", PVLDB 2020) is enforced here: keep at
    * most `cap` rows per user — the `cap` smallest md5 draws over
    * `seed|user|id`, deterministic under any partitioning — which makes
    * the release's L1 user-sensitivity exactly `cap`, then add
    * Laplace(cap/ε) noise from the same replayable seed lattice.
    *
    * Groups are the ones observed in the RAW data (left-joined back so
    * a group whose every row was capped away still releases a noisy 0 —
    * silently dropping it would leak); that observed-domain choice is
    * the documented deviation from a public-domain release, which
    * callers with a fixed taxonomy should prefer. `n_unbounded` /
    * `n_bounded` ride along for the oracle gate only — the release is
    * (group, noisy6).
    *
    * Plan: the cap is `row_number ≤ cap` over (draw, id) per user ⇒
    * WindowGroupLimit prunes each user map-side to `cap` rows before
    * the exchange; then two map-side-combined grouped counts and a
    * groups-sized join. Nothing after the prune is data-sized.
    */
  def dpBoundedCounts(df: DataFrame, groupCol: String, userCol: String,
      idCol: String, cap: Int, epsilon: Double, seed: Long = 1L): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    val base = df.where(col(groupCol).isNotNull && col(userCol).isNotNull &&
      col(idCol).isNotNull)
    val draw = md5(concat(lit(s"cb|$seed|"), col(userCol).cast("string"),
      lit("|"), col(idCol).cast("string")))
    val w = Window.partitionBy(col(userCol)).orderBy(draw, col(idCol))
    val bounded = base.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= cap)
      .groupBy(col(groupCol).as("g")).agg(count(lit(1)).as("n_bounded"))
    val raw = base.groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("n_unbounded"))
    val b = cap / epsilon
    val u = (graft.functions.HashExpressions.md5Prefix64(concat(lit(s"dp|$seed|"),
        col("g").cast("string")), 15).cast("double")
      + lit(0.5)) / lit(math.pow(2, 60))
    raw.join(bounded, Seq("g"), "left")
      .withColumn("n_bounded", coalesce(col("n_bounded"), lit(0L)))
      .withColumn("_u", u)
      .withColumn("noisy6", round(
        col("n_bounded") - lit(b) * signum(col("_u") - 0.5)
          * log(lit(1.0) - lit(2.0) * abs(col("_u") - 0.5)), 6))
      .select(col("g").as(groupCol), col("n_unbounded"), col("n_bounded"),
        col("noisy6"))
  }

  /** l-diversity audit — the release gate k-anonymity alone cannot
    * provide: a QI group can be large (k-safe) yet carry ONE sensitive
    * value, so membership still discloses it (homogeneity attack).
    * Per QI equivalence class this reports group size, the number of
    * distinct sensitive values, the dominant value's share (floored
    * ppm — exact integer arithmetic, no float ratio to disagree on),
    * and the ≥ l verdict.
    *
    * Plan: two aggregations riding the same QI⊕sensitive key — count
    * per (QI, s) first (map-side combinable), then per-QI max/sum/count
    * over the value-level rows. No windows, no join back; value-level
    * cardinality bounds the second stage at |distinct sensitive| per
    * group.
    */
  def lDiversity(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
      l: Int): DataFrame = {
    require(qiCols.nonEmpty && l >= 1)
    val qi = qiCols.map(col)
    df.groupBy(qi :+ col(sensitiveCol): _*)
      .agg(count(lit(1)).as("_c"))
      .groupBy(qi: _*)
      .agg(sum(col("_c")).as("n"),
        count(lit(1)).as("n_distinct_sensitive"),
        max(col("_c")).as("_maxc"))
      .select(qi ++ Seq(col("n"), col("n_distinct_sensitive"),
        expr("(1000000 * _maxc) div n").as("max_share_ppm"),
        (col("n_distinct_sensitive") >= l).as("l_diverse")): _*)
  }

  /** t-closeness audit — the third member of the release-gate family
    * (k-anonymity bounds re-identification, l-diversity bounds
    * homogeneity, t-closeness bounds ATTRIBUTE INFERENCE: a QI class
    * whose sensitive distribution differs sharply from the table-wide
    * one leaks even when it is diverse). Distance is total variation —
    * ½ Σ_v |p_class(v) − p_global(v)| — computed as EXACT integer
    * algebra on the common denominator 2·n_class·n_global: every
    * |class_count·n_global − global_count·n_class| term is a BIGINT,
    * one floored-ppm division at the end.
    *
    * Plan: class⊕value counts (map-combinable), global value counts
    * (broadcast — bounded by sensitive-domain size), one grouped sum
    * per class. The broadcast join must be an OUTER union of the value
    * domains per class — a value ABSENT from a class still contributes
    * its full global mass to the distance, so the global table is the
    * join's left side.
    */
  def tCloseness(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, tPpm: Long): DataFrame = {
    require(qiCols.nonEmpty && tPpm >= 0)
    val qi = qiCols.map(col)
    val cell = df.groupBy(qi :+ col(sensitiveCol).as("_v"): _*)
      .agg(count(lit(1)).as("_c"))
    val classes = cell.groupBy(qi: _*).agg(sum(col("_c")).as("n_class"))
    val global = df.groupBy(col(sensitiveCol).as("_v"))
      .agg(count(lit(1)).as("_g"))
      .crossJoin(broadcast(
        df.agg(count(lit(1)).as("n_global"))))
    // every (class, domain value) pair, including zero-count cells.
    // NULL-SAFE equality (<=>) on the QI ⊕ value key: a class keyed by
    // a null QI value must still match its own cells — plain equality
    // would zero all its counts and report tv_dist ≈ ½ regardless of
    // the true distribution
    val cellR = cell.select(
      qiCols.map(c => col(c).as(s"_r_$c")) ++
        Seq(col("_v").as("_rv"), col("_c")): _*)
    val joinCond = (qiCols.map(c => col(c) <=> col(s"_r_$c")) :+
      (col("_v") <=> col("_rv"))).reduce(_ && _)
    val lattice = classes.crossJoin(broadcast(global))
      .join(cellR, joinCond, "left")
      .withColumn("_c", coalesce(col("_c"), lit(0L)))
    lattice
      .groupBy(qi :+ col("n_class") :+ col("n_global"): _*)
      .agg(sum(abs(col("_c") * col("n_global") - col("_g") * col("n_class")))
        .as("_num"))
      // ppm scaling overflows long past n ≈ 2e6 rows (1e6·2·n²); fail
      // by name instead of wrapping — the require() discipline, lifted
      // to a data-driven bound (at larger n, pre-aggregate per class
      // and divide before scaling)
      .withColumn("n_global", when(col("n_global") > 2000000L,
        raise_error(lit("tCloseness: > 2e6 rows overflows the exact " +
          "ppm algebra — pre-scale per class"))).otherwise(col("n_global")))
      .select(qi ++ Seq(col("n_class"),
        expr("(1000000 * _num) div (2 * n_class * n_global)")
          .as("tv_dist_ppm")): _*)
      .withColumn("t_close", col("tv_dist_ppm") <= tPpm)
  }

  /** K-anonymity generalization ladder — picks HOW COARSE the quasi-
    * identifiers must be bucketed before every equivalence class
    * reaches size `k` (the release knob that q135's suppression path
    * doesn't turn: generalize first, suppress only what's left). The
    * caller declares the ladder — `(level, bucketed QI columns)` from
    * finest to coarsest — and each level costs ONE grouped count whose
    * survivors are a 4-number summary; the chosen level is the minimum
    * one meeting `k`. Emits one row per level
    * `(level, n_classes, min_class, max_class, meets_k, is_chosen)` —
    * the full ladder stays visible (an auditor wants to see the
    * utility cliff, not just the winner); if NO level meets `k`,
    * every `is_chosen` is false, never a silently-picked coarsest.
    */
  def generalizationLadder(df: DataFrame,
      ladder: Seq[(Int, Seq[org.apache.spark.sql.Column])],
      k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    require(ladder.nonEmpty && ladder.map(_._1).distinct.size ==
      ladder.size, "ladder levels must be distinct")
    val perLevel = ladder.map { case (lvl, exprs) =>
      require(exprs.nonEmpty, s"level $lvl has no QI columns")
      df.groupBy(exprs: _*).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_classes"), min("c").as("min_class"),
          max("c").as("max_class"))
        .select(lit(lvl.toLong).as("level"), col("n_classes"),
          col("min_class"), col("max_class"))
    }.reduce(_ unionByName _)
    val flagged = perLevel
      .withColumn("meets_k", col("min_class") >= k)
    val chosen = flagged.where(col("meets_k"))
      .agg(min("level").as("_chosen"))
    flagged.crossJoin(broadcast(chosen))
      .withColumn("is_chosen",
        col("_chosen").isNotNull && col("level") === col("_chosen"))
      .drop("_chosen")
  }

  /** Right-to-be-forgotten residual audit — the VERIFICATION side of a
    * deletion pipeline (the cascade delete is the easy half; proving
    * nothing survived is what a regulator asks for). For each audited
    * table: how many rows still reference a tombstoned subject, how
    * many distinct subjects still leak, and a pass flag. Each audit is
    * one left-semi join against the (small, broadcastable) victim set
    * plus one count-distinct — no data ever leaves the executors but
    * five numbers per table. A failing row names the table that needs
    * a re-run; an all-pass report is the artifact you archive.
    */
  def forgetAudit(victims: DataFrame, victimCol: String,
      audits: Seq[(String, DataFrame, String)]): DataFrame = {
    require(audits.nonEmpty, "need at least one table to audit")
    val v = victims.select(col(victimCol).as("_victim")).distinct()
    val nv = v.agg(count(lit(1)).as("n_victims"))
    audits.map { case (table, df, keyCol) =>
      df.join(broadcast(v), col(keyCol) === col("_victim"), "left_semi")
        .agg(count(lit(1)).as("residual_rows"),
          countDistinct(col(keyCol)).as("residual_keys"))
        .crossJoin(nv)
        .select(lit(table).as("table_name"), col("n_victims"),
          col("residual_rows"), col("residual_keys"),
          (col("residual_rows") === 0).as("pass"))
    }.reduce(_.unionByName(_))
  }
}
