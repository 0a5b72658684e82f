package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training pipelines.
  *
  * `df.sample()` / TABLESAMPLE draw per-partition, so the selected rows
  * change with partitioning, executor count, and engine — unusable for
  * train/val/test splits that must be stable across reruns and reproducible
  * by other systems. These operators derive the assignment from an md5
  * bucket of the row id instead: pure narrow projection, engine-portable
  * (any SQL dialect reproduces it), and stable under any layout. The
  * 16-bit hex prefix gives 65536 lattice points spread uniformly; bucket
  * skew is O(2^-16) relative.
  */
object Sampling {

  /** Uniform [0, 100) bucket from the md5 of the id. */
  def hashBucket(id: Column): Column =
    graft.functions.HashExpressions.md5Prefix64(id.cast("string"), 4) % 100

  /** Deterministic percentage sample: keeps rows whose bucket < `pct`. */
  def hashSample(df: DataFrame, idCol: String, pct: Int): DataFrame = {
    require(0 <= pct && pct <= 100)
    df.where(hashBucket(col(idCol)) < pct)
  }

  /** Stable split assignment, e.g. `Seq("train" -> 80, "val" -> 10,
    * "test" -> 10)`: adds a `split` column. Weights must sum to 100.
    */
  def hashSplit(df: DataFrame, idCol: String,
      weights: Seq[(String, Int)]): DataFrame = {
    require(weights.map(_._2).sum == 100, "split weights must sum to 100")
    require(weights.nonEmpty)
    val cum = weights.map(_._2).scanLeft(0)(_ + _).tail
    val b = hashBucket(col(idCol))
    val cases = weights.map(_._1).zip(cum).init
    val assigned = cases.foldLeft(Option.empty[Column]) {
      case (acc, (name, bound)) =>
        Some(acc.map(_.when(b < bound, name))
          .getOrElse(when(b < bound, name)))
    }
    val split = assigned.map(_.otherwise(weights.last._1))
      .getOrElse(lit(weights.last._1))
    df.withColumn("split", split)
  }

  /** Stratified deterministic sample: per-stratum rates (e.g. keep 10%
    * of 'en' but 100% of a rare language — the rebalancing move every
    * corpus mix needs). Same md5-bucket mechanics as [[hashSample]], so
    * the kept set is stable under any partitioning and reproducible by
    * any engine; strata absent from `rates` fall back to `defaultPct`.
    * Still a pure narrow filter — no shuffle.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Seq[(String, Int)], defaultPct: Int = 0): DataFrame = {
    require((defaultPct +: rates.map(_._2)).forall(p => 0 <= p && p <= 100))
    // literal-map lookup, not a when-per-stratum chain: the chain
    // references the strata column once PER RATE, and when that column
    // is itself an expensive derived expression (q67 strata = the
    // language argmax), projection collapse inlines one full copy per
    // reference into the filter. The map keys are literals, so this is
    // one reference regardless of rate count; absent strata → null →
    // defaultPct, same semantics as the chain's otherwise.
    val rateMap = map(rates.flatMap { case (s, p) => Seq(lit(s), lit(p)) }: _*)
    val pct = coalesce(element_at(rateMap, col(strataCol)), lit(defaultPct))
    df.where(hashBucket(col(idCol)) < pct)
  }

  /** Uniform [0, 65536) bucket from the md5 of the id — the fine-grained
    * lattice for fractional rates that the percent-granular
    * [[hashBucket]] cannot express.
    */
  def hashBucket64k(id: Column): Column =
    graft.functions.HashExpressions.md5Prefix64(id.cast("string"), 4)

  /** Deterministic weighted sampling without replacement (the
    * Efraimidis–Spirakis A-ES scheme): each row draws its md5-lattice
    * uniform `u ∈ (0, 1)` and competes with key `u^(1/w)` — higher
    * weight, stochastically higher key — and the top `k` keys per
    * stratum win. One pass, mergeable (per-partition top-k pre-prune
    * is Spark's own TakeOrdered shape), and reproducible by any engine
    * from the id alone — `df.sample`'s partitioning-dependence is the
    * thing this family exists to avoid.
    *
    * `pow` is the one libm call: keys round to 6 d.p. BEFORE ranking
    * with the id as tiebreak (the q64/q104 rank-stability discipline),
    * so cross-libm ulp noise cannot flip a rank. Weights must be
    * positive; `u` offsets by half a lattice step so it is never 0.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      strataCol: String, k: Int): DataFrame = {
    require(k >= 1)
    import org.apache.spark.sql.expressions.Window
    val u = (hashBucket64k(col(idCol)).cast("double") + lit(0.5)) / lit(65536.0)
    val key = round(pow(u, lit(1.0) / col(weightCol)), 6)
    val w = Window.partitionBy("stratum")
      .orderBy(col("skey").desc, col("id"))
    df.filter(col(weightCol) > 0)
      .select(col(strataCol).as("stratum"), col(idCol).as("id"),
        col(weightCol).cast("double").as("weight"), key.as("skey"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
  }

  /** Rendezvous (highest-random-weight) shard assignment: row → shard
    * `argmax_i md5(id | i)` over `numShards` candidates — the consistent
    * placement primitive whose defining property is MINIMAL MOVEMENT:
    * adding shard N+1 reassigns only the keys whose new hash wins
    * (~1/(N+1) of them), where `hash(id) mod N` reshuffles nearly
    * everything. Pure in-row integer argmax (ties broken toward the
    * lowest shard by `array_position` semantics, deterministic), no
    * shuffle — the assignment column then drives `repartition` /
    * `partitionBy` as the caller's layout requires.
    */
  def rendezvousShard(df: DataFrame, idCol: String, numShards: Int,
      outCol: String = "shard"): DataFrame = {
    require(numShards >= 1)
    val scores = transform(sequence(lit(0), lit(numShards - 1)),
      i => graft.functions.HashExpressions.md5Prefix64(concat(col(idCol).cast("string"), lit("|"),
        i.cast("string")), 8))
    df.withColumn(outCol,
      (array_position(scores, array_max(scores)) - 1).cast("long"))
  }

  /** Exact-k balanced sample — the "same-size eval set per class" verb
    * (proportional stratification keeps imbalance; an eval table wants
    * k PER GROUP): the k smallest md5 draws per group, id tiebreak, so
    * the pick is deterministic under any partitioning and replayable
    * by any engine. Groups smaller than k keep everything. The window
    * is `row_number ≤ const`, so WindowGroupLimit prunes each group
    * map-side to k rows before the exchange — the shuffle carries
    * O(groups × k), never the corpus.
    */
  def exactKPerGroup(df: DataFrame, idCol: String, groupCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val draw = graft.functions.HashExpressions.md5Prefix64(concat(lit("ek|"),
      col(idCol).cast("string")), 15)
    val w = Window.partitionBy(groupCol).orderBy(col("_draw"), col(idCol))
    df.where(col(groupCol).isNotNull && col(idCol).isNotNull)
      .withColumn("_draw", draw)
      .withColumn("draw_rank", row_number().over(w).cast("long"))
      .where(col("draw_rank") <= k)
      .drop("_draw")
  }

  /** Exact water-filling budget allocation — the quota verb behind
    * crawl budgets, sampling allocations, and rate plans: split a
    * global `budget` across demands so every demand is met up to a
    * common threshold, small demands fully, big ones capped fairly.
    * The classic threshold search is exact in one pass of window
    * algebra: rows sorted (demand ASC, id ASC) with prefix sums — row
    * k is FULLY funded iff `S_k + (N−k)·d_k ≤ B` (funding everyone at
    * least d_k still fits); the remaining budget spreads as
    * `t = (B − S_K) div (N−K)` with the integer remainder given +1 to
    * the first R capped rows in the same order, so `Σ alloc =
    * min(B, Σ demand)` EXACTLY — the conservation law the spec pins.
    *
    * The input is a per-domain aggregate (dimension-sized by
    * construction), so the one global sort window here orders domains,
    * never data rows. Non-positive demands fail by name.
    */
  def waterFillAllocation(demands: DataFrame, idCol: String,
      demandCol: String, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be >= 0")
    import org.apache.spark.sql.expressions.Window
    val rows = demands.select(col(idCol).as("id"),
      when(col(demandCol) <= 0, expr(
        s"raise_error('waterFillAllocation: non-positive $demandCol')"))
        .otherwise(col(demandCol)).cast("long").as("d"))
    val w = Window.orderBy(col("d").asc, col("id").asc)
    val cum = rows
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("s", sum("d").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = cum.agg(count(lit(1)).as("n_all"))
    val cumN = cum.crossJoin(broadcast(tot))
      .withColumn("full",
        col("s") + (col("n_all") - col("rn")) * col("d") <= budget)
    val kRow = cumN.agg(
      coalesce(max(when(col("full"), col("rn"))), lit(0L)).as("k"),
      coalesce(max(when(col("full"), col("s"))), lit(0L)).as("sk"))
    cumN.crossJoin(broadcast(kRow))
      .withColumn("t", when(col("n_all") > col("k"),
        expr(s"(${budget}L - sk) div (n_all - k)")).otherwise(lit(0L)))
      .withColumn("r", when(col("n_all") > col("k"),
        expr(s"${budget}L - sk - t * (n_all - k)")).otherwise(lit(0L)))
      .select(col("id").as(idCol), col("d").as("demand"),
        when(col("rn") <= col("k"), col("d"))
          .otherwise(col("t") +
            when(col("rn") - col("k") <= col("r"), 1L).otherwise(0L))
          .as("alloc"))
  }

  /** Token-budget mixture sampling — the "data mixing" step of a
    * training-corpus build: each group (source, language, domain …) is
    * down-sampled toward a per-group token budget, so over-represented
    * sources stop dominating the mixture. Keep rate per group is
    * min(1, budget / group_total_tokens); row selection is the same
    * md5-bucket lattice as [[hashSample]], so the kept set is
    * deterministic under any partitioning and reproducible by any
    * engine, and re-running with a bigger budget only ADDS documents
    * (buckets are nested) — the property that makes mixtures tunable
    * without churning the corpus.
    *
    * Plan shape: one partial-aggregated groupBy over group keys (output
    * rows = number of groups, tiny), broadcast back, then a narrow
    * filter — the 100 TB cost is one scan plus a broadcast join, no
    * data-sized shuffle. Rates are computed in double precision on both
    * engines (IEEE-identical), so the bucket threshold compare is
    * portable.
    */
  def tokenBudgetSample(df: DataFrame, idCol: String, groupCol: String,
      tokensCol: String, budgetPerGroup: Long): DataFrame = {
    require(budgetPerGroup > 0)
    val totals = df.groupBy(col(groupCol))
      .agg(sum(col(tokensCol)).as("_total"))
    df.join(broadcast(totals), Seq(groupCol))
      .withColumn("_rate",
        least(lit(1.0), lit(budgetPerGroup.toDouble) / col("_total")))
      .where(hashBucket64k(col(idCol)) < col("_rate") * 65536)
      .drop("_total", "_rate")
  }

  /** Sequence packing for training batches, stream-chunking semantics:
    * within a shard, documents are laid head-to-tail in id order and a
    * document belongs to the budget window its FIRST token lands in —
    * bin = floor((cumsum - tokens) / budget) over the shard's
    * id-ordered prefix sums. (This is how fixed-length LLM training
    * windows consume a concatenated corpus; a straddling document stays
    * with the window it starts in. True close-on-overflow bin packing
    * is inherently sequential and not expressible as one window — and
    * not what a packed loader does anyway.) Sharding is what makes this
    * scale: a single global packing order serializes the cumsum into
    * one task, while `numShards` md5 shards pack in parallel and stay
    * deterministic (shard from the id, order within shard by id —
    * partitioning-independent). Returns (id, shard, bin) — the physical
    * grouping key for a downstream `repartition(shard, bin)` batch
    * write.
    */
  /** Materialize the packed windows [[packSequences]] assigns: one row
    * per (shard, bin) with the concatenated token-id stream of its
    * documents laid head-to-tail in id order — the physical artifact a
    * fixed-context training loader consumes, with document boundaries
    * dissolved into one flat stream per window. `df` carries
    * (idCol, idsCol: array<long>); token counts are the array sizes, so
    * the bin math is identical to [[packSequences]] on the same corpus.
    *
    * Plan: the assignment's per-shard cumsum window, a same-key join
    * back, and ONE exchange on (shard, bin) for the reassembly — the
    * collect_list sorts by the unique doc id, so the stream order is
    * partitioning-independent.
    */
  def packWindows(df: DataFrame, idCol: String, idsCol: String,
      budget: Long, numShards: Int = 8): DataFrame = {
    val assigned = packSequences(
      df.select(col(idCol), size(col(idsCol)).cast("long").as("_n")),
      idCol, "_n", budget, numShards)
    df.select(col(idCol).as("id"), col(idsCol).as("_ids"))
      .join(assigned, Seq("id"))
      .groupBy(col("shard"), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(col("_ids"))).cast("long").as("n_tokens"),
        flatten(transform(
          array_sort(collect_list(struct(col("id"), col("_ids")))),
          s => s.getField("_ids"))).as("window_ids"))
  }

  /** Temperature-based mixture sampling (the √-count data-mixing rule):
    * group g with c_g documents gets sampling weight c_g^α, and a keep
    * rate of min(1, target·w_g / Σw / c_g) — α < 1 flattens the
    * mixture toward rare groups, the standard multi-source/multi-
    * lingual rebalance. Keep decisions ride the md5 lattice
    * ([[hashBucket64k]]) — deterministic under any partitioning.
    *
    * α is fixed at 0.5 so the weight is `sqrt` — an IEEE
    * correctly-rounded op, bit-identical on every engine, unlike
    * `pow`'s libm freedom; Σw is folded DRIVER-side over the
    * group-name-sorted weights (group cardinality = mixture-source
    * cardinality, inherently tiny) so the summation ORDER is part of
    * the contract — an engine-order float sum at a keep-rate boundary
    * could flip a row. Rates broadcast back as literals on a tiny
    * join; the corpus itself sees one narrow filter.
    */
  def temperatureSample(df: DataFrame, idCol: String, groupCol: String,
      targetTotal: Long): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("_c"))
      .orderBy(col(groupCol))
      .collect().map(r => r.get(0).toString -> r.getLong(1))
    val sumW = counts.map { case (_, c) => math.sqrt(c.toDouble) }
      .foldLeft(0.0)(_ + _)
    val rates = counts.map { case (g, c) =>
      (g, c, math.min(1.0, targetTotal * math.sqrt(c.toDouble) / sumW / c))
    }.toSeq
    val rateDf = broadcast(
      df.sparkSession.createDataFrame(rates).toDF(groupCol, "_c", "_rate"))
    df.join(rateDf.select(col(groupCol), col("_rate")), groupCol)
      .where(hashBucket64k(col(idCol)) < col("_rate") * 65536)
      .select(col(idCol), col(groupCol), round(col("_rate"), 6).as("rate"))
  }

  /** RAG-style overlapping chunking: fixed `chunk`-token windows every
    * `stride` tokens (stride < chunk ⇒ overlap), per document. Emits
    * (id, chunk_id, start_token, chunk_text, n_tokens); the final
    * chunk of a document may be short (standard retrieval-chunker
    * semantics — a sub-stride tail is still retrievable context).
    * Pure narrow generator over the scan: the words array is projected
    * once (the no-CSE-inside-lambdas rule), `explode(sequence(...))`
    * fans out starts, `slice` re-reads the in-row array — no shuffle,
    * no state; at 100 TB this runs at scan speed and the output
    * inherits the input's partitioning.
    */
  def chunkDocuments(df: DataFrame, textCol: String, idCol: String,
      chunk: Int, stride: Int): DataFrame = {
    require(chunk >= 1 && stride >= 1, "chunk and stride must be >= 1")
    df.select(col(idCol).as("id"), TextOps.words(col(textCol)).as("_w"))
      .select(col("id"), col("_w"),
        explode(sequence(lit(0), size(col("_w")) - 1, lit(stride))).as("_start"))
      .select(col("id"),
        (col("_start") / stride).cast("long").as("chunk_id"),
        col("_start").cast("long").as("start_token"),
        concat_ws(" ", slice(col("_w"), col("_start") + 1, lit(chunk)))
          .as("chunk_text"),
        least(size(col("_w")) - col("_start"), lit(chunk)).cast("long")
          .as("n_tokens"))
  }

  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, numShards: Int = 8): DataFrame = {
    require(budget > 0 && numShards > 0)
    val shard = graft.functions.HashExpressions.md5Hex64(col(idCol).cast("string"), 5, 4) % numShards
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.select(col(idCol).as("id"), col(tokensCol).as("tokens"),
        shard.as("shard"))
      .withColumn("bin",
        floor((sum(col("tokens")).over(w) - col("tokens")) / budget))
      .select(col("id"), col("shard"), col("bin"))
  }

  /** Balanced shard assignment by serpentine (boustrophedon) round-robin
    * over the size-descending rank: block k of `numShards` items fills
    * shards left-to-right when k is even, right-to-left when odd, so
    * the biggest item in each block pairs with the smallest of the
    * next — the deterministic, one-pass approximation of LPT bin
    * packing (greedy LPT itself is inherently sequential: every
    * placement depends on all previous loads). Rank ties break by id.
    *
    * Plan: one global sort of (size, id) KEY PAIRS via `row_number` over
    * an empty partition — a single-task window over the ranked frame,
    * the honest cost of any total-order policy; the payload never
    * enters the sort (callers join assignments back by id). At 100 TB
    * the swap is range-partitioned `rank` over a sampled boundary set
    * (Spark's own `orderBy` machinery) with the same serpentine
    * arithmetic on top.
    */
  def serpentineShards(df: DataFrame, idCol: String, sizeCol: String,
      numShards: Int): DataFrame = {
    require(numShards >= 1)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("size").desc, col("id"))
    val n = lit(numShards.toLong)
    df.select(col(idCol).as("id"), col(sizeCol).cast("long").as("size"))
      .withColumn("r", row_number().over(w).cast("long") - 1)
      .withColumn("block", (col("r") / n).cast("long"))
      .withColumn("pos", col("r") % n)
      .withColumn("shard",
        when(col("block") % 2 === 0, col("pos")).otherwise(n - 1 - col("pos")))
      .select(col("id"), col("size"), col("r").as("rank"), col("shard"))
  }

  /** Deterministic negative sampling for retrieval/recommendation
    * training: for every user, the `k` hash-smallest candidate items
    * the user did NOT interact with. The candidate universe per user
    * is HASH-BLOCKED — only items whose md5 bucket equals the user's
    * (mod `blocks`) are considered — which is what makes this a join,
    * not a users × items cross product: per user the candidate set is
    * |items|/blocks, and the block assignment is itself a uniform
    * deterministic sample of the item universe (every item reachable
    * by 1/blocks of users, every user seeing 1/blocks of items). Both
    * the pair score and the block come from the md5 lattice, so a
    * rerun — or the oracle — reproduces the draw exactly.
    */
  def negativeSample(interactions: DataFrame, userCol: String,
      itemCol: String, items: DataFrame, itemIdCol: String,
      k: Int, blocks: Int = 8): DataFrame = {
    require(k >= 1 && blocks >= 1)
    def block(c: Column): Column =
      pmod(graft.functions.HashExpressions.md5Prefix64(c.cast("string"), 15), lit(blocks.toLong))
    // repartition on u BEFORE the candidate fan-out: the distinct
    // collapses to few (AQE-coalesced) partitions, and a broadcast
    // fan-out join inherits its input's partitioning — without the
    // spread, one task would own the whole users×candidates explosion
    // and the window's partial sort would run single-threaded (observed:
    // a 25-minute one-core task at sf1). After the spread every
    // partition fans out its own users in parallel, and all of a user's
    // pairs stay in one partition, which is exactly what the partial
    // WindowGroupLimit needs.
    val shufflePartitions = interactions.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val users = interactions.select(col(userCol).as("u")).distinct()
      .withColumn("blk", block(col("u")))
      // EXPLICIT partition count: the users table is tiny in bytes, so a
      // bare repartition(col) gets AQE-coalesced back into one partition
      // — and the downstream fan-out join multiplies whatever layout
      // this table has. The explicit count pins the spread.
      .repartition(shufflePartitions, col("u")).localCheckpoint()
    val cand = items.select(col(itemIdCol).as("item"))
      .distinct().withColumn("blk", block(col("item")))
    val seen = interactions
      .select(col(userCol).as("u"), col(itemCol).as("item")).distinct()
    // K'-OVERSHOOT pruning — the step that keeps this operator from
    // shuffling the full users×(items/blocks) pair fan-out: a user's k
    // hash-smallest NON-seen candidates are among its (k + s_u)
    // hash-smallest candidates overall, where s_u = how many of the
    // user's seen items fall in its own hash block. Taking the global
    // bound K' = k + max(s_u) makes the limit a CONSTANT, so the
    // rank-filter compiles to WindowGroupLimit with a PARTIAL pass —
    // every pair of a given user lives in its block's partition, so the
    // fan-out is cut to ≤ K' rows per user BEFORE the first wide
    // exchange, and the seen anti-join runs on the pruned table, never
    // the fan-out. max(s_u) is a bounded scalar (one aggregate to the
    // driver, the pageRank-dangling discipline); a pathological user
    // whose seen set saturates its own block would inflate K' for
    // everyone — at that point route the over-cap users through a
    // separate full-rank path and keep K' at the p99 (documented
    // refinement, same union shape).
    val maxS = seen.withColumn("blkI", block(col("item")))
      .join(users, Seq("u"))
      .where(col("blkI") === col("blk"))
      .groupBy("u").agg(count(lit(1)).as("s"))
      .agg(coalesce(max(col("s")), lit(0L))).first().getLong(0)
    val kPrime = k + maxS.toInt
    // broadcast pinned to the CANDIDATE side: the fan-out join's output
    // inherits the STREAMED side's partitioning, and that must be the
    // u-spread users table — left to AQE, the (byte-smaller) users side
    // gets broadcast and the whole explosion lands in the candidate
    // table's one coalesced partition (observed: a 22-minute one-core
    // sort at sf1 doing what 32 cores finish in seconds)
    val scored = users.join(broadcast(cand), Seq("blk"))
      .withColumn("score", graft.functions.HashExpressions.md5Prefix64(concat(col("u").cast("string"),
        lit("|"), col("item").cast("string")), 15))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("u").orderBy(col("score"), col("item"))
    val pruned = scored.withColumn("rk0", row_number().over(w))
      .where(col("rk0") <= kPrime)
    pruned.join(seen, Seq("u", "item"), "left_anti")
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select(col("u").as(userCol), col("item").as(itemCol), col("rk"))
  }

  /** GROUP-AWARE k-fold assignment — the cross-validation split whose
    * one hard requirement is leakage safety: every row of a group (all
    * events of a user, all docs of a domain) lands in the SAME fold,
    * because a group straddling train and eval folds leaks near-
    * duplicate signal into the eval score. The fold is a pure function
    * of the group key (`md5(seed|group) mod k` — the repo's split
    * lattice, [[hashSplit]]'s discipline), so assignment is a narrow
    * map, reproducible under any partitioning, and stable when rows
    * are added to an existing group.
    *
    * Emits the per-fold audit (`fold, n_rows, n_groups,
    * rows_share_ppm`) rather than the data-sized assignment — the
    * caller applies the same lattice expression to route rows; the
    * audit is what you LOOK at (fold balance is O(2⁻³²) skewed by the
    * hash, but the audit proves it for this corpus, not in theory).
    * One grouped count (map-side combinable) + a k-sized rollup.
    */
  def kFoldAudit(df: DataFrame, groupCol: String, k: Int,
      seed: Long = 1L): DataFrame = {
    require(k >= 2 && k <= 1000, s"k out of range: $k")
    val fold = graft.functions.HashExpressions.md5Prefix64(concat(lit(s"fold|$seed|"),
        col(groupCol).cast("string")), 8) % k
    val perGroup = df.where(col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("g")).agg(count(lit(1)).as("rows"))
      .select(col("g"),
        graft.functions.HashExpressions.md5Prefix64(concat(lit(s"fold|$seed|"),
          col("g").cast("string")), 8)
          .mod(k).as("fold"), col("rows"))
    val total = perGroup.agg(sum("rows").as("_t"))
    perGroup.groupBy("fold")
      .agg(count(lit(1)).as("n_groups"), sum("rows").as("n_rows"))
      .crossJoin(broadcast(total))
      .select(col("fold"), col("n_rows"), col("n_groups"),
        expr("(1000000 * n_rows) div _t").as("rows_share_ppm"))
  }

  /** Curriculum ordering — the training-schedule verb: emit a
    * deterministic global training order that presents EASY documents
    * first and ramps to hard, with a deterministic shuffle WITHIN each
    * difficulty stage (strictly sorting by difficulty would correlate
    * adjacent batches; the md5 shuffle breaks that while keeping the
    * stage ramp). The global order is the lexicographic triple
    * `(stage, bucket, pos)` where `bucket` is an md5 bucket and `pos`
    * a row_number WITHIN (stage, bucket) — so no window ever sees more
    * than one bucket of one stage, and the full order materializes
    * without any single-reducer global sort (the [[serpentineShards]]
    * discipline: order by construction, not by sorting).
    *
    * Stage bands come from the DISTINCT-difficulty cumulative frame
    * (value-cardinality-sized, the weighted-percentiles discipline) —
    * a global `ntile` would collapse all data onto one reducer. The
    * documented consequence: bands are VALUE-ALIGNED — every row
    * sharing a difficulty value shares a stage, so populations are
    * equal only up to the largest single-value mass. For a continuous
    * difficulty score that skew is negligible; for a degenerate score
    * (one value everywhere) all rows honestly land in stage 0.
    */
  def curriculumOrder(df: DataFrame, idCol: String, difficultyCol: String,
      nStages: Int = 4, nBuckets: Int = 256,
      seed: Long = 1L): DataFrame = {
    require(nStages >= 2 && nStages <= 64 && nBuckets >= 1)
    val base = df.where(col(idCol).isNotNull && col(difficultyCol).isNotNull)
      .select(col(idCol).as("id"),
        col(difficultyCol).cast("long").as("diff"))
    val byVal = base.groupBy("diff").agg(count(lit(1)).as("cnt"))
    val wVal = org.apache.spark.sql.expressions.Window.orderBy(col("diff"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val total = byVal.agg(sum("cnt").as("_t"))
    val stages = byVal
      .withColumn("cum_end", sum("cnt").over(wVal))
      .crossJoin(broadcast(total))
      .select(col("diff"),
        least(lit(nStages - 1L),
          expr(s"($nStages * (cum_end - cnt)) div _t")).as("stage"))
    val staged = base.join(broadcast(stages), "diff")
    val bucketed = staged.withColumn("bucket",
      graft.functions.HashExpressions.md5Prefix64(concat(lit(s"cur|$seed|"),
        col("id").cast("string")), 8) % nBuckets)
    val wSb = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stage"), col("bucket"))
      .orderBy(md5(concat(lit(s"pos|$seed|"), col("id").cast("string"))),
        col("id"))
    bucketed.withColumn("pos", row_number().over(wSb).cast("long"))
      .select(col("id"), col("diff"), col("stage"), col("bucket"),
        col("pos"))
  }
  /** DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
    * score every RAW-pool document by how much more likely its tokens
    * are under the TARGET distribution than under the raw distribution,
    * and keep the top-k. The published recipe uses hashed n-gram
    * features; the engine-portable member of the family is the unigram
    * estimator with add-one smoothing — per token,
    * `w = ln( p̂_tgt(tok) / p̂_raw(tok) )` with
    * `p̂(tok) = (c+1)/(N+V)`, and a document's importance weight is the
    * sum over its token OCCURRENCES.
    *
    * Determinism (the q113/q345 micro-nat discipline): the single float
    * step is ONE `ln` per DISTINCT vocabulary word over an exact
    * integer ratio, pinned to `round(10⁶·ln(...))` in the vocab-sized
    * frame; per-document scores are then EXACT integer sums, so the
    * oracle replays the draw bit-for-bit and top-k ties break by id.
    *
    * Plan: one explode → vocab-count aggregate (map-side combined,
    * vocab-sized result), a broadcast 1-row total, one vocab-sized
    * ratio projection joined back to the token stream (optimizer
    * broadcasts when it fits), one per-doc aggregate, TakeOrdered(k).
    * Two data-sized shuffles — the floor for a corpus-conditioned
    * per-document score. Count products stay in longs through ~10⁹
    * tokens per side; lift to decimal beyond (guarded in scaladoc, not
    * at runtime — the 100 TB deployment sizes this knowingly).
    */
  def dsirSelect(docs: DataFrame, textCol: String, idCol: String,
      targetCol: Column, k: Int = 100): DataFrame = {
    require(k >= 1)
    val toks = docs.select(col(idCol).as("id"), targetCol.as("tgt"),
      explode(graft.ops.TextOps.words(col(textCol))).as("word"))
    val counts = toks.groupBy("word").agg(
      sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"),
      sum(when(col("tgt"), 0L).otherwise(1L)).as("cr"))
    val tot = counts.agg(sum("ct").as("nt"), sum("cr").as("nr"),
      count(lit(1)).as("v"))
    val ratio = counts.crossJoin(broadcast(tot))
      .select(col("word"),
        round(log(((col("ct") + 1) * (col("nr") + col("v"))).cast("double")
          / ((col("cr") + 1) * (col("nt") + col("v"))).cast("double")) * 1e6)
          .cast("long").as("w_micro"))
    val scored = toks.where(!col("tgt"))
      .join(ratio, Seq("word"))
      .groupBy("id")
      .agg(sum("w_micro").as("score_micro"), count(lit(1)).as("n_words"))
    import org.apache.spark.sql.expressions.Window
    scored.orderBy(col("score_micro").desc, col("id")).limit(k)
      .withColumn("rank", row_number().over(Window
        .orderBy(col("score_micro").desc, col("id"))).cast("long"))
      .select(col("id").as(idCol), col("score_micro"), col("n_words"),
        col("rank"))
  }

  /** UniMax mixture allocation (Chung et al. 2023) — the epoch-capped
    * fair waterfill the temperature knob approximates by hand: give
    * every source an equal share of the token budget, EXCEPT that no
    * source is asked for more than `maxEpochs` passes over its own
    * data; capacity freed by small sources flows to the rest. The
    * funded set is a prefix of the capacity-ascending order (standard
    * waterfilling), so one cumulative window decides it exactly:
    * source at rank r is funded iff capacity·(n−r+1) ≤ budget −
    * cum_prev (integer cross-multiplication, no division). Unfunded
    * sources split the residue by truncating division, with the
    * remainder distributed one token each to the first `rem` of them
    * in rank order — allocations sum to EXACTLY min(budget, Σcapacity).
    *
    * Scale: one doc-sized grouped aggregate (map-side combinable)
    * reduces the corpus to source cardinality; the global windows run
    * over that bounded frame only (the mixture tables' standing
    * contract — never over data-sized rows).
    */
  def uniMaxAllocation(df: DataFrame, textCol: String, sourceCol: String,
      budget: Long, maxEpochs: Int = 1): DataFrame = {
    require(budget > 0 && maxEpochs >= 1)
    import org.apache.spark.sql.expressions.Window
    val wAsc = Window.orderBy(col("capacity"), col("source"))
    val wAll = wAsc.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val ranked = df
      .filter(col(textCol).isNotNull && col(sourceCol).isNotNull)
      .groupBy(col(sourceCol).as("source"))
      .agg(sum(TextOps.wsTokenCount(col(textCol))).as("n_tokens"))
      .withColumn("capacity", col("n_tokens") * maxEpochs)
      .withColumn("r", row_number().over(wAsc).cast("long"))
      .withColumn("cum_prev", coalesce(sum("capacity").over(
        wAsc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("funded",
        col("capacity") * (col("n") - col("r") + 1) <=
          lit(budget) - col("cum_prev"))
      .withColumn("f_sum", coalesce(sum(when(col("funded"),
        col("capacity"))).over(wAll), lit(0L)))
      .withColumn("k", coalesce(sum(when(col("funded"), 1L))
        .over(wAll), lit(0L)))
    ranked.select(col("source"), col("n_tokens"), col("capacity"),
        col("funded"),
        when(col("funded"), col("capacity")).otherwise(
          expr(s"($budget - f_sum) div (n - k)") +
            when(col("r") - col("k") <=
              expr(s"($budget - f_sum) % (n - k)"), 1L).otherwise(0L))
          .as("alloc_tokens"))
      .withColumn("epochs_ppm",
        expr("(1000000 * alloc_tokens) div n_tokens"))
  }

  /** Cross-document attention audit over [[packSequences]]' packing —
    * the training-time contamination packing introduces: inside one
    * packed window, a causal LM without a block-diagonal mask attends
    * across document boundaries. Per (shard, bin): exact cross-document
    * causal pair count Σ_{i<j} l_i·l_j = (L² − Σl²)/2 (always even,
    * integer-exact), total pairs L(L−1)/2, and the truncating-ppm
    * fraction — the number that decides whether the loader needs the
    * mask. Single-doc windows score 0; single-token windows have no
    * pairs and emit null. One narrow token-count projection, the
    * packing's own shard/bin assignment, one grouped aggregate.
    */
  def packingCrossDocAudit(df: DataFrame, textCol: String, idCol: String,
      budget: Long, numShards: Int = 8): DataFrame = {
    val toks = df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        TextOps.wsTokenCount(col(textCol)).as("tokens"))
    toks.join(packSequences(toks, "id", "tokens", budget, numShards),
        Seq("id"))
      .groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"),
        sum("tokens").as("window_tokens"),
        sum(col("tokens") * col("tokens")).as("_sq"))
      .select(col("shard"), col("bin"), col("n_docs"),
        col("window_tokens"),
        expr("(window_tokens * window_tokens - _sq) div 2")
          .as("cross_pairs"),
        expr("(window_tokens * (window_tokens - 1)) div 2")
          .as("total_pairs"),
        when(col("window_tokens") > 1, expr(
          "(1000000 * (window_tokens * window_tokens - _sq))" +
            " div (window_tokens * window_tokens - window_tokens)"))
          .as("cross_ppm"))
  }
}
