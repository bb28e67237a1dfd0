package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, Sketches, TextFunctions}

/** Sketch-based approximate aggregates (SURVEY §2 D29).
  *
  * At 100 TB an exact per-group COUNT(DISTINCT v) is one of the two
  * classic scale-killers (the other is the global sort): Spark plans
  * it either as an Expand (doubling the scanned rows per distinct
  * aggregate) or as two exchanges carrying every distinct value. The
  * KMV sketch ([[Sketches.KMinValues]]) replaces that with bounded
  * state — k longs per group per partition, partial-aggregated
  * map-side, one group-key exchange of ≤ k·groups longs total.
  *
  * Error: relative error of the (k-1)·2⁶³/kth estimator is ~1/√(k-2)
  * (≈6% at k=256). Groups with fewer than k distinct values are
  * EXACT — the sketch degrades to the full distinct hash set.
  *
  * Everything is deterministic (splitmix64 of the value, no RNG), so
  * the whole sketch — kept hashes, estimate, and its error vs the
  * exact count — replays bit-identically in the DuckDB oracle.
  */
object Sketch {

  /** 2⁶³ as a double (exactly representable: a power of two). */
  private val TwoPow63 = math.pow(2.0, 63)

  /** Per-stratum approximate distinct count of `value`.
    *
    * Output: (stratum, n_kept, kth_min, est_distinct) — `kth_min` is
    * the largest kept hash (the k-th minimum when the sketch is
    * full), `est_distinct` = (k-1)·2⁶³/kth when full, else the exact
    * kept count. One IEEE division past exact integers, so the
    * estimate itself is engine-portable. */
  /** The KMV estimate off a kept-hash array column: exact kept count
    * below k, else (k−1)·2⁶³/kth — one IEEE division past exact
    * integers ((k-1)·2⁶³ is exact in double: ≤ 10 significand bits
    * shifted by 63). */
  def kmvEstimate(kmv: Column, k: Int): Column = {
    val scale = (k - 1).toDouble * TwoPow63
    when(size(kmv) < k, size(kmv).cast("double"))
      .otherwise(lit(scale) / element_at(kmv, size(kmv)).cast("double"))
  }

  def distinctKmv(df: DataFrame, stratum: Column, value: Column,
                  k: Int, seed: Long = 7L): DataFrame =
    df.groupBy(stratum.as("stratum"))
      .agg(Sketches.kMinValues(Hashing.hashLong64(value, seed), k).as("kmv"))
      .select(
        col("stratum"),
        size(col("kmv")).cast("long").as("n_kept"),
        element_at(col("kmv"), size(col("kmv"))).as("kth_min"),
        kmvEstimate(col("kmv"), k).as("est_distinct"))

  /** [[distinctKmv]] plus the exact distinct count and the measured
    * relative error — the "approximation cost is a query result, not
    * a claim" companion (same pattern as the ANN recall gates). The
    * exact branch is the expensive plan the sketch replaces; it lives
    * only in this validation query. */
  def distinctKmvChecked(df: DataFrame, stratum: Column, value: Column,
                         k: Int, seed: Long = 7L): DataFrame = {
    val sk = distinctKmv(df, stratum, value, k, seed)
    val exact = df.groupBy(stratum.as("stratum"))
      .agg(count_distinct(value).as("exact_distinct"))
    sk.join(exact, "stratum")
      .withColumn("rel_err",
        abs((col("est_distinct") - col("exact_distinct").cast("double")) /
          col("exact_distinct").cast("double")))
  }

  /** One-pass per-column table statistics — the ANALYZE twin
    * (SURVEY §2 E11). Optimizers and layout tools live on exactly
    * four numbers per column (count, null count, min/max, NDV); at
    * 100 TB the first three partial-aggregate trivially but exact NDV
    * per column is the count-distinct scale-killer D29 retires — so
    * NDV here is the SAME KMV sketch, one per column, all folded in
    * ONE scan (a single partial-aggregated 1-row frame; no Expand, no
    * per-column passes). The 1-row result melts to (col_name, stats)
    * rows via a generate — no second scan.
    *
    * Columns must cast losslessly to long for the NDV hash (keys,
    * ints, dates-as-days); fractional columns need a caller-chosen
    * integer encoding — a truncating cast would silently merge
    * distinct values. */
  def tableStats(df: DataFrame, statCols: Seq[String],
                 k: Int = 256, seed: Long = 7L): DataFrame = {
    require(statCols.nonEmpty, "tableStats: need at least one column")
    val aggs = count(lit(1)).as("__total") +: statCols.flatMap { c => Seq(
      count(col(c)).as(s"__${c}_n"),
      min(col(c)).cast("double").as(s"__${c}_min"),
      max(col(c)).cast("double").as(s"__${c}_max"),
      Sketches.kMinValues(Hashing.hashLong64(col(c).cast("long"), seed), k)
        .as(s"__${c}_kmv"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(statCols.map { c =>
        struct(
          lit(c).as("col_name"),
          col(s"__${c}_n").as("n_vals"),
          (col("__total") - col(s"__${c}_n")).as("n_null"),
          col(s"__${c}_min").as("min_v"),
          col(s"__${c}_max").as("max_v"),
          kmvEstimate(col(s"__${c}_kmv"), k).as("ndv_est"))
      }: _*)).as("s"))
      .select(col("s.*"))
  }

  /** [[tableStats]] plus exact NDV and measured relative error per
    * column (the [[distinctKmvChecked]] validation pattern — the
    * exact side is one pruned single-column scan per column and lives
    * only in this validation query). */
  def tableStatsChecked(df: DataFrame, statCols: Seq[String],
                        k: Int = 256, seed: Long = 7L): DataFrame = {
    val exact = statCols.map { c =>
      df.select(col(c)).agg(count_distinct(col(c)).as("ndv_exact"))
        .select(lit(c).as("col_name"), col("ndv_exact"))
    }.reduce(_ unionByName _)
    tableStats(df, statCols, k, seed).join(exact, "col_name")
      .withColumn("rel_err",
        abs((col("ndv_est") - col("ndv_exact").cast("double")) /
          col("ndv_exact").cast("double")))
  }

  /** Sketch-based JOIN-SIZE estimation (SURVEY §2 E13) — the
    * optimizer statistic [[tableStats]]' NDV can't give: how many
    * DISTINCT KEYS two relations share, without joining them. The
    * classic KMV set-operation estimator (Beyer et al., SIGMOD'07):
    * kmin(A ∪ B) = kmin(kminA ∪ kminB), so the k-smallest of the two
    * sketches' union is itself the union's sketch; the fraction ρ of
    * those k that appear in BOTH sketches estimates the Jaccard of
    * the key sets, and `ρ · est(|A ∪ B|)` estimates the overlap. Two
    * dim-sized sketch aggregates (each partial-aggregated over its
    * relation), one cross join of 1-row frames — the relations are
    * never joined.
    *
    * Determinism: array ops over exact hashes; `ratio` is one integer
    * division and `est_common` one multiply, in fixed order — the
    * oracle replays every step. */
  def joinSizeEst(a: DataFrame, aKey: Column, b: DataFrame, bKey: Column,
                  k: Int = 256, seed: Long = 7L): DataFrame = {
    val sa = a.agg(Sketches.kMinValues(Hashing.hashLong64(aKey, seed), k).as("ka"))
    val sb = b.agg(Sketches.kMinValues(Hashing.hashLong64(bKey, seed), k).as("kb"))
    sa.crossJoin(sb)
      .withColumn("u",
        slice(array_sort(array_distinct(concat(col("ka"), col("kb")))), 1, k))
      .withColumn("n_inter",
        size(array_intersect(array_intersect(col("u"), col("ka")), col("kb"))))
      .withColumn("est_union", kmvEstimate(col("u"), k))
      .withColumn("ratio",
        col("n_inter").cast("double") / size(col("u")).cast("double"))
      .select(
        size(col("ka")).cast("long").as("n_a_kept"),
        size(col("kb")).cast("long").as("n_b_kept"),
        col("n_inter").cast("long").as("n_inter"),
        col("est_union"),
        (col("ratio") * col("est_union")).as("est_common"))
  }

  /** [[joinSizeEst]] plus the exact distinct-key overlap and measured
    * relative error — the validation companion (the exact side joins
    * the deduped key sets; it is the plan the estimator replaces). */
  def joinSizeEstChecked(a: DataFrame, aKey: Column, b: DataFrame, bKey: Column,
                         k: Int = 256, seed: Long = 7L): DataFrame = {
    val exact = a.select(aKey.as("__k")).distinct()
      .join(b.select(bKey.as("__k")).distinct(), Seq("__k"))
      .agg(count(lit(1)).as("exact_common"))
    joinSizeEst(a, aKey, b, bKey, k, seed).crossJoin(exact)
      .withColumn("rel_err",
        abs((col("est_common") - col("exact_common").cast("double")) /
          col("exact_common").cast("double")))
  }

  /** Point query against a [[graft.functions.Sketches.CountMinSketch]]
    * matrix column: minimum of the item's `depth` cells. Pure column
    * expression — probing N items against a broadcast 1-row sketch is
    * map-side. Never underestimates. */
  def cmsEstimate(cms: Column, hashed: Column, depth: Int, width: Int): Column =
    (0 until depth).map { r =>
      element_at(cms,
        (lit(r.toLong * width) +
          shiftrightunsigned(Hashing.hashLong64(hashed, r.toLong), 1) % width
          + 1L).cast("int"))
    }.reduce(least(_, _))

  /** Heavy hitters over the corpus bigram vocabulary via Count-Min
    * (SURVEY §2 D31): which bigrams appear in ≥ `minCount` documents —
    * the approximate sibling of the exact [[Corpus.topNgrams]] (D19).
    * The exact version shuffles the whole vocabulary (fine when the
    * vocabulary is bounded; at 100 TB of web text with URLs/ids/typos
    * it isn't); this one never holds per-item counts:
    *
    *  1. ONE corpus pass folds every (doc, bigram) occurrence into a
    *     single depth×width Count-Min matrix (partial-aggregated
    *     map-side; the exchange carries one ~16 KB matrix per
    *     partition, regardless of vocabulary size). Bigrams ride as
    *     the codegen'd [[Hashing.HashedShinglesN]] 64-bit hashes —
    *     per-doc distinct, so the matrix counts DOC frequency, same
    *     contract as D19;
    *  2. candidate bigrams come from a deterministic 1-in-`sampleMod`
    *     hash-sample of documents — an item hitting `minCount` docs
    *     misses an f-fraction sample with prob (1−f)^minCount, so
    *     recall comes from the sample (and sharpens as minCount
    *     grows), precision from the sketch;
    *  3. candidates probe the broadcast matrix map-side; the estimate
    *     can only OVERCOUNT, so `est >= minCount` keeps every truly
    *     frequent candidate — no false negatives past sampling.
    *
    * The output also carries each kept candidate's EXACT doc
    * frequency (a candidate-bounded aggregate — validation in the
    * style of [[distinctKmvChecked]]; the scale path drops it), so
    * the CMS one-sided error (`est >= df`, strict where cells
    * collide) is visible in the result. All integers — hash-exact
    * oracle. */
  /** Deterministic quantile estimates from a BOTTOM-k-BY-HASH uniform
    * sample — the distribution profile (length/quality deciles over a
    * corpus) without the global sort exact quantiles need.
    *
    * Why this shape at 100 TB: `percentile`/`quantile_cont` sort the
    * column; streaming sketches (KLL, t-digest) are mergeable but
    * their state depends on partition merge ORDER, so results differ
    * run to run and can never hash-match an oracle. Bottom-k by a
    * 64-bit hash of the row KEY is both: the k smallest hashes of the
    * union are the merge of the k smallest per partition
    * (`TakeOrderedAndProject` — per-partition top-k, driver merges k
    * rows per partition), the sample is uniform because the hash is,
    * and the result is a pure function of the data — the same KMV
    * argument [[distinctKmv]] uses, applied to sampling. Rank error is
    * the usual sampling error (±~1.3/√k per quantile at k=1000).
    *
    * Quantile definition (exact, interpolation-free, so any engine
    * agrees bit-for-bit): value at 0-based index `floor(q·(n-1))` of
    * the sample ordered by (value, key), n = |sample| ≤ k. Returns
    * (q, v). */
  def quantileSketch(df: DataFrame, key: Column, value: Column, k: Int = 1000,
                     quantiles: Seq[Double] =
                       Seq(0.0, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sampled = df
      .select(key.as("__k"), value.as("__v"),
        graft.functions.Hashing.hashLong64(key.cast("long"), 77L).as("__h"))
      .orderBy(col("__h"), col("__k")).limit(k)
    // the windows below are over the ≤k-row sample only — bounded by
    // construction, never corpus-sized
    val ranked = sampled
      .withColumn("rn", row_number().over(Window.orderBy(col("__v"), col("__k"))))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val qs = df.sparkSession.range(1).select(
      explode(typedlit(quantiles)).as("q"))
    ranked.join(qs,
        (col("rn") - 1).cast("long") === floor(col("q") * (col("n") - 1)).cast("long"))
      .select(col("q"), col("__v").as("v"))
  }

  /** Per-GROUP quantile estimates — [[quantileSketch]] stratified:
    * each group keeps its own bottom-`k`-by-hash sample and its own
    * interpolation-free index-rule quantiles ("length p50/p90 per
    * language" — the per-stratum distribution profile a corpus mix
    * report needs). Returns (stratum, q, v).
    *
    * Scale shape: ONE hash exchange on the group key. The per-group
    * bottom-k is a `row_number ≤ k` over (hash, key) — Spark plants a
    * partial WindowGroupLimit BEFORE the exchange, so the shuffle
    * carries at most k rows per group per input partition, never the
    * group's full membership; the rank/count windows after it run on
    * sample-sized groups under the SAME partitioning (no second
    * exchange). Same determinism argument as [[quantileSketch]]: the
    * sample is a pure function of the data, so the result hash-matches
    * the DuckDB replay at any partitioning. */
  def groupQuantileSketch(df: DataFrame, group: Column, key: Column,
                          value: Column, k: Int = 200,
                          quantiles: Seq[Double] =
                            Seq(0.0, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byGroup = Window.partitionBy(col("__g"))
    val sampled = df
      .select(group.as("__g"), key.as("__k"), value.as("__v"),
        graft.functions.Hashing.hashLong64(key.cast("long"), 77L).as("__h"))
      .withColumn("srn", row_number().over(byGroup.orderBy(col("__h"), col("__k"))))
      .where(col("srn") <= k)
    val ranked = sampled
      .withColumn("rn", row_number().over(byGroup.orderBy(col("__v"), col("__k"))))
      .withColumn("n", count(lit(1)).over(byGroup))
    val qs = df.sparkSession.range(1).select(
      explode(typedlit(quantiles)).as("q"))
    ranked.join(qs,
        (col("rn") - 1).cast("long") === floor(col("q") * (col("n") - 1)).cast("long"))
      .select(col("__g").as("stratum"), col("q"), col("__v").as("v"))
  }

  def heavyHittersCms(docs: DataFrame, depth: Int = 4, width: Int = 512,
                      minCount: Long = 30L, sampleMod: Int = 20,
                      seed: Long = 11L): DataFrame = {
    val items = docs.select(col("doc_id"),
      explode(Hashing.hashedShinglesNCol(
        TextFunctions.tokens(col("text")), 2)).as("bg"))
    val sketch = items.agg(Sketches.countMin(col("bg"), depth, width).as("cms"))
    val cand = items
      .filter(shiftrightunsigned(Hashing.hashLong64(col("doc_id"), seed), 1)
        % sampleMod === 0)
      .select(col("bg")).distinct()
    val exact = items.join(broadcast(cand), Seq("bg")).groupBy(col("bg"))
      .agg(count(lit(1)).as("df"))
    cand
      .crossJoin(broadcast(sketch))
      .withColumn("est", cmsEstimate(col("cms"), col("bg"), depth, width))
      .filter(col("est") >= minCount)
      .join(exact, Seq("bg"))
      .select(col("bg"), col("est"), col("df"))
  }
}
