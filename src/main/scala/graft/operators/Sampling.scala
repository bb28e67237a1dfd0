package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Deterministic corpus sampling / splitting / mixing for
  * training-data pipelines (SURVEY §2 D13-D15).
  *
  * Everything here keys off [[Hashing.hashLong64]] (splitmix64 of the
  * row id with a per-operator seed) instead of `rand()`: the same row
  * lands in the same bucket on every run, every partitioning, and in
  * the DuckDB oracle — which is what a 100 TB pipeline actually needs
  * (re-runs must not reshuffle the eval split, and a doc's split must
  * survive being joined from another stage). All three operators are
  * MAP-ONLY on the corpus except [[domainMix]], which needs one
  * hash-partitioned window per stratum — no global sort, no collect.
  */
object Sampling {

  /** [[weightedSample]]'s default hash seed — named so oracle SQL
    * builders interpolate the same value the engine uses. */
  val WeightedSeed = 23L

  /** Uniform bucket in [0, 100): unsigned-shift the hash so the
    * modulo is sign-free (DuckDB replay: `(h // 2) % 100`). */
  def bucket(id: Column, seed: Long): Column =
    (shiftrightunsigned(Hashing.hashLong64(id, seed), 1) % 100).cast("int")

  /** Per-stratum deterministic downsample: keep rows whose bucket
    * falls under the stratum's sampling percentage. `ratePct` is any
    * column expression in [0,100] — a literal, a joined-in rates
    * column, or a rule over the stratum key. Map-only: no shuffle, no
    * state, reproducible. */
  def stratified(df: DataFrame, id: Column, ratePct: Column, seed: Long = 11L): DataFrame =
    df.withColumn("bucket", bucket(id, seed)).where(col("bucket") < ratePct)

  /** Hash-based train/valid/test assignment (98/1/1-style fractions
    * given as cumulative percentage cut points). Map-only; the split
    * is a pure function of the id, so any stage can recompute it
    * without a join against a split table. */
  def trainTestSplit(df: DataFrame, id: Column, trainPct: Int = 90,
                     validPct: Int = 5, seed: Long = 13L): DataFrame = {
    val b = bucket(id, seed)
    df.withColumn("bucket", b)
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + validPct, "valid")
          .otherwise("test"))
  }

  /** EXACT-quota stratified split — [[trainTestSplit]] guarantees the
    * ratios only in expectation (hash buckets), which under-represents
    * SMALL strata: a 30-doc language can land 40/60 instead of 90/10.
    * Here every stratum is split at exact rank quotas: rows rank by
    * (hash, id) WITHIN the stratum and the first
    * `floor(n·trainPct/100)` are train, the next
    * `floor(n·validPct/100)` valid, the rest test — per-stratum counts
    * are exact to the floor, and membership is still a deterministic
    * pure function of (data, seed). Integer quota arithmetic
    * (`rk·100 ≤ n·pct`), no doubles anywhere. One stratum exchange;
    * AQE splits skewed strata. */
  def splitExact(df: DataFrame, id: Column, stratum: Column,
                 trainPct: Int = 90, validPct: Int = 5,
                 seed: Long = 13L): DataFrame = {
    require(trainPct > 0 && validPct >= 0 && trainPct + validPct < 100,
      s"invalid split ($trainPct, $validPct)")
    val w = Window.partitionBy(stratum).orderBy(Hashing.hashLong64(id, seed), id)
    val n = count(lit(1)).over(Window.partitionBy(stratum))
    df.withColumn("rk", row_number().over(w))
      .withColumn("split",
        // rk is IntegerType (row_number); widen BEFORE the multiply or
        // rk*100 wraps past ~21.4M rows per stratum. n (count over
        // window) is already LongType, so the comparison stays long.
        when(col("rk").cast("long") * 100 <= n * trainPct, "train")
          .when(col("rk").cast("long") * 100 <= n * (trainPct + validPct), "valid")
          .otherwise(lit("test")))
      .drop("rk")
  }

  /** Balanced domain mix: at most `perStratum` rows from each stratum,
    * picked by hash rank (deterministic, not first-k-by-position — so
    * the sample is unbiased w.r.t. input order). One window per
    * stratum, hash-partitioned on the stratum key; at 100 TB this is a
    * single exchange and AQE splits skewed strata. */
  def domainMix(df: DataFrame, id: Column, stratum: Column, perStratum: Int,
                seed: Long = 17L): DataFrame = {
    val w = Window.partitionBy(stratum).orderBy(Hashing.hashLong64(id, seed), id)
    df.withColumn("rk", row_number().over(w).cast("int"))
      .where(col("rk") <= perStratum)
  }

  /** Temperature-scaled domain mixture (the pretraining data-mixing
    * step: upsample small domains, downsample the head — e.g. the
    * multilingual sampling rule `p_i^τ / Σ p_j^τ` of Conneau &
    * Lample, "Cross-lingual Language Model Pretraining", and the
    * domain-weights tables of GPT-3/The Pile): per domain, the
    * natural share `p_i = n_i/N`, its temperature-flattened weight,
    * and the integer document quota out of `budget` the domain gets
    * under that mix.
    *
    * τ is FIXED at 0.5 — `p^0.5 = sqrt(p)`, and `sqrt` is an
    * IEEE-754 correctly-rounded operation on BOTH engines, while
    * arbitrary-τ `pow` is a libm call with engine-dependent last-ulp
    * rounding (the same determinism trade documented on
    * [[weightedSample]]'s Efraimidis–Spirakis deviation). τ = 0.5 is
    * itself a standard operating point (XLM uses τ ∈ {0.5, 0.7}).
    * Weights are quantized to fixed-point (`floor(1e9·sqrt(p))` as
    * BIGINT) so the normalizer is an order-free integer sum, and the
    * quota uses pure integer arithmetic (`w_fp·budget div Σw_fp`) —
    * no float ever crosses an aggregation.
    *
    * Scale shape: one corpus-wide count per domain (map-side
    * combined), then two broadcast 1-row stat frames (N, Σw_fp); the
    * result is domain-cardinality-sized. Rounding note: quotas are
    * floors, so `Σ quota ≤ budget` — the ≤ #domains leftover docs are
    * the caller's to assign (largest-remainder or drop). */
  def temperatureMix(df: DataFrame, stratum: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    // quota = w_fp·budget div z_fp with w_fp ≤ 1e9: the product must
    // stay in 64 bits (Spark's ANSI-off multiply wraps silently).
    // Budgets here are mix-batch DOC counts; for a larger unit scale
    // it down (the quota is a proportion — units cancel).
    require(budget <= Long.MaxValue / 1000000000L,
      s"budget=$budget overflows the fixed-point quota arithmetic " +
        s"(max ${Long.MaxValue / 1000000000L})")
    val cnt = df.groupBy(stratum.as("source")).agg(count(lit(1)).as("n_docs"))
    val tot = cnt.agg(sum(col("n_docs")).as("n_total"))
    val scored = cnt.crossJoin(broadcast(tot))
      .withColumn("p", col("n_docs").cast("double") / col("n_total").cast("double"))
      .withColumn("w_fp", floor(lit(1e9) * sqrt(col("p"))).cast("long"))
    val z = scored.agg(sum(col("w_fp")).as("z_fp"))
    scored.crossJoin(broadcast(z))
      .withColumn("weight", col("w_fp").cast("double") / col("z_fp").cast("double"))
      .withColumn("quota", expr(s"(w_fp * ${budget}L) div z_fp"))
      .select(col("source"), col("n_docs"), col("p"), col("w_fp"),
        col("weight"), col("quota"))
  }

  /** Deterministic global shuffle into training shards: every row gets
    * a `(shard, shard_pos)` address — shard by sign-free hash modulo,
    * position by hash rank WITHIN the shard. This is the "shuffle
    * 100 TB for training order" operator: a training job reads shard
    * files in shard_pos order and sees a reproducible random
    * permutation, without any engine ever materializing a global sort
    * (a global sort = range exchange over the full corpus; here the
    * only exchange is the hash partition by shard, and each shard
    * sorts locally — shards are output-file-sized by construction, and
    * hash sharding cannot skew). Re-runs, re-partitionings and the
    * DuckDB oracle all agree on every row's address because the hash
    * is splitmix64 of the id, not `rand()`. */
  def shardAssign(df: DataFrame, id: Column, nShards: Int, seed: Long = 19L): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    // >>> 1 makes the modulo sign-free (DuckDB replay: (h // 2) % n)
    val h = shiftrightunsigned(Hashing.hashLong64(id, seed), 1)
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), id)
    df.withColumn("__h", h)
      .withColumn("shard", (col("__h") % nShards).cast("int"))
      .withColumn("shard_pos", (row_number().over(w) - 1).cast("int"))
      .drop("__h")
  }

  /** Deterministic weighted sample: the `n` rows per stratum with the
    * smallest `priority = hash63(id) / weight` — a hash-uniform
    * priority scaled by 1/weight, so selection probability grows
    * monotonically with the weight (quality-weighted corpus sampling:
    * weight = a quality score, token count, dedup-keeper score, …).
    *
    * Honest note on the distribution: the textbook
    * Efraimidis–Spirakis key is u^(1/w) (equivalently −ln(u)/w),
    * which makes inclusion probabilities EXACTLY proportional to
    * weights. `ln`/`pow` are libm calls whose last-ulp behavior
    * differs across engines, which would break the bit-exact oracle
    * this repo holds every operator to — so the shipped priority is
    * the one-IEEE-division u/w: same monotone weight preference,
    * same top-k plan, slightly flatter tail probabilities. Swap the
    * priority expression for `-log(u)/w` if within-engine
    * determinism is enough.
    *
    * Plan shape at 100 TB: priorities are map-side; the per-stratum
    * top-n runs as a partial WindowGroupLimit BEFORE the one stratum
    * exchange, so each partition ships at most n rows per stratum —
    * never the corpus. Ties (two ids with equal priority) break by
    * id, so the sample is total-order stable.
    *
    * Weights must be strictly positive: a zero weight has no defined
    * priority (h/0 = ∞) and a negative one would sort FIRST and be
    * silently always selected. Non-positive and NULL weights are
    * filtered out defensively — a row with no usable weight is not in
    * the sampling population. */
  def weightedSample(df: DataFrame, id: Column, weight: Column, stratum: Column,
                     n: Int, seed: Long = WeightedSeed): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    // mask to [0, 2^63) so the double conversion is of a nonnegative
    // exact integer (DuckDB replay: h % 2^63, same division)
    val h63 = Hashing.hashLong64(id, seed).bitwiseAND(Long.MaxValue)
    val w = Window.partitionBy(stratum).orderBy(col("priority"), id)
    df.where(weight.isNotNull && weight > 0)
      .withColumn("priority", h63.cast("double") / weight.cast("double"))
      .withColumn("rk", row_number().over(w).cast("int"))
      .where(col("rk") <= n)
  }

  /** Referentially-CONSISTENT sampling — carve a dev/test slice out of
    * a production schema: hash-sample `pct`% of the ROOT entities
    * (customers) and keep EVERY dependent row (their orders, those
    * orders' lineitems), so the slice satisfies all foreign keys and
    * per-entity behavior is complete. Independent per-table sampling
    * — the naive approach — breaks both (an order whose customer was
    * dropped; a lineitem whose order was). Root membership is a pure
    * hash of the root key (splitmix64, never `rand()`), so the same
    * slice is reproducible anywhere, and GROWING pct keeps the old
    * slice as a subset (hash-threshold monotonicity).
    *
    * Scale shape: the root filter is map-side; dependents attach by
    * LEFT SEMI joins DOWN the FK chain (orders semi-join sampled
    * customers, lineitem joins surviving orders) — each join
    * hash-partitions on the FK, AQE picks broadcast when the sampled
    * root set is small. Returns the lineitem-grain slice keyed
    * (l_orderkey, l_linenumber, o_custkey). */
  def consistentSample(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame, pct: Int,
                       seed: Long = 5L): DataFrame = {
    require(pct > 0 && pct <= 100, s"pct in (0, 100], got $pct")
    val sampledCust = customer.select(col("c_custkey"))
      .where(shiftrightunsigned(Hashing.hashLong64(col("c_custkey"), seed), 1)
        % 100 < pct)
    val sampledOrders = orders
      .join(sampledCust, col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey"), col("o_custkey"))
    lineitem.select(col("l_orderkey"), col("l_linenumber"))
      .join(sampledOrders, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_custkey"))
  }
}
