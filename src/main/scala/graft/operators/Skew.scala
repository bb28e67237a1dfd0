package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Explicit key-salting for skewed joins (SURVEY §2 E5).
  *
  * AQE's skew-join split handles most hot keys at runtime, but it only
  * fires on sort-merge joins over fresh shuffle stats — it cannot help
  * when the join is shuffle-free (bucketed/co-located inputs), when a
  * stage reuses a cached exchange, or when the planner's stats miss
  * the skew. Salting is the deterministic, plan-time control: the
  * skewed side scatters each hot key across `buckets` sub-keys, the
  * other side replicates `buckets`-fold, and the join key becomes
  * `(key, salt)` — so one hot key occupies `buckets` partitions
  * instead of one.
  *
  * The salt is [[Hashing.hashLong64]] of a caller-chosen distributor
  * column (e.g. the fact row's id) — NOT `rand()` — so the plan stays
  * deterministic and re-runs produce identical partition placement.
  * Result rows are exactly the plain join's: each skewed-side row
  * carries one salt, and the replicated side covers every salt value.
  */
object Skew {

  private val SupportedJoins = Set("inner", "left", "leftouter", "leftsemi", "leftanti")

  /** Equi-join `skewed ⋈ other` on `keys`, salted `buckets`-wide.
    * `distributor` must be a (castable-to-)long column of the skewed
    * side that varies within a hot key. Join types that would see the
    * replicated rows in the output (right/full outer) are rejected —
    * replication would duplicate unmatched `other` rows. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
                 distributor: Column, buckets: Int,
                 joinType: String = "inner"): DataFrame = {
    require(buckets >= 2, s"buckets=$buckets: salting needs >= 2 buckets")
    require(SupportedJoins.contains(joinType.toLowerCase.replace("_", "")),
      s"joinType=$joinType not salt-safe (replicated side would leak into the output)")
    // A NULL distributor (or a failed long cast under non-ANSI mode)
    // must not lose the row: HashLong64 is null-intolerant, and a NULL
    // salt never equi-matches — an inner join would silently drop the
    // row, breaking the result-equivalence contract above. Any constant
    // fallback keeps determinism; such rows just share bucket hash(0).
    val salted = skewed.withColumn("__salt",
      pmod(Hashing.hashLong64(coalesce(distributor.cast("long"), lit(0L)), 23L),
        lit(buckets)).cast("int"))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
