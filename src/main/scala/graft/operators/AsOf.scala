package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: each left row picks up the LATEST right
  * row with the same key and `rightTime <= leftTime` (SURVEY §2 C8).
  *
  * Spark has no native as-of join; the classic scalable formulation is
  * NOT a join at all but a union + window: tag both sides, sort by
  * `(key, time, side)` within key partitions, and carry the last seen
  * right-side payload forward onto every left row. One hash exchange
  * on the key, one within-partition sort — same cost as a sort-merge
  * join, no range-explosion, no per-key driver loops, AQE-splittable.
  * This beats the naive `left join + filter + row_number` (which
  * materializes every (left × earlier-right) pair before ranking —
  * quadratic in rows-per-key).
  *
  * Tie semantics: a right row AT `leftTime` matches (inclusive <=) —
  * right rows sort before left rows at equal time. The right side
  * should be unique per `(keys, rightTime)`; among exact duplicates
  * the match is the last in encounter order (DuckDB's ASOF JOIN is
  * equally unspecified there).
  *
  * All matched right columns travel in ONE struct, so a right row
  * whose payload contains legitimate NULLs can never mix fields from
  * two different right rows (a per-column `last(ignoreNulls)` would).
  */
object AsOf {

  /** `left ⟕asof right` on `keys`. Right columns (except the keys)
    * appear in the output as `<prefix><col>`, NULL when no right row
    * precedes the left row. `leftTime`/`rightTime` must share an
    * orderable type. */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String,
           prefix: String = "asof_"): DataFrame =
    joinImpl(left, right, keys, leftTime, rightTime, prefix, forward = false)

  /** Forward as-of: each left row picks up the EARLIEST right row with
    * `rightTime >= leftTime` (inclusive) — "the next quote at or after
    * the order". Same union+window plan with the time order reversed:
    * walking times descending, the last right row seen at or above a
    * left row is exactly the minimum `rightTime >= leftTime`. Identical
    * cost profile to [[join]]. */
  def joinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTime: String, rightTime: String,
                  prefix: String = "asof_"): DataFrame =
    joinImpl(left, right, keys, leftTime, rightTime, prefix, forward = true)

  private def joinImpl(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTime: String, rightTime: String,
                       prefix: String, forward: Boolean): DataFrame = {
    // The union+window plumbing reserves __t/__r/__rv/__m; an input that
    // already carries one would alias-collide (analysis error or a
    // silently wrong window). Fail loudly instead, like the other
    // operators' defensive requires.
    val reserved = Set("__t", "__r", "__rv", "__m")
    val clash = (left.columns ++ right.columns).filter(reserved.contains).distinct
    require(clash.isEmpty,
      s"AsOf.join: input column(s) ${clash.mkString(", ")} collide with reserved internal names")
    val rvCols = right.columns.filterNot(keys.contains).toSeq
    val prefClash = left.columns.toSet.intersect(rvCols.map(prefix + _).toSet)
    require(prefClash.isEmpty,
      s"AsOf.join: left column(s) ${prefClash.mkString(", ")} collide with prefixed right outputs")
    val rStruct = struct(rvCols.map(c => col(c).as(prefix + c)): _*)
    val rvType = right.select(rStruct).schema.head.dataType

    val rTagged = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(1).as("__r"), rStruct.as("__rv")): _*)
    val lTagged = left.select(
      left.columns.map(col).toSeq ++ Seq(
        col(leftTime).as("__t"), lit(0).as("__r"),
        lit(null).cast(rvType).as("__rv")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(if (forward) col("__t").desc else col("__t"), col("__r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged, allowMissingColumns = true)
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__r") === 0)
      .select(left.columns.map(col).toSeq ++
        rvCols.map(c => col(s"__m.$prefix$c").as(prefix + c)): _*)
  }
}
