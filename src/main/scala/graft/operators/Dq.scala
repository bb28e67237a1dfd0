package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (SURVEY §2 E12) — the
  * Deequ/dbt-test shape, engine-owned: a rule set evaluates to a
  * `(rule, violations, checked)` summary frame a pipeline gates on.
  *
  * Scale shape: all ROW-LOCAL rules (not-null, range, accepted
  * values, regex) fold in ONE scan as conditional partial aggregates
  * — adding a rule adds a counter, never a pass. Key uniqueness rides
  * the same aggregate (`count − count_distinct`, one distinct — no
  * Expand). Referential integrity is the one rule that genuinely
  * needs a second relation: an anti-join counted, broadcast when the
  * parent is dim-sized.
  *
  * All counters are exact integers — the summary hash-replays
  * anywhere.
  */
object Dq {

  /** A named rule: `violated` evaluates true on a bad row. */
  case class Rule(name: String, violated: Column)

  /** Row-local rules + optional unique-key rules, one scan.
    * Output: (rule, violations, checked). */
  def check(df: DataFrame, rules: Seq[Rule],
            uniqueKeys: Seq[(String, Column)] = Nil): DataFrame = {
    require(rules.nonEmpty || uniqueKeys.nonEmpty, "Dq.check: no rules")
    val ruleAggs = rules.map(r =>
      coalesce(sum(when(r.violated, 1L).otherwise(0L)), lit(0L)))
    // uniqueness counts over NON-NULL keys (count(k) skips nulls like
    // count_distinct does) — NULL keys are the not-null rule's
    // business, same contract as refIntegrity
    val uniqAggs = uniqueKeys.map { case (_, k) => count(k) - count_distinct(k) }
    val names = rules.map(_.name) ++ uniqueKeys.map(_._1)
    // aggregates are aliased POSITIONALLY (`__v_0`, `__v_1`, …): rule
    // names surface only as string literals in the output rows, so a
    // name containing a dot or backtick can never break col()
    // resolution
    val aggs = (ruleAggs ++ uniqAggs).zipWithIndex
      .map { case (a, i) => a.as(s"__v_$i") } :+ count(lit(1)).as("__n")
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(names.zipWithIndex.map { case (n, i) =>
        struct(lit(n).as("rule"), col(s"__v_$i").as("violations"),
          col("__n").as("checked"))
      }: _*)).as("s"))
      .select(col("s.*"))
  }

  /** Referential integrity: child rows whose `childKey` has no match
    * in `parent` (NULL child keys are not violations — that's the
    * not-null rule's job). Parent side reduces to distinct keys
    * before the anti-join (broadcast when dim-sized). */
  def refIntegrity(name: String, child: DataFrame, childKey: String,
                   parent: DataFrame, parentKey: String): DataFrame = {
    val keys = parent.select(col(parentKey).as(childKey)).distinct()
      .withColumn("__hit", lit(1))
    child.join(broadcast(keys), Seq(childKey), "left")
      .agg(
        coalesce(sum(when(col(childKey).isNotNull && col("__hit").isNull, 1L)
          .otherwise(0L)), lit(0L)).as("violations"),
        count(lit(1)).as("checked"))
      .select(lit(name).as("rule"), col("violations"), col("checked"))
  }
}
