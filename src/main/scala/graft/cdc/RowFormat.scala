package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-format normalization: the reference's JDBC/binlog type fidelity
  * rules re-expressed as column transforms.
  *
  * Reference: `src/dumpr/query.clj:10-17` pins the connector flags
  * `tinyInt1isBit=false` (tinyint(1) stays an integer, not a boolean)
  * and `zeroDateTimeBehavior=convertToNull` (invalid zero dates become
  * NULL); `src/dumpr/stream.clj:225-241` decodes text columns per their
  * column charset; timestamps are fixed to UTC
  * (`src/dumpr/query.clj:31-43`). The point of all of them: the
  * snapshot and the stream must yield byte-identical row content.
  *
  * The demo normalization below applies the same rule *shapes* to the
  * synthetic `events` table: a packed string field is parsed
  * (charset-decode analogue), a numeric flag stays an int (tinyint1
  * rule), an out-of-range marker maps to NULL (zero-date rule), and
  * times are emitted as UTC date strings.
  */
object RowFormat {

  /** `(pos, k, flag, day, etype)` — deterministic, engine-portable. */
  def normalize(events: DataFrame): DataFrame =
    events.select(
      col("event_id").as("pos"),
      propsK.as("k"),
      when(col("value") > 50.0, lit(1)).otherwise(lit(0)).as("flag"),
      when(propsK === 0, lit(null).cast("string"))
        .otherwise(date_format(timestamp_micros(expr("ts div 1000")), "yyyy-MM-dd"))
        .as("day"),
      upper(col("event_type")).as("etype")
    )

  /** Rows that fail validation are routed to a dead-letter output
    * instead of poisoning the stream. Reference: the `:error` row type
    * (`src/dumpr/row_format.clj:16-17`, emitted at
    * `src/dumpr/stream.clj:196-210` when schema load/validation fails).
    */
  def deadLetter(events: DataFrame): DataFrame =
    events
      .select(col("event_id").as("pos"), propsK.as("k"))
      .filter(col("k") >= 95)
      .withColumn("reason", lit("k_out_of_range"))

  private def propsK =
    regexp_extract(col("props"), "(\\d+)", 1).cast("int")
}
