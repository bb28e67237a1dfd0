package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns.
  *
  * All arithmetic is promoted to double and folded strictly
  * left-to-right, which makes results bit-reproducible across engines
  * and partitionings (a requirement for the DuckDB oracle and for
  * threshold-stable dedup at scale). Built on higher-order functions so
  * the whole computation stays inside Catalyst — no UDF serialization,
  * no driver involvement.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double, left-to-right. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
