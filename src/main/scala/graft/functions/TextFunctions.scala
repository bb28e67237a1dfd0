package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the training-data pipeline
  * operators (SURVEY §2 D8-D11). Pure `functions._` compositions —
  * codegen-friendly, engine-portable (each has an exact DuckDB
  * counterpart used by the oracles).
  */
object TextFunctions {

  /** Whitespace tokens (keeps empties, same as DuckDB string_split). */
  def tokens(text: Column): Column = split(text, " ")

  /** Occurrences of exactly `word` among tokens. */
  def tokenCount(toks: Column, word: String): Column =
    size(filter(toks, _ === word))

  /** Distinct word 3-gram shingles, `w_i '_' w_i+1 '_' w_i+2`.
    * 1-based positions mirror DuckDB list indexing so the oracle SQL is
    * a literal transliteration. */
  def shingles3(toks: Column): Column =
    when(size(toks) >= lit(3),
      array_distinct(
        transform(sequence(lit(1), size(toks) - 2),
          i => concat_ws("_", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))))
      .otherwise(array().cast("array<string>"))

  /** Exact Jaccard similarity of two distinct-element arrays, computed
    * as |∩| / (|a|+|b|-|∩|) in double — integer-derived, so
    * bit-identical across engines. */
  def jaccard(a: Column, b: Column): Column = {
    val i = size(array_intersect(a, b)).cast("double")
    i / (size(a) + size(b) - size(array_intersect(a, b)))
  }

  /** Heuristic language ID from stopword densities (deterministic
    * integer cross-multiplications; SURVEY §2 D8). */
  def langId(toks: Column): Column = {
    val n = size(toks)
    when(tokenCount(toks, "the") * 12 >= n, "en")
      .when(tokenCount(toks, "a") * 12 >= n, "fr")
      .when(tokenCount(toks, "data") * 15 >= n, "de")
      .when(tokenCount(toks, "join") * 15 >= n, "es")
      .otherwise("zh")
  }

  /** Composite quality score in [0,1]: length, stopword ratio, mean
    * word length (SURVEY §2 D9). Fixed evaluation order for
    * reproducibility. */
  def qualityScore(text: Column, nChars: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks)
    val nStop = tokenCount(toks, "the") + tokenCount(toks, "a")
    val meanWl = (nChars - (nTok - 1)).cast("double") / nTok
    round(
      least(nTok, lit(300)).cast("double") / 300.0 * 0.4 +
        (lit(1.0) - nStop.cast("double") / nTok) * 0.3 +
        least(meanWl, lit(8.0)) / 8.0 * 0.3,
      6)
  }

  /** BPE-ish piece count: ⌈len/4⌉ per whitespace token (SURVEY D10). */
  def bpeishCount(toks: Column): Column =
    aggregate(
      transform(toks, t => ((length(t) + 3) / 4).cast("long")),
      lit(0L),
      (acc, v) => acc + v)
}
