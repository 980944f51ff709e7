package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable text primitives (SURVEY.md §2.C).
  *
  * Everything here is built from codegen'd Catalyst higher-order functions —
  * no UDFs — and uses engine-portable arithmetic (polynomial rolling hash
  * mod 1e9+7) so the DuckDB oracle can reproduce values bit-for-bit.
  */
object TextFunctions {

  val HashMod = 1000000007L

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Polynomial rolling hash of a string: fold (acc*31 + c) % 1e9+7.
    * The portable content hash for shingles/tokens/fingerprints — pure
    * integer arithmetic any engine can reproduce (DuckDB: ascii() fold).
    * Backed by the native codegen expression graft.plans.CharHash.
    */
  def charHash(s: Column): Column = call_function("graft_charhash", s)

  /** Word n-gram shingles (default 3). Empty for texts shorter than n. */
  def shingles(text: Column, n: Int = 3): Column = {
    val ts = tokens(text)
    when(size(ts) >= n,
      transform(sequence(lit(1), size(ts) - (n - 1)), i => concat_ws(" ", slice(ts, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Count of tokens belonging to a fixed vocabulary. */
  def vocabCount(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(words)))
}
