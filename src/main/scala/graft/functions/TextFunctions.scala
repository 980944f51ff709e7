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

  // PII patterns for text redaction — the text-pipeline counterpart of the
  // reference's image-region blur (select-labelling-imgs.py anonymizes
  // detected faces/text before publishing; a text corpus scrubs these
  // before training). Conservative, linear-time regexes (no catastrophic
  // backtracking: character classes + bounded quantifiers only).
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "(?:\\+?[0-9]{1,3}[-. ])?\\(?[0-9]{3}\\)?[-. ][0-9]{3}[-. ][0-9]{4}"
  val SsnPattern = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  val Ipv4Pattern = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** Redact PII spans in free text: emails, phone numbers, SSN-shaped ids,
    * and IPv4 addresses replaced with typed placeholders. Order matters —
    * SSN before phone (an SSN also matches loose phone shapes), email
    * before IPv4 (domains can look numeric). Pure codegen'd regexp_replace
    * chain: one pass per pattern, partition-parallel, no UDF.
    */
  def redactPii(text: Column): Column = {
    val e = regexp_replace(text, EmailPattern, "[EMAIL]")
    val s = regexp_replace(e, SsnPattern, "[SSN]")
    val p = regexp_replace(s, PhonePattern, "[PHONE]")
    regexp_replace(p, Ipv4Pattern, "[IP]")
  }

  /** Count of PII spans by kind, same patterns as redactPii. */
  def piiCounts(text: Column): Column = {
    val afterEmail = regexp_replace(text, EmailPattern, "[EMAIL]")
    val afterSsn = regexp_replace(afterEmail, SsnPattern, "[SSN]")
    val afterPhone = regexp_replace(afterSsn, PhonePattern, "[PHONE]")
    struct(
      regexp_count(text, lit(EmailPattern)).as("emails"),
      regexp_count(afterEmail, lit(SsnPattern)).as("ssns"),
      regexp_count(afterSsn, lit(PhonePattern)).as("phones"),
      regexp_count(afterPhone, lit(Ipv4Pattern)).as("ips"))
  }
}
