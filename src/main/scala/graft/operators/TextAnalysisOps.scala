package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Exact._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions.{norm, toDouble}

/** Text-analysis operators for corpus curation (SURVEY.md §2.C). All pure
  * per-row expressions (map-side, codegen'd) followed by at most one
  * aggregation — embarrassingly parallel at any scale.
  */
object TextAnalysisOps {

  private val Stopsets: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "es" -> Seq("el", "la", "de", "los", "que"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "les", "des", "et", "une"))

  /** q47 — stopword-profile language ID: one vocabulary-hit count per
    * language, argmax with a fixed priority order, 'und' when no evidence.
    */
  def langId(s: SparkSession, d: String): DataFrame = {
    val base = Stopsets.foldLeft(Tables.documents(s, d).select(col("doc_id"), col("text"))) {
      case (df, (langName, words)) => df.withColumn(s"n_$langName", vocabCount(col("text"), words).cast("long"))
    }
    val scores = Stopsets.map { case (l, _) => col(s"n_$l") }
    val pred = Stopsets.map(_._1).foldRight(lit("und"): Column) { (l, acc) =>
      when(col(s"n_$l") === greatest(scores: _*) && col(s"n_$l") > 0, lit(l)).otherwise(acc)
    }
    base.withColumn("lang_pred", pred)
      .select("doc_id", "n_en", "n_es", "n_de", "n_fr", "lang_pred")
      .orderBy("doc_id")
  }

  /** q48 — document quality score: token count, type-token ratio, stopword
    * ratio, composite score. The curation filter every corpus pass runs.
    */
  def qualityScore(s: SparkSession, d: String): DataFrame = {
    val ts = tokens(col("text"))
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        size(ts).cast("long").as("n_tokens"),
        (size(array_distinct(ts)) / size(ts)).as("ttr"),
        (vocabCount(col("text"), Stopsets.head._2) / size(ts)).as("stop_ratio"))
      .withColumn("score", least(lit(1.0), col("n_tokens") / 100.0) * col("ttr"))
      .orderBy("doc_id")
  }

  /** q49 — token statistics per language: whitespace tokens + regex word
    * tokens (the BPE-ish pre-tokenizer count).
    */
  def tokenCount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("lang"),
        size(tokens(col("text"))).cast("long").as("nt"),
        size(regexp_extract_all(col("text"), lit("\\w+"), lit(0))).cast("long").as("nw"),
        col("n_chars"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("nt")).as("sum_tokens"),
        sum(col("nw")).as("sum_word_tokens"),
        sum(col("n_chars")).as("sum_chars"),
        (sum(col("nt")).cast("double") / count(lit(1))).as("avg_tokens"))
      .orderBy("lang")

  /** q50 — rolling-hash document fingerprint (portable polynomial hash) —
    * the cheap stable content id used for incremental dedup across corpus
    * versions.
    */
  def fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), charHash(col("text")).as("fingerprint"))
      .orderBy("doc_id")

  /** q51 — embedding-column statistics per label: exact-decimal mean norm
    * plus extrema; the sanity dashboard for an embedding pipeline.
    */
  def embedStats(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("label"), norm(toDouble(col("embedding"))).as("nrm"))
      .groupBy("label")
      .agg(
        count(lit(1)).as("n_vectors"),
        davg(col("nrm")).as("avg_norm"),
        min(col("nrm")).as("min_norm"),
        max(col("nrm")).as("max_norm"))
      .orderBy("label")
}
