package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data pipelines (SURVEY.md §2.4 E5):
  * tokenization, quality signals, and a character-n-gram language-ID
  * heuristic. Everything is built from codegen'd `functions._` expressions —
  * no UDFs in the hot path.
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish pre-tokenization: letter runs, digit runs. */
  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit("[a-z]+|[0-9]+"), lit(0))

  /** Type-token ratio — a standard lexical-diversity quality signal. */
  def typeTokenRatio(text: Column): Column = {
    val tk = tokens(text)
    size(array_distinct(tk)).cast("double") / size(tk)
  }

  /** Character-bigram profiles per language: tiny, embedded marker sets.
    * A real system learns these from labelled corpora; the heuristic and its
    * plumbing (score columns + greatest-of argmax) are the deliverable. */
  private val bigramMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("th", "he", "in", "er"),
    "de" -> Seq("ch", "ei", "en", "sch"),
    "es" -> Seq("ll", "os", "as", "ión"),
    "fr" -> Seq("ou", "le", "es", "que"),
    "zh" -> Seq("zh", "ng", "xi", "ao"))

  /** Score one language: total occurrences of its marker n-grams.
    * Literal-substring arithmetic only (`replace`, not regex), summed
    * left-to-right in doubles — any SQL engine reproduces it exactly, which
    * is what lets the lang-guess query carry a hash-checked oracle. */
  private def langScore(text: Column, markers: Seq[String]): Column =
    markers.map { m =>
      // occurrences of marker m = (len(text) - len(remove(text, m))) / len(m)
      (length(text) - length(replace(text, lit(m), lit("")))).cast("double") / m.length
    }.reduce(_ + _)

  /** Append a `lang_guess` column: argmax over marker-profile scores.
    * Deterministic; ties break by language code order. */
  def withLangGuess(df: DataFrame, text: Column): DataFrame = {
    val scored = bigramMarkers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      struct(langScore(text, ms).as("score"), lit(lang).as("lang"))
    }
    // array_max on (score, lang) structs: max score, then max lang on ties —
    // flip to deterministic min-lang ties by negating below if ever needed.
    df.withColumn("lang_guess", array_max(array(scored: _*)).getField("lang"))
  }

  /** Stopword ratio against a fixed stopword list. Occurrences (duplicates
    * included) are counted per stopword via `size - size(array_remove)` —
    * codegen'd array expressions, not a higher-order `filter`, which is
    * CodegenFallback and would interpret the lambda per token per row. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val tk = tokens(text)
    val hits = stopwords
      .map(w => (size(tk) - size(array_remove(tk, w))).cast("double"))
      .reduce(_ + _)
    hits / size(tk)
  }
}
