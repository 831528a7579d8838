package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text analysis for LLM training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting.
  *
  * Everything is a narrow per-document projection built from
  * codegen'd string/array built-ins — no UDFs, no explode of the
  * corpus, so each operator is one parquet scan + one projection at
  * any scale (the shuffles below are only the deterministic final
  * ORDER BY the oracle compare needs).
  */
object TextOps {

  /** Tiny in-plan stopword lists (broadcast as literals — the 100 TB
    * path would load real lists with broadcast(), same plan shape).
    */
  private val stop = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"))

  private def inList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("(", ", ", ")")

  private def stopScore(lang: String) =
    expr(s"size(filter(toks, t -> t IN ${inList(stop(lang))}))").cast("double") /
      size(col("toks"))

  /** N-gram-heuristic language ID: per-language stopword hit ratio,
    * argmax with a deterministic (score DESC, language ASC) tiebreak.
    */
  def langId(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("en_score", stopScore("en"))
      .withColumn("de_score", stopScore("de"))
      .withColumn("fr_score", stopScore("fr"))
      .withColumn("predicted", expr(
        """array_sort(array(struct(-en_score AS ns, 'en' AS l),
          |                 struct(-de_score AS ns, 'de' AS l),
          |                 struct(-fr_score AS ns, 'fr' AS l)))[0].l"""
          .stripMargin))
      .select(col("doc_id"),
        round(col("en_score"), 4).as("en_score"),
        round(col("de_score"), 4).as("de_score"),
        round(col("fr_score"), 4).as("fr_score"),
        col("predicted"))
      .orderBy("doc_id")

  /** Quality metrics: length, token stats, stopword/repetition
    * ratios, and a deterministic composite score in [0,1].
    */
  def quality(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"),
        split(col("text"), " ").as("toks"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("avg_token_len",
        (col("n_chars") - (col("n_tokens") - 1)).cast("double") / col("n_tokens"))
      .withColumn("stopword_ratio", stopScore("en"))
      .withColumn("repetition_ratio",
        lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"))
      .withColumn("quality_score",
        // length in a healthy band + some-but-not-all stopwords +
        // low repetition; each term in [0,1], equal weights
        round((least(col("n_tokens").cast("double") / 50.0, lit(1.0))
          + when(col("stopword_ratio").between(0.01, 0.6), 1.0).otherwise(0.0)
          + (lit(1.0) - least(col("repetition_ratio") / 0.9, lit(1.0)))) / 3.0,
          4))
      .select(col("doc_id"), col("n_chars"), col("n_tokens"), col("n_distinct"),
        round(col("avg_token_len"), 4).as("avg_token_len"),
        round(col("stopword_ratio"), 4).as("stopword_ratio"),
        round(col("repetition_ratio"), 4).as("repetition_ratio"),
        col("quality_score"))
      .orderBy("doc_id")

  /** Token counting: whitespace tokens and a BPE-ish segmentation
    * (letter runs / digit runs / single other chars), plus the
    * chars-per-token compression proxy.
    */
  def tokenCounts(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .withColumn("ws_tokens",
        size(split(col("text"), " ")).cast("long"))
      .withColumn("bpe_tokens",
        size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
          .cast("long"))
      .withColumn("chars_per_token",
        round(length(col("text")).cast("double") / col("bpe_tokens"), 4))
      .select("doc_id", "ws_tokens", "bpe_tokens", "chars_per_token")
      .orderBy("doc_id")

  /** Document fingerprint: md5 of the whitespace-normalized lowercase
    * text, plus its leading 60 bits as a BIGINT (join/partition key
    * form — 60 so it stays positive in signed int64 on both engines).
    */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .withColumn("norm",
        regexp_replace(lower(trim(col("text"))), "\\s+", " "))
      .withColumn("fp_md5", md5(col("norm")))
      .withColumn("fp60",
        conv(substring(col("fp_md5"), 1, 15), 16, 10).cast("long"))
      .select("doc_id", "fp_md5", "fp60")
      .orderBy("doc_id")
}
