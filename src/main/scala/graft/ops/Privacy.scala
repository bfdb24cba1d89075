package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** PII detection and redaction — a first-class training-data-pipeline stage:
  * corpora scraped from the web carry emails, government-ID-shaped numbers,
  * and IP addresses that must be scrubbed before the text is used.
  *
  * Scale: pure map work — every pattern is a codegen'd `RegexpReplace` /
  * `RegexpExtractAll` over the text column, zero shuffle (the final orderBy
  * exists only for the driver's deterministic hash). A 100 TB corpus redacts
  * at scan speed with no exchange.
  *
  * Pattern dialect: the patterns use only syntax shared by Java regex
  * (Spark) and RE2 (DuckDB oracle) — character classes, bounded repetition,
  * word boundaries; no backreferences or lookaround, which RE2 rejects.
  */
object Privacy {

  /** (name, pattern, replacement) — applied in order. Order matters and must
    * match the oracle's nesting: email first (its local part could otherwise
    * be chewed up by the number patterns), then ID-shaped numbers, then
    * IPv4. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("id", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<ID>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"))

  /** Redact all configured PII patterns from `text`, in order. */
  def redact(text: Column): Column =
    piiPatterns.foldLeft(text) {
      case (c, (_, pat, repl)) => regexp_replace(c, pat, repl)
    }

  /** Count matches per pattern (group 0 = whole match; Spark's default
    * group index is 1, which requires a capture group — pin 0). */
  def matchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** The fixture text is clean word soup, so the query plants deterministic
    * PII derived from doc_id — same arithmetic in the oracle — and then
    * proves the scrubber removes exactly what was planted. */
  private def withPlantedPii(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com or "),
        (lit(100) + col("doc_id") % 900).cast("string"), lit("-"),
        (lit(10) + col("doc_id") % 90).cast("string"), lit("-"),
        (lit(1000) + col("doc_id") % 9000).cast("string"),
        lit(" ip 10."), (col("doc_id") % 256).cast("string"),
        lit(".0."), ((col("doc_id") * 7) % 256).cast("string")).as("text"))

  /** q69_pii_redact — plant PII, count matches per category, redact. */
  def q69PiiRedact(spark: SparkSession, sfDir: String): DataFrame =
    withPlantedPii(Tables.documents(spark, sfDir))
      .select(col("doc_id"),
        matchCount(col("text"), piiPatterns(0)._2).as("n_emails"),
        matchCount(col("text"), piiPatterns(1)._2).as("n_ids"),
        matchCount(col("text"), piiPatterns(2)._2).as("n_ips"),
        redact(col("text")).as("redacted"))
      .orderBy(col("doc_id"))

  val q69Sql: String = {
    val Seq((_, email, _), (_, id, _), (_, ip, _)) = piiPatterns
    // DuckDB regexp_replace needs the explicit 'g' flag (Spark replaces
    // globally by default); patterns are shared verbatim.
    s"""WITH pii AS (
       |  SELECT doc_id,
       |         text || ' contact user' || doc_id || '@example.com or ' ||
       |         (100 + doc_id % 900) || '-' || (10 + doc_id % 90) || '-' ||
       |         (1000 + doc_id % 9000) || ' ip 10.' || doc_id % 256 ||
       |         '.0.' || (doc_id * 7) % 256 AS text
       |  FROM documents)
       |SELECT doc_id,
       |  len(regexp_extract_all(text, '$email')) AS n_emails,
       |  len(regexp_extract_all(text, '$id')) AS n_ids,
       |  len(regexp_extract_all(text, '$ip')) AS n_ips,
       |  regexp_replace(regexp_replace(regexp_replace(text,
       |      '$email', '<EMAIL>', 'g'),
       |      '$id', '<ID>', 'g'),
       |      '$ip', '<IP>', 'g') AS redacted
       |FROM pii ORDER BY doc_id""".stripMargin
  }
}
