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

  /** The fixture text is clean word soup, so the queries plant
    * deterministic PII derived from an id column — same arithmetic in
    * their oracles — and then prove the scrubber removes exactly what was
    * planted. Shared by q69 (keyed by doc_id) and the q110 composed
    * pipeline (keyed by the dedup representative id): one definition, so
    * the two oracles can never drift apart. */
  def plantPii(docs: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol)
    docs.select(id,
      concat(col("text"),
        lit(" contact user"), id.cast("string"),
        lit("@example.com or "),
        (lit(100) + id % 900).cast("string"), lit("-"),
        (lit(10) + id % 90).cast("string"), lit("-"),
        (lit(1000) + id % 9000).cast("string"),
        lit(" ip 10."), (id % 256).cast("string"),
        lit(".0."), ((id * 7) % 256).cast("string")).as("text"))
  }

  /** The SQL twin of [[plantPii]] (oracle side), parameterized the same
    * way. */
  def plantPiiSql(idCol: String): String =
    s"text || ' contact user' || $idCol || '@example.com or ' ||\n" +
      s"         (100 + $idCol % 900) || '-' || (10 + $idCol % 90) || '-' ||\n" +
      s"         (1000 + $idCol % 9000) || ' ip 10.' || $idCol % 256 ||\n" +
      s"         '.0.' || ($idCol * 7) % 256"

  /** q69_pii_redact — plant PII, count matches per category, redact. */
  def q69PiiRedact(spark: SparkSession, sfDir: String): DataFrame =
    plantPii(Tables.documents(spark, sfDir), "doc_id")
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
       |         ${plantPiiSql("doc_id")} AS text
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
