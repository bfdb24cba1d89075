package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Array/collection operators — lateral explode with position, slicing,
  * dedup + sort inside a cell, and order-preserving re-aggregation (the
  * collection half of SURVEY §2.7's scalar-function family; every
  * tokenized-text pipeline round-trips arrays exactly like this).
  *
  * Determinism: `collect_list` order is partition-dependent, so every
  * re-aggregation here sorts — `sort_array(collect_list(struct(pos, tok)))`
  * rebuilds token order from the carried position, the same contract as
  * DuckDB's `string_agg(... ORDER BY pos)`. Cell-level ops (`array_sort`,
  * `array_distinct`, `slice`) are map-side and shuffle nothing; the one
  * shuffle is the re-agg hash aggregate keyed on doc_id.
  */
object ArrayOps {

  /** q47_arrays — per document: filtered token count, first-5-token prefix,
    * sorted distinct vocabulary, and the even-position token sequence
    * rebuilt in order from a posexplode. */
  def q47Arrays(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val withToks = docs.select(col("doc_id"),
      split(col("text"), " ").as("toks"))
    val filtered = filter(col("toks"), t => t =!= "")
    val cellOps = withToks.select(
      col("doc_id"),
      size(filtered).as("n_toks"),
      array_join(slice(col("toks"), 1, 5), " ").as("first5"),
      array_join(array_sort(array_distinct(filtered)), "|")
        .as("distinct_sorted"))
    val even = withToks
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))
      .filter(col("tok") =!= "" && col("pos") % 2 === 0)
      .groupBy(col("doc_id"))
      .agg(array_join(
        transform(sort_array(collect_list(struct(col("pos"), col("tok")))),
          x => x("tok")),
        " ").as("even_toks"))
    cellOps.join(even, Seq("doc_id"), "left")
      .withColumn("even_toks", coalesce(col("even_toks"), lit("")))
      .orderBy(col("doc_id"))
  }

  val q47Sql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |pe AS (
      |  SELECT doc_id, unnest(toks) AS tok,
      |         unnest(generate_series(0, len(toks) - 1)) AS pos
      |  FROM t),
      |even AS (
      |  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS even_toks
      |  FROM pe WHERE tok <> '' AND pos % 2 = 0 GROUP BY doc_id)
      |SELECT t.doc_id,
      |       CAST(len(list_filter(toks, x -> x <> '')) AS INT) AS n_toks,
      |       array_to_string(toks[1:5], ' ') AS first5,
      |       array_to_string(
      |         list_sort(list_distinct(list_filter(toks, x -> x <> ''))), '|')
      |         AS distinct_sorted,
      |       coalesce(even.even_toks, '') AS even_toks
      |FROM t LEFT JOIN even ON t.doc_id = even.doc_id
      |ORDER BY t.doc_id""".stripMargin
}
