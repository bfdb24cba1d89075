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

  /** q89_maps — MapType round-trip: per-order flag→count maps built with
    * `map_from_entries` over a sorted entry list, then consumed back
    * through `map_keys` / `element_at` / `size`. The map is an INTERNAL
    * shape (outputs are plain columns, so the oracle is plain relational
    * SQL) — the point is exercising Spark's map machinery on a
    * deterministic entry order.
    *
    * Scale: entries pre-aggregate to (orderkey, flag, cnt) cardinality
    * before any collection builds, so the map construction is a bounded
    * per-key fold (≤3 flags), not a row-level collect. */
  def q89Maps(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val counts = li.groupBy(col("l_orderkey"), col("l_returnflag"))
      .agg(count(lit(1)).as("cnt"))
    counts.groupBy(col("l_orderkey"))
      .agg(map_from_entries(
        sort_array(collect_list(struct(col("l_returnflag"), col("cnt")))))
        .as("m"))
      .select(col("l_orderkey"),
        size(col("m")).as("n_flags"),
        array_join(map_keys(col("m")), ",").as("flags_csv"),
        coalesce(element_at(col("m"), "A"), lit(0L)).as("a_cnt"),
        coalesce(element_at(col("m"), "N"), lit(0L)).as("n_cnt"),
        coalesce(element_at(col("m"), "R"), lit(0L)).as("r_cnt"))
      .orderBy(col("l_orderkey"))
  }

  val q89Sql: String =
    """SELECT l_orderkey,
      |       CAST(count(DISTINCT l_returnflag) AS INT) AS n_flags,
      |       string_agg(DISTINCT l_returnflag, ',' ORDER BY l_returnflag)
      |         AS flags_csv,
      |       count(*) FILTER (l_returnflag = 'A') AS a_cnt,
      |       count(*) FILTER (l_returnflag = 'N') AS n_cnt,
      |       count(*) FILTER (l_returnflag = 'R') AS r_cnt
      |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin
}
