package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Scalar function families — SURVEY.md §2.7.
  *
  * The R-tier evidence: the reference's only scalar logic is filename/key
  * string manipulation (`save_nyc_data_to_s3.py:41-44` — split filename to
  * year, f-string key building) and date-part extraction from the execution
  * date (`save_nyc_data_to_s3.py:62-64,84-86`). q40/q41 re-express exactly
  * those shapes over the test tables; the rest is the implied-warehouse
  * scalar surface.
  *
  * All of these are codegen'd built-ins (`org.apache.spark.sql.functions`) —
  * no UDFs, so every query stays inside WholeStageCodegen and scales as pure
  * map work with zero shuffle (except where grouped).
  *
  * Determinism: row-level double arithmetic is left unrounded — IEEE 754
  * mul/add/div are exactly specified, so Spark and DuckDB produce identical
  * bits. Transcendentals other than sqrt (which IEEE requires correctly
  * rounded) are avoided in oracle-checked output.
  */
object Scalars {

  /** q40_string — the reference's filename round-trip: build the monthly key
    * with format_string (mirrors the f-string at `save_nyc_data_to_s3.py:44`),
    * then recover the year both ways the reference does it — split (mirrors
    * `populate_s3.py:75-77` `filename.split("_")[-1].split("-")[0]`) and a
    * regexp_extract equivalent — plus the contains() predicate used for link
    * filtering (`populate_s3.py:21`). */
  def q40String(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .withColumn("fname",
        format_string("fhvhv_tripdata_%d-%02d.parquet",
          year(col("o_orderdate")), month(col("o_orderdate"))))
      .select(
        col("o_orderkey"), col("fname"),
        element_at(split(element_at(split(col("fname"), "_"), -1), "-"), 1)
          .as("year_from_split"),
        regexp_extract(col("fname"), "tripdata_(\\d{4})-(\\d{2})", 2)
          .as("month_from_re"),
        col("fname").contains("fhvhv_tripdata_").as("is_tripdata"),
        upper(substring(col("o_orderpriority"), 1, 4)).as("prio_prefix"),
        length(col("o_orderpriority")).as("prio_len"))
      .orderBy(col("o_orderkey"))

  val q40Sql: String =
    """SELECT o_orderkey,
      |  printf('fhvhv_tripdata_%d-%02d.parquet',
      |         year(o_orderdate), month(o_orderdate)) AS fname,
      |  string_split(string_split(printf('fhvhv_tripdata_%d-%02d.parquet',
      |         year(o_orderdate), month(o_orderdate)), '_')[-1], '-')[1]
      |    AS year_from_split,
      |  regexp_extract(printf('fhvhv_tripdata_%d-%02d.parquet',
      |         year(o_orderdate), month(o_orderdate)),
      |         'tripdata_(\d{4})-(\d{2})', 2) AS month_from_re,
      |  contains(printf('fhvhv_tripdata_%d-%02d.parquet',
      |         year(o_orderdate), month(o_orderdate)),
      |         'fhvhv_tripdata_') AS is_tripdata,
      |  upper(substring(o_orderpriority, 1, 4)) AS prio_prefix,
      |  length(o_orderpriority) AS prio_len
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** q45_links — the reference's listing-page scrape as a real extraction
    * operator, not just a predicate: its DAG xpath-scrapes every `<a>` href
    * containing "fhvhv_tripdata_" from the TLC download page
    * (`populate_s3.py:21`), then parses the year from the filename
    * (`populate_s3.py:75-76`). Here: synthesize a page per order row (the
    * fixtures carry no HTML), `regexp_extract_all` every href, explode to
    * one row per link, keep tripdata links, recover year + filename. All
    * map-side (pattern work inside codegen) — a 100 TB crawl of listing
    * pages shuffles nothing until the links aggregate downstream. */
  def q45Links(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val page = concat(
      lit("<html><body><a href=\"/trip-data/fhvhv_tripdata_"),
      year(col("o_orderdate")), lit("-0"), (col("o_orderkey") % 9 + 1),
      lit(".parquet\">fhvhv</a><a href=\"/trip-data/green_tripdata_"),
      year(col("o_orderdate")),
      lit("-01.parquet\">green</a><a href=\"/about.html\">about</a>"),
      lit("</body></html>"))
    o.select(col("o_orderkey"), page.as("page"))
      .select(col("o_orderkey"),
        explode(regexp_extract_all(col("page"),
          lit("href=\"([^\"]+)\""), lit(1))).as("href"))
      .filter(col("href").contains("fhvhv_tripdata_"))
      .select(
        col("o_orderkey"), col("href"),
        element_at(split(col("href"), "/"), -1).as("filename"),
        regexp_extract(col("href"), "tripdata_(\\d{4})-", 1).cast("int")
          .as("file_year"))
      .orderBy(col("o_orderkey"), col("href"))
  }

  val q45Sql: String =
    """WITH pages AS (
      |  SELECT o_orderkey,
      |         '<html><body><a href="/trip-data/fhvhv_tripdata_'
      |         || year(o_orderdate) || '-0' || (o_orderkey % 9 + 1)
      |         || '.parquet">fhvhv</a><a href="/trip-data/green_tripdata_'
      |         || year(o_orderdate)
      |         || '-01.parquet">green</a><a href="/about.html">about</a>'
      |         || '</body></html>' AS page
      |  FROM orders),
      |links AS (
      |  SELECT o_orderkey,
      |         unnest(regexp_extract_all(page, 'href="([^"]+)"', 1)) AS href
      |  FROM pages)
      |SELECT o_orderkey, href,
      |       string_split(href, '/')[-1] AS filename,
      |       CAST(regexp_extract(href, 'tripdata_(\d{4})-', 1) AS INTEGER)
      |         AS file_year
      |FROM links
      |WHERE contains(href, 'fhvhv_tripdata_')
      |ORDER BY o_orderkey, href""".stripMargin

  /** q41_datetime — date-part extraction and month arithmetic (mirrors the
    * DAG's execution-date handling, `save_nyc_data_to_s3.py:62-64,84-86`, and
    * its monthly-schedule arithmetic `:54`). */
  def q41Datetime(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(
        col("o_orderkey"), col("o_orderdate"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        dayofmonth(col("o_orderdate")).as("o_day"),
        quarter(col("o_orderdate")).as("o_quarter"),
        (weekday(col("o_orderdate")) + 1).as("iso_dow"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        add_months(col("o_orderdate"), 1).as("next_month"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .orderBy(col("o_orderkey"))

  val q41Sql: String =
    """SELECT o_orderkey, o_orderdate,
      |  year(o_orderdate) AS o_year,
      |  month(o_orderdate) AS o_month,
      |  day(o_orderdate) AS o_day,
      |  quarter(o_orderdate) AS o_quarter,
      |  isodow(o_orderdate) AS iso_dow,
      |  date_trunc('month', o_orderdate) AS month_start,
      |  CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS next_month,
      |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** q42_math — measure arithmetic over the float fee columns (the shape the
    * reference's five FLOAT measures exist for, `setup.py:89-93`). */
  def q42Math(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_extendedprice"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))).as("charge"),
        (col("l_extendedprice") / col("l_quantity")).as("unit_price"),
        abs(col("l_discount") - lit(0.05)).as("disc_dev"),
        (col("l_orderkey") % 7).as("key_mod"),
        floor(col("l_extendedprice")).as("price_floor"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        sqrt(col("l_quantity")).as("qty_sqrt"))
      .orderBy(Tables.lineitemKey.map(col): _*)

  val q42Sql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice,
      |  l_extendedprice * (1.0 - l_discount) AS revenue,
      |  l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge,
      |  l_extendedprice / l_quantity AS unit_price,
      |  abs(l_discount - 0.05) AS disc_dev,
      |  l_orderkey % 7 AS key_mod,
      |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
      |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
      |  sqrt(l_quantity) AS qty_sqrt
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_extendedprice""".stripMargin

  /** q43_null — conditional/null handling (the reference's nullable
    * `on_scene_datetime`, `setup.py:84`, modeled by synthesizing NULLs):
    * when/otherwise, coalesce, null-aware counting. */
  def q43Null(spark: SparkSession, sfDir: String): DataFrame = {
    val nullableDisc =
      when(col("l_discount") < 0.03, lit(null)).otherwise(col("l_discount"))
    Tables.lineitem(spark, sfDir)
      .withColumn("disc_n", nullableDisc)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("disc_n")).as("n_disc_present"),
        (count(lit(1)) - count(col("disc_n"))).as("n_disc_null"),
        decSum(coalesce(col("disc_n"), lit(0.0)), 2)
          .as("sum_disc_coalesced"),
        max(when(col("disc_n").isNull, col("l_quantity")))
          .as("max_qty_where_null"))
      .orderBy(col("l_returnflag"))
  }

  val q43Sql: String =
    """WITH t AS (
      |  SELECT *, CASE WHEN l_discount < 0.03 THEN NULL
      |                 ELSE l_discount END AS disc_n
      |  FROM lineitem)
      |SELECT l_returnflag,
      |  count(*) AS n_rows,
      |  count(disc_n) AS n_disc_present,
      |  count(*) - count(disc_n) AS n_disc_null,
      |  CAST(sum(CAST(COALESCE(disc_n, 0.0) AS DECIMAL(18,2))) AS DOUBLE)
      |    AS sum_disc_coalesced,
      |  max(CASE WHEN disc_n IS NULL THEN l_quantity END)
      |    AS max_qty_where_null
      |FROM t GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q44_json — JSON-in-string extraction over `events.props` (FIXTURES §B).
    * get_json_object is the Spark-native path; the oracle reads the same
    * field via DuckDB's JSON operator. */
  def q44Json(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_val"),
        col("event_type"))
      .orderBy(col("event_id"))

  val q44Sql: String =
    """SELECT event_id,
      |       CAST(props->>'$.k' AS INTEGER) AS k_val,
      |       event_type
      |FROM events ORDER BY event_id""".stripMargin

  /** q67_variant — the Spark 4 VARIANT path over the same JSON props q44
    * reads as strings: `parse_json` builds the binary variant ONCE per row,
    * typed `variant_get` extracts without re-parsing, and
    * `schema_of_variant` audits the inferred shape (drift in upstream
    * producers shows up as a new schema group, not a silent NULL column).
    * Versus per-field get_json_object, the variant parse cost is paid once
    * regardless of how many fields a wide pipeline extracts — the
    * semi-structured answer at 100 TB. Oracle: DuckDB extracts the same
    * typed value from the JSON text; the schema string is deterministic. */
  def q67Variant(spark: SparkSession, sfDir: String): DataFrame = {
    val v = parse_json(col("props"))
    graft.Tables.events(spark, sfDir)
      .select(col("event_type"),
        variant_get(v, "$.k", "bigint").as("k"),
        schema_of_variant(v).as("vschema"))
      .groupBy(col("event_type"), col("vschema"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"), col("vschema"))
  }

  val q67Sql: String =
    """SELECT event_type,
      |       'OBJECT<k: BIGINT>' AS vschema,
      |       count(*) AS n,
      |       CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
      |       min(CAST(props->>'$.k' AS BIGINT)) AS min_k,
      |       max(CAST(props->>'$.k' AS BIGINT)) AS max_k
      |FROM events
      |GROUP BY event_type ORDER BY event_type, vschema""".stripMargin

  /** q49_regex — the regex scalar family: extract / replace-all / count /
    * boolean match, all codegen'd built-ins over the documents table.
    * Dialect note: Spark `regexp_replace` replaces ALL occurrences; DuckDB
    * needs the explicit 'g' flag for the same semantics. */
  def q49Regex(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        regexp_extract(col("text"), "[0-9]+", 0).as("first_num"),
        regexp_replace(col("text"), "[0-9]+", "#").as("masked"),
        regexp_count(col("text"), lit("[a-z]+")).as("n_words"),
        col("text").rlike("the").as("has_the"))
      .orderBy(col("doc_id"))

  val q49Sql: String =
    """SELECT doc_id,
      |       regexp_extract(text, '[0-9]+') AS first_num,
      |       regexp_replace(text, '[0-9]+', '#', 'g') AS masked,
      |       CAST(len(regexp_extract_all(text, '[a-z]+')) AS INT) AS n_words,
      |       regexp_matches(text, 'the') AS has_the
      |FROM documents ORDER BY doc_id""".stripMargin
}
