package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-quality operators — the warehouse-operations layer every pipeline
  * needs around its facts: a per-column profiling report (the "describe
  * table" a new dataset gets on arrival) and declarative expectation checks
  * (the dbt-test / expectations pattern: rules in, violation counts out).
  *
  * Scale: the profiler melts k columns into k×n rows map-side and
  * aggregates at column/value cardinality with map-side combine — two
  * column-pruned scans (overall stats + modal values; re-scanning beats
  * persisting a k×n melted frame at fact-table scale), no self-joins, and
  * Spark 4's WindowGroupLimit bounds the mode's top-1-per-column pick.
  * The expectations run as ONE conditional aggregate per table plus one
  * anti-join for the FK rule — adding rules does not add scans.
  *
  * Cross-engine canonicalization: every value profiles as a string — ints
  * and timestamps cast directly, doubles through DECIMAL(18,2) first —
  * because both engines render those identically ("123.50",
  * "1996-01-02 00:00:00"), where raw double→string formatting would not
  * match.
  */
object DataQuality {

  /** The orders columns q108 profiles, with their canonicalizing casts. */
  private def orderProfileCols: Seq[(String, Column)] = Seq(
    "o_custkey" -> col("o_custkey").cast("string"),
    "o_orderdate" -> col("o_orderdate").cast("string"),
    "o_orderkey" -> col("o_orderkey").cast("string"),
    "o_orderpriority" -> col("o_orderpriority"),
    "o_orderstatus" -> col("o_orderstatus"),
    "o_totalprice" -> col("o_totalprice").cast("decimal(18,2)").cast("string"))

  /** q108_profile — per-column profile of `orders`: row/null/distinct
    * counts, min/max, and the modal value (ties broken by value). */
  def q108Profile(spark: SparkSession, sfDir: String): DataFrame = {
    val melted = Tables.orders(spark, sfDir)
      .select(explode(array(orderProfileCols.map { case (n, c) =>
        struct(lit(n).as("column_name"), c.as("val"))
      }: _*)).as("kv"))
      .select(col("kv.column_name").as("column_name"), col("kv.val").as("val"))
    val stats = melted.groupBy(col("column_name"))
      .agg(count(lit(1)).as("n_rows"),
        count(when(col("val").isNull, 1)).as("n_nulls"),
        countDistinct(col("val")).as("n_distinct"),
        min(col("val")).as("min_val"),
        max(col("val")).as("max_val"))
    val mode = melted.filter(col("val").isNotNull)
      .groupBy(col("column_name"), col("val"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("column_name"))
          .orderBy(desc("n"), col("val"))))
      .filter(col("rn") === 1)
      .select(col("column_name"), col("val").as("top_value"),
        col("n").as("top_count"))
    stats.join(mode, Seq("column_name"), "left")
      .orderBy(col("column_name"))
  }

  val q108Sql: String = {
    val arms = Seq(
      ("o_custkey", "CAST(o_custkey AS VARCHAR)"),
      ("o_orderdate", "CAST(o_orderdate AS VARCHAR)"),
      ("o_orderkey", "CAST(o_orderkey AS VARCHAR)"),
      ("o_orderpriority", "o_orderpriority"),
      ("o_orderstatus", "o_orderstatus"),
      ("o_totalprice", "CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)"))
      .map { case (n, e) =>
        s"SELECT '$n' AS column_name, $e AS val FROM orders"
      }.mkString("\n  UNION ALL ")
    s"""WITH melted AS (
       |  $arms),
       |stats AS (
       |  SELECT column_name, count(*) AS n_rows,
       |         count(CASE WHEN val IS NULL THEN 1 END) AS n_nulls,
       |         count(DISTINCT val) AS n_distinct,
       |         min(val) AS min_val, max(val) AS max_val
       |  FROM melted GROUP BY column_name),
       |mode AS (
       |  SELECT column_name, val AS top_value, n AS top_count
       |  FROM (SELECT column_name, val, count(*) AS n,
       |               row_number() OVER (PARTITION BY column_name
       |                 ORDER BY count(*) DESC, val) AS rn
       |        FROM melted WHERE val IS NOT NULL
       |        GROUP BY column_name, val)
       |  WHERE rn = 1)
       |SELECT s.column_name, s.n_rows, s.n_nulls, s.n_distinct,
       |       s.min_val, s.max_val, m.top_value, m.top_count
       |FROM stats s LEFT JOIN mode m ON s.column_name = m.column_name
       |ORDER BY s.column_name""".stripMargin
  }

  /** q109_expectations — declarative constraint validation: one row per
    * rule with checked/violation counts and a pass verdict. All lineitem
    * rules fold into ONE conditional aggregate pass; the FK rule is the
    * only join. */
  def q109Expectations(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val liAgg = li.agg(
      count(lit(1)).as("n"),
      count(when(col("l_quantity") <= 0, 1)).as("v_qty"),
      count(when(col("l_discount") < 0 || col("l_discount") > 1, 1))
        .as("v_disc"),
      count(when(col("l_shipdate").isNull, 1)).as("v_ship"))
    val oAgg = o.agg(
      count(lit(1)).as("n"),
      count(when(col("o_totalprice") <= 0, 1)).as("v_price"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_unique"))
    val fkViol = li.join(o, col("l_orderkey") === col("o_orderkey"),
      "left_anti").agg(count(lit(1)).as("v_fk"))
    def rule(name: String, checked: Column, viol: Column): Column =
      struct(lit(name).as("rule"), checked.as("n_checked"),
        viol.as("n_violations"))
    liAgg.crossJoin(oAgg.withColumnRenamed("n", "n_o"))
      .crossJoin(fkViol)
      .select(explode(array(
        rule("fk_lineitem_orderkey_in_orders", col("n"), col("v_fk")),
        rule("lineitem_discount_in_unit_range", col("n"), col("v_disc")),
        rule("lineitem_quantity_positive", col("n"), col("v_qty")),
        rule("lineitem_shipdate_not_null", col("n"), col("v_ship")),
        rule("orders_orderkey_unique", col("n_o"), col("v_unique")),
        rule("orders_totalprice_positive", col("n_o"), col("v_price"))))
        .as("r"))
      .select(col("r.rule").as("rule"), col("r.n_checked").as("n_checked"),
        col("r.n_violations").as("n_violations"),
        (col("r.n_violations") === 0).as("passed"))
      .orderBy(col("rule"))
  }

  val q109Sql: String =
    """WITH li AS (
      |  SELECT count(*) AS n,
      |         count(CASE WHEN l_quantity <= 0 THEN 1 END) AS v_qty,
      |         count(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 END)
      |           AS v_disc,
      |         count(CASE WHEN l_shipdate IS NULL THEN 1 END) AS v_ship
      |  FROM lineitem),
      |o AS (
      |  SELECT count(*) AS n_o,
      |         count(CASE WHEN o_totalprice <= 0 THEN 1 END) AS v_price,
      |         count(*) - count(DISTINCT o_orderkey) AS v_unique
      |  FROM orders),
      |fk AS (
      |  SELECT count(*) AS v_fk FROM lineitem
      |  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
      |rules AS (
      |  SELECT 'fk_lineitem_orderkey_in_orders' AS rule,
      |         li.n AS n_checked, fk.v_fk AS n_violations FROM li, fk
      |  UNION ALL SELECT 'lineitem_discount_in_unit_range', n, v_disc FROM li
      |  UNION ALL SELECT 'lineitem_quantity_positive', n, v_qty FROM li
      |  UNION ALL SELECT 'lineitem_shipdate_not_null', n, v_ship FROM li
      |  UNION ALL SELECT 'orders_orderkey_unique', n_o, v_unique FROM o
      |  UNION ALL SELECT 'orders_totalprice_positive', n_o, v_price FROM o)
      |SELECT rule, n_checked, n_violations,
      |       n_violations = 0 AS passed
      |FROM rules ORDER BY rule""".stripMargin

  /** q154_benford — first-significant-digit audit of order totals against
    * Benford's law, the classic fabricated-data / data-entry-defect smell
    * test. The digit is extracted EXACTLY (first character of the floored
    * integer part — no float log10), and the Benford expectations
    * log10(1+1/d) are compiled in as shared double literals, so both
    * engines compare observed shares against bit-identical constants.
    * (The TPC-H-ish uniform totalprice deliberately FAILS Benford —
    * excess_ratio far from 1 for high digits — which is exactly what the
    * audit should report for synthetic data.)
    *
    * Scale: one 9-key hash aggregate; the digit extraction is a codegen'd
    * string projection. */
  def q154Benford(spark: SparkSession, sfDir: String): DataFrame = {
    val digit = substring(
      floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
      .cast("int")
    val counts = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") >= 1.0)
      .select(digit.as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("n_total"))
    val expected = benfordExpected.foldLeft(lit(0.0)) {
      case (acc, (d, p)) => when(col("digit") === d, lit(p)).otherwise(acc)
    }
    counts.crossJoin(broadcast(total))
      .select(col("digit"), col("n"), col("n_total"),
        (col("n").cast("double") / col("n_total").cast("double"))
          .as("share"),
        expected.as("expected_share"))
      .withColumn("excess_ratio",
        col("share") / col("expected_share"))
      .orderBy(col("digit"))
  }

  /** Benford proportions log10(1+1/d), d = 1..9 — computed once here and
    * inlined into BOTH engines as the identical shortest-round-trip double
    * literal. */
  val benfordExpected: Seq[(Int, Double)] =
    (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d))

  val q154Sql: String = {
    val caseExpr = benfordExpected
      .map { case (d, p) =>
        s"WHEN digit = $d THEN ${java.lang.Double.toString(p)}" }
      .mkString("CASE ", " ", " ELSE 0.0 END")
    s"""WITH d AS (
       |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
       |                          AS VARCHAR), 1, 1) AS INT) AS digit
       |  FROM orders WHERE o_totalprice >= 1.0),
       |c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
       |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM c)
       |SELECT c.digit, c.n, t.n_total,
       |       CAST(c.n AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS share,
       |       $caseExpr AS expected_share,
       |       (CAST(c.n AS DOUBLE) / CAST(t.n_total AS DOUBLE))
       |         / ($caseExpr) AS excess_ratio
       |FROM c CROSS JOIN t
       |ORDER BY c.digit""".stripMargin
  }

  /** q145_chisq — χ² contingency audit of language × source in the corpus:
    * the categorical-association / domain-drift check a curation pipeline
    * runs to see whether sources skew toward languages (independence would
    * mean every source mirrors the global language mix). Emits one row per
    * observed cell: observed count, margin totals, and the cell's χ²
    * contribution, plus the decimal-summed total replicated on every row.
    *
    * Exactness: the textbook (o−e)²/e with e = r·c/N is irrational per
    * cell; multiplying through by N gives the equal rational form
    * (o·N − r·c)² / (r·c·N) with EXACT BIGINT numerator and denominator,
    * leaving one IEEE division per cell. The total χ² cannot be a double
    * sum (order-dependent); each contribution is rounded to DECIMAL(18,8)
    * and the decimal sum is order-free. Overflow bound: (o·N − r·c)² needs
    * o·N < 2³¹·√2 — holds to ~40k observed per cell at 50k rows; a
    * 100 TB deployment lifts the same algebra to DECIMAL(38) intermediates.
    *
    * Scale: one cell-cardinality aggregate, two margin aggregates
    * broadcast back onto the cells — the fact rows shuffle once.
    */
  def q145Chisq(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val cells = docs.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("o"))
    val rows = docs.groupBy(col("lang")).agg(count(lit(1)).as("r_total"))
    val cols = docs.groupBy(col("source")).agg(count(lit(1)).as("c_total"))
    val n = docs.agg(count(lit(1)).as("n"))
    val contrib =
      (col("o") * col("n") - col("r_total") * col("c_total")) *
        (col("o") * col("n") - col("r_total") * col("c_total"))
    val scored = cells
      .join(broadcast(rows), "lang")
      .join(broadcast(cols), "source")
      .crossJoin(broadcast(n))
      .select(col("lang"), col("source"), col("o"), col("r_total"),
        col("c_total"), col("n"),
        contrib.as("chi_num"),
        (col("r_total") * col("c_total") * col("n")).as("chi_den"))
      .withColumn("contrib",
        col("chi_num").cast("double") / col("chi_den").cast("double"))
      // cell-cardinality rows, two consumers (total + output) — without
      // this the corpus is scanned twice more for the total
      .localCheckpoint()
    val total = scored
      .agg(sum(col("contrib").cast("decimal(18,8)")).cast("double")
        .as("chi2_total"))
    scored.crossJoin(broadcast(total))
      .orderBy(col("lang"), col("source"))
  }

  val q145Sql: String =
    """WITH cells AS (
      |  SELECT lang, source, count(*) AS o
      |  FROM documents GROUP BY lang, source),
      |r AS (SELECT lang, count(*) AS r_total FROM documents GROUP BY lang),
      |c AS (SELECT source, count(*) AS c_total
      |      FROM documents GROUP BY source),
      |n AS (SELECT count(*) AS n FROM documents),
      |scored AS (
      |  SELECT cells.lang, cells.source, cells.o, r.r_total, c.c_total, n.n,
      |         (cells.o * n.n - r.r_total * c.c_total)
      |           * (cells.o * n.n - r.r_total * c.c_total) AS chi_num,
      |         r.r_total * c.c_total * n.n AS chi_den,
      |         CAST((cells.o * n.n - r.r_total * c.c_total)
      |              * (cells.o * n.n - r.r_total * c.c_total) AS DOUBLE)
      |           / CAST(r.r_total * c.c_total * n.n AS DOUBLE) AS contrib
      |  FROM cells
      |  JOIN r ON cells.lang = r.lang
      |  JOIN c ON cells.source = c.source
      |  CROSS JOIN n),
      |tot AS (SELECT CAST(sum(CAST(contrib AS DECIMAL(18,8))) AS DOUBLE)
      |               AS chi2_total
      |        FROM scored)
      |SELECT s.lang, s.source, s.o,
      |       CAST(s.r_total AS BIGINT) AS r_total,
      |       CAST(s.c_total AS BIGINT) AS c_total,
      |       CAST(s.n AS BIGINT) AS n,
      |       CAST(s.chi_num AS BIGINT) AS chi_num,
      |       CAST(s.chi_den AS BIGINT) AS chi_den,
      |       s.contrib, t.chi2_total
      |FROM scored s CROSS JOIN tot t
      |ORDER BY s.lang, s.source""".stripMargin

  /** q161_ks_test — two-sample Kolmogorov–Smirnov distance between the
    * revenue distributions of returned ('R') and accepted ('A') lines:
    * D = max over x of |F_R(x) − F_A(x)|, the standard distribution-drift
    * gate between a reference corpus and an incoming batch. Computed as
    * exact integers end-to-end: values in cents, the sup as
    * max |cumR·N_A − cumA·N_R| (common denominator N_R·N_A deferred to ONE
    * closing IEEE division), so the statistic hash-matches exactly.
    *
    * Scale: the per-value aggregate collapses the row count to distinct
    * values BEFORE any ordered pass (map-side combinable); the cumulative
    * pass is [[Scale.globalCumSum]] — the two-pass partition-offset
    * prefix sum (range-partition on v, local running sums, broadcast
    * per-partition offsets) — so the distinct-value frame, which scales
    * with SF, never funnels through one task the way the
    * single-partition `Window.orderBy` form it replaced did. Long sums
    * regroup exactly. */
  def q161KsTest(spark: SparkSession, sfDir: String): DataFrame = {
    val v = (col("l_extendedprice").cast("decimal(18,2)") * 100)
      .cast("long")
    val counts = Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag").isin("R", "A"))
      .select(v.as("v"), col("l_returnflag").as("side"))
      .groupBy(col("v"))
      .agg(sum(when(col("side") === "R", 1L).otherwise(0L)).as("nr"),
        sum(when(col("side") === "A", 1L).otherwise(0L)).as("na"))
    val cum = Scale.globalCumSum(counts, Seq(col("v")),
        Seq("nr" -> "cr", "na" -> "ca"))
      .select(col("v"), col("cr"), col("ca"))
      // the audit's 4-op diamond: tot AND the sup aggregate each
      // re-derived the two-pass prefix sum. The cut frame is
      // distinct-value cardinality (3 longs/row); r12 A/B kept it:
      // sf0.1 1.82→1.56 s, sf1 1.74→1.71, sf2 2.11→1.96 (r9's persist
      // of the same frame lost 26% — columnar cache vs row blocks).
      .localCheckpoint()
    val tot = cum.agg(max(col("cr")).as("n_r"), max(col("ca")).as("n_a"))
    cum.crossJoin(broadcast(tot))
      .agg(max(col("n_r")).as("n_r"), max(col("n_a")).as("n_a"),
        max(abs(col("cr") * col("n_a") - col("ca") * col("n_r")))
          .as("d_num"))
      .select(col("n_r"), col("n_a"), col("d_num"),
        (col("d_num").cast("double") /
          (col("n_r") * col("n_a")).cast("double")).as("d"))
  }

  val q161Sql: String =
    """WITH counts AS (
      |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
      |              AS BIGINT) AS v,
      |         sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS nr,
      |         sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS na
      |  FROM lineitem WHERE l_returnflag IN ('R', 'A')
      |  GROUP BY 1),
      |cum AS (
      |  SELECT v,
      |         sum(nr) OVER (ORDER BY v
      |           ROWS UNBOUNDED PRECEDING) AS cr,
      |         sum(na) OVER (ORDER BY v
      |           ROWS UNBOUNDED PRECEDING) AS ca
      |  FROM counts),
      |tot AS (SELECT max(cr) AS n_r, max(ca) AS n_a FROM cum)
      |SELECT CAST(t.n_r AS BIGINT) AS n_r, CAST(t.n_a AS BIGINT) AS n_a,
      |       CAST(max(abs(c.cr * t.n_a - c.ca * t.n_r)) AS BIGINT)
      |         AS d_num,
      |       CAST(max(abs(c.cr * t.n_a - c.ca * t.n_r)) AS DOUBLE)
      |         / CAST(t.n_r * t.n_a AS DOUBLE) AS d
      |FROM cum c CROSS JOIN tot t
      |GROUP BY t.n_r, t.n_a""".stripMargin

  /** Target output-file size for q195's layout plan (1 MiB — small to be
    * meaningful on the fixture; production uses 128M-1G). */
  val TargetFileBytes = 1048576L

  /** q195_file_sizing — the write-side layout planner: per source
    * (= output partition), its row count, byte volume (n_chars as the
    * serialized-size proxy), the file count a [[TargetFileBytes]] target
    * implies (ceil division in exact integers), rows per file, and the
    * largest single document's share of the target (a >1.0 value means
    * one row alone overflows a file — the row-group-sizing red flag).
    * This is the math behind every `repartition(N)`/`maxRecordsPerFile`
    * decision; computing it from the data instead of guessing is what
    * keeps a 100 TB write from producing 10M tiny files or 100 huge ones.
    *
    * Scale: one source-cardinality aggregate with map-side combine. */
  def q195FileSizing(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_rows"), sum(col("n_chars")).as("n_bytes"),
        max(col("n_chars")).as("max_doc_bytes"))
      .select(col("source"), col("n_rows"), col("n_bytes"),
        expr(s"(n_bytes + ${TargetFileBytes - 1}L) div ${TargetFileBytes}L")
          .as("n_files"),
        expr(s"n_rows div ((n_bytes + ${TargetFileBytes - 1}L) div ${TargetFileBytes}L)")
          .as("rows_per_file"),
        (col("max_doc_bytes").cast("double") / TargetFileBytes.toDouble)
          .as("max_doc_share"))
      .orderBy(col("source"))

  val q195Sql: String =
    s"""SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
       |       CAST(sum(n_chars) AS BIGINT) AS n_bytes,
       |       (CAST(sum(n_chars) AS BIGINT) + ${TargetFileBytes - 1})
       |         // $TargetFileBytes AS n_files,
       |       CAST(count(*) AS BIGINT)
       |         // ((CAST(sum(n_chars) AS BIGINT) + ${TargetFileBytes - 1})
       |             // $TargetFileBytes) AS rows_per_file,
       |       CAST(max(n_chars) AS DOUBLE) / $TargetFileBytes.0
       |         AS max_doc_share
       |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------- FK integrity

  /** q215_fk_health — referential-integrity audit across the star schema's
    * four load-bearing foreign keys (lineitem→orders, lineitem→part,
    * lineitem→supplier, orders→customer): per relation, the fact row
    * count, null-FK count, and DANGLING count (non-null FK with no parent
    * row — the join-loss class that silently shrinks every downstream
    * aggregate). The first thing a warehouse DQ gate checks after each
    * load; q02's anti-join idempotency guards ingestion, this guards the
    * join graph.
    *
    * Scale: each relation is one left-anti-shaped membership check —
    * expressed as a left join onto the DISTINCT parent keys so all four
    * audits stay map-side-combinable aggregates; parent key sets are
    * dimension-sized (broadcastable) or shuffle on the key. Facts are
    * scanned once per relation with the scan pruned to the FK column. */
  def q215FkHealth(spark: SparkSession, sfDir: String): DataFrame = {
    def audit(rel: String, fact: DataFrame, fk: String,
        parent: DataFrame, pk: String): DataFrame = {
      val keys = parent.select(col(pk).as("__pk")).distinct()
        .withColumn("__hit", lit(1))
      fact.select(col(fk).as("__fk"))
        .join(keys, col("__fk") === col("__pk"), "left")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("__fk").isNull, 1L).otherwise(0L)).as("n_null_fk"),
          sum(when(col("__fk").isNotNull && col("__hit").isNull, 1L)
            .otherwise(0L)).as("n_dangling"))
        .select(lit(rel).as("relation"), col("n_rows"), col("n_null_fk"),
          col("n_dangling"),
          (col("n_dangling").cast("double") / col("n_rows").cast("double"))
            .as("dangling_rate"))
    }
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    audit("lineitem.orderkey", li, "l_orderkey", o, "o_orderkey")
      .unionByName(audit("lineitem.partkey", li, "l_partkey",
        Tables.part(spark, sfDir), "p_partkey"))
      .unionByName(audit("lineitem.suppkey", li, "l_suppkey",
        Tables.supplier(spark, sfDir), "s_suppkey"))
      .unionByName(audit("orders.custkey", o, "o_custkey",
        Tables.customer(spark, sfDir), "c_custkey"))
      .orderBy(col("relation"))
  }

  val q215Sql: String = {
    def arm(rel: String, factTbl: String, fk: String, parentTbl: String,
        pk: String): String =
      s"""SELECT '$rel' AS relation,
         |       count(*) AS n_rows,
         |       CAST(sum(CASE WHEN f.$fk IS NULL THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_null_fk,
         |       CAST(sum(CASE WHEN f.$fk IS NOT NULL AND p.$pk IS NULL
         |         THEN 1 ELSE 0 END) AS BIGINT) AS n_dangling,
         |       CAST(sum(CASE WHEN f.$fk IS NOT NULL AND p.$pk IS NULL
         |         THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dangling_rate
         |FROM $factTbl f
         |LEFT JOIN (SELECT DISTINCT $pk FROM $parentTbl) p
         |  ON f.$fk = p.$pk""".stripMargin
    Seq(
      arm("lineitem.orderkey", "lineitem", "l_orderkey", "orders",
        "o_orderkey"),
      arm("lineitem.partkey", "lineitem", "l_partkey", "part", "p_partkey"),
      arm("lineitem.suppkey", "lineitem", "l_suppkey", "supplier",
        "s_suppkey"),
      arm("orders.custkey", "orders", "o_custkey", "customer", "c_custkey"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY relation")
  }
}
