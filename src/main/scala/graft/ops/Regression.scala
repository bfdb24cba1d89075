package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Per-group ordinary least squares — the closed-form fit every
  * feature-engineering pipeline runs per segment (elasticity per flag,
  * trend per cohort): slope/intercept/R² from the five algebraic sums
  * (n, Σx, Σy, Σxy, Σx², Σy²). The sums are EXACT — integer-scaled
  * decimals, so partial aggregation is lossless and order-insensitive —
  * and the handful of closing IEEE operations (two casts, one division
  * each) is performed in the identical order by both engines, making the
  * doubles bit-reproducible. This is the pattern this engine uses
  * everywhere floats must hash-match: exact rational core, IEEE only at
  * the boundary (same discipline as q148/q151).
  *
  * Scale: one map-side-combinable grouped aggregate over the fact table —
  * the same cost as q20; no second pass, no collect. The closed form is
  * why: OLS via normal equations needs only sums, never the row set.
  */
object Regression {

  /** q157_ols — regress extended price (cents) on quantity (units) per
    * return flag over lineitem. Slope in cents/unit, intercept in cents,
    * plus R² — on the synthetic fixture price ≈ unit·quantity so R² lands
    * near the discount-noise-reduced correlation, which the test asserts.
    */
  def q157Ols(spark: SparkSession, sfDir: String): DataFrame = {
    // exact integer embedding: quantity is integral, price has ≤2dp; the
    // decimal cast (not a raw double→long cast) avoids off-by-one from
    // binary float representation of .005-style cents
    val x = col("l_quantity").cast("decimal(18,2)").cast("long")
    val y = (col("l_extendedprice").cast("decimal(18,2)") * 100)
      .cast("long")
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), x.as("x"), y.as("y"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        // y² in cents² reaches ~10¹⁴ per row — BIGINT sums overflow at
        // sf0.1's group sizes, so the per-row square is already decimal
        sum(d38(col("y")) * d38(col("y"))).as("syy"))
      // numerators/denominators stay exact integers in decimal(38,0):
      // Spark widens to p1+p2+1 capped at 38 and only ROUNDS when digits
      // exceed 38 — these reach ~10²⁵, comfortably exact
      .select(col("l_returnflag"), col("n"),
        (d38(col("n")) * d38(col("sxy")) - d38(col("sx")) * d38(col("sy")))
          .as("num"),
        (d38(col("n")) * d38(col("sxx")) - d38(col("sx")) * d38(col("sx")))
          .as("denx"),
        (d38(col("n")) * d38(col("syy")) - d38(col("sy")) * d38(col("sy")))
          .as("deny"),
        col("sx"), col("sy"))
      .select(col("l_returnflag"), col("n"),
        (col("num").cast("double") / col("denx").cast("double"))
          .as("slope"),
        col("num"), col("denx"), col("deny"), col("sx"), col("sy"))
      .select(col("l_returnflag"), col("n"), col("slope"),
        ((col("sy").cast("double") - col("slope") * col("sx").cast("double"))
          / col("n").cast("double")).as("intercept"),
        ((col("num").cast("double") * col("num").cast("double"))
          / (col("denx").cast("double") * col("deny").cast("double")))
          .as("r2"))
      .orderBy(col("l_returnflag"))
  }

  val q157Sql: String =
    """WITH s AS (
      |  SELECT l_returnflag, count(*) AS n,
      |         sum(x) AS sx, sum(y) AS sy,
      |         sum(x * y) AS sxy, sum(x * x) AS sxx,
      |         sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
      |  FROM (SELECT l_returnflag,
      |               CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT) AS x,
      |               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
      |                    AS BIGINT) AS y
      |        FROM lineitem)
      |  GROUP BY l_returnflag),
      |r AS (
      |  SELECT l_returnflag, n,
      |         CAST(n AS HUGEINT) * CAST(sxy AS HUGEINT)
      |           - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT) AS num,
      |         CAST(n AS HUGEINT) * CAST(sxx AS HUGEINT)
      |           - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS denx,
      |         CAST(n AS HUGEINT) * CAST(syy AS HUGEINT)
      |           - CAST(sy AS HUGEINT) * CAST(sy AS HUGEINT) AS deny,
      |         sx, sy
      |  FROM s),
      |f AS (
      |  SELECT l_returnflag, n,
      |         CAST(num AS DOUBLE) / CAST(denx AS DOUBLE) AS slope,
      |         num, denx, deny, sx, sy
      |  FROM r)
      |SELECT l_returnflag, n, slope,
      |       (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
      |         / CAST(n AS DOUBLE) AS intercept,
      |       (CAST(num AS DOUBLE) * CAST(num AS DOUBLE))
      |         / (CAST(denx AS DOUBLE) * CAST(deny AS DOUBLE)) AS r2
      |FROM f ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------- correlation matrix

  /** Measures correlated by q234, in output order. */
  val CorrMeasures = Seq("quantity", "extendedprice", "discount", "tax")

  /** q234_corr_matrix — pairwise Pearson correlation over the lineitem
    * measures in ONE pass: q157's exact-co-moment discipline generalized
    * to the full upper triangle. All four measures are embedded as
    * ×100-scaled integers (scaling cancels out of r), every Σx / Σx² /
    * Σxy accumulates in decimal(38,0) (lossless, order-insensitive
    * partial aggregation — per-row cents² already reaches 10¹⁴), and each
    * correlation is numerator/√denx·√deny over exact integers with IEEE
    * arithmetic only in the last three ops. The feature-redundancy screen
    * a modeling pipeline runs before training.
    *
    * Scale: a single map-side-combinable aggregate producing 15 sums —
    * one fact-table scan for the whole matrix, never one pass per pair;
    * the 6 output rows are projections of that one broadcast-size row
    * (localCheckpoint'd so the union of projections cannot re-run the
    * scan). D measures cost D(D+1)/2 + D sums in the same single pass. */
  def q234CorrMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    def scaled(m: String) =
      (col(s"l_$m").cast("decimal(18,2)") * 100).cast("long").as(m)
    val ms = CorrMeasures
    val pairs = for {
      (a, i) <- ms.zipWithIndex; (b, j) <- ms.zipWithIndex if i <= j
    } yield (a, b)
    val base = Tables.lineitem(spark, sfDir).select(ms.map(scaled): _*)
    val sums = ms.map(m => sum(d38(col(m))).as(s"s_$m")) ++
      pairs.map { case (a, b) =>
        sum(d38(col(a)) * d38(col(b))).as(s"p_${a}_$b")
      }
    val agg1 = base.agg(count(lit(1)).as("n"), sums: _*).localCheckpoint()
    def den(m: String) = sqrt(
      (d38(col("n")) * col(s"p_${m}_$m") - col(s"s_$m") * col(s"s_$m"))
        .cast("double"))
    val rows = pairs.filter { case (a, b) => a != b }.map { case (a, b) =>
      agg1.select(lit(a).as("m1"), lit(b).as("m2"), col("n"),
        ((d38(col("n")) * col(s"p_${a}_$b") - col(s"s_$a") * col(s"s_$b"))
          .cast("double") / (den(a) * den(b))).as("corr"))
    }
    rows.reduce(_.union(_)).orderBy(col("m1"), col("m2"))
  }

  val q234Sql: String = {
    val ms = CorrMeasures
    val pairs = for {
      (a, i) <- ms.zipWithIndex; (b, j) <- ms.zipWithIndex if i <= j
    } yield (a, b)
    val scaledCols = ms.map(m =>
      s"CAST(CAST(l_$m AS DECIMAL(18,2)) * 100 AS BIGINT) AS $m")
      .mkString(",\n       |         ")
    val sumCols = (ms.map(m => s"sum(CAST($m AS HUGEINT)) AS s_$m") ++
      pairs.map { case (a, b) =>
        s"sum(CAST($a AS HUGEINT) * CAST($b AS HUGEINT)) AS p_${a}_$b"
      }).mkString(",\n       |         ")
    def den(m: String) =
      s"sqrt(CAST(CAST(n AS HUGEINT) * p_${m}_$m - s_$m * s_$m AS DOUBLE))"
    val selects = pairs.filter { case (a, b) => a != b }
      .map { case (a, b) =>
        s"""SELECT '$a' AS m1, '$b' AS m2, n,
           |       CAST(CAST(n AS HUGEINT) * p_${a}_$b - s_$a * s_$b
           |            AS DOUBLE) / (${den(a)} * ${den(b)}) AS corr
           |FROM s""".stripMargin
      }.mkString("\n", "\nUNION ALL\n", "\n")
    s"""WITH base AS (
       |  SELECT $scaledCols
       |  FROM lineitem),
       |s AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |         $sumCols
       |  FROM base)
       |SELECT * FROM ($selects) ORDER BY m1, m2""".stripMargin
  }
}
