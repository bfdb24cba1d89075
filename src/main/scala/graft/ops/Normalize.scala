package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Distribution alignment and stratification audits — the statistics a
  * curation pipeline runs when sources must be made comparable before
  * mixing: quantile normalization (map every source's distribution onto
  * the pooled one) and the Simpson's-paradox check (does a pooled rate
  * comparison reverse inside every stratum?). Both all-integer until
  * final divisions; the paradox test itself never touches a float —
  * rate comparisons are integer cross-multiplications.
  */
object Normalize {

  /** q187_quantile_norm — quantile-normalize document length per source:
    * each doc's `n_chars` is replaced by the POOLED distribution's value
    * at the same quantile position, aligning every source's length
    * profile to the corpus (the microarray/batch-effect technique, here
    * de-biasing source-specific crawl truncation). Position mapping is
    * exact integer arithmetic: source rank r of n_s maps to global index
    * floor((r−1)(N−1)/(n_s−1))+1 (endpoints to endpoints; singleton
    * sources to the global lower median).
    *
    * Scale: two ranking passes — per-source (partitioned window) and the
    * global order statistic (the definitional total sort, same
    * range-partition machinery as every deterministic output; a
    * 1000-executor variant would zone it by pre-computed boundaries) —
    * then one equi-join on the computed index. No fact-sized windows
    * beyond those ranks. */
  def q187QuantileNorm(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val bySrc = Window.partitionBy(col("source"))
      .orderBy(col("n_chars"), col("doc_id"))
    val ranked = docs
      .withColumn("r", row_number().over(bySrc))
      .withColumn("n_s", count(lit(1)).over(Window.partitionBy(col("source"))))
    // global order statistics via the distributed partition-offset rank
    // (the documents frame scales with SF — a partitionBy-less
    // Window.orderBy here would route the whole corpus through one task)
    val global = Scale.globalRank(
        docs.select(col("n_chars").as("g_val")), Seq(col("g_val")))
      .withColumn("g", col("rank_idx") + 1L).drop("rank_idx")
    val n = docs.agg(count(lit(1)).as("n_total"))
    ranked.crossJoin(broadcast(n))
      .withColumn("g_idx",
        when(col("n_s") === 1, expr("(n_total + 1) div 2"))
          .otherwise(expr(
            "(r - 1) * (n_total - 1) div (n_s - 1) + 1")))
      .join(global, col("g_idx") === col("g"))
      .select(col("doc_id"), col("source"), col("n_chars"), col("r"),
        col("n_s"), col("g_idx"), col("g_val").as("norm_chars"))
      .orderBy(col("doc_id"))
  }

  val q187Sql: String =
    """WITH docs AS (
      |  SELECT doc_id, source, n_chars FROM documents),
      |ranked AS (
      |  SELECT doc_id, source, n_chars,
      |         row_number() OVER (PARTITION BY source
      |           ORDER BY n_chars, doc_id) AS r,
      |         count(*) OVER (PARTITION BY source) AS n_s
      |  FROM docs),
      |global AS (
      |  SELECT n_chars AS g_val,
      |         row_number() OVER (ORDER BY n_chars) AS g
      |  FROM docs),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM docs)
      |SELECT rk.doc_id, rk.source, rk.n_chars, rk.r, rk.n_s,
      |       CASE WHEN rk.n_s = 1 THEN (n.n_total + 1) // 2
      |            ELSE (rk.r - 1) * (n.n_total - 1) // (rk.n_s - 1) + 1
      |       END AS g_idx,
      |       gl.g_val AS norm_chars
      |FROM ranked rk CROSS JOIN n
      |JOIN global gl ON gl.g =
      |  CASE WHEN rk.n_s = 1 THEN (n.n_total + 1) // 2
      |       ELSE (rk.r - 1) * (n.n_total - 1) // (rk.n_s - 1) + 1 END
      |ORDER BY rk.doc_id""".stripMargin

  /** q188_simpson — Simpson's-paradox audit on order finalization: does
    * high-priority beat low-priority on the pooled 'F'-rate while losing
    * inside (some or every) nation? Per nation: both group rates, the
    * within-nation direction, the pooled direction, and the reversal
    * flag. Every direction is an INTEGER cross-multiplication
    * (a₁·b₂ vs a₂·b₁) — the comparison a float rate can get wrong is
    * exact here; the reported rates are display-only IEEE divisions.
    *
    * Scale: orders join customer on custkey (dimension-sized build side,
    * broadcast), one (nation × 2)-cardinality aggregate, pooled totals
    * from the per-nation frame — never a second fact scan. */
  def q188Simpson(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey"),
        when(col("o_orderpriority") < lit("3"), lit("high"))
          .otherwise(lit("low")).as("grp"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("fin"))
    val c = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"))
    val cells = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(
        sum(when(col("grp") === "high", col("fin")).otherwise(0L))
          .as("f_high"),
        sum(when(col("grp") === "high", 1L).otherwise(0L)).as("n_high"),
        sum(when(col("grp") === "low", col("fin")).otherwise(0L))
          .as("f_low"),
        sum(when(col("grp") === "low", 1L).otherwise(0L)).as("n_low"))
      .localCheckpoint() // nation-cardinality; feeds pooled + output
    val pooled = cells.agg(sum(col("f_high")).as("phf"), sum(col("n_high")).as("phn"),
      sum(col("f_low")).as("plf"), sum(col("n_low")).as("pln"))
    cells.crossJoin(broadcast(pooled))
      .select(col("c_nationkey"), col("f_high"), col("n_high"), col("f_low"),
        col("n_low"),
        when(col("n_high") > 0, col("f_high").cast("double") /
          col("n_high").cast("double")).as("rate_high"),
        when(col("n_low") > 0, col("f_low").cast("double") /
          col("n_low").cast("double")).as("rate_low"),
        signum((col("f_high") * col("n_low") - col("f_low") * col("n_high"))
          .cast("double")).cast("int").as("local_dir"),
        signum((col("phf") * col("pln") - col("plf") * col("phn"))
          .cast("double")).cast("int").as("pooled_dir"))
      .withColumn("reversed",
        col("local_dir") * col("pooled_dir") === -1)
      .orderBy(col("c_nationkey"))
  }

  val q188Sql: String =
    """WITH o AS (
      |  SELECT o_custkey,
      |         CASE WHEN o_orderpriority < '3' THEN 'high' ELSE 'low' END
      |           AS grp,
      |         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS fin
      |  FROM orders),
      |cells AS (
      |  SELECT c.c_nationkey,
      |         CAST(sum(CASE WHEN grp = 'high' THEN fin ELSE 0 END)
      |              AS BIGINT) AS f_high,
      |         CAST(sum(CASE WHEN grp = 'high' THEN 1 ELSE 0 END)
      |              AS BIGINT) AS n_high,
      |         CAST(sum(CASE WHEN grp = 'low' THEN fin ELSE 0 END)
      |              AS BIGINT) AS f_low,
      |         CAST(sum(CASE WHEN grp = 'low' THEN 1 ELSE 0 END)
      |              AS BIGINT) AS n_low
      |  FROM o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1),
      |pooled AS (
      |  SELECT CAST(sum(f_high) AS BIGINT) AS phf,
      |         CAST(sum(n_high) AS BIGINT) AS phn,
      |         CAST(sum(f_low) AS BIGINT) AS plf,
      |         CAST(sum(n_low) AS BIGINT) AS pln
      |  FROM cells)
      |SELECT c_nationkey, f_high, n_high, f_low, n_low,
      |       CASE WHEN n_high > 0 THEN CAST(f_high AS DOUBLE) / CAST(n_high AS DOUBLE) END AS rate_high,
      |       CASE WHEN n_low > 0 THEN CAST(f_low AS DOUBLE) / CAST(n_low AS DOUBLE) END AS rate_low,
      |       CAST(sign(f_high * n_low - f_low * n_high) AS INT) AS local_dir,
      |       CAST(sign(phf * pln - plf * phn) AS INT) AS pooled_dir,
      |       CAST(sign(f_high * n_low - f_low * n_high) AS INT)
      |         * CAST(sign(phf * pln - plf * phn) AS INT) = -1 AS reversed
      |FROM cells CROSS JOIN pooled
      |ORDER BY c_nationkey""".stripMargin
}
