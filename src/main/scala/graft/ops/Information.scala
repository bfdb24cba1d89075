package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Information-theoretic dataset diagnostics — the feature-selection and
  * drift-monitoring statistics a training-data pipeline runs between
  * ingestion and training: mutual information between categorical
  * metadata columns, and the population-stability index between two time
  * slices of a metric.
  *
  * Exactness discipline (the proven q143/q148/q151 boundary): every
  * logarithmic term is log2 OF AN INTEGER (products of counts — log2
  * replaces ln, a constant 1/ln2 rescaling that preserves ordering and
  * zero), each additive term is rounded once to DECIMAL(18,6), and the
  * final reduction is an exact decimal sum cast to double — so even these
  * "float" statistics hash-match the DuckDB oracle bit-for-bit.
  */
object Information {

  /** q182_mutual_info — mutual information (in bits) between `source` and
    * `lang` over the documents table, with the marginal entropies and the
    * normalized MI / min(H) in one row: does the sharding dimension leak
    * the language mix? The classic categorical feature-redundancy probe.
    *
    * MI = Σ_xy (n_xy/N) · [log2(n_xy·N) − log2(n_x·n_y)]; all log
    * arguments are exact BIGINT products (≤ N² ≈ 2.5e7 at sf0.01 —
    * overflow-free far beyond bench scale).
    *
    * Scale: one (source, lang)-cardinality hash aggregate off the fact
    * scan (map-side combine); marginals derive from the tiny joint frame
    * (localCheckpoint'd), never from a second scan. */
  def q182MutualInfo(spark: SparkSession, sfDir: String): DataFrame = {
    val joint = Tables.documents(spark, sfDir)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_xy"))
      .localCheckpoint() // sources×langs rows; feeds marginals + terms
    val mx = joint.groupBy(col("source")).agg(sum(col("n_xy")).as("n_x"))
    val my = joint.groupBy(col("lang")).agg(sum(col("n_xy")).as("n_y"))
    val tot = joint.agg(sum(col("n_xy")).as("n"))
    def dec6(c: Column): Column = c.cast("decimal(18,6)")
    val terms = joint
      .join(broadcast(mx), "source").join(broadcast(my), "lang")
      .crossJoin(broadcast(tot))
      .select(
        dec6((col("n_xy").cast("double") / col("n").cast("double")) *
          (log2((col("n_xy") * col("n")).cast("double")) -
            log2((col("n_x") * col("n_y")).cast("double")))).as("mi_term"),
        col("n_xy"), col("n_x"), col("n_y"), col("n"))
    // marginal entropies from the same frame: H(X) = Σ -(n_x/N)log2(n_x/N),
    // each x counted once — divide the per-row term by the per-x row count?
    // No: compute from the marginal frames directly (tiny).
    val hx = mx.crossJoin(broadcast(tot))
      .select(dec6((col("n_x").cast("double") / col("n").cast("double")) *
        (log2(col("n").cast("double")) - log2(col("n_x").cast("double"))))
        .as("h_term"))
      .agg(sum(col("h_term")).as("h_x"))
    val hy = my.crossJoin(broadcast(tot))
      .select(dec6((col("n_y").cast("double") / col("n").cast("double")) *
        (log2(col("n").cast("double")) - log2(col("n_y").cast("double"))))
        .as("h_term"))
      .agg(sum(col("h_term")).as("h_y"))
    terms.agg(sum(col("mi_term")).as("mi_dec"))
      .crossJoin(broadcast(hx)).crossJoin(broadcast(hy))
      .select(col("mi_dec").cast("double").as("mi_bits"),
        col("h_x").cast("double").as("h_source"),
        col("h_y").cast("double").as("h_lang"),
        (col("mi_dec").cast("double") /
          least(col("h_x"), col("h_y")).cast("double")).as("nmi"))
  }

  val q182Sql: String =
    """WITH joint AS (
      |  SELECT source, lang, CAST(count(*) AS BIGINT) AS n_xy
      |  FROM documents GROUP BY 1, 2),
      |mx AS (SELECT source, CAST(sum(n_xy) AS BIGINT) AS n_x
      |       FROM joint GROUP BY 1),
      |my AS (SELECT lang, CAST(sum(n_xy) AS BIGINT) AS n_y
      |       FROM joint GROUP BY 1),
      |tot AS (SELECT CAST(sum(n_xy) AS BIGINT) AS n FROM joint),
      |mi AS (
      |  SELECT CAST(sum(CAST(
      |           (CAST(j.n_xy AS DOUBLE) / CAST(t.n AS DOUBLE)) *
      |           (log2(CAST(j.n_xy * t.n AS DOUBLE)) -
      |            log2(CAST(x.n_x * y.n_y AS DOUBLE)))
      |           AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS mi_dec
      |  FROM joint j JOIN mx x USING (source) JOIN my y USING (lang)
      |  CROSS JOIN tot t),
      |hx AS (
      |  SELECT CAST(sum(CAST(
      |           (CAST(n_x AS DOUBLE) / CAST(n AS DOUBLE)) *
      |           (log2(CAST(n AS DOUBLE)) - log2(CAST(n_x AS DOUBLE)))
      |           AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS h_x
      |  FROM mx CROSS JOIN tot),
      |hy AS (
      |  SELECT CAST(sum(CAST(
      |           (CAST(n_y AS DOUBLE) / CAST(n AS DOUBLE)) *
      |           (log2(CAST(n AS DOUBLE)) - log2(CAST(n_y AS DOUBLE)))
      |           AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS h_y
      |  FROM my CROSS JOIN tot)
      |SELECT CAST(mi_dec AS DOUBLE) AS mi_bits,
      |       CAST(h_x AS DOUBLE) AS h_source,
      |       CAST(h_y AS DOUBLE) AS h_lang,
      |       CAST(mi_dec AS DOUBLE) /
      |         CAST(least(h_x, h_y) AS DOUBLE) AS nmi
      |FROM mi CROSS JOIN hx CROSS JOIN hy""".stripMargin

  /** q183_psi — population-stability index (log2 variant) of the event
    * `value` distribution between the first and second half of the month:
    * the model-monitoring drift score ops teams alert on (PSI > 0.25 ⇒
    * investigate; the ln→log2 change rescales by 1/ln2 — thresholds
    * rescale with it, ordering doesn't). Ten fixed 50-wide bins with
    * add-one smoothing so empty bins stay defined:
    * psi = Σ (p_i − q_i)·[log2(a_i·Nq) − log2(b_i·Np)] over smoothed
    * counts a,b — every log argument an exact BIGINT product.
    *
    * Scale: one pass over the fact table into a (bin × 2)-cardinality
    * aggregate; everything downstream is 10 rows. */
  def q183Psi(spark: SparkSession, sfDir: String): DataFrame = {
    val binned = Tables.events(spark, sfDir)
      .select(least(lit(9), floor(col("value") / 50.0).cast("int"))
          .as("bin"),
        when(col("ts") < lit("2024-01-16").cast("timestamp"), 1L)
          .otherwise(0L).as("is_p"))
      .groupBy(col("bin"))
      .agg(sum(col("is_p")).as("raw_p"),
        sum(lit(1L) - col("is_p")).as("raw_q"))
    // add-one smoothing over the FIXED 10-bin domain: materialize all bins
    val bins = spark.range(0, 10).select(col("id").cast("int").as("bin"))
    val sm = bins.join(binned, Seq("bin"), "left")
      .select(col("bin"),
        (coalesce(col("raw_p"), lit(0L)) + 1L).as("a"),
        (coalesce(col("raw_q"), lit(0L)) + 1L).as("b"))
      .localCheckpoint() // 10 rows; feeds totals + terms
    val tot = sm.agg(sum(col("a")).as("np"), sum(col("b")).as("nq"))
    sm.crossJoin(broadcast(tot))
      .select(col("bin"), col("a"), col("b"),
        ((col("a").cast("double") / col("np").cast("double")) -
          (col("b").cast("double") / col("nq").cast("double")))
          .as("dp"),
        (log2((col("a") * col("nq")).cast("double")) -
          log2((col("b") * col("np")).cast("double"))).as("lr"))
      .select(col("bin"), col("a").as("n_ref_sm"), col("b").as("n_cur_sm"),
        col("dp").cast("decimal(18,6)").as("delta_p"),
        (col("dp") * col("lr")).cast("decimal(18,6)").as("psi_term"))
      .withColumn("psi_total",
        sum(col("psi_term")).over(Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing))
        .cast("double"))
      .select(col("bin"), col("n_ref_sm"), col("n_cur_sm"),
        col("delta_p").cast("double").as("delta_p"),
        col("psi_term").cast("double").as("psi_term"), col("psi_total"))
      .orderBy(col("bin"))
  }

  val q183Sql: String =
    """WITH binned AS (
      |  SELECT least(9, CAST(floor(value / 50.0) AS INT)) AS bin,
      |         CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
      |                       THEN 1 ELSE 0 END) AS BIGINT) AS raw_p,
      |         CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
      |                       THEN 0 ELSE 1 END) AS BIGINT) AS raw_q
      |  FROM events GROUP BY 1),
      |sm AS (
      |  SELECT r.bin,
      |         coalesce(b.raw_p, 0) + 1 AS a,
      |         coalesce(b.raw_q, 0) + 1 AS b
      |  FROM (SELECT CAST(unnest(range(0, 10)) AS INT) AS bin) r
      |  LEFT JOIN binned b ON b.bin = r.bin),
      |tot AS (SELECT CAST(sum(a) AS BIGINT) AS np,
      |               CAST(sum(b) AS BIGINT) AS nq FROM sm),
      |terms AS (
      |  SELECT bin, a, b,
      |         CAST((CAST(a AS DOUBLE) / CAST(np AS DOUBLE))
      |            - (CAST(b AS DOUBLE) / CAST(nq AS DOUBLE))
      |           AS DECIMAL(18,6)) AS delta_p,
      |         CAST(((CAST(a AS DOUBLE) / CAST(np AS DOUBLE))
      |             - (CAST(b AS DOUBLE) / CAST(nq AS DOUBLE)))
      |           * (log2(CAST(a * nq AS DOUBLE))
      |              - log2(CAST(b * np AS DOUBLE)))
      |           AS DECIMAL(18,6)) AS psi_term
      |  FROM sm CROSS JOIN tot)
      |SELECT bin, a AS n_ref_sm, b AS n_cur_sm,
      |       CAST(delta_p AS DOUBLE) AS delta_p,
      |       CAST(psi_term AS DOUBLE) AS psi_term,
      |       CAST(CAST(sum(psi_term) OVER () AS DECIMAL(18,6)) AS DOUBLE)
      |         AS psi_total
      |FROM terms ORDER BY bin""".stripMargin
}
