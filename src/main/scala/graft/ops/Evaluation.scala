package graft.ops

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.StableHash

/** Offline evaluation metrics — the measurement half of a training-data
  * pipeline: graded retrieval quality (NDCG) for the embedding-search
  * stack and per-class precision/recall/F1 for a labeled classifier.
  * Both follow the engine's exactness discipline: counts and
  * decimal-rounded discount terms are exact (order-insensitive partial
  * aggregation), with IEEE arithmetic only in the final scalar —
  * so even the "float" metrics hash-match the oracle bit-for-bit.
  */
object Evaluation {

  /** log2 discount weights 1/log2(i+1), i = 1..10, rounded once to 6 dp
    * and inlined into BOTH engines as identical decimal literals (the
    * q148/q151 pattern: round each term, THEN sum exactly). */
  val discounts: Seq[(Int, JBigDecimal)] = (1 to 10).map { i =>
    i -> new JBigDecimal(1.0 / (math.log(i + 1.0) / math.log(2.0)))
      .setScale(6, RoundingMode.HALF_EVEN)
  }

  /** Ideal-DCG prefix sums: cumDiscounts(k) = Σ_{i≤k} discount(i) — the
    * IDCG@10 of a query with k relevant candidates in the corpus. */
  val cumDiscounts: Seq[(Int, JBigDecimal)] =
    discounts.scanLeft(0 -> JBigDecimal.ZERO) { case ((_, acc), (i, d)) =>
      i -> acc.add(d)
    }.tail

  private def caseChain(on: Column, table: Seq[(Int, JBigDecimal)]): Column =
    table.foldLeft(lit(null).cast("decimal(18,6)")) { case (acc, (i, d)) =>
      when(on === i, lit(d.toPlainString).cast("decimal(18,6)"))
        .otherwise(acc)
    }

  private def caseChainSql(on: String,
      table: Seq[(Int, JBigDecimal)]): String =
    table.map { case (i, d) =>
      s"WHEN $on = $i THEN CAST('${d.toPlainString}' AS DECIMAL(18,6))"
    }.mkString("CASE ", " ", " END")

  /** q162_ndcg — NDCG@10 of brute-force cosine retrieval (the q75 kernel:
    * 4-dp-rounded similarity, candidate-id tie-break) with graded-binary
    * relevance rel = [candidate label = query label], for query vectors
    * 0–19. DCG sums the rank-discount decimals exactly; IDCG@10 is the
    * discount prefix sum at min(10, corpus relevant count); NDCG is the
    * one closing IEEE division. The retrieval-regression gate that runs
    * beside q152's recall audit — recall says "did the right ids come
    * back", NDCG says "in the right order, weighted by position".
    *
    * Scale: probe side is 20 vectors broadcast against the corpus scan —
    * the same shape as q75, no shuffle on the corpus side; the per-query
    * top-10 is a partitioned window over ≤ corpus candidates. */
  def q162Ndcg(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("label").as("q_label"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos_sim"), col("cand_id"))
    val ranked = e
      .select(col("vec_id").as("cand_id"), col("embedding"), col("label"))
      .crossJoin(broadcast(q))
      .filter(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("q_label"), col("cand_id"), col("label"),
        round(Similarity.cosine(col("q_emb"), col("embedding")), 4)
          .as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
    val rel = when(col("label") === col("q_label"), 1L).otherwise(0L)
    val dcg = ranked.groupBy(col("query_id"), col("q_label"))
      .agg(sum(rel).as("n_rel_top10"),
        sum(when(rel === 1L, caseChain(col("rank"), discounts))
          .otherwise(lit("0").cast("decimal(18,6)"))).as("dcg_dec"))
    // corpus relevant count: class size minus the query vector itself
    val classSizes = e.groupBy(col("label").as("q_label"))
      .agg(count(lit(1)).as("class_n"))
    dcg.join(broadcast(classSizes), Seq("q_label"))
      .select(col("query_id"), col("n_rel_top10"),
        (col("class_n") - 1).as("n_rel_corpus"),
        col("dcg_dec").cast("double").as("dcg"),
        (col("dcg_dec").cast("double") /
          caseChain(least(col("class_n") - 1, lit(10)), cumDiscounts)
            .cast("double")).as("ndcg"))
      .orderBy(col("query_id"))
  }

  val q162Sql: String = {
    val disc = caseChainSql("rank", discounts)
    val idcg = caseChainSql("least(class_n - 1, 10)", cumDiscounts)
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, embedding AS qe, label AS q_label
       |  FROM embeddings WHERE vec_id < 20),
       |p AS (
       |  SELECT q.query_id, q.q_label, e.vec_id AS cand_id, e.label,
       |         unnest(e.embedding)::DOUBLE AS x,
       |         unnest(q.qe)::DOUBLE AS y
       |  FROM embeddings e, q WHERE e.vec_id <> q.query_id),
       |s AS (
       |  SELECT query_id, q_label, cand_id, label,
       |         round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 4)
       |           AS cos_sim
       |  FROM p GROUP BY query_id, q_label, cand_id, label),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |            ORDER BY cos_sim DESC, cand_id) AS rank
       |  FROM s),
       |topk AS (SELECT * FROM r WHERE rank <= 10),
       |d AS (
       |  SELECT query_id, q_label,
       |         sum(CASE WHEN label = q_label THEN 1 ELSE 0 END)
       |           AS n_rel_top10,
       |         sum(CASE WHEN label = q_label THEN $disc
       |                  ELSE CAST('0' AS DECIMAL(18,6)) END) AS dcg_dec
       |  FROM topk GROUP BY query_id, q_label),
       |cs AS (SELECT label, count(*) AS class_n FROM embeddings
       |       GROUP BY label)
       |SELECT d.query_id, CAST(d.n_rel_top10 AS BIGINT) AS n_rel_top10,
       |       cs.class_n - 1 AS n_rel_corpus,
       |       CAST(d.dcg_dec AS DOUBLE) AS dcg,
       |       CAST(d.dcg_dec AS DOUBLE) / CAST($idcg AS DOUBLE) AS ndcg
       |FROM d JOIN cs ON d.q_label = cs.label
       |ORDER BY d.query_id""".stripMargin
  }

  /** q163_class_metrics — per-class precision / recall / F1 against a
    * deterministic synthetic classifier: the prediction equals the true
    * label except on the ~25% of ids whose hash trips the error gate,
    * where it shifts by a hash-derived nonzero offset (so every error is
    * a REAL cross-class confusion, never an accidental self-match).
    * tp/fp/fn are exact counts from two class-cardinality aggregates;
    * each metric is one IEEE division — F1 via 2tp/(2tp+fp+fn), which
    * needs no intermediate precision·recall product.
    *
    * Scale: two map-side-combinable aggregates (by true label, by
    * predicted label) joined at class cardinality — never a per-row
    * confusion matrix materialization. */
  def q163ClassMetrics(spark: SparkSession, sfDir: String): DataFrame = {
    val h = StableHash.intMix62(col("vec_id"), 7L)
    val pred = when(pmod(h, lit(4L)) === 0L,
      pmod(col("label") + 1L + pmod(h, lit(9L)), lit(10L)))
      .otherwise(col("label").cast("long"))
    val scored = Tables.embeddings(spark, sfDir)
      .select(col("label").cast("long").as("y"), pred.as("yhat"))
    val byTrue = scored.groupBy(col("y").as("class"))
      .agg(count(lit(1)).as("n_true"),
        sum(when(col("yhat") === col("y"), 1L).otherwise(0L)).as("tp"))
    val byPred = scored.groupBy(col("yhat").as("class"))
      .agg(count(lit(1)).as("n_pred"))
    byTrue.join(byPred, Seq("class"))
      .select(col("class"), col("n_true"), col("n_pred"), col("tp"),
        (col("tp").cast("double") / col("n_pred").cast("double"))
          .as("precision"),
        (col("tp").cast("double") / col("n_true").cast("double"))
          .as("recall"),
        ((col("tp") * 2).cast("double") /
          (col("tp") * 2 + (col("n_pred") - col("tp")) +
            (col("n_true") - col("tp"))).cast("double")).as("f1"))
      .orderBy(col("class"))
  }

  val q163Sql: String = {
    val h = StableHash.intMix62Sql("vec_id", 7L)
    s"""WITH scored AS (
       |  SELECT CAST(label AS BIGINT) AS y,
       |         CASE WHEN ($h) % 4 = 0
       |              THEN (CAST(label AS BIGINT) + 1 + ($h) % 9) % 10
       |              ELSE CAST(label AS BIGINT) END AS yhat
       |  FROM embeddings),
       |t AS (
       |  SELECT y AS class, count(*) AS n_true,
       |         sum(CASE WHEN yhat = y THEN 1 ELSE 0 END) AS tp
       |  FROM scored GROUP BY y),
       |p AS (SELECT yhat AS class, count(*) AS n_pred FROM scored
       |      GROUP BY yhat)
       |SELECT t.class, CAST(t.n_true AS BIGINT) AS n_true,
       |       CAST(p.n_pred AS BIGINT) AS n_pred,
       |       CAST(t.tp AS BIGINT) AS tp,
       |       CAST(t.tp AS DOUBLE) / CAST(p.n_pred AS DOUBLE) AS precision,
       |       CAST(t.tp AS DOUBLE) / CAST(t.n_true AS DOUBLE) AS recall,
       |       CAST(t.tp * 2 AS DOUBLE)
       |         / CAST(t.tp * 2 + (p.n_pred - t.tp) + (t.n_true - t.tp)
       |                AS DOUBLE) AS f1
       |FROM t JOIN p ON t.class = p.class
       |ORDER BY t.class""".stripMargin
  }

  /** q179_gains — decile gains/lift table: orders ranked by score
    * (o_totalprice, standing in for a model score) are cut into ten
    * equal-depth bins; each reports its positive count (label =
    * finalized status 'F'), cumulative capture rate, and lift over the
    * base rate. The standard campaign-targeting / model-quality readout.
    * Everything is integer counts until the final IEEE divisions.
    *
    * Deciles are assigned from the rank in the TOTAL order (score desc,
    * key) — ntile semantics, deterministic under ties. The rank is the
    * distributed partition-offset pass ([[Scale.globalRank]]:
    * range-partition on the order, rank locally, add broadcast
    * per-partition offsets) — the orders frame scales with SF, so the
    * single-partition `Window.orderBy` row_number it replaces would
    * serialize the table through one task at 100×. Cardinality after
    * the per-decile aggregate is 10 rows.
    */
  def q179Gains(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice").as("score"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("pos"))
    val n = scored.agg(count(lit(1)).as("n"))
    val ranked = Scale.globalRank(scored,
        Seq(desc("score"), col("o_orderkey")))
      .withColumn("rn", col("rank_idx") + 1L).drop("rank_idx")
      .crossJoin(broadcast(n))
      .withColumn("decile",
        least(lit(10), expr("(10 * (rn - 1)) div n + 1")).cast("int"))
    val per = ranked.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_rows"), sum(col("pos")).as("n_pos"),
        min(col("score")).as("min_score"))
      .localCheckpoint() // 10 rows; feeds tot + the cumulative window
    val tot = per.agg(sum(col("n_rows")).as("n_all"),
      sum(col("n_pos")).as("pos_all"))
    per
      .withColumn("cum_pos", sum(col("n_pos")).over(
        Window.orderBy(col("decile"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(tot))
      .select(col("decile"), col("n_rows"), col("n_pos"), col("min_score"),
        col("cum_pos"),
        (col("cum_pos").cast("double") / col("pos_all").cast("double"))
          .as("capture"),
        ((col("n_pos").cast("double") / col("n_rows").cast("double")) /
          (col("pos_all").cast("double") / col("n_all").cast("double")))
          .as("lift"))
      .orderBy(col("decile"))
  }

  val q179Sql: String =
    """WITH scored AS (
      |  SELECT o_orderkey, o_totalprice AS score,
      |         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
      |  FROM orders),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM scored),
      |ranked AS (
      |  SELECT pos, score,
      |         least(10, (10 * (row_number() OVER (ORDER BY score DESC,
      |           o_orderkey) - 1)) // n + 1) AS decile
      |  FROM scored CROSS JOIN n),
      |per AS (
      |  SELECT decile, CAST(count(*) AS BIGINT) AS n_rows,
      |         CAST(sum(pos) AS BIGINT) AS n_pos,
      |         min(score) AS min_score
      |  FROM ranked GROUP BY decile),
      |tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS n_all,
      |               CAST(sum(n_pos) AS BIGINT) AS pos_all FROM per)
      |SELECT CAST(decile AS INT) AS decile, n_rows, n_pos, min_score,
      |       CAST(sum(n_pos) OVER (ORDER BY decile
      |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos,
      |       CAST(CAST(sum(n_pos) OVER (ORDER BY decile
      |         ROWS UNBOUNDED PRECEDING) AS DOUBLE)
      |         / CAST(pos_all AS DOUBLE) AS DOUBLE) AS capture,
      |       (CAST(n_pos AS DOUBLE) / CAST(n_rows AS DOUBLE))
      |         / (CAST(pos_all AS DOUBLE) / CAST(n_all AS DOUBLE)) AS lift
      |FROM per CROSS JOIN tot ORDER BY decile""".stripMargin

  // --------------------------------------------------------------- ROC AUC

  /** q231_auc_rank — EXACT ROC-AUC via the Mann–Whitney rank-sum identity
    * AUC = (R⁺ − P(P+1)/2)/(P·N), with textbook midrank tie handling —
    * computed WITHOUT ranking rows. The classifier is q163's synthetic one
    * flattened to binary (y = label<5) with an integer score = 4·y + noise
    * in [−4, 4], overlapping the classes on [0, 4] so ties and errors are
    * real. The
    * whole computation folds to score-cardinality: per distinct score,
    * (count, positives); a cumulative window over the handful of score
    * values yields each score's midrank (doubled to stay integer:
    * 2·mid = 2·cum_before + cnt + 1), and the doubled positive rank-sum
    * R2 = Σ n_pos_s·(2·cum_before + cnt + 1) is an exact BIGINT in any
    * partition order. One IEEE division makes the AUC; Gini = 2·AUC−1.
    *
    * Scale: one map-side-combinable aggregate whose shuffle is bounded by
    * distinct-score cardinality, then a window over THAT (17 rows here —
    * the unpartitioned window is over the aggregate, never data rows). A
    * continuous scorer first quantizes to fixed-point buckets (q210's
    * 2^20 discipline), which bounds cardinality and maps ties to buckets
    * the same way in both engines. This is how AUC stays one pass at
    * 10^11 scored rows. */
  def q231AucRank(spark: SparkSession, sfDir: String): DataFrame = {
    val h = StableHash.intMix62(col("vec_id"), 29L)
    val scored = Tables.embeddings(spark, sfDir)
      .select(when(col("label") < 5, 1L).otherwise(0L).as("y"),
        (when(col("label") < 5, 4L).otherwise(0L) +
          pmod(h, lit(9L)) - 4L).as("score"))
    val byScore = scored.groupBy(col("score"))
      .agg(count(lit(1)).as("cnt"), sum(col("y")).as("n_pos_s"))
    val ranked = byScore.withColumn("cum_before",
      coalesce(sum(col("cnt")).over(Window.orderBy(col("score"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    ranked
      .agg(sum(col("cnt")).as("n"), sum(col("n_pos_s")).as("n_pos"),
        sum(col("n_pos_s") * (col("cum_before") * 2 + col("cnt") + 1))
          .as("rank_sum2"))
      .select(col("n"), col("n_pos"), (col("n") - col("n_pos")).as("n_neg"),
        col("rank_sum2"),
        ((col("rank_sum2") - col("n_pos") * (col("n_pos") + 1))
          .cast("double") /
          (col("n_pos") * (col("n") - col("n_pos")) * 2).cast("double"))
          .as("auc"))
      .withColumn("gini", col("auc") * 2 - 1)
  }

  val q231Sql: String = {
    val mix = StableHash.intMix62Sql("vec_id", 29L)
    s"""WITH scored AS (
       |  SELECT CASE WHEN label < 5 THEN 1 ELSE 0 END AS y,
       |         (CASE WHEN label < 5 THEN 4 ELSE 0 END)
       |           + ($mix) % 9 - 4 AS score
       |  FROM embeddings),
       |by_score AS (
       |  SELECT score, CAST(count(*) AS BIGINT) AS cnt,
       |         CAST(sum(y) AS BIGINT) AS n_pos_s
       |  FROM scored GROUP BY score),
       |ranked AS (
       |  SELECT *, CAST(coalesce(sum(cnt) OVER (ORDER BY score
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |         AS BIGINT) AS cum_before
       |  FROM by_score),
       |a AS (
       |  SELECT CAST(sum(cnt) AS BIGINT) AS n,
       |         CAST(sum(n_pos_s) AS BIGINT) AS n_pos,
       |         CAST(sum(n_pos_s * (cum_before * 2 + cnt + 1)) AS BIGINT)
       |           AS rank_sum2
       |  FROM ranked)
       |SELECT n, n_pos, n - n_pos AS n_neg, rank_sum2,
       |       CAST(rank_sum2 - n_pos * (n_pos + 1) AS DOUBLE) /
       |         CAST(n_pos * (n - n_pos) * 2 AS DOUBLE) AS auc,
       |       (CAST(rank_sum2 - n_pos * (n_pos + 1) AS DOUBLE) /
       |         CAST(n_pos * (n - n_pos) * 2 AS DOUBLE)) * 2 - 1 AS gini
       |FROM a""".stripMargin
  }

  // ------------------------------------------------------ kNN classification

  /** Probe count and neighborhood size for q236. */
  val KnnProbes = 100
  val KnnK = 5

  /** q236_knn_classify — leave-one-out k-NN classification accuracy over
    * the embedding corpus: for each probe vector, take its [[KnnK]]
    * nearest neighbors (squared L2 on the int8-quantized corpus — exact
    * integer distances, the q229 discipline) excluding itself, predict
    * the majority neighbor label (ties → smaller label), and report
    * per-class probe counts, hits, and accuracy. The end-to-end quality
    * gate for the whole vector stack: q152/q189 measure whether retrieval
    * finds the right IDS; this measures how much LABEL structure the
    * geometry actually carries (on the synthetic fixture: none — labels
    * are random w.r.t. the vectors, so accuracy ≈ 10-class chance, which
    * is precisely what the metric should and does report).
    *
    * Scale: probes are a [[KnnProbes]]-row broadcast against one corpus
    * scan (the q75 shape — swap in the q74/q76 bucketed kernels unchanged
    * when N demands); the per-probe top-k is a partitioned window over
    * corpus candidates, the vote is a (probe × ≤k-label) aggregate, and
    * the report is class-cardinality. Every distance, rank, and vote is
    * exact-integer with total-order ties. */
  def q236KnnClassify(spark: SparkSession, sfDir: String): DataFrame = {
    val qz = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        Quantize.quantizeInt(col("embedding")).as("qv"))
    val probes = qz.filter(col("vec_id") < KnnProbes)
      .select(col("vec_id").as("probe_id"), col("label").as("y"),
        col("qv").as("pq"))
    val wP = Window.partitionBy(col("probe_id"))
    val neigh = qz.select(col("vec_id").as("cand_id"),
        col("label").as("cand_label"), col("qv"))
      .crossJoin(broadcast(probes))
      .filter(col("cand_id") =!= col("probe_id"))
      .select(col("probe_id"), col("y"), col("cand_id"), col("cand_label"),
        Quantize.intL2sq(col("pq"), col("qv")).as("d2"))
      .withColumn("rk",
        row_number().over(wP.orderBy(col("d2"), col("cand_id"))))
      .filter(col("rk") <= KnnK)
    val votes = neigh.groupBy(col("probe_id"), col("y"), col("cand_label"))
      .agg(count(lit(1)).as("n_votes"))
      .withColumn("vr", row_number().over(
        wP.orderBy(col("n_votes").desc, col("cand_label"))))
      .filter(col("vr") === 1)
      .select(col("probe_id"), col("y"), col("cand_label").as("yhat"))
    votes.groupBy(col("y").as("label"))
      .agg(count(lit(1)).as("n_probes"),
        sum(when(col("yhat") === col("y"), 1L).otherwise(0L)).as("n_hits"))
      .withColumn("accuracy",
        col("n_hits").cast("double") / col("n_probes").cast("double"))
      .orderBy(col("label"))
  }

  /** q245_calibration — the reliability diagram + expected calibration
    * error for q231's synthetic scorer, all in EXACT rational arithmetic:
    * the score s ∈ [−4, 8] maps to predicted probability p̂ = (s+4)/12,
    * so per score bin both p̂ and the empirical rate are integer ratios,
    * and the bin's calibration gap |p̂ − rate| has the exact numerator
    * |(s+4)·n_b − 12·pos_b|. A ROLLUP over the bin frame then gives the
    * whole diagram AND the summary in one formula: for a single-score
    * group, gap-sum/(12·n) IS that bin's |p̂ − rate|; for the total row
    * (score = −100 sentinel), it is the textbook frequency-weighted ECE
    * Σ (n_b/N)·|p̂_b − rate_b|. AUC (q231) measures discrimination; this
    * measures whether the scores MEAN what they claim — the other half
    * of classifier eval, and no per-bin IEEE division is ever summed.
    *
    * Scale: one score-cardinality aggregate (map-side combinable) then a
    * ROLLUP over ~13 bin rows. Continuous scorers first quantize to
    * fixed-point buckets, as q231 notes. */
  def q245Calibration(spark: SparkSession, sfDir: String): DataFrame = {
    val h = StableHash.intMix62(col("vec_id"), 29L)
    val bins = Tables.embeddings(spark, sfDir)
      .select(when(col("label") < 5, 1L).otherwise(0L).as("y"),
        (when(col("label") < 5, 4L).otherwise(0L) +
          pmod(h, lit(9L)) - 4L).as("score"))
      .groupBy(col("score"))
      .agg(count(lit(1)).as("n_b"), sum(col("y")).as("pos_b"))
      .select(col("score"), col("n_b"), col("pos_b"),
        ((col("score") + 4) * col("n_b")).as("s4n"),
        abs((col("score") + 4) * col("n_b") - col("pos_b") * 12).as("t"))
    bins.rollup(col("score"))
      .agg(sum(col("n_b")).as("n_rows"), sum(col("pos_b")).as("n_pos"),
        sum(col("s4n")).as("s4n"), sum(col("t")).as("t"))
      .select(coalesce(col("score"), lit(-100L)).as("score"),
        col("n_rows"), col("n_pos"),
        (col("s4n").cast("double") / (col("n_rows") * 12).cast("double"))
          .as("p_hat"),
        (col("n_pos").cast("double") / col("n_rows").cast("double"))
          .as("rate"),
        (col("t").cast("double") / (col("n_rows") * 12).cast("double"))
          .as("cal_gap"))
      .orderBy(col("score"))
  }

  val q245Sql: String = {
    val mix = StableHash.intMix62Sql("vec_id", 29L)
    s"""WITH scored AS (
       |  SELECT CASE WHEN label < 5 THEN 1 ELSE 0 END AS y,
       |         (CASE WHEN label < 5 THEN 4 ELSE 0 END)
       |           + ($mix) % 9 - 4 AS score
       |  FROM embeddings),
       |bins AS (
       |  SELECT score, CAST(count(*) AS BIGINT) AS n_b,
       |         CAST(sum(y) AS BIGINT) AS pos_b
       |  FROM scored GROUP BY score),
       |terms AS (
       |  SELECT score, n_b, pos_b,
       |         (score + 4) * n_b AS s4n,
       |         abs((score + 4) * n_b - pos_b * 12) AS t
       |  FROM bins)
       |SELECT coalesce(score, -100) AS score,
       |       CAST(sum(n_b) AS BIGINT) AS n_rows,
       |       CAST(sum(pos_b) AS BIGINT) AS n_pos,
       |       CAST(sum(s4n) AS DOUBLE) / CAST(sum(n_b) * 12 AS DOUBLE)
       |         AS p_hat,
       |       CAST(sum(pos_b) AS DOUBLE) / CAST(sum(n_b) AS DOUBLE)
       |         AS rate,
       |       CAST(sum(t) AS DOUBLE) / CAST(sum(n_b) * 12 AS DOUBLE)
       |         AS cal_gap
       |FROM terms GROUP BY ROLLUP(score)
       |ORDER BY score""".stripMargin
  }

  /** q253_fairness — demographic-parity and equalized-odds audit of
    * q163's synthetic classifier, flattened to the binary task y =
    * (label < 5), across a protected-attribute proxy g = vec_id mod 2:
    * per group the selection rate P(ŷ=1), TPR and FPR, and in the same
    * row their cross-group gaps plus the four-fifths-rule ratio
    * min(sel)/max(sel) — the pre-deployment fairness screen that
    * complements accuracy (q163/q236), discrimination (q231) and
    * calibration (q245). Ten exact integer counters in ONE
    * map-side-combinable aggregate; every rate is a single division and
    * every gap a single IEEE subtract of identical operands in both
    * engines.
    *
    * Scale: one scan, one combine to a single row — group count D costs
    * 5·D counters, never a second pass. */
  def q253Fairness(spark: SparkSession, sfDir: String): DataFrame = {
    val h = StableHash.intMix62(col("vec_id"), 7L)
    val predLabel = when(pmod(h, lit(4L)) === 0L,
      pmod(col("label") + 1L + pmod(h, lit(9L)), lit(10L)))
      .otherwise(col("label").cast("long"))
    val base = Tables.embeddings(spark, sfDir)
      .select(pmod(col("vec_id"), lit(2L)).as("g"),
        when(col("label") < 5, 1L).otherwise(0L).as("y"),
        when(predLabel < 5, 1L).otherwise(0L).as("yhat"))
    def cnt(g: Int, cond: Column, name: String) =
      sum(when(col("g") === g.toLong && cond, 1L).otherwise(0L)).as(name)
    val agg1 = base.agg(
      cnt(0, lit(true), "n0"), cnt(1, lit(true), "n1"),
      cnt(0, col("y") === 1L, "pos0"), cnt(1, col("y") === 1L, "pos1"),
      cnt(0, col("yhat") === 1L, "sel0"), cnt(1, col("yhat") === 1L, "sel1"),
      cnt(0, col("y") === 1L && col("yhat") === 1L, "tp0"),
      cnt(1, col("y") === 1L && col("yhat") === 1L, "tp1"),
      cnt(0, col("y") === 0L && col("yhat") === 1L, "fp0"),
      cnt(1, col("y") === 0L && col("yhat") === 1L, "fp1"))
    def rate(num: String, den: Column) =
      col(num).cast("double") / den.cast("double")
    agg1.select(col("n0"), col("n1"),
      rate("sel0", col("n0")).as("sel_rate0"),
      rate("sel1", col("n1")).as("sel_rate1"),
      abs(rate("sel0", col("n0")) - rate("sel1", col("n1")))
        .as("dp_diff"),
      (least(rate("sel0", col("n0")), rate("sel1", col("n1"))) /
        greatest(rate("sel0", col("n0")), rate("sel1", col("n1"))))
        .as("dp_ratio"),
      rate("tp0", col("pos0")).as("tpr0"),
      rate("tp1", col("pos1")).as("tpr1"),
      abs(rate("tp0", col("pos0")) - rate("tp1", col("pos1")))
        .as("tpr_diff"),
      rate("fp0", col("n0") - col("pos0")).as("fpr0"),
      rate("fp1", col("n1") - col("pos1")).as("fpr1"),
      abs(rate("fp0", col("n0") - col("pos0")) -
        rate("fp1", col("n1") - col("pos1"))).as("fpr_diff"))
  }

  val q253Sql: String = {
    val h = StableHash.intMix62Sql("vec_id", 7L)
    s"""WITH scored AS (
       |  SELECT vec_id % 2 AS g,
       |         CASE WHEN label < 5 THEN 1 ELSE 0 END AS y,
       |         CASE WHEN (CASE WHEN ($h) % 4 = 0
       |                    THEN (CAST(label AS BIGINT) + 1 + ($h) % 9) % 10
       |                    ELSE CAST(label AS BIGINT) END) < 5
       |              THEN 1 ELSE 0 END AS yhat
       |  FROM embeddings),
       |a AS (
       |  SELECT
       |    CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
       |    CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |    CAST(sum(CASE WHEN g = 0 AND y = 1 THEN 1 ELSE 0 END)
       |         AS BIGINT) AS pos0,
       |    CAST(sum(CASE WHEN g = 1 AND y = 1 THEN 1 ELSE 0 END)
       |         AS BIGINT) AS pos1,
       |    CAST(sum(CASE WHEN g = 0 AND yhat = 1 THEN 1 ELSE 0 END)
       |         AS BIGINT) AS sel0,
       |    CAST(sum(CASE WHEN g = 1 AND yhat = 1 THEN 1 ELSE 0 END)
       |         AS BIGINT) AS sel1,
       |    CAST(sum(CASE WHEN g = 0 AND y = 1 AND yhat = 1 THEN 1 ELSE 0
       |             END) AS BIGINT) AS tp0,
       |    CAST(sum(CASE WHEN g = 1 AND y = 1 AND yhat = 1 THEN 1 ELSE 0
       |             END) AS BIGINT) AS tp1,
       |    CAST(sum(CASE WHEN g = 0 AND y = 0 AND yhat = 1 THEN 1 ELSE 0
       |             END) AS BIGINT) AS fp0,
       |    CAST(sum(CASE WHEN g = 1 AND y = 0 AND yhat = 1 THEN 1 ELSE 0
       |             END) AS BIGINT) AS fp1
       |  FROM scored)
       |SELECT n0, n1,
       |       CAST(sel0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS sel_rate0,
       |       CAST(sel1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS sel_rate1,
       |       abs(CAST(sel0 AS DOUBLE) / CAST(n0 AS DOUBLE)
       |           - CAST(sel1 AS DOUBLE) / CAST(n1 AS DOUBLE)) AS dp_diff,
       |       least(CAST(sel0 AS DOUBLE) / CAST(n0 AS DOUBLE),
       |             CAST(sel1 AS DOUBLE) / CAST(n1 AS DOUBLE)) /
       |       greatest(CAST(sel0 AS DOUBLE) / CAST(n0 AS DOUBLE),
       |                CAST(sel1 AS DOUBLE) / CAST(n1 AS DOUBLE))
       |         AS dp_ratio,
       |       CAST(tp0 AS DOUBLE) / CAST(pos0 AS DOUBLE) AS tpr0,
       |       CAST(tp1 AS DOUBLE) / CAST(pos1 AS DOUBLE) AS tpr1,
       |       abs(CAST(tp0 AS DOUBLE) / CAST(pos0 AS DOUBLE)
       |           - CAST(tp1 AS DOUBLE) / CAST(pos1 AS DOUBLE))
       |         AS tpr_diff,
       |       CAST(fp0 AS DOUBLE) / CAST(n0 - pos0 AS DOUBLE) AS fpr0,
       |       CAST(fp1 AS DOUBLE) / CAST(n1 - pos1 AS DOUBLE) AS fpr1,
       |       abs(CAST(fp0 AS DOUBLE) / CAST(n0 - pos0 AS DOUBLE)
       |           - CAST(fp1 AS DOUBLE) / CAST(n1 - pos1 AS DOUBLE))
       |         AS fpr_diff
       |FROM a""".stripMargin
  }

  /** Action count for q244's policies. */
  val IpsK = 5

  /** q244_ips_eval — OFF-policy evaluation by inverse propensity scoring:
    * given logs from a uniform exploration policy (action = id-hash mod
    * [[IpsK]], propensity exactly 1/K), estimate the value a DIFFERENT
    * deterministic target policy would have achieved: V_IPS =
    * (1/n)·Σ r·K·1[a_log = a_tgt], and the self-normalized SNIPS variant
    * Σr·w / Σw. Reward = 1 iff the logged action equals the context's
    * true best (label mod K). Because the fixture is synthetic, the
    * target's TRUE value is also computable — emitted in-row, so the
    * estimate and its ground truth sit side by side (IPS is unbiased:
    * the spec checks the estimate lands within sampling error). The
    * counterfactual-evaluation step every recommendation/ranking
    * pipeline runs before shipping a policy, reduced to ONE exact
    * integer aggregate.
    *
    * Scale: one map-side-combinable global aggregate — five counters
    * over a scan; no joins, no shuffle beyond the single-row combine.
    * Every estimate is an integer ratio with one IEEE division. */
  def q244IpsEval(spark: SparkSession, sfDir: String): DataFrame = {
    // intMix62Col, NOT intMix62-with-two-salts: additive salts 51/52
    // would make the two draws differ by a CONSTANT (a_tgt ≡ a_log+4
    // mod 5 — zero matches, the exact correlation documented on
    // intMix62Col); the multiplicative salt decorrelates the policies
    val aLog = pmod(StableHash.intMix62Col(col("vec_id"), lit(51L)),
      lit(IpsK.toLong))
    val aTgt = pmod(StableHash.intMix62Col(col("vec_id"), lit(52L)),
      lit(IpsK.toLong))
    val best = pmod(col("label").cast("long"), lit(IpsK.toLong))
    val r = when(aLog === best, 1L).otherwise(0L)
    val matched = when(aLog === aTgt, 1L).otherwise(0L)
    Tables.embeddings(spark, sfDir)
      .select(r.as("r"), matched.as("m"),
        when(aTgt === best, 1L).otherwise(0L).as("tgt_hit"))
      .agg(count(lit(1)).as("n"),
        sum(col("r")).as("n_reward"),
        sum(col("m")).as("n_match"),
        sum(col("r") * col("m")).as("n_match_reward"),
        sum(col("tgt_hit")).as("n_tgt_hit"))
      .select(col("n"), col("n_reward"), col("n_match"),
        col("n_match_reward"),
        (col("n_reward").cast("double") / col("n").cast("double"))
          .as("v_logging"),
        ((col("n_match_reward") * IpsK).cast("double") /
          col("n").cast("double")).as("v_ips"),
        (col("n_match_reward").cast("double") / col("n_match")
          .cast("double")).as("v_snips"),
        (col("n_tgt_hit").cast("double") / col("n").cast("double"))
          .as("v_true"))
  }

  val q244Sql: String = {
    val aLog = s"(${StableHash.intMix62ColSql("vec_id", "51")}) % $IpsK"
    val aTgt = s"(${StableHash.intMix62ColSql("vec_id", "52")}) % $IpsK"
    s"""WITH base AS (
       |  SELECT CASE WHEN ($aLog) = CAST(label AS BIGINT) % $IpsK
       |              THEN 1 ELSE 0 END AS r,
       |         CASE WHEN ($aLog) = ($aTgt) THEN 1 ELSE 0 END AS m,
       |         CASE WHEN ($aTgt) = CAST(label AS BIGINT) % $IpsK
       |              THEN 1 ELSE 0 END AS tgt_hit
       |  FROM embeddings),
       |a AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(r) AS BIGINT) AS n_reward,
       |         CAST(sum(m) AS BIGINT) AS n_match,
       |         CAST(sum(r * m) AS BIGINT) AS n_match_reward,
       |         CAST(sum(tgt_hit) AS BIGINT) AS n_tgt_hit
       |  FROM base)
       |SELECT n, n_reward, n_match, n_match_reward,
       |       CAST(n_reward AS DOUBLE) / CAST(n AS DOUBLE) AS v_logging,
       |       CAST(n_match_reward * $IpsK AS DOUBLE) / CAST(n AS DOUBLE)
       |         AS v_ips,
       |       CAST(n_match_reward AS DOUBLE) / CAST(n_match AS DOUBLE)
       |         AS v_snips,
       |       CAST(n_tgt_hit AS DOUBLE) / CAST(n AS DOUBLE) AS v_true
       |FROM a""".stripMargin
  }

  val q236Sql: String =
    s"""WITH qz AS (
       |  SELECT vec_id, CAST(label AS BIGINT) AS label,
       |         list_transform(embedding, x -> CAST(round(
       |           CAST(x AS DOUBLE) /
       |           (list_max(list_transform(embedding,
       |              y -> abs(CAST(y AS DOUBLE)))) / 127.0)) AS BIGINT))
       |           AS qv
       |  FROM embeddings),
       |probes AS (
       |  SELECT vec_id AS probe_id, label AS y, qv AS pq
       |  FROM qz WHERE vec_id < $KnnProbes),
       |p AS (
       |  SELECT probe_id, y, c.vec_id AS cand_id, c.label AS cand_label,
       |         unnest(c.qv) AS cx, unnest(pq) AS px
       |  FROM qz c, probes WHERE c.vec_id <> probe_id),
       |d AS (
       |  SELECT probe_id, y, cand_id, cand_label,
       |         CAST(sum((cx - px) * (cx - px)) AS BIGINT) AS d2
       |  FROM p GROUP BY 1, 2, 3, 4),
       |nn AS (
       |  SELECT *, row_number() OVER (PARTITION BY probe_id
       |           ORDER BY d2, cand_id) AS rk
       |  FROM d),
       |votes AS (
       |  SELECT probe_id, y, cand_label, count(*) AS n_votes
       |  FROM nn WHERE rk <= $KnnK GROUP BY 1, 2, 3),
       |pred AS (
       |  SELECT probe_id, y, cand_label AS yhat,
       |         row_number() OVER (PARTITION BY probe_id
       |           ORDER BY n_votes DESC, cand_label) AS vr
       |  FROM votes)
       |SELECT y AS label, CAST(count(*) AS BIGINT) AS n_probes,
       |       CAST(sum(CASE WHEN yhat = y THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_hits,
       |       CAST(sum(CASE WHEN yhat = y THEN 1 ELSE 0 END) AS DOUBLE) /
       |         CAST(count(*) AS DOUBLE) AS accuracy
       |FROM pred WHERE vr = 1
       |GROUP BY y ORDER BY label""".stripMargin
}
