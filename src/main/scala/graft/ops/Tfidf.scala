package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** TF-IDF term scoring — the classic corpus-relevance signal a training-data
  * pipeline uses for keyword extraction and topic filtering (extends the
  * text-analysis family, SURVEY §2.7, over the `documents` table).
  *
  * The IDF factor is the PURE RATIO n_docs/df rather than its logarithm:
  * ranking is order-equivalent for fixed tf, and one double division is
  * bit-identical across engines where `ln` (libm) is not — the determinism
  * contract FIXTURES.md imposes on every oracle row.
  *
  * Scale design:
  *  - Term-frequency and doc-frequency are both hash aggregates with map-side
  *    partial combine; the shuffled keys are (doc, term) and term — both
  *    vocabulary-bound, never corpus-bound.
  *  - The corpus size joins in as a broadcast 1-row aggregate, not a driver
  *    constant — no action at plan-build time.
  *  - Top-k per document runs on the custom bounded-heap operator
  *    ([[graft.plans.GroupedTopK]]): the partial stage prunes to ≤3 rows
  *    per (partition, doc) BEFORE the shuffle, and the rank window then
  *    sorts 3-row groups, not the scored table.
  *  - The tf ⋈ df join shuffles on the term key; when the vocabulary fits
  *    (it usually does — Heaps' law), `broadcast(dfreq)` turns it map-side.
  */
object Tfidf {

  /** q56_tfidf — top-3 terms per document by tf·(N/df), ties broken by term. */
  def q56Tfidf(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val tf = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = toks.groupBy(col("tok"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(dfreq, "tok")
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") *
          (col("n_docs").cast("double") / col("df").cast("double")))
    // heap-prune to the top 3 per doc (identical total order to the rank
    // window below, so the retained set is exactly the rnk<=3 rows), THEN
    // rank — the window sorts 3-row partitions instead of the full table
    val top = graft.plans.GroupedTopK.topKPerKey(
      scored.select(col("doc_id"), col("tok"), col("tf"), col("df"),
        col("score")),
      Seq("doc_id"), Seq("score" -> true, "tok" -> false), 3)
    val byDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("tok"))
    top
      .withColumn("rnk", row_number().over(byDoc))
      .select(col("doc_id"), col("rnk"), col("tok"), col("tf"), col("df"),
        col("score"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  val q56Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |tf AS (
      |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
      |  FROM toks WHERE tok <> '' GROUP BY doc_id, tok),
      |dfreq AS (
      |  SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      |  FROM toks WHERE tok <> '' GROUP BY tok),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.tok, tf.tf, dfreq.df,
      |         CAST(tf.tf AS DOUBLE) *
      |           (CAST(n.n_docs AS DOUBLE) / CAST(dfreq.df AS DOUBLE)) AS score
      |  FROM tf JOIN dfreq ON tf.tok = dfreq.tok CROSS JOIN n),
      |ranked AS (
      |  SELECT doc_id, tok, tf, df, score,
      |         row_number() OVER (PARTITION BY doc_id
      |                            ORDER BY score DESC, tok) AS rnk
      |  FROM scored)
      |SELECT doc_id, rnk, tok, tf, df, score
      |FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin
}
