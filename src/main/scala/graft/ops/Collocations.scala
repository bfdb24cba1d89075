package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Bigram collocation mining — which word pairs co-occur more often than
  * their unigram frequencies predict. The association score is the LIFT
  * ratio p(xy) / (p(x)·p(y)) rather than log-PMI: the ratio needs only
  * multiplications and one division (bit-identical IEEE across engines),
  * whereas libm `log` is not guaranteed to round identically between
  * engines and would break the hash oracle.
  *
  * Scale: bigram expansion is map-side (`transform` over the token array —
  * no self-join on positions); both count aggregates shuffle vocabulary-
  * bounded keys with map-side combine; the unigram table and the 1-row
  * totals broadcast back into the bigram frame. The corpus itself is
  * never joined or shuffled row-per-token beyond the two bounded
  * aggregations.
  */
object Collocations {

  /** Minimum bigram support for q102 (keeps the tail of singleton pairs out
    * of the result; real corpora use far higher cutoffs). */
  val minSupport = 5

  def q102Collocations(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    // adjacent-pair expansion inside the row: t[i] is 0-based subscripting;
    // docs with <2 tokens are excluded BEFORE sequence(0, size-2) can
    // produce a descending (0,-1) range
    val big = docs
      .select(split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(t)-2), i -> struct(t[i] AS w1, t[i+1] AS w2))"))
        .as("bg"))
      .select(col("bg.w1"), col("bg.w2"))
    val uni = docs.select(explode(split(col("text"), " ")).as("w"))
    val un = uni.groupBy(col("w")).agg(count(lit(1)).as("n"))
    val bn = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_xy"))
    val tot = uni.agg(count(lit(1)).as("n_tok"))
      .crossJoin(big.agg(count(lit(1)).as("n_big")))
    // lift = (n_xy/n_big) / ((n_x/n_tok)(n_y/n_tok)), arranged with the
    // SAME association order as the oracle so the doubles match bitwise
    val lift = round(
      col("n_xy").cast("double") * col("n_tok") * col("n_tok") /
        (col("n_big").cast("double") * col("n1") * col("n2")), 6)
    bn
      .filter(col("n_xy") >= minSupport)
      .crossJoin(broadcast(tot))
      .join(broadcast(un.select(col("w").as("w1"), col("n").as("n1"))), "w1")
      .join(broadcast(un.select(col("w").as("w2"), col("n").as("n2"))), "w2")
      .select(col("w1"), col("w2"), col("n_xy"), lift.as("lift"))
      .orderBy(desc("lift"), col("w1"), col("w2"))
  }

  val q102Sql: String =
    s"""WITH toks AS (
       |  SELECT string_split(text, ' ') AS t FROM documents
       |  WHERE len(string_split(text, ' ')) >= 2),
       |big AS (
       |  SELECT t[i+1] AS w1, t[i+2] AS w2
       |  FROM toks, UNNEST(range(0, len(t)-1)) AS u(i)),
       |uni AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
       |un AS (SELECT w, count(*) AS n FROM uni GROUP BY w),
       |bn AS (SELECT w1, w2, count(*) AS n_xy FROM big GROUP BY w1, w2),
       |tot AS (SELECT (SELECT count(*) FROM uni) AS n_tok,
       |               (SELECT count(*) FROM big) AS n_big)
       |SELECT bn.w1, bn.w2, bn.n_xy,
       |       round(CAST(bn.n_xy AS DOUBLE) * tot.n_tok * tot.n_tok /
       |             (CAST(tot.n_big AS DOUBLE) * u1.n * u2.n), 6) AS lift
       |FROM bn
       |CROSS JOIN tot
       |JOIN un u1 ON bn.w1 = u1.w
       |JOIN un u2 ON bn.w2 = u2.w
       |WHERE bn.n_xy >= $minSupport
       |ORDER BY lift DESC, w1, w2""".stripMargin
}
