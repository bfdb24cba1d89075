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
      .crossJoin(broadcast(big.agg(count(lit(1)).as("n_big"))))
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
  /** q120_basket_pairs — market-basket co-occurrence mining (the unordered
    * cousin of the q102 sequence collocations): part pairs appearing in the
    * same order, with support ≥ 3 and lift = P(pair) / (P(p1)·P(p2)) =
    * n_pair·n_baskets / (n1·n2) — integer products, one IEEE division, so
    * the oracle replays it exactly.
    *
    * Scale: the pair generator is a self-equi-join on the basket key, so
    * pair expansion is bounded by (basket size)² per order — never corpus²
    * — and the support threshold prunes AFTER a map-side-combinable count
    * on (p1, p2). A pathological mega-basket would need per-key capping
    * upstream; the fixture's max basket is 13 lines. The one driver-side
    * scalar (basket count) is a metadata-cheap count reused as a literal.
    */
  def q120BasketPairs(spark: SparkSession, sfDir: String): DataFrame = {
    // four consumers read the distinct item set (both pair-join sides, the
    // frequency frame, the basket count) — materialize the narrow frame
    // once instead of re-scanning lineitem per consumer
    val items = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .localCheckpoint()
    val nBaskets = items.select(col("l_orderkey")).distinct().count()
    val pairs = items.select(col("l_orderkey"), col("l_partkey").as("p1"))
      .join(items.select(col("l_orderkey"), col("l_partkey").as("p2")),
        Seq("l_orderkey"))
      .filter(col("p1") < col("p2"))
      .groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= 3)
    val freq = items.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_item"))
    pairs
      .join(freq.select(col("l_partkey").as("p1"), col("n_item").as("n1")),
        Seq("p1"))
      .join(freq.select(col("l_partkey").as("p2"), col("n_item").as("n2")),
        Seq("p2"))
      .select(col("p1"), col("p2"), col("n_pair"), col("n1"), col("n2"),
        ((col("n_pair") * nBaskets).cast("double") /
          (col("n1") * col("n2")).cast("double")).as("lift"))
      .orderBy(col("p1"), col("p2"))
  }

  val q120Sql: String =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |pairs AS (
      |  SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n_pair
      |  FROM items a JOIN items b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING count(*) >= 3),
      |freq AS (
      |  SELECT l_partkey, count(*) AS n_item FROM items GROUP BY 1),
      |nb AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM items)
      |SELECT p1, p2, n_pair, f1.n_item AS n1, f2.n_item AS n2,
      |       CAST(n_pair * nb.n_baskets AS DOUBLE) /
      |         CAST(f1.n_item * f2.n_item AS DOUBLE) AS lift
      |FROM pairs
      |JOIN freq f1 ON f1.l_partkey = p1
      |JOIN freq f2 ON f2.l_partkey = p2
      |CROSS JOIN nb
      |ORDER BY p1, p2""".stripMargin
}
