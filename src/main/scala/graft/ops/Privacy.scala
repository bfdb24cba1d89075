package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** PII detection and redaction — a first-class training-data-pipeline stage:
  * corpora scraped from the web carry emails, government-ID-shaped numbers,
  * and IP addresses that must be scrubbed before the text is used.
  *
  * Scale: pure map work — every pattern is a codegen'd `RegexpReplace` /
  * `RegexpExtractAll` over the text column, zero shuffle (the final orderBy
  * exists only for the driver's deterministic hash). A 100 TB corpus redacts
  * at scan speed with no exchange.
  *
  * Pattern dialect: the patterns use only syntax shared by Java regex
  * (Spark) and RE2 (DuckDB oracle) — character classes, bounded repetition,
  * word boundaries; no backreferences or lookaround, which RE2 rejects.
  */
object Privacy {

  /** (name, pattern, replacement) — applied in order. Order matters and must
    * match the oracle's nesting: email first (its local part could otherwise
    * be chewed up by the number patterns), then ID-shaped numbers, then
    * IPv4. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("id", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<ID>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"))

  /** Redact all configured PII patterns from `text`, in order. */
  def redact(text: Column): Column =
    piiPatterns.foldLeft(text) {
      case (c, (_, pat, repl)) => regexp_replace(c, pat, repl)
    }

  /** Count matches per pattern (group 0 = whole match; Spark's default
    * group index is 1, which requires a capture group — pin 0). */
  def matchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** The fixture text is clean word soup, so the queries plant
    * deterministic PII derived from an id column — same arithmetic in
    * their oracles — and then prove the scrubber removes exactly what was
    * planted. Shared by q69 (keyed by doc_id) and the q110 composed
    * pipeline (keyed by the dedup representative id): one definition, so
    * the two oracles can never drift apart. */
  def plantPii(docs: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol)
    docs.select(id,
      concat(col("text"),
        lit(" contact user"), id.cast("string"),
        lit("@example.com or "),
        (lit(100) + id % 900).cast("string"), lit("-"),
        (lit(10) + id % 90).cast("string"), lit("-"),
        (lit(1000) + id % 9000).cast("string"),
        lit(" ip 10."), (id % 256).cast("string"),
        lit(".0."), ((id * 7) % 256).cast("string")).as("text"))
  }

  /** The SQL twin of [[plantPii]] (oracle side), parameterized the same
    * way. */
  def plantPiiSql(idCol: String): String =
    s"text || ' contact user' || $idCol || '@example.com or ' ||\n" +
      s"         (100 + $idCol % 900) || '-' || (10 + $idCol % 90) || '-' ||\n" +
      s"         (1000 + $idCol % 9000) || ' ip 10.' || $idCol % 256 ||\n" +
      s"         '.0.' || ($idCol * 7) % 256"

  /** q69_pii_redact — plant PII, count matches per category, redact. */
  def q69PiiRedact(spark: SparkSession, sfDir: String): DataFrame =
    plantPii(Tables.documents(spark, sfDir), "doc_id")
      .select(col("doc_id"),
        matchCount(col("text"), piiPatterns(0)._2).as("n_emails"),
        matchCount(col("text"), piiPatterns(1)._2).as("n_ids"),
        matchCount(col("text"), piiPatterns(2)._2).as("n_ips"),
        redact(col("text")).as("redacted"))
      .orderBy(col("doc_id"))

  /** q141_kanon — k-anonymity enforcement, the release gate that follows
    * redaction in a privacy pipeline: a row is releasable only if its
    * quasi-identifier combination (here nation × market segment × account
    * balance sign) is shared by ≥ k individuals. Rows in smaller groups get
    * the most specific identifier GENERALIZED (segment → '*') and the
    * group is re-tested at the coarser level; still-small groups are
    * suppressed entirely.
    *
    * Scale: two hash aggregates on low-cardinality quasi-identifier keys
    * (map-side combinable) and one broadcast-size join back — the fact
    * rows are never shuffled more than once, and nothing about the shape
    * changes at 100 TB because group cardinality is the product of QI
    * domains, not of rows.
    */
  def q141Kanon(spark: SparkSession, sfDir: String, k: Int = 5): DataFrame = {
    val c = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
        when(col("c_acctbal") >= 0, lit("pos")).otherwise(lit("neg"))
          .as("bal_sign"))
    val fine = c.groupBy(col("c_nationkey"), col("c_mktsegment"),
      col("bal_sign")).agg(count(lit(1)).as("n_fine"))
    val gen = c
      .join(fine, Seq("c_nationkey", "c_mktsegment", "bal_sign"))
      .select(col("c_custkey"), col("c_nationkey"),
        when(col("n_fine") >= k, col("c_mktsegment")).otherwise(lit("*"))
          .as("segment"),
        col("bal_sign"))
    val coarse = gen.groupBy(col("c_nationkey"), col("segment"),
      col("bal_sign")).agg(count(lit(1)).as("n_group"))
    gen.join(coarse, Seq("c_nationkey", "segment", "bal_sign"))
      .filter(col("n_group") >= k)
      .select(col("c_custkey"), col("c_nationkey"), col("segment"),
        col("bal_sign"), col("n_group"))
      .orderBy(col("c_custkey"))
  }

  val q141Sql: String =
    """WITH c AS (
      |  SELECT c_custkey, c_nationkey, c_mktsegment,
      |         CASE WHEN c_acctbal >= 0 THEN 'pos' ELSE 'neg' END AS bal_sign
      |  FROM customer),
      |fine AS (SELECT c_nationkey, c_mktsegment, bal_sign,
      |                count(*) AS n_fine
      |         FROM c GROUP BY 1, 2, 3),
      |gen AS (SELECT c.c_custkey, c.c_nationkey,
      |               CASE WHEN f.n_fine >= 5 THEN c.c_mktsegment
      |                    ELSE '*' END AS segment,
      |               c.bal_sign
      |        FROM c JOIN fine f
      |          ON c.c_nationkey = f.c_nationkey
      |         AND c.c_mktsegment = f.c_mktsegment
      |         AND c.bal_sign = f.bal_sign),
      |coarse AS (SELECT c_nationkey, segment, bal_sign, count(*) AS n_group
      |           FROM gen GROUP BY 1, 2, 3)
      |SELECT g.c_custkey, g.c_nationkey, g.segment, g.bal_sign, n.n_group
      |FROM gen g JOIN coarse n
      |  ON g.c_nationkey = n.c_nationkey AND g.segment = n.segment
      | AND g.bal_sign = n.bal_sign
      |WHERE n.n_group >= 5
      |ORDER BY g.c_custkey""".stripMargin

  val q69Sql: String = {
    val Seq((_, email, _), (_, id, _), (_, ip, _)) = piiPatterns
    // DuckDB regexp_replace needs the explicit 'g' flag (Spark replaces
    // globally by default); patterns are shared verbatim.
    s"""WITH pii AS (
       |  SELECT doc_id,
       |         ${plantPiiSql("doc_id")} AS text
       |  FROM documents)
       |SELECT doc_id,
       |  len(regexp_extract_all(text, '$email')) AS n_emails,
       |  len(regexp_extract_all(text, '$id')) AS n_ids,
       |  len(regexp_extract_all(text, '$ip')) AS n_ips,
       |  regexp_replace(regexp_replace(regexp_replace(text,
       |      '$email', '<EMAIL>', 'g'),
       |      '$id', '<ID>', 'g'),
       |      '$ip', '<IP>', 'g') AS redacted
       |FROM pii ORDER BY doc_id""".stripMargin
  }

  /** q181_ldiversity — l-diversity audit, the release gate k-anonymity
    * (q141) does NOT provide: a class of k identical quasi-identifiers is
    * still a disclosure if they all share one sensitive value. Per
    * QI class (nation, balance sign): size, l = distinct sensitive values
    * (market segment), the dominant value's share (the homogeneity-attack
    * risk), and the l ≥ 3 release flag. All-integer counts; the share is
    * one IEEE division.
    *
    * Scale: one (QI, sensitive)-cardinality hash aggregate with map-side
    * combine, then a QI-cardinality rollup — never row-scaled shuffles. */
  def q181Ldiversity(spark: SparkSession, sfDir: String,
      l: Int = 3): DataFrame = {
    val fine = Tables.customer(spark, sfDir)
      .select(col("c_nationkey"),
        when(col("c_acctbal") >= 0, lit("pos")).otherwise(lit("neg"))
          .as("bal_sign"),
        col("c_mktsegment"))
      .groupBy(col("c_nationkey"), col("bal_sign"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_sv"))
    fine.groupBy(col("c_nationkey"), col("bal_sign"))
      .agg(sum(col("n_sv")).as("n_class"),
        count(lit(1)).as("l_distinct"),
        max(col("n_sv")).as("n_top"))
      .select(col("c_nationkey"), col("bal_sign"), col("n_class"),
        col("l_distinct"), col("n_top"),
        (col("n_top").cast("double") / col("n_class").cast("double"))
          .as("top_share"),
        (col("l_distinct") >= l).as("releasable"))
      .orderBy(col("c_nationkey"), col("bal_sign"))
  }

  val q181Sql: String =
    """WITH fine AS (
      |  SELECT c_nationkey,
      |         CASE WHEN c_acctbal >= 0 THEN 'pos' ELSE 'neg' END
      |           AS bal_sign,
      |         c_mktsegment, CAST(count(*) AS BIGINT) AS n_sv
      |  FROM customer GROUP BY 1, 2, 3)
      |SELECT c_nationkey, bal_sign,
      |       CAST(sum(n_sv) AS BIGINT) AS n_class,
      |       CAST(count(*) AS BIGINT) AS l_distinct,
      |       CAST(max(n_sv) AS BIGINT) AS n_top,
      |       CAST(max(n_sv) AS DOUBLE) / CAST(sum(n_sv) AS DOUBLE)
      |         AS top_share,
      |       count(*) >= 3 AS releasable
      |FROM fine GROUP BY c_nationkey, bal_sign
      |ORDER BY c_nationkey, bal_sign""".stripMargin

  // --------------------------------------------- differential privacy

  /** Geometric-mechanism parameters: α = 4/5, i.e. ε = ln(5/4) ≈ 0.223 for
    * a sensitivity-1 count query; support truncated at ±[[DpTrunc]] (total
    * truncated tail mass 2·α⁴¹/(1+α) ≈ 1.4·10⁻⁴, absorbed into the end
    * bins — the standard truncated-geometric release). */
  private val DpNum = BigInt(4)
  private val DpDen = BigInt(5)
  private val DpTrunc = 40
  private val DpScale = BigInt(1) << 40

  /** Exact CDF bins of the two-sided geometric distribution
    * Pr(k) ∝ α^|k|: row (k, lo, hi) means noise = k iff the 40-bit uniform
    * hash u falls in [lo, hi). Thresholds are ⌊2⁴⁰·F(k)⌋ computed in
    * BigInt rationals — no float touches the mechanism, so the identical
    * integer literals drive both engines.
    *
    * F(k<0) = α^|k|/(1+α) = 4^|k|·5 / (5^|k|·9);
    * F(k≥0) = 1 − α^(k+1)/(1+α). */
  private[graft] val dpThresholds: Seq[(Int, Long, Long)] = {
    def ceilDiv(a: BigInt, b: BigInt): BigInt = (a + b - 1) / b
    def t(k: Int): BigInt =
      if (k < 0) {
        val a = -k
        (DpScale * DpNum.pow(a) * DpDen) / (DpDen.pow(a) * (DpNum + DpDen))
      } else
        DpScale - ceilDiv(DpScale * DpNum.pow(k + 1) * DpDen,
          DpDen.pow(k + 1) * (DpNum + DpDen))
    (-DpTrunc to DpTrunc).map { k =>
      val lo = if (k == -DpTrunc) BigInt(0) else t(k - 1)
      val hi = if (k == DpTrunc) DpScale else t(k)
      (k, lo.toLong, hi.toLong)
    }
  }

  /** ε printed into the release row: ln(5/4) as a FIXED decimal literal
    * (not a runtime `ln` — the two engines' transcendental libraries are
    * not bit-guaranteed; a shared literal is). */
  private val DpEpsilonLit = "0.22314355131420976"

  /** q224_dp_counts — ε-differentially-private per-source document counts
    * via the truncated geometric mechanism (Ghosh–Roughgarden–Sundararajan:
    * the discrete Laplace, universally optimal for sensitivity-1 counts).
    * The noise is SEEDED: a 40-bit uniform from the stable source hash is
    * inverse-CDF'd through exact integer thresholds, so the release is
    * deterministic per (source, salt) — reproducible audits, and the DuckDB
    * oracle replays it bit-for-bit. A production release would rotate the
    * salt per publication; determinism-per-salt is exactly what makes a
    * release auditable after the fact.
    *
    * Scale: one map-side-combinable count aggregate at source cardinality,
    * then a broadcast range-join against the 81-row threshold table — no
    * shuffle beyond the count's. */
  def q224DpCounts(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.StableHash
    val per = Tables.documents(spark, sfDir)
      .groupBy(col("source")).agg(count(lit(1)).as("n_true"))
      .withColumn("u",
        pmod(StableHash.charMix62(col("source"), 17L), lit(DpScale.toLong)))
    val thr = spark.createDataFrame(dpThresholds).toDF("noise", "lo", "hi")
    per.join(broadcast(thr), col("u") >= col("lo") && col("u") < col("hi"))
      .select(col("source"), col("n_true"),
        col("noise").cast("long").as("noise"),
        (col("n_true") + col("noise")).as("dp_count"),
        expr(s"CAST($DpEpsilonLit AS DOUBLE)").as("epsilon"))
      .orderBy(col("source"))
  }

  val q224Sql: String = {
    val rows = dpThresholds
      .map { case (k, lo, hi) => s"($k, ${lo}::BIGINT, ${hi}::BIGINT)" }
      .mkString(",\n    ")
    s"""WITH per AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_true,
       |         (${graft.functions.StableHash.charMix62Sql("source", 17L)})
       |           % ${DpScale.toLong} AS u
       |  FROM documents GROUP BY source),
       |thr(noise, lo, hi) AS (VALUES
       |    $rows)
       |SELECT source, n_true, CAST(noise AS BIGINT) AS noise,
       |       n_true + CAST(noise AS BIGINT) AS dp_count,
       |       CAST($DpEpsilonLit AS DOUBLE) AS epsilon
       |FROM per JOIN thr ON u >= lo AND u < hi
       |ORDER BY source""".stripMargin
  }

  /** Per-record clip bound for q239 — inside the fixture's n_chars range
    * (48..553) so clipping VISIBLY binds and the audit column is live. */
  val DpClip = 400L

  /** q239_dp_sum — ε-DP per-source CHARACTER-VOLUME release, the sum-query
    * companion to q224's counts, via the granularity mechanism (clip +
    * snap + lattice noise, the construction in Google's DP library):
    * (1) each document contributes min(n_chars, [[DpClip]]) — bounding
    * per-record sensitivity to C; (2) the clipped sum is SNAPPED to the
    * C-lattice (round-half-up, exact integer ⌊(2S+C)/(2C)⌋·C), so
    * neighboring datasets differ by at most ONE lattice step; (3) one
    * sensitivity-1 truncated-geometric draw (the q224 mechanism and
    * threshold table, independent salt) is added IN LATTICE UNITS:
    * dp_sum = snap(S) + C·k. All integers end-to-end — no float ever
    * touches the mechanism — and the release is seeded-deterministic per
    * (source, salt), replayed bit-for-bit by the oracle. The audit
    * columns (n_clipped, true vs clipped sum) quantify the clipping bias
    * a real release must budget for.
    *
    * Scale: identical to q224 — one map-side-combinable aggregate at
    * source cardinality plus an 81-row broadcast range-join. */
  def q239DpSum(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.StableHash
    val c = DpClip
    val per = Tables.documents(spark, sfDir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("true_sum"),
        sum(least(col("n_chars"), lit(c))).as("clipped_sum"),
        sum(when(col("n_chars") > c, 1L).otherwise(0L)).as("n_clipped"))
      .withColumn("u",
        pmod(StableHash.charMix62(col("source"), 23L), lit(DpScale.toLong)))
    val thr = spark.createDataFrame(dpThresholds).toDF("noise", "lo", "hi")
    per.join(broadcast(thr), col("u") >= col("lo") && col("u") < col("hi"))
      .select(col("source"), col("n_docs"), col("true_sum"),
        col("clipped_sum"), col("n_clipped"),
        col("noise").cast("long").as("noise_k"),
        (expr(s"(2 * clipped_sum + $c) div ${2 * c}") * c +
          col("noise") * c).as("dp_sum"),
        expr(s"CAST($DpEpsilonLit AS DOUBLE)").as("epsilon"))
      .orderBy(col("source"))
  }

  val q239Sql: String = {
    val c = DpClip
    val rows = dpThresholds
      .map { case (k, lo, hi) => s"($k, ${lo}::BIGINT, ${hi}::BIGINT)" }
      .mkString(",\n    ")
    s"""WITH per AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(n_chars) AS BIGINT) AS true_sum,
       |         CAST(sum(least(n_chars, $c)) AS BIGINT) AS clipped_sum,
       |         CAST(sum(CASE WHEN n_chars > $c THEN 1 ELSE 0 END)
       |              AS BIGINT) AS n_clipped,
       |         (${graft.functions.StableHash.charMix62Sql("source", 23L)})
       |           % ${DpScale.toLong} AS u
       |  FROM documents GROUP BY source),
       |thr(noise, lo, hi) AS (VALUES
       |    $rows)
       |SELECT source, n_docs, true_sum, clipped_sum, n_clipped,
       |       CAST(noise AS BIGINT) AS noise_k,
       |       ((2 * clipped_sum + $c) // ${2 * c}) * $c
       |         + CAST(noise AS BIGINT) * $c AS dp_sum,
       |       CAST($DpEpsilonLit AS DOUBLE) AS epsilon
       |FROM per JOIN thr ON u >= lo AND u < hi
       |ORDER BY source""".stripMargin
  }

  // --------------------------------------------------------- t-closeness

  /** Release threshold for q230: a class passes if EMD ≤ 0.2. */
  val TClose = 0.2

  /** Ordered account-balance bands (the sensitive attribute for q230);
    * TPC-H acctbal spans [-999.99, 9999.99] so the cuts 0/3000/6000 give
    * four populated ordered bands. */
  val BalBands = 4

  /** q230_tcloseness — the t-closeness audit (Li et al., ICDE 2007), the
    * release gate l-diversity (q181) does NOT provide: a class with l
    * distinct sensitive values still leaks if its DISTRIBUTION over them
    * diverges from the population's (skewness attack). Per QI class
    * (nation × market segment), compute the Earth Mover's Distance between
    * the class's distribution over ordered balance bands and the global
    * one: for ordered values with unit ground distance,
    * EMD = (1/(m−1))·Σ|CumP_i − CumQ_i|. The cumulative differences are
    * cross-multiplied into exact integers (|N·G_i − n·N_i|) so both
    * engines sum identical BIGINTs; ONE IEEE division produces the EMD.
    *
    * Scale: one class-cardinality hash aggregate with map-side combine
    * (the m−1 cumulative counters are conditional sums in the same pass),
    * plus a broadcast single-row global frame — never row-scaled shuffles.
    * (Cross-multiplied magnitudes are n·N ≤ pop²; past ~3·10⁹ individuals
    * switch the products to DECIMAL(38,0) sums, same shape.) */
  def q230Tcloseness(spark: SparkSession, sfDir: String): DataFrame = {
    val band = when(col("c_acctbal") < 0, 0)
      .when(col("c_acctbal") < 3000, 1)
      .when(col("c_acctbal") < 6000, 2)
      .otherwise(3)
    val base = Tables.customer(spark, sfDir)
      .select(col("c_nationkey"), col("c_mktsegment"), band.as("b"))
    def cums(prefix: String): Seq[Column] =
      (0 until BalBands - 1).map(i =>
        sum(when(col("b") <= i, 1L).otherwise(0L)).as(s"$prefix$i"))
    val cls = base.groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_class"), cums("g"): _*)
    val glob = base.agg(count(lit(1)).as("pop"), cums("p"): _*)
    val num = (0 until BalBands - 1)
      .map(i => abs(col("pop") * col(s"g$i") - col("n_class") * col(s"p$i")))
      .reduce(_ + _)
    cls.crossJoin(broadcast(glob))
      .select(col("c_nationkey"), col("c_mktsegment"), col("n_class"),
        (num.cast("double") /
          (col("n_class") * col("pop") * (BalBands - 1)).cast("double"))
          .as("emd"))
      .withColumn("releasable", col("emd") <= TClose)
      .orderBy(col("c_nationkey"), col("c_mktsegment"))
  }

  val q230Sql: String = {
    val bandSql = """CASE WHEN c_acctbal < 0 THEN 0
                    |              WHEN c_acctbal < 3000 THEN 1
                    |              WHEN c_acctbal < 6000 THEN 2
                    |              ELSE 3 END""".stripMargin
    def cums(prefix: String) = (0 until BalBands - 1)
      .map(i => s"CAST(sum(CASE WHEN b <= $i THEN 1 ELSE 0 END) AS BIGINT)" +
        s" AS $prefix$i")
      .mkString(",\n       |         ").stripMargin
    val num = (0 until BalBands - 1)
      .map(i => s"abs(pop * g$i - n_class * p$i)").mkString(" + ")
    s"""WITH base AS (
       |  SELECT c_nationkey, c_mktsegment,
       |         $bandSql AS b
       |  FROM customer),
       |cls AS (
       |  SELECT c_nationkey, c_mktsegment,
       |         CAST(count(*) AS BIGINT) AS n_class,
       |         ${cums("g")}
       |  FROM base GROUP BY 1, 2),
       |popd AS (
       |  SELECT CAST(count(*) AS BIGINT) AS pop,
       |         ${cums("p")}
       |  FROM base)
       |SELECT c_nationkey, c_mktsegment, n_class,
       |       CAST($num AS DOUBLE) /
       |         CAST(n_class * pop * ${BalBands - 1} AS DOUBLE) AS emd,
       |       CAST($num AS DOUBLE) /
       |         CAST(n_class * pop * ${BalBands - 1} AS DOUBLE) <= $TClose
       |         AS releasable
       |FROM cls CROSS JOIN popd
       |ORDER BY c_nationkey, c_mktsegment""".stripMargin
  }
}
