package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Training-set assembly operators — the last mile between a curated corpus
  * ([[Curation]], [[Dedup]]) and the trainer: deterministic shard
  * assignment, domain-mixture reweighting toward a target distribution,
  * out-of-vocabulary auditing against a frozen vocabulary, and incremental
  * (new-batch-vs-corpus) exact deduplication. The reference's ELT tier has
  * no equivalent; these extend north-star tier X (BASELINE.json).
  *
  * Shared determinism rules (README): hashes are exact BIGINT arithmetic
  * both engines evaluate identically, every ratio is a single IEEE division
  * of exact integers, and ties break on a total order.
  */
object TrainingData {

  // ------------------------------------------------------------ sharding

  /** Shard count for q203 — a power of two like a real output layout. */
  val Shards = 16

  /** Knuth's 32-bit multiplicative constant; `id·A mod 2^32` is a cheap
    * unit-stride-breaking permutation-ish mix both engines compute exactly
    * in BIGINT (ids ≤ 2^21 at bench scale ⇒ products < 2^53). */
  val MixA = 2654435761L
  val Mod32 = 4294967296L

  /** q203_shuffle_shard — deterministic training-shard assignment plus the
    * balance audit a shuffle step must ship with: every document lands in
    * `shard = (doc_id·A mod 2^32) mod K`, and the output is one row per
    * shard with its document count, character (token-proxy) mass, and an
    * order-independent content checksum (sum of the mixed hashes). A
    * sequential id would stripe correlated documents into the same shard;
    * the multiplicative mix decorrelates shard membership from crawl order
    * — the "global shuffle" a trainer needs, without a global sort.
    *
    * Scale: the shard key is a map-side expression; the audit is a
    * K-bounded hash aggregate with map-side combine. The real write is
    * `df.write.partitionBy("shard")` with NO orderBy — nothing here
    * shuffles the corpus itself. Balance is content-independent (pure id
    * arithmetic), so a skewed shard means a skewed id space — the audit's
    * min/max id columns localize it. */
  def q203ShuffleShard(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .withColumn("h", expr(s"(doc_id * $MixA) % $Mod32"))
      .withColumn("shard", expr(s"h % $Shards"))
    docs.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(col("h")).as("checksum"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"))
      .orderBy(col("shard"))
  }

  val q203Sql: String =
    s"""SELECT (doc_id * $MixA) % $Mod32 % $Shards AS shard,
       |       count(*) AS n_docs,
       |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |       CAST(sum((doc_id * $MixA) % $Mod32) AS BIGINT) AS checksum,
       |       min(doc_id) AS min_doc_id,
       |       max(doc_id) AS max_doc_id
       |FROM documents
       |GROUP BY 1 ORDER BY shard""".stripMargin

  // ------------------------------------------------------- mixture weights

  /** Upsampling cap for q204 — no domain is repeated more than this many
    * times, the standard guard against a tiny domain dominating by weight. */
  val MixCap = 3.0

  /** q204_mix_weights — domain-mixture reweighting: given the corpus's
    * actual per-source character mass and a UNIFORM target distribution,
    * compute each source's sampling weight `min(cap, target/actual)`, the
    * character mass it would contribute after weighting, and its final
    * share of the reweighted corpus. The data-mixing step every
    * pretraining run performs (cf. the Pile / DoReMi-style fixed mixtures)
    * expressed as two tiny aggregates — the cap means over-represented
    * domains are downsampled fully while under-represented ones are
    * upsampled at most ×cap, and the final-share column shows the residual
    * deviation from target the cap leaves behind.
    *
    * Scale: one map-side-combinable aggregate at source cardinality
    * (dozens), then arithmetic on that dozens-row frame; the totals arrive
    * by broadcast cross join, never a global window over data rows. The
    * weights table is the JOB OUTPUT — the 100 TB application is a
    * broadcast join of this table back onto the corpus feeding a weighted
    * sampler (q144's technique). */
  def q204MixWeights(spark: SparkSession, sfDir: String): DataFrame = {
    val bySource = Tables.documents(spark, sfDir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
    val tot = bySource.agg(
      sum(col("chars")).as("tot_chars"),
      count(lit(1)).as("n_sources"))
    val weighted = bySource.crossJoin(broadcast(tot))
      .withColumn("actual_share",
        col("chars").cast("double") / col("tot_chars").cast("double"))
      .withColumn("weight",
        least(lit(MixCap),
          (lit(1.0) / col("n_sources").cast("double")) / col("actual_share")))
      .withColumn("exp_chars", col("chars").cast("double") * col("weight"))
    val expTot = weighted.agg(sum(col("exp_chars")).as("exp_tot"))
    weighted.crossJoin(broadcast(expTot))
      .select(col("source"), col("n_docs"), col("chars"),
        col("actual_share"), col("weight"),
        (col("exp_chars") / col("exp_tot")).as("final_share"))
      .orderBy(col("source"))
  }

  val q204Sql: String =
    s"""WITH by_source AS (
       |  SELECT source, count(*) AS n_docs,
       |         CAST(sum(n_chars) AS BIGINT) AS chars
       |  FROM documents GROUP BY source),
       |tot AS (
       |  SELECT CAST(sum(chars) AS BIGINT) AS tot_chars,
       |         count(*) AS n_sources
       |  FROM by_source),
       |weighted AS (
       |  SELECT source, n_docs, chars,
       |         CAST(chars AS DOUBLE) / CAST(tot_chars AS DOUBLE)
       |           AS actual_share,
       |         least($MixCap,
       |           (1.0 / CAST(n_sources AS DOUBLE)) /
       |             (CAST(chars AS DOUBLE) / CAST(tot_chars AS DOUBLE)))
       |           AS weight
       |  FROM by_source CROSS JOIN tot)
       |SELECT source, n_docs, chars, actual_share, weight,
       |       (CAST(chars AS DOUBLE) * weight) /
       |         (SELECT sum(CAST(chars AS DOUBLE) * weight) FROM weighted)
       |         AS final_share
       |FROM weighted ORDER BY source""".stripMargin

  // ------------------------------------------------------------ OOV audit

  /** Vocabulary size for q205. */
  val VocabSize = 1000

  /** q205_oov_rate — out-of-vocabulary audit against a frozen top-K
    * vocabulary: build the corpus's top-[[VocabSize]] alphabetic tokens by
    * instance count (ties on token — a total order, so the vocabulary is
    * deterministic), then report per source how many token INSTANCES fall
    * outside it. A rising OOV rate per source is the standard drift alarm
    * between tokenizer training and corpus refresh — and the per-source
    * breakdown says which ingest stream drifted.
    *
    * Scale: token counting is one map-side-combinable aggregate whose
    * shuffle is bounded by distinct-token cardinality ≪ corpus size;
    * the top-K pick is a TakeOrdered heap, the K-row
    * vocabulary broadcasts into a semi-join-shaped membership flag, and
    * the audit is one aggregate at source cardinality. The corpus is
    * scanned twice (vocab build, audit) — a real pipeline persists the
    * vocabulary; both passes are shuffle-light. */
  def q205OovRate(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(col("source"),
        explode(expr("regexp_extract_all(text, '[a-z]+', 0)")).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(VocabSize)
      .select(col("tok"), lit(1).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
      .orderBy(col("source"))
  }

  val q205Sql: String =
    s"""WITH toks AS (
       |  SELECT source, unnest(regexp_extract_all(text, '[a-z]+')) AS tok
       |  FROM documents),
       |vocab AS (
       |  SELECT tok FROM (
       |    SELECT tok, count(*) AS cnt,
       |           row_number() OVER (ORDER BY count(*) DESC, tok) AS rn
       |    FROM toks GROUP BY tok)
       |  WHERE rn <= $VocabSize)
       |SELECT source, count(*) AS n_tokens,
       |       CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_oov,
       |       CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |         / count(*) AS oov_rate
       |FROM toks t LEFT JOIN vocab v USING (tok)
       |GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------------------------- incremental dedup

  /** q206_incremental_dedup — cross-snapshot exact deduplication: the
    * incoming batch (modeled as every 10th document) is checked against
    * the standing corpus (the other nine tenths) by content hash, and the
    * audit reports, per source, how much of the batch is already present.
    * This is the dedup shape a CONTINUOUS ingest runs — not corpus-wide
    * all-pairs (q70/q83) but new-versus-existing, where the existing side
    * is orders of magnitude larger and must never be rescanned per
    * document.
    *
    * Scale: both sides reduce to (md5(text), source) projections; the
    * membership check is a hash semi-join on the digest — the standing
    * side's digests are a materialized index in a real pipeline, and the
    * join shuffles ONLY digests (32 bytes/doc), never text. No broadcast
    * hint: the corpus side outgrows any driver at 100 TB; the equi-join
    * partitions by digest and streams. */
  def q206IncrementalDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), md5(col("text")).as("digest"))
    val incoming = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      .select(col("digest")).distinct()
      .select(col("digest"), lit(1).as("hit"))
    incoming.join(corpus, Seq("digest"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_incoming"),
        sum(when(col("hit").isNotNull, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("n_new", col("n_incoming") - col("n_dup"))
      .withColumn("dup_rate",
        col("n_dup").cast("double") / col("n_incoming").cast("double"))
      .orderBy(col("source"))
  }

  val q206Sql: String =
    """WITH docs AS (
      |  SELECT doc_id, source, md5(text) AS digest FROM documents),
      |corpus AS (
      |  SELECT DISTINCT digest FROM docs WHERE doc_id % 10 <> 0),
      |incoming AS (
      |  SELECT i.source, i.digest,
      |         CASE WHEN c.digest IS NULL THEN 0 ELSE 1 END AS dup
      |  FROM docs i LEFT JOIN corpus c USING (digest)
      |  WHERE i.doc_id % 10 = 0)
      |SELECT source, count(*) AS n_incoming,
      |       CAST(sum(dup) AS BIGINT) AS n_dup,
      |       CAST(count(*) - sum(dup) AS BIGINT) AS n_new,
      |       CAST(sum(dup) AS DOUBLE) / count(*) AS dup_rate
      |FROM incoming GROUP BY source ORDER BY source""".stripMargin
}
