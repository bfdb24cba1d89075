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
      // final_share must be a ratio of ORDER-INDEPENDENT sums: a double
      // sum of chars·weight is partition-merge-order dependent, so the
      // weight is quantized once to 2^20 fixed point and multiplied by the
      // exact BIGINT char mass — integer products, integer sum, ONE IEEE
      // division at the end (the q210/q211 discipline). weight itself is a
      // per-row chain of single IEEE ops, identical in both engines.
      // (Headroom: chars·(cap·2^20) overflows BIGINT past ~3·10^18 chars
      // per source; at that corpus size drop to 2^10 quantization.)
      .withColumn("exp_q",
        floor(col("weight") * lit(1L << 20)).cast("long") * col("chars"))
    val expTot = weighted.agg(sum(col("exp_q")).as("exp_tot"))
    weighted.crossJoin(broadcast(expTot))
      .select(col("source"), col("n_docs"), col("chars"),
        col("actual_share"), col("weight"),
        (col("exp_q").cast("double") / col("exp_tot").cast("double"))
          .as("final_share"))
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
       |  FROM by_source CROSS JOIN tot),
       |quant AS (
       |  SELECT source, n_docs, chars, actual_share, weight,
       |         CAST(floor(weight * 1048576) AS BIGINT) * chars AS exp_q
       |  FROM weighted)
       |SELECT source, n_docs, chars, actual_share, weight,
       |       CAST(exp_q AS DOUBLE) /
       |         CAST((SELECT CAST(sum(exp_q) AS BIGINT) FROM quant)
       |              AS DOUBLE) AS final_share
       |FROM quant ORDER BY source""".stripMargin

  /** q228_mix_apply — APPLY the q204 mix weights to the corpus as
    * deterministic per-document up/down-sampling: a document with weight w
    * gets ⌊w⌋ copies plus one more iff its id-hash uniform falls below the
    * fractional part (computed on the SAME 2^20-quantized weight q204
    * reports, so the two queries can never disagree about the target).
    * The q204→q228 pair is report→apply, the same arc as q225→q226: q204
    * says what the mix SHOULD be, this materializes the per-source copy
    * counts that realize it, with the achieved-vs-target rate in-row.
    *
    * Determinism & scale: weights are source-cardinality aggregates; the
    * weight join is left unhinted (AQE broadcasts source-cardinality
    * frames at any realistic source count; a web-scale hostname 'source'
    * would shuffle on the key). Copy counts are exact integers from the
    * quantized weight and a seeded integer hash — both engines replay
    * them bit-for-bit; the rates are single IEEE divisions. */
  def q228MixApply(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.StableHash
    val bySource = Tables.documents(spark, sfDir)
      .groupBy(col("source"))
      .agg(sum(col("n_chars")).as("chars"))
    val tot = bySource.agg(
      sum(col("chars")).as("tot_chars"),
      count(lit(1)).as("n_sources"))
    val wq = bySource.crossJoin(broadcast(tot))
      .select(col("source"),
        floor(least(lit(MixCap),
          (lit(1.0) / col("n_sources").cast("double")) /
            (col("chars").cast("double") / col("tot_chars").cast("double")))
          * lit(1L << 20)).cast("long").as("w_q"))
    Tables.documents(spark, sfDir).select(col("source"), col("doc_id"))
      .join(wq, "source")
      .select(col("source"), col("w_q"),
        (expr("w_q div 1048576") +
          when(pmod(StableHash.intMix62(col("doc_id"), 23L),
            lit(1L << 20)) < col("w_q") % lit(1L << 20), 1L)
            .otherwise(0L)).as("copies"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), max(col("w_q")).as("w_q"),
        sum(col("copies")).as("n_selected"))
      .select(col("source"), col("n_docs"), col("w_q"), col("n_selected"),
        (col("n_selected").cast("double") / col("n_docs").cast("double"))
          .as("realized_rate"),
        (col("w_q").cast("double") / lit(1048576.0)).as("target_rate"))
      .orderBy(col("source"))
  }

  val q228Sql: String =
    s"""WITH by_source AS (
       |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS chars
       |  FROM documents GROUP BY source),
       |tot AS (
       |  SELECT CAST(sum(chars) AS BIGINT) AS tot_chars,
       |         count(*) AS n_sources
       |  FROM by_source),
       |wq AS (
       |  SELECT source,
       |         CAST(floor(least($MixCap,
       |           (1.0 / CAST(n_sources AS DOUBLE)) /
       |             (CAST(chars AS DOUBLE) / CAST(tot_chars AS DOUBLE)))
       |           * 1048576) AS BIGINT) AS w_q
       |  FROM by_source CROSS JOIN tot),
       |sel AS (
       |  SELECT d.source, q.w_q,
       |         (q.w_q // 1048576) +
       |         (CASE WHEN (${graft.functions.StableHash
                  .intMix62Sql("d.doc_id", 23L)}) % 1048576
       |                    < q.w_q % 1048576
       |               THEN 1 ELSE 0 END) AS copies
       |  FROM documents d JOIN wq q USING (source))
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(max(w_q) AS BIGINT) AS w_q,
       |       CAST(sum(copies) AS BIGINT) AS n_selected,
       |       CAST(sum(copies) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |         AS realized_rate,
       |       CAST(max(w_q) AS DOUBLE) / CAST(1048576 AS DOUBLE)
       |         AS target_rate
       |FROM sel GROUP BY source ORDER BY source""".stripMargin

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

  // ------------------------------------------------- context-length plan

  /** Candidate context lengths for q207 (tokens). */
  val Contexts = Seq(512L, 2048L, 8192L)

  /** q207_packing_plan — context-length planning: for each candidate
    * training context length, how many documents fit whole, how many must
    * split, how many context-sized chunks the corpus yields
    * (Σ ceil(tokens/ctx)), and the padding waste if every chunk pads to
    * the full context (Σ (chunks·ctx − tokens)). The decision table for
    * "train at 2k or 8k": padding waste falls and split rate rises with
    * ctx, and this prices both sides exactly. Token count = whitespace
    * tokens (q54's `ws_tokens` convention, proven cross-engine).
    *
    * Scale: the ctx expansion is a 3-way map-side explode; the rollup is
    * a 3-row hash aggregate with map-side combine. One corpus scan, no
    * joins, integer arithmetic only until the final rates. */
  def q207PackingPlan(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(size(split(trim(col("text")), "\\s+")).cast("long").as("toks"))
    docs
      .select(col("toks"),
        explode(array(Contexts.map(lit): _*)).as("ctx"))
      // ceil(toks/ctx) via (toks + ctx − 1) div ctx: operands stay positive,
      // where truncating division (Spark `div`) and flooring division
      // (DuckDB `//`) agree — the negate-and-floor ceil trick does NOT
      // cross engines (Spark div truncates toward zero: -400 div 512 = 0,
      // DuckDB floors: -400 // 512 = -1)
      .withColumn("chunks", expr("(toks + ctx - 1) div ctx"))
      .groupBy(col("ctx"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("toks") <= col("ctx"), 1L).otherwise(0L)).as("n_fit"),
        sum(when(col("toks") > col("ctx"), 1L).otherwise(0L)).as("n_split"),
        sum(col("toks")).as("total_tokens"),
        sum(col("chunks")).as("n_chunks"),
        sum(col("chunks") * col("ctx") - col("toks")).as("pad_tokens"))
      .withColumn("waste_rate",
        col("pad_tokens").cast("double") /
          (col("n_chunks") * col("ctx")).cast("double"))
      .orderBy(col("ctx"))
  }

  val q207Sql: String = {
    val ctxList = Contexts.mkString(", ")
    s"""WITH d AS (
       |  SELECT CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
       |           AS toks
       |  FROM documents),
       |x AS (
       |  SELECT toks, unnest([$ctxList]) AS ctx FROM d),
       |c AS (
       |  SELECT toks, ctx, (toks + ctx - 1) // ctx AS chunks FROM x)
       |SELECT ctx, count(*) AS n_docs,
       |       CAST(sum(CASE WHEN toks <= ctx THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_fit,
       |       CAST(sum(CASE WHEN toks > ctx THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_split,
       |       CAST(sum(toks) AS BIGINT) AS total_tokens,
       |       CAST(sum(chunks) AS BIGINT) AS n_chunks,
       |       CAST(sum(chunks * ctx - toks) AS BIGINT) AS pad_tokens,
       |       CAST(sum(chunks * ctx - toks) AS DOUBLE) /
       |         CAST(sum(chunks) * ctx AS DOUBLE) AS waste_rate
       |FROM c GROUP BY ctx ORDER BY ctx""".stripMargin
  }

  // --------------------------------------------------- gram duplication

  /** Shingle width for q208 — 8-grams, the substring-dedup literature's
    * usual fingerprint width. */
  val DupGramN = 8

  /** q208_dup_gram_rate — corpus-level n-gram duplication audit: how many
    * distinct 8-grams occur in more than one document, what fraction of
    * the corpus's gram INSTANCES those cross-document grams account for,
    * and how deep the worst gram's document frequency runs. The one-row
    * answer to "how much cross-document boilerplate survives dedup" —
    * q166 then localizes WHERE (span-level), q70/q83 WHO (doc pairs);
    * this is the corpus health number that says whether to bother.
    *
    * Scale: gram stream is map-side explode; the per-gram frame
    * aggregates with map-side combine (shuffle bounded by distinct-gram
    * cardinality); the final fold is a one-row aggregate. No joins. */
  def q208DupGramRate(spark: SparkSession, sfDir: String): DataFrame = {
    val grams = Curation.nGrams(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
      DupGramN)
    grams
      .groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("df"),
        count(lit(1)).as("instances"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") > 1, 1L).otherwise(0L)).as("n_shared_grams"),
        sum(col("instances")).as("n_instances"),
        sum(when(col("df") > 1, col("instances")).otherwise(0L))
          .as("n_shared_instances"),
        max(col("df")).as("max_df"))
      .select(col("n_grams"), col("n_shared_grams"),
        (col("n_shared_grams").cast("double") / col("n_grams").cast("double"))
          .as("shared_gram_rate"),
        col("n_instances"), col("n_shared_instances"),
        (col("n_shared_instances").cast("double") /
          col("n_instances").cast("double")).as("shared_instance_rate"),
        col("max_df"))
  }

  val q208Sql: String = {
    val n = DupGramN
    val concat = (0 until n).map(i => s"t[i+$i]").mkString(" || ' ' || ")
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id,
       |         unnest(list_transform(range(1, greatest(len(t) - ${n - 2}, 2)),
       |                i -> $concat)) AS gram
       |  FROM toks WHERE len(t) >= $n),
       |per_gram AS (
       |  SELECT gram, count(DISTINCT doc_id) AS df, count(*) AS instances
       |  FROM grams GROUP BY gram)
       |SELECT count(*) AS n_grams,
       |       CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_shared_grams,
       |       CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS DOUBLE)
       |         / count(*) AS shared_gram_rate,
       |       CAST(sum(instances) AS BIGINT) AS n_instances,
       |       CAST(sum(CASE WHEN df > 1 THEN instances ELSE 0 END) AS BIGINT)
       |         AS n_shared_instances,
       |       CAST(sum(CASE WHEN df > 1 THEN instances ELSE 0 END) AS DOUBLE)
       |         / sum(instances) AS shared_instance_rate,
       |       CAST(max(df) AS BIGINT) AS max_df
       |FROM per_gram""".stripMargin
  }

  // ------------------------------------------------- budget curriculum

  /** q209's training budget as a fraction of total corpus characters —
    * relative, so the operator is scale-free. */
  val BudgetFrac = 1.0 / 3.0

  /** q209_budget_curriculum — greedy source selection under a token
    * budget: rank sources by information density (characters per
    * document, descending — a cheap quality proxy; swap in q53's score in
    * production), accumulate character mass in rank order, and mark the
    * prefix that fits a budget of [[BudgetFrac]] × total corpus. The
    * "which sources make the cut for the high-quality phase" table —
    * curriculum and annealing schedules start exactly like this.
    *
    * Scale: one source-cardinality aggregate off the corpus scan; the
    * ranking window runs over that dozens-row frame, NOT over data rows
    * (the q129 broadcast-total discipline). Deterministic: density ties
    * break on source name. */
  def q209BudgetCurriculum(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bySource = Tables.documents(spark, sfDir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
      .withColumn("density",
        col("chars").cast("double") / col("n_docs").cast("double"))
    val tot = bySource.agg(sum(col("chars")).as("tot_chars"))
    val rankWin = Window.orderBy(col("density").desc, col("source"))
    bySource.crossJoin(broadcast(tot))
      .withColumn("rank", row_number().over(rankWin).cast("long"))
      .withColumn("cum_chars",
        sum(col("chars")).over(rankWin.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("selected",
        (col("cum_chars").cast("double") <=
          col("tot_chars").cast("double") * BudgetFrac).cast("int"))
      .select(col("rank"), col("source"), col("n_docs"), col("chars"),
        col("density"), col("cum_chars"), col("selected"))
      .orderBy(col("rank"))
  }

  val q209Sql: String =
    s"""WITH by_source AS (
       |  SELECT source, count(*) AS n_docs,
       |         CAST(sum(n_chars) AS BIGINT) AS chars,
       |         CAST(sum(n_chars) AS DOUBLE) / count(*) AS density
       |  FROM documents GROUP BY source),
       |tot AS (SELECT CAST(sum(chars) AS BIGINT) AS tot_chars FROM by_source),
       |ranked AS (
       |  SELECT *, row_number() OVER (ORDER BY density DESC, source) AS rank,
       |         CAST(sum(chars) OVER (ORDER BY density DESC, source
       |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_chars
       |  FROM by_source)
       |SELECT r.rank, r.source, r.n_docs, r.chars, r.density, r.cum_chars,
       |       CAST(CASE WHEN CAST(r.cum_chars AS DOUBLE) <=
       |         CAST(t.tot_chars AS DOUBLE) * CAST($BudgetFrac AS DOUBLE)
       |         THEN 1 ELSE 0 END AS INT) AS selected
       |FROM ranked r CROSS JOIN tot t
       |ORDER BY r.rank""".stripMargin

  // --------------------------------------------- label-centroid geometry

  /** Fixed-point scales for q210 — the q79 centroid discipline: float
    * embeddings quantize to integers before any reduction so sums are
    * order-independent and cross-engine exact. */
  private val Q20 = 1048576.0          // 2^20, embedding quantization
  private val Q40 = 1099511627776.0    // 2^40, product-term quantization

  /** q210_centroid_sim — pairwise cosine similarity between per-label
    * embedding centroids: the class-geometry audit that says which label
    * clusters are near-collinear (confusable) before anyone trains a
    * probe. Every reduction is fixed-point: embeddings quantize at 2^20
    * before the centroid mean ([[Centroids]] q79's rule), and the cosine's
    * dot/norm terms quantize at 2^40 before summing, so both engines add
    * exact integers in any order.
    *
    * Scale: centroids are a (labels × dims)-bounded aggregate off one
    * scan; the pairwise stage joins the TINY centroid frame to itself on
    * the dimension index — k²·d rows for k labels, nothing touches the
    * data again. Output k(k−1)/2 rows. */
  def q210CentroidSim(spark: SparkSession, sfDir: String): DataFrame = {
    val cent = Tables.embeddings(spark, sfDir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg((sum(floor(col("v").cast("double") * Q20).cast("long"))
        .cast("double") / (count(lit(1)) * Q20)).as("cval"))
      // MEASURED-REJECTION NOTE (recompute audit: this labels×dims
      // centroid aggregate feeds a/b/norms — 3-op finding): a
      // localCheckpoint was A/B'd in r13 and rejected — sf0.1
      // 0.93→0.94 s, sf1 0.91→1.01 (wash-to-loss): the corpus-sized
      // posexplode exchange is shared by ReuseExchange, each
      // "recompute" is only the k·d-row final aggregate, cheaper than
      // the cut's eager job. Registry: RecomputeAudit.measuredRejections.
    val a = cent.select(col("label").as("label_a"), col("pos"),
      col("cval").as("ca"))
    val b = cent.select(col("label").as("label_b"), col("pos"),
      col("cval").as("cb"))
    val terms = a.join(b, Seq("pos")).filter(col("label_a") < col("label_b"))
      .groupBy(col("label_a"), col("label_b"))
      .agg((sum(floor(col("ca") * col("cb") * Q40).cast("long"))
        .cast("double") / Q40).as("dot"))
    val norms = cent.groupBy(col("label"))
      .agg((sum(floor(col("cval") * col("cval") * Q40).cast("long"))
        .cast("double") / Q40).as("sq"))
    terms
      .join(norms.select(col("label").as("label_a"), col("sq").as("sq_a")),
        "label_a")
      .join(norms.select(col("label").as("label_b"), col("sq").as("sq_b")),
        "label_b")
      .select(col("label_a"), col("label_b"),
        (col("dot") / (sqrt(col("sq_a")) * sqrt(col("sq_b")))).as("cosine"))
      .orderBy(col("label_a"), col("label_b"))
  }

  val q210Sql: String =
    s"""WITH pe AS (
       |  SELECT label, unnest(embedding) AS v,
       |         unnest(generate_series(0, len(embedding) - 1)) AS pos
       |  FROM embeddings),
       |cent AS (
       |  SELECT label, pos,
       |         CAST(sum(CAST(floor(CAST(v AS DOUBLE) * $Q20) AS BIGINT))
       |              AS DOUBLE) / (count(*) * $Q20) AS cval
       |  FROM pe GROUP BY label, pos),
       |terms AS (
       |  SELECT a.label AS label_a, b.label AS label_b,
       |         CAST(sum(CAST(floor(a.cval * b.cval * $Q40) AS BIGINT))
       |              AS DOUBLE) / $Q40 AS dot
       |  FROM cent a JOIN cent b ON a.pos = b.pos AND a.label < b.label
       |  GROUP BY 1, 2),
       |norms AS (
       |  SELECT label,
       |         CAST(sum(CAST(floor(cval * cval * $Q40) AS BIGINT))
       |              AS DOUBLE) / $Q40 AS sq
       |  FROM cent GROUP BY label)
       |SELECT t.label_a, t.label_b,
       |       t.dot / (sqrt(na.sq) * sqrt(nb.sq)) AS cosine
       |FROM terms t
       |JOIN norms na ON na.label = t.label_a
       |JOIN norms nb ON nb.label = t.label_b
       |ORDER BY t.label_a, t.label_b""".stripMargin

  // ------------------------------------------------------------ zipf fit

  /** Head size for q211's rank-frequency regression. */
  val ZipfK = 100

  /** Fixed-point scale for q211's log-log sums (2^30). */
  private val Q30 = 1073741824.0

  /** q211_zipf_fit — Zipf-law health check: OLS slope of ln(freq) on
    * ln(rank) over the corpus's top-[[ZipfK]] tokens. Natural text sits
    * near slope −1; a corpus drifting toward templated/generated content
    * flattens or steepens the head, and this one number is the standard
    * screen. Regression terms quantize to 2^30 fixed point before
    * summing (the [[q210CentroidSim]] discipline), so the K-term sums are
    * order-independent and the closed-form slope/intercept/r² are
    * bit-stable across engines.
    *
    * Scale: token counting shuffles at distinct-token cardinality with
    * map-side combine; the top-K pick is a TakeOrdered heap; the
    * regression folds K rows. One scan, no joins. */
  def q211ZipfFit(spark: SparkSession, sfDir: String): DataFrame = {
    val head = Tables.documents(spark, sfDir)
      .select(explode(expr("regexp_extract_all(text, '[a-z]+', 0)")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(ZipfK)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("tok"))).cast("long"))
    def fx(c: org.apache.spark.sql.Column) =
      floor(c * Q30).cast("long")
    val terms = head.select(
      fx(log(col("rank").cast("double"))).as("x"),
      fx(log(col("cnt").cast("double"))).as("y"))
    val s = terms.agg(
      count(lit(1)).as("k"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(fx(col("x").cast("double") * col("y").cast("double") /
        (Q30 * Q30))).as("sxy"),
      sum(fx(col("x").cast("double") * col("x").cast("double") /
        (Q30 * Q30))).as("sxx"),
      sum(fx(col("y").cast("double") * col("y").cast("double") /
        (Q30 * Q30))).as("syy"))
    // Two rules below: (1) every moment-sum casts to DOUBLE individually
    // BEFORE any product — sx·sy ≈ 2.5e23 overflows BIGINT (ANSI throws in
    // Spark, DuckDB widens to HUGEINT; either way the engines diverge);
    // (2) UNITS must match — sxy/sxx/syy carry one Q30 factor (value·Q30)
    // while sx·sy carries two (Q30²), so cross-products of first moments
    // divide by Q30 to land in the same value·Q30 scale as k·sxy. The
    // double expression tree is identical on identical integer inputs, so
    // the result is bit-stable.
    val (dk, dsx, dsy, dsxy, dsxx, dsyy) = (
      col("k").cast("double"), col("sx").cast("double"),
      col("sy").cast("double"), col("sxy").cast("double"),
      col("sxx").cast("double"), col("syy").cast("double"))
    val num = dk * dsxy - dsx * dsy / Q30
    val den = dk * dsxx - dsx * dsx / Q30
    s.select(col("k"),
      (num / den).as("slope"),
      (((dsy / Q30) - (num / den) * (dsx / Q30)) / dk).as("intercept"),
      ((num * num) / (den * (dk * dsyy - dsy * dsy / Q30))).as("r2"))
  }

  val q211Sql: String =
    s"""WITH toks AS (
       |  SELECT unnest(regexp_extract_all(text, '[a-z]+')) AS tok
       |  FROM documents),
       |head AS (
       |  SELECT tok, cnt,
       |         row_number() OVER (ORDER BY cnt DESC, tok) AS rank
       |  FROM (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok)
       |  QUALIFY rank <= $ZipfK),
       |terms AS (
       |  SELECT CAST(floor(ln(CAST(rank AS DOUBLE)) * $Q30) AS BIGINT) AS x,
       |         CAST(floor(ln(CAST(cnt AS DOUBLE)) * $Q30) AS BIGINT) AS y
       |  FROM head),
       |s AS (
       |  SELECT count(*) AS k,
       |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |         CAST(sum(CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)
       |           / ($Q30 * $Q30) * $Q30) AS BIGINT)) AS BIGINT) AS sxy,
       |         CAST(sum(CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
       |           / ($Q30 * $Q30) * $Q30) AS BIGINT)) AS BIGINT) AS sxx,
       |         CAST(sum(CAST(floor(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)
       |           / ($Q30 * $Q30) * $Q30) AS BIGINT)) AS BIGINT) AS syy
       |  FROM terms),
       |d AS (
       |  -- cast each sum to DOUBLE before ANY product: sx*sy overflows
       |  -- BIGINT (Spark throws under ANSI, DuckDB widens to HUGEINT)
       |  SELECT CAST(k AS DOUBLE) AS dk, CAST(sx AS DOUBLE) AS dsx,
       |         CAST(sy AS DOUBLE) AS dsy, CAST(sxy AS DOUBLE) AS dsxy,
       |         CAST(sxx AS DOUBLE) AS dsxx, CAST(syy AS DOUBLE) AS dsyy,
       |         k FROM s)
       |SELECT k,
       |       (dk * dsxy - dsx * dsy / $Q30) /
       |         (dk * dsxx - dsx * dsx / $Q30) AS slope,
       |       ((dsy / $Q30) -
       |        ((dk * dsxy - dsx * dsy / $Q30) /
       |         (dk * dsxx - dsx * dsx / $Q30)) *
       |        (dsx / $Q30)) / dk AS intercept,
       |       ((dk * dsxy - dsx * dsy / $Q30) *
       |        (dk * dsxy - dsx * dsy / $Q30)) /
       |       ((dk * dsxx - dsx * dsx / $Q30) *
       |        (dk * dsyy - dsy * dsy / $Q30)) AS r2
       |FROM d""".stripMargin

  // ----------------------------------------------------- prefix near-dup

  /** Prefix width for q212 — crawl truncation dups share long prefixes. */
  val PrefixChars = 64

  /** q212_prefix_dup — truncation-duplicate audit: documents sharing their
    * first [[PrefixChars]] characters are near-certain crawl artifacts
    * (same page fetched twice with different tail truncation — exact-hash
    * dedup misses them, MinHash finds them late). Per source: how many
    * documents sit in a shared-prefix group, how many groups, and the
    * largest group. The cheap screen that runs BEFORE the expensive
    * n-gram/LSH passes and routinely kills 1-5% of a web corpus.
    *
    * Scale: the group size arrives by a window partitioned by the prefix
    * itself — millions of tiny independent partitions, embarrassingly
    * parallel; the rollup is a source-cardinality aggregate. One scan. */
  def q212PrefixDup(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pref = Tables.documents(spark, sfDir)
      .select(col("source"), substring(col("text"), 1, PrefixChars).as("pfx"))
      .withColumn("grp_n", count(lit(1)).over(Window.partitionBy(col("pfx"))))
    pref.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("grp_n") > 1, 1L).otherwise(0L)).as("n_in_dup_group"),
        countDistinct(when(col("grp_n") > 1, col("pfx"))).as("n_dup_groups"),
        max(col("grp_n")).as("max_group"))
      .withColumn("dup_rate",
        col("n_in_dup_group").cast("double") / col("n_docs").cast("double"))
      .orderBy(col("source"))
  }

  val q212Sql: String =
    s"""WITH pref AS (
       |  SELECT source, substring(text, 1, $PrefixChars) AS pfx,
       |         count(*) OVER (PARTITION BY substring(text, 1, $PrefixChars))
       |           AS grp_n
       |  FROM documents)
       |SELECT source, count(*) AS n_docs,
       |       CAST(sum(CASE WHEN grp_n > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_in_dup_group,
       |       CAST(count(DISTINCT CASE WHEN grp_n > 1 THEN pfx END) AS BIGINT)
       |         AS n_dup_groups,
       |       CAST(max(grp_n) AS BIGINT) AS max_group,
       |       CAST(sum(CASE WHEN grp_n > 1 THEN 1 ELSE 0 END) AS DOUBLE)
       |         / count(*) AS dup_rate
       |FROM pref GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------------------------- label-noise screen

  /** q213's outlier threshold: cosine to own-label centroid below this
    * flags a vector as a label-noise candidate. */
  val OutlierCos = 0.5

  /** q213_label_outliers — label-noise screen: every vector's cosine to its
    * OWN label's centroid, rolled up per label with the count below
    * [[OutlierCos]] and the single worst vector. Mislabeled or junk
    * embeddings sit far from their class centroid; this is the standard
    * pre-training triage before anyone trusts `label` as supervision.
    * Same fixed-point discipline as [[q210CentroidSim]] (quantized
    * centroid, 2^40-quantized dot/norm terms), so ranks and counts are
    * exact across engines.
    *
    * Scale: centroids are a (k×d)-bounded aggregate (the only explode —
    * its shuffle is k×d rows after map-side combine); the per-vector pass
    * is a broadcast join of the k-row centroid-ARRAY frame followed by a
    * codegen-friendly `zip_with`+`aggregate` fold over the embedding —
    * no N·d intermediate frame, no per-vector shuffle at all. Integer
    * fold terms keep the sums order-independent, so the values are
    * bit-identical to the exploded form the oracle replays. */
  def q213LabelOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding"))
    val cent = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .withColumn("vq", floor(col("v").cast("double") * Q20) / Q20)
      .groupBy(col("label"), col("pos"))
      .agg((sum((col("vq") * Q20).cast("long")).cast("double") /
        (count(lit(1)) * Q20)).as("cval"))
    // per-label centroid array (pos-ordered) + its constant norm term:
    // sq_c depends only on the label, so it is computed once here on the
    // k-row frame instead of once per vector. The quantization constants
    // are spelled CAST(... AS DOUBLE) inside the expr strings — a bare
    // `1048576.0` literal parses as DECIMAL in Spark SQL and would turn
    // the division into decimal arithmetic, off the IEEE-double path the
    // oracle replays.
    val q20d = s"cast($Q20 as double)"
    val q40d = s"cast($Q40 as double)"
    val centArr = cent.groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, cval))), " +
        "x -> x.cval)").as("carr"))
      .withColumn("sq_c",
        expr(s"aggregate(carr, 0L, (acc, c) -> " +
          s"acc + cast(floor(c * c * $q40d) as bigint))").cast("double") / Q40)
    val perVec = emb.join(broadcast(centArr), Seq("label"))
      .withColumn("vqa",
        expr(s"transform(embedding, x -> " +
          s"floor(cast(x as double) * $q20d) / $q20d)"))
      .select(col("vec_id"), col("label"),
        (expr(s"aggregate(zip_with(vqa, carr, (a, b) -> " +
          s"cast(floor(a * b * $q40d) as bigint)), 0L, (acc, x) -> acc + x)")
          .cast("double") / Q40).as("dot"),
        (expr(s"aggregate(vqa, 0L, (acc, a) -> " +
          s"acc + cast(floor(a * a * $q40d) as bigint))")
          .cast("double") / Q40).as("sq_v"),
        col("sq_c"))
      .select(col("vec_id"), col("label"),
        (col("dot") / (sqrt(col("sq_v")) * sqrt(col("sq_c")))).as("cos"))
    // argmin tie-break packed into ONE BIGINT (the q147/q118 pattern —
    // DuckDB's min_by takes no composite key): cosine quantized to 2^30
    // in [0, 2^31], shifted past the id space. Injective only while
    // 0 ≤ vec_id < 2^21 — guard loudly, don't alias.
    val pack = when(col("vec_id").between(0L, 2097151L),
      floor((col("cos") + 1.0) * Q30).cast("long") * lit(2097152L) +
        col("vec_id"))
      .otherwise(raise_error(
        lit("q213 packed-key bound: vec_id outside [0, 2^21)")))
    perVec.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("cos") < OutlierCos, 1L).otherwise(0L)).as("n_outliers"),
        min_by(col("vec_id"), pack).as("worst_vec_id"),
        min(col("cos")).as("worst_cos"))
      .orderBy(col("label"))
  }

  val q213Sql: String =
    s"""WITH pe AS (
       |  SELECT vec_id, label,
       |         unnest(generate_series(0, len(embedding) - 1)) AS pos,
       |         floor(CAST(unnest(embedding) AS DOUBLE) * $Q20) / $Q20 AS vq
       |  FROM embeddings),
       |cent AS (
       |  SELECT label, pos,
       |         CAST(sum(CAST(vq * $Q20 AS BIGINT)) AS DOUBLE) /
       |           (count(*) * $Q20) AS cval
       |  FROM pe GROUP BY label, pos),
       |per_vec AS (
       |  SELECT p.vec_id, p.label,
       |         (CAST(sum(CAST(floor(p.vq * c.cval * $Q40) AS BIGINT))
       |            AS DOUBLE) / $Q40) /
       |         (sqrt(CAST(sum(CAST(floor(p.vq * p.vq * $Q40) AS BIGINT))
       |            AS DOUBLE) / $Q40) *
       |          sqrt(CAST(sum(CAST(floor(c.cval * c.cval * $Q40) AS BIGINT))
       |            AS DOUBLE) / $Q40)) AS cos
       |  FROM pe p JOIN cent c ON p.label = c.label AND p.pos = c.pos
       |  GROUP BY p.vec_id, p.label)
       |SELECT label, count(*) AS n_vecs,
       |       CAST(sum(CASE WHEN cos < $OutlierCos THEN 1 ELSE 0 END)
       |         AS BIGINT) AS n_outliers,
       |       min_by(vec_id, CASE
       |           WHEN vec_id BETWEEN 0 AND 2097151
       |           THEN CAST(floor((cos + 1.0) * $Q30) AS BIGINT)
       |                * 2097152 + vec_id
       |           ELSE error('q213 packed-key bound: vec_id outside [0, 2^21)')
       |         END) AS worst_vec_id,
       |       min(cos) AS worst_cos
       |FROM per_vec GROUP BY label ORDER BY label""".stripMargin

  // ------------------------------------------------------ snapshot diff

  /** q214_snapshot_diff — corpus-version diff: snapshots A (doc_id mod 5
    * ≠ 0) and B (doc_id mod 5 ≠ 1) model two crawls that share most
    * content; the diff keys on the md5 content digest per source and
    * reports added / removed / retained digests and the content Jaccard.
    * The dataset-versioning audit run before a retrain: "what actually
    * changed since the last snapshot" by content, not by id — renumbered
    * ids do not show up as churn.
    *
    * Scale: both sides reduce to distinct (source, digest) — the full
    * outer join keys on the digest and shuffles 32-byte rows; aggregates
    * are source-cardinality with map-side combine. Text never shuffles. */
  def q214SnapshotDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), md5(col("text")).as("digest"))
    val a = docs.filter(col("doc_id") % 5 =!= 0)
      .select(col("source"), col("digest")).distinct()
      .withColumn("in_a", lit(1))
    val b = docs.filter(col("doc_id") % 5 =!= 1)
      .select(col("source"), col("digest")).distinct()
      .withColumn("in_b", lit(1))
    a.join(b, Seq("source", "digest"), "full_outer")
      .groupBy(col("source"))
      .agg(
        sum(when(col("in_a").isNotNull, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("in_b").isNotNull, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("in_a").isNotNull && col("in_b").isNotNull, 1L)
          .otherwise(0L)).as("n_retained"),
        sum(when(col("in_a").isNull, 1L).otherwise(0L)).as("n_added"),
        sum(when(col("in_b").isNull, 1L).otherwise(0L)).as("n_removed"))
      .withColumn("jaccard",
        col("n_retained").cast("double") /
          (col("n_a") + col("n_b") - col("n_retained")).cast("double"))
      .orderBy(col("source"))
  }

  val q214Sql: String =
    """WITH docs AS (
      |  SELECT doc_id, source, md5(text) AS digest FROM documents),
      |a AS (SELECT DISTINCT source, digest FROM docs WHERE doc_id % 5 <> 0),
      |b AS (SELECT DISTINCT source, digest FROM docs WHERE doc_id % 5 <> 1),
      |j AS (
      |  SELECT coalesce(a.source, b.source) AS source,
      |         CASE WHEN a.digest IS NULL THEN 0 ELSE 1 END AS in_a,
      |         CASE WHEN b.digest IS NULL THEN 0 ELSE 1 END AS in_b
      |  FROM a FULL OUTER JOIN b
      |    ON a.source = b.source AND a.digest = b.digest)
      |SELECT source,
      |       CAST(sum(in_a) AS BIGINT) AS n_a,
      |       CAST(sum(in_b) AS BIGINT) AS n_b,
      |       CAST(sum(in_a * in_b) AS BIGINT) AS n_retained,
      |       CAST(sum(1 - in_a) AS BIGINT) AS n_added,
      |       CAST(sum(1 - in_b) AS BIGINT) AS n_removed,
      |       CAST(sum(in_a * in_b) AS DOUBLE) /
      |         CAST(sum(in_a) + sum(in_b) - sum(in_a * in_b) AS DOUBLE)
      |         AS jaccard
      |FROM j GROUP BY source ORDER BY source""".stripMargin

  // --------------------------------------------------- gram diversity

  /** Shingle width for q216's diversity ratio. */
  val DivGramN = 4

  /** q216_gram_diversity — per-source lexical-diversity proxy: distinct
    * 4-grams over total 4-gram instances. Highly templated or
    * machine-generated sources repeat their shingles (ratio → 0), diverse
    * prose approaches 1 — the cheap stand-in for the gzip-compressibility
    * quality feature (a low ratio IS high compressibility), computed
    * without ever materializing a compressor. Complements [[q208DupGramRate]]
    * (corpus-wide, cross-document) at source granularity including
    * within-document repetition.
    *
    * Scale: map-side gram explode with `source` CARRIED through the
    * explode (no doc_id→source join-back — that join would need a
    * doc-cardinality broadcast, which cannot broadcast at corpus scale),
    * then ONE aggregate per (source, gram) with map-side combine, then a
    * source-cardinality rollup. The (source, gram) shuffle is bounded by
    * distinct grams per source — the same profile as word counting. */
  def q216GramDiversity(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"))
    val grams = Curation.nGrams(docs, DivGramN, Seq("source"))
    grams.groupBy(col("source"), col("gram"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("distinct_grams"),
        sum(col("n")).as("total_grams"),
        max(col("n")).as("max_gram_count"))
      .withColumn("diversity",
        col("distinct_grams").cast("double") / col("total_grams").cast("double"))
      .orderBy(col("source"))
  }

  val q216Sql: String = {
    val n = DivGramN
    val concat = (0 until n).map(i => s"t[i+$i]").mkString(" || ' ' || ")
    s"""WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t
       |  FROM documents),
       |grams AS (
       |  SELECT source,
       |         unnest(list_transform(range(1, greatest(len(t) - ${n - 2}, 2)),
       |                i -> $concat)) AS gram
       |  FROM toks WHERE len(t) >= $n),
       |per AS (
       |  SELECT source, gram, count(*) AS n FROM grams GROUP BY 1, 2)
       |SELECT source, count(*) AS distinct_grams,
       |       CAST(sum(n) AS BIGINT) AS total_grams,
       |       CAST(max(n) AS BIGINT) AS max_gram_count,
       |       CAST(count(*) AS DOUBLE) / sum(n) AS diversity
       |FROM per GROUP BY source ORDER BY source""".stripMargin
  }

  // ----------------------------------------------------- exact eval split

  /** q217's held-out fractions: 10% val, 10% test (per source, exact). */
  val EvalFrac = 0.1

  /** q217_eval_split — EXACT-quota train/val/test assignment: within each
    * source, rank documents by the multiplicative id mix ([[MixA]] — a
    * deterministic shuffle order uncorrelated with crawl order) and cut at
    * exact floor(n·frac) quotas: first `nv` ranks → val, next `nt` → test,
    * rest → train. Hash-threshold splits (q133) give only EXPECTED
    * proportions — fine at corpus scale, wrong for a 500-doc eval set
    * where ±3% is a visible eval-noise floor; rank-cut quotas are exact at
    * every size. Reports per (source, split): docs, char mass, and the
    * id-mix checksum a reproducing run must match.
    *
    * Scale: the rank is a window partitioned by source — thousands of
    * independent partitions (the one place a per-source sort is the
    * design, not a bottleneck); everything after is a (source × 3)-row
    * aggregate with map-side combine. */
  /** Per-document split assignment shared by [[q217EvalSplit]] (the quota
    * report) and [[q221SplitLeakage]] (the hygiene audit): rank by the id
    * mix within source, cut at exact quotas. Input needs (doc_id, source)
    * plus whatever payload columns the caller carries through. */
  def evalSplitAssign(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
    docs
      .withColumn("h", expr(s"(doc_id * $MixA) % $Mod32"))
      .withColumn("rk", row_number().over(w.orderBy(col("h"), col("doc_id")))
        .cast("long"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("q", floor(col("n").cast("double") * EvalFrac).cast("long"))
      .withColumn("split",
        when(col("rk") <= col("q"), "val")
          .when(col("rk") <= col("q") * 2, "test")
          .otherwise("train"))
  }

  def q217EvalSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val split = evalSplitAssign(Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("n_chars")))
    split.groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(col("h")).as("checksum"))
      .orderBy(col("source"), col("split"))
  }

  val q217Sql: String =
    s"""WITH mixed AS (
       |  SELECT doc_id, source, n_chars,
       |         (doc_id * $MixA) % $Mod32 AS h
       |  FROM documents),
       |ranked AS (
       |  SELECT *,
       |         row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
       |           AS rk,
       |         count(*) OVER (PARTITION BY source) AS n
       |  FROM mixed),
       |split AS (
       |  SELECT source, n_chars, h,
       |         CASE
       |           WHEN rk <= CAST(floor(CAST(n AS DOUBLE) * $EvalFrac)
       |             AS BIGINT) THEN 'val'
       |           WHEN rk <= CAST(floor(CAST(n AS DOUBLE) * $EvalFrac)
       |             AS BIGINT) * 2 THEN 'test'
       |           ELSE 'train' END AS split
       |  FROM ranked)
       |SELECT source, split, count(*) AS n_docs,
       |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |       CAST(sum(h) AS BIGINT) AS checksum
       |FROM split GROUP BY source, split
       |ORDER BY source, split""".stripMargin

  // ---------------------------------------------------- dedup impact

  /** q218_dedup_impact — the report that ships with every dedup run: per
    * source, documents and character mass BEFORE exact content dedup vs
    * AFTER (keeping each digest's min-doc_id representative, q36's rule),
    * and the share of the source's mass the collapse removed. Dedup
    * changes the domain mixture [[q204MixWeights]] consumes — this is the
    * bridge artifact that says by how much, per source, so the mixture is
    * recomputed on POST-dedup mass rather than silently drifting.
    *
    * Scale: one (digest-cardinality) aggregate picks representatives
    * (map-side combinable min/count), one source-cardinality rollup each
    * side, one tiny join. Text shuffles only as 32-byte digests. */
  def q218DedupImpact(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        md5(col("text")).as("digest"))
    val before = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("docs_before"),
        sum(col("n_chars")).as("chars_before"))
    val reps = docs.groupBy(col("digest"))
      .agg(min(col("doc_id")).as("doc_id"))
    val after = docs.join(reps, Seq("digest", "doc_id"), "left_semi")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs_after"),
        sum(col("n_chars")).as("chars_after"))
    before.join(after, Seq("source"), "left")
      .select(col("source"), col("docs_before"),
        coalesce(col("docs_after"), lit(0L)).as("docs_after"),
        (col("docs_before") - coalesce(col("docs_after"), lit(0L)))
          .as("docs_removed"),
        col("chars_before"),
        coalesce(col("chars_after"), lit(0L)).as("chars_after"),
        ((col("chars_before") - coalesce(col("chars_after"), lit(0L)))
          .cast("double") / col("chars_before").cast("double"))
          .as("mass_removed_rate"))
      .orderBy(col("source"))
  }

  val q218Sql: String =
    """WITH docs AS (
      |  SELECT doc_id, source, n_chars, md5(text) AS digest FROM documents),
      |reps AS (
      |  SELECT digest, min(doc_id) AS doc_id FROM docs GROUP BY digest),
      |before_agg AS (
      |  SELECT source, count(*) AS docs_before,
      |         CAST(sum(n_chars) AS BIGINT) AS chars_before
      |  FROM docs GROUP BY source),
      |after_agg AS (
      |  SELECT d.source, count(*) AS docs_after,
      |         CAST(sum(d.n_chars) AS BIGINT) AS chars_after
      |  FROM docs d SEMI JOIN reps r
      |    ON d.digest = r.digest AND d.doc_id = r.doc_id
      |  GROUP BY d.source)
      |SELECT b.source, b.docs_before,
      |       CAST(coalesce(a.docs_after, 0) AS BIGINT) AS docs_after,
      |       CAST(b.docs_before - coalesce(a.docs_after, 0) AS BIGINT)
      |         AS docs_removed,
      |       b.chars_before,
      |       CAST(coalesce(a.chars_after, 0) AS BIGINT) AS chars_after,
      |       CAST(b.chars_before - coalesce(a.chars_after, 0) AS DOUBLE) /
      |         CAST(b.chars_before AS DOUBLE) AS mass_removed_rate
      |FROM before_agg b LEFT JOIN after_agg a ON b.source = a.source
      |ORDER BY b.source""".stripMargin

  // ---------------------------------------------------- length bands

  /** q220_length_bands — exact per-source document-length percentiles
    * (p10/p50/p90 of n_chars) by the rank-pick rule `value at row
    * ceil(p·n)` under the total order (n_chars, doc_id). The
    * length-filter planning table: min-length cuts are set per source
    * (a code corpus and a chat corpus have different "too short"), and
    * interpolated percentiles would break cross-engine hash equality
    * where an exact order statistic cannot.
    *
    * Scale: one window rank per source partition (thousands of
    * independent partitions), then a source-cardinality conditional
    * aggregate. For a mega-source beyond per-partition sort, q25's
    * binned-percentile shape substitutes; at source-catalog
    * cardinalities the partition sort IS the plan. */
  def q220LengthBands(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
    val ranked = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rk", row_number().over(
        w.orderBy(col("n_chars"), col("doc_id"))).cast("long"))
      .withColumn("n", count(lit(1)).over(w))
    def pick(p: Double) = max(when(
      col("rk") === ceil(col("n").cast("double") * p).cast("long"),
      col("n_chars")))
    ranked.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        pick(0.1).as("p10_chars"),
        pick(0.5).as("p50_chars"),
        pick(0.9).as("p90_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(col("source"))
  }

  val q220Sql: String =
    """WITH ranked AS (
      |  SELECT source, n_chars,
      |         row_number() OVER (PARTITION BY source
      |                            ORDER BY n_chars, doc_id) AS rk,
      |         count(*) OVER (PARTITION BY source) AS n
      |  FROM documents)
      |SELECT source, count(*) AS n_docs,
      |       min(n_chars) AS min_chars,
      |       CAST(max(CASE WHEN rk = CAST(ceil(CAST(n AS DOUBLE) * 0.1)
      |         AS BIGINT) THEN n_chars END) AS BIGINT) AS p10_chars,
      |       CAST(max(CASE WHEN rk = CAST(ceil(CAST(n AS DOUBLE) * 0.5)
      |         AS BIGINT) THEN n_chars END) AS BIGINT) AS p50_chars,
      |       CAST(max(CASE WHEN rk = CAST(ceil(CAST(n AS DOUBLE) * 0.9)
      |         AS BIGINT) THEN n_chars END) AS BIGINT) AS p90_chars,
      |       max(n_chars) AS max_chars
      |FROM ranked GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------- split leakage

  /** q221_split_leakage — eval-hygiene audit on the q217 split: a held-out
    * (val/test) document whose EXACT content (md5 digest) also appears in
    * train is a leaked eval item — the model has seen the answer, the
    * metric is inflated. Reports, per held-out split: document count,
    * leaked count, and the leak rate. Non-zero leakage is the standard
    * argument for deduplicating BEFORE splitting ([[q218DedupImpact]]
    * upstream of [[evalSplitAssign]]); this query measures exactly what
    * skipping that costs, on the same split assignment q217 ships.
    *
    * Scale: the split assignment is q217's window; the leak check is a
    * semi-join of held-out digests against the DISTINCT train digest set —
    * digest-keyed shuffle of 32-byte rows, then a 2-row aggregate. */
  def q221SplitLeakage(spark: SparkSession, sfDir: String): DataFrame = {
    val assigned = evalSplitAssign(Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), md5(col("text")).as("digest")))
      .select(col("doc_id"), col("split"), col("digest"))
    val trainDigests = assigned.filter(col("split") === "train")
      .select(col("digest")).distinct()
      .withColumn("in_train", lit(1))
    assigned.filter(col("split") =!= "train")
      .join(trainDigests, Seq("digest"), "left")
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("in_train").isNotNull, 1L).otherwise(0L)).as("n_leaked"))
      .withColumn("leak_rate",
        col("n_leaked").cast("double") / col("n_docs").cast("double"))
      .orderBy(col("split"))
  }

  val q221Sql: String =
    s"""WITH assigned AS (
       |  SELECT doc_id, md5(text) AS digest,
       |         CASE
       |           WHEN rk <= q THEN 'val'
       |           WHEN rk <= q * 2 THEN 'test'
       |           ELSE 'train' END AS split
       |  FROM (
       |    SELECT doc_id, text,
       |           row_number() OVER (PARTITION BY source
       |             ORDER BY (doc_id * $MixA) % $Mod32, doc_id) AS rk,
       |           CAST(floor(CAST(count(*) OVER (PARTITION BY source)
       |             AS DOUBLE) * $EvalFrac) AS BIGINT) AS q
       |    FROM documents)),
       |train_digests AS (
       |  SELECT DISTINCT digest FROM assigned WHERE split = 'train')
       |SELECT a.split, count(*) AS n_docs,
       |       CAST(sum(CASE WHEN t.digest IS NULL THEN 0 ELSE 1 END)
       |         AS BIGINT) AS n_leaked,
       |       CAST(sum(CASE WHEN t.digest IS NULL THEN 0 ELSE 1 END)
       |         AS DOUBLE) / count(*) AS leak_rate
       |FROM assigned a
       |LEFT JOIN train_digests t ON a.digest = t.digest
       |WHERE a.split <> 'train'
       |GROUP BY a.split ORDER BY a.split""".stripMargin

  // ------------------------------------------- temperature-scaled mixing

  /** q243_temp_mix — temperature-scaled sampling weights, the multilingual
    * pretraining recipe (XLM-R's p_i^α family): at temperature α = 1/2,
    * source i samples with share ∝ √p_i — big sources are damped, tail
    * sources boosted, without q204's hard cap. α = 1/2 is chosen
    * deliberately: √ of an exact integer is CORRECTLY-ROUNDED IEEE (the
    * only transcendental-free power), so the whole weight table is
    * cross-engine exact — a general p^0.3 needs pow(), whose libm is not
    * bit-guaranteed, and would take the q148 round-then-sum discipline
    * instead. Since shares normalize, √p_i ∝ √chars_i: the weight is
    * √(exact char mass), quantized to 2^20 fixed point, integer-summed
    * (never a float sum — q233's rule), ONE division per share. `boost`
    * = sampled-share / natural-share is the in-row audit: > 1 means the
    * source is upsampled.
    *
    * Scale: one map-side-combinable aggregate at source cardinality plus
    * arithmetic on that dozens-row frame with a broadcast total — the
    * output is the broadcast config for a q144-style weighted sampler. */
  def q243TempMix(spark: SparkSession, sfDir: String): DataFrame = {
    val per = Tables.documents(spark, sfDir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
      .withColumn("wq",
        floor(sqrt(col("chars").cast("double")) * lit(1L << 20))
          .cast("long"))
    val tot = per.agg(sum(col("chars")).as("tot_chars"),
      sum(col("wq")).as("tot_wq"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("chars"), col("wq"),
        (col("chars").cast("double") / col("tot_chars").cast("double"))
          .as("p_share"),
        (col("wq").cast("double") / col("tot_wq").cast("double"))
          .as("w_share"))
      .withColumn("boost", col("w_share") / col("p_share"))
      .orderBy(col("source"))
  }

  val q243Sql: String =
    """WITH per AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |         CAST(sum(n_chars) AS BIGINT) AS chars
      |  FROM documents GROUP BY source),
      |w AS (
      |  SELECT *, CAST(floor(sqrt(CAST(chars AS DOUBLE)) * 1048576)
      |                 AS BIGINT) AS wq
      |  FROM per),
      |tot AS (
      |  SELECT CAST(sum(chars) AS BIGINT) AS tot_chars,
      |         CAST(sum(wq) AS BIGINT) AS tot_wq
      |  FROM w)
      |SELECT source, n_docs, chars, wq,
      |       CAST(chars AS DOUBLE) / CAST(tot_chars AS DOUBLE) AS p_share,
      |       CAST(wq AS DOUBLE) / CAST(tot_wq AS DOUBLE) AS w_share,
      |       (CAST(wq AS DOUBLE) / CAST(tot_wq AS DOUBLE)) /
      |         (CAST(chars AS DOUBLE) / CAST(tot_chars AS DOUBLE))
      |         AS boost
      |FROM w CROSS JOIN tot
      |ORDER BY source""".stripMargin
}
