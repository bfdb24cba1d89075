package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The assembled LLM training-data preprocessing pipeline — this round's
  * flagship composition, built entirely from individually-oracle-checked
  * stages: exact dedup (q36) → PII redaction (q69) → corpus boilerplate
  * removal (q99) → quality gate → overlapping chunking (q100). q110 proves
  * the COMPOSITION with one hash over the emitted chunk set.
  *
  * Stage order is the 100 TB design:
  *  1. Dedup FIRST — the only wide-text shuffle; everything after runs on
  *     unique representatives.
  *  2. Redaction is pure map work on the deduped reps.
  *  3. Boilerplate removal shuffles vocabulary-bounded doc frequencies and
  *     broadcast-anti-joins the (tiny) common-term set. A nice emergent
  *     property the fixture exercises: redaction markers (<EMAIL>, <ID>,
  *     <IP>) land in EVERY document, so the boilerplate stage strips them
  *     automatically — scrub artifacts never reach the training set.
  *  4. The quality gate is a residual predicate on the survivor manifest.
  *  5. Chunking is map-side expansion; output rows carry provenance
  *     (representative id, chunk offset) for audit and joinback.
  *
  * The physical plan re-scans the (doc_id, text)-pruned corpus four times
  * (dedup agg, position explode, term-frequency path, total count) rather
  * than materializing shared intermediates — deliberate: the exploded
  * position frame is larger than the corpus itself, so at scale a pruned
  * parquet re-scan is cheaper than persisting it, and each scan feeds a
  * different aggregation shape Catalyst cannot fuse anyway.
  */
object TrainingPipeline {

  /** Minimum surviving tokens for a doc to be chunked. */
  val MinKeptTokens = 20
  /** Chunk geometry (matches q100). */
  val ChunkSize = 32
  val ChunkStride = 24

  /** The pipeline core over any `(doc_id, text)` frame. */
  def preprocess(docs: DataFrame): DataFrame = {
    // 1. exact dedup: deterministic min-id representative per text
    val rep = docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"))
    // 2. plant deterministic PII off the rep id (the fixture corpus is
    //    clean word soup), then redact — THE SAME builder as q69, so the
    //    two oracles cannot drift apart
    val planted = Privacy.plantPii(rep, "keep_id")
    val redacted = planted.select(col("keep_id").as("doc_id"),
      Privacy.redact(col("text")).as("text"))
    // 3. corpus boilerplate removal (includes the redaction markers, which
    //    by construction hit 100% document frequency)
    val cleaned = Text.removeBoilerplate(redacted, Text.boilerplateDocPct)
    // 4. quality gate + 5. chunking with provenance
    Chunking.chunkTokens(
      cleaned.filter(col("n_kept") >= MinKeptTokens)
        .select(col("doc_id").as("keep_id"), col("n_kept"),
          col("clean_text")),
      "clean_text", ChunkSize, ChunkStride)
  }

  /** Containment threshold for q250's dedup stage. */
  val V2Contain = 0.8

  /** q250_curation_v2 — the round-6 curation pipeline assembled from this
    * round's individually-oracle-checked stages, composed in the order a
    * 100 TB run wants:
    *  1. CONTAINMENT DEDUP (q248's machinery, threshold [[V2Contain]]):
    *     documents near-contained in a larger document are dropped — the
    *     quote/boilerplate duplicates Jaccard dedup under-catches. The
    *     only wide-gram shuffle; everything after runs on survivors.
    *  2. PERPLEXITY GATE (q238's scoring on the SURVIVOR corpus — the
    *     unigram model is refit post-dedup, as it must be: duplicate mass
    *     biases token frequencies): each source's worst third by
    *     bits/token (the tail) is cut.
    *  3. TEMPERATURE MIX (q243, α = ½) over what remains: the per-source
    *     sampling shares the trainer actually consumes.
    * The output is the per-source curation ledger: raw counts, what each
    * stage cut, what survived, and the final sampling share with its
    * boost — one frame a data-engineering review reads top to bottom.
    * Every stage reuses the exact arithmetic its standalone operator
    * proved (same gram hashing, same decimal-rounded scoring, same
    * √-quantized weights), so the composition is as hash-stable as its
    * parts.
    *
    * Scale: stage 1 is the banded gram join (bounded candidates); stage
    * 2 is vocabulary-bounded scoring + a per-source window; stage 3 is
    * source-cardinality arithmetic. No stage re-widens: text never
    * shuffles after stage 1's gram hashes. */
  def q250CurationV2(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
    // stage 1: containment dedup
    val drops = Dedup.q248Containment(spark, sfDir)
      .filter(col("containment") >= V2Contain)
      .select(col("contained_doc").as("doc_id")).distinct()
      .localCheckpoint() // consumed twice: anti-join + per-source cut count
    val kept1 = docs.join(drops, Seq("doc_id"), "left_anti")
    // stage 2: refit unigram LM on survivors, cut each source's tail third
    val toks = kept1
      .select(col("doc_id"), col("source"), col("n_chars"),
        explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("c_corpus"))
    val total = vocab.agg(sum(col("c_corpus")).as("n_corpus"))
    val scored = toks
      .groupBy(col("doc_id"), col("source"), col("n_chars"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      // vocabulary-cardinality — unbounded (Heaps-law); AQE sizes it
      .join(vocab, "tok")
      .groupBy(col("doc_id"), col("source"), col("n_chars"))
      .agg(sum(col("cnt")).as("n_tokens"),
        sum((col("cnt").cast("double") * log2(col("c_corpus")))
          .cast("decimal(18,6)")).as("sum_clogc_dec"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("source"), col("n_chars"),
        (log2(col("n_corpus")) -
          col("sum_clogc_dec").cast("double") /
            col("n_tokens").cast("double")).as("bits"))
    val w = Window.partitionBy(col("source"))
    val kept2 = scored
      .withColumn("rk", row_number().over(
        w.orderBy(col("bits"), col("doc_id"))).cast("long"))
      .withColumn("n", count(lit(1)).over(w))
      .filter(col("rk") * 3 <= col("n") * 2) // head + middle survive
      .select(col("doc_id"), col("source"), col("n_chars"))
      .localCheckpoint() // consumed by the per-source aggregate AND totals
    // stage 3: temperature-1/2 sampling weights over the retained corpus
    val per = kept2.groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("chars_kept"))
      .withColumn("wq",
        floor(sqrt(col("chars_kept").cast("double")) * lit(1L << 20))
          .cast("long"))
    val tot = per.agg(sum(col("wq")).as("tot_wq"))
    val raw = docs.groupBy(col("source")).agg(count(lit(1)).as("n_raw"))
    val cut1 = docs.join(drops, Seq("doc_id"), "left_semi")
      .groupBy(col("source")).agg(count(lit(1)).as("n_dedup_cut"))
    per.crossJoin(broadcast(tot))
      .join(raw, Seq("source"))
      .join(cut1, Seq("source"), "left")
      .select(col("source"), col("n_raw"),
        coalesce(col("n_dedup_cut"), lit(0L)).as("n_dedup_cut"),
        (col("n_raw") - coalesce(col("n_dedup_cut"), lit(0L)) -
          col("n_kept")).as("n_tail_cut"),
        col("n_kept"), col("chars_kept"), col("wq"),
        (col("wq").cast("double") / col("tot_wq").cast("double"))
          .as("w_share"),
        ((col("wq").cast("double") / col("tot_wq").cast("double")) *
          col("n_raw").cast("double") /
          col("n_kept").cast("double")).as("per_doc_boost"))
      .orderBy(col("source"))
  }

  val q250Sql: String =
    s"""WITH toks0 AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |grams0 AS (
       |  SELECT DISTINCT doc_id,
       |         unnest(list_transform(range(1, greatest(len(t) - 1, 2)),
       |                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gram
       |  FROM toks0 WHERE len(t) >= 3),
       |sizes AS (SELECT doc_id, count(*) AS n FROM grams0 GROUP BY doc_id),
       |inter AS (
       |  SELECT g1.doc_id AS d1, g2.doc_id AS d2, count(*) AS n_inter
       |  FROM grams0 g1 JOIN grams0 g2
       |    ON g1.gram = g2.gram
       |   AND g2.doc_id > g1.doc_id AND g2.doc_id <= g1.doc_id + 10
       |  GROUP BY 1, 2),
       |drops AS (
       |  SELECT DISTINCT CASE WHEN s1.n <= s2.n THEN d1 ELSE d2 END
       |           AS doc_id
       |  FROM inter
       |  JOIN sizes s1 ON s1.doc_id = d1
       |  JOIN sizes s2 ON s2.doc_id = d2
       |  WHERE n_inter / least(s1.n, s2.n) >= $V2Contain),
       |kept1 AS (
       |  SELECT * FROM documents
       |  WHERE doc_id NOT IN (SELECT doc_id FROM drops)),
       |toks AS (
       |  SELECT doc_id, source, n_chars,
       |         unnest(string_split(text, ' ')) AS tok
       |  FROM kept1),
       |clean AS (SELECT * FROM toks WHERE tok <> ''),
       |vocab AS (SELECT tok, count(*) AS c_corpus FROM clean GROUP BY tok),
       |total AS (SELECT CAST(sum(c_corpus) AS BIGINT) AS n_corpus
       |          FROM vocab),
       |tf AS (SELECT doc_id, source, n_chars, tok, count(*) AS cnt
       |       FROM clean GROUP BY 1, 2, 3, 4),
       |scored AS (
       |  SELECT tf.doc_id, tf.source, tf.n_chars,
       |         log2(t.n_corpus) -
       |           CAST(sum(CAST(CAST(tf.cnt AS DOUBLE) * log2(v.c_corpus)
       |                         AS DECIMAL(18,6))) AS DOUBLE)
       |           / CAST(sum(tf.cnt) AS DOUBLE) AS bits
       |  FROM tf JOIN vocab v ON tf.tok = v.tok CROSS JOIN total t
       |  GROUP BY tf.doc_id, tf.source, tf.n_chars, t.n_corpus),
       |ranked AS (
       |  SELECT *,
       |         row_number() OVER (PARTITION BY source
       |           ORDER BY bits, doc_id) AS rk,
       |         count(*) OVER (PARTITION BY source) AS n
       |  FROM scored),
       |kept2 AS (
       |  SELECT doc_id, source, n_chars FROM ranked WHERE rk * 3 <= n * 2),
       |per AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
       |         CAST(sum(n_chars) AS BIGINT) AS chars_kept
       |  FROM kept2 GROUP BY source),
       |w AS (
       |  SELECT *, CAST(floor(sqrt(CAST(chars_kept AS DOUBLE)) * 1048576)
       |                 AS BIGINT) AS wq
       |  FROM per),
       |tot AS (SELECT CAST(sum(wq) AS BIGINT) AS tot_wq FROM w),
       |raw AS (SELECT source, CAST(count(*) AS BIGINT) AS n_raw
       |        FROM documents GROUP BY source),
       |cut1 AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_dedup_cut
       |  FROM documents WHERE doc_id IN (SELECT doc_id FROM drops)
       |  GROUP BY source)
       |SELECT w.source, raw.n_raw,
       |       coalesce(cut1.n_dedup_cut, 0) AS n_dedup_cut,
       |       raw.n_raw - coalesce(cut1.n_dedup_cut, 0) - w.n_kept
       |         AS n_tail_cut,
       |       w.n_kept, w.chars_kept, w.wq,
       |       CAST(w.wq AS DOUBLE) / CAST(tot.tot_wq AS DOUBLE) AS w_share,
       |       (CAST(w.wq AS DOUBLE) / CAST(tot.tot_wq AS DOUBLE)) *
       |         CAST(raw.n_raw AS DOUBLE) /
       |         CAST(w.n_kept AS DOUBLE) AS per_doc_boost
       |FROM w
       |CROSS JOIN tot
       |JOIN raw ON raw.source = w.source
       |LEFT JOIN cut1 ON cut1.source = w.source
       |ORDER BY w.source""".stripMargin

  /** q110_training_pipeline — the composed path over `documents`. */
  def q110TrainingPipeline(spark: SparkSession, sfDir: String): DataFrame =
    preprocess(Tables.documents(spark, sfDir))
      .orderBy(col("keep_id"), col("chunk_start"))

  val q110Sql: String = {
    val Seq((_, email, _), (_, id, _), (_, ip, _)) = Privacy.piiPatterns
    s"""WITH rep AS (
       |  SELECT text, min(doc_id) AS keep_id FROM documents GROUP BY text),
       |planted AS (
       |  SELECT keep_id,
       |         ${Privacy.plantPiiSql("keep_id")} AS text
       |  FROM rep),
       |red AS (
       |  SELECT keep_id,
       |         regexp_replace(regexp_replace(regexp_replace(text,
       |             '$email', '<EMAIL>', 'g'),
       |             '$id', '<ID>', 'g'),
       |             '$ip', '<IP>', 'g') AS text
       |  FROM planted),
       |pos AS (
       |  SELECT keep_id,
       |         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
       |         unnest(string_split(text, ' ')) AS term
       |  FROM red),
       |common AS (
       |  SELECT term FROM pos GROUP BY term
       |  HAVING count(DISTINCT keep_id) * 100 >
       |         ${Text.boilerplateDocPct} * (SELECT count(*) FROM red)),
       |cleaned AS (
       |  SELECT p.keep_id, count(*) AS n_kept,
       |         string_agg(p.term, ' ' ORDER BY p.pos) AS clean_text
       |  FROM pos p ANTI JOIN common c ON p.term = c.term
       |  GROUP BY p.keep_id),
       |gated AS (
       |  SELECT keep_id, n_kept, string_split(clean_text, ' ') AS t
       |  FROM cleaned WHERE n_kept >= $MinKeptTokens)
       |SELECT keep_id, n_kept, s AS chunk_start,
       |       array_to_string(t[s+1: s+$ChunkSize], ' ') AS chunk_text,
       |       least($ChunkSize, n_kept - s) AS n_tokens
       |FROM gated, UNNEST(range(0, n_kept, $ChunkStride)) AS u(s)
       |ORDER BY keep_id, chunk_start""".stripMargin
  }
}
