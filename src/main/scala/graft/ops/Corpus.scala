package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The composed training-corpus cleaning pipeline — the operation an LLM
  * data pipeline actually runs, assembled from the tier-X primitives:
  * exact dedup (q36) → language-ID (q52) → quality scoring (q53) →
  * threshold filter. Each stage is individually oracle-checked; q77 proves
  * the COMPOSITION is too (one hash over the surviving corpus manifest).
  *
  * Stage order is the 100 TB design:
  *  1. Dedup FIRST — the only stage that must shuffle the wide `text`
  *     column, and deduping before enrichment means every later stage runs
  *     on unique docs only (on a crawl corpus that is a 2-5× saving).
  *  2. Language scores are pure per-row expressions (zero shuffle, inside
  *     WholeStageCodegen), computed on the deduped representatives.
  *  3. Token metrics explode to (keep_id, tok) — text itself is NOT
  *     carried through the explode, so the aggregation shuffles narrow
  *     rows and map-side partial combine collapses them to one row per
  *     doc per partition before the exchange.
  *  4. The metrics join back on keep_id (narrow ⋈ narrow), the filter is
  *     a residual predicate, and the output is the cleaning manifest
  *     (ids + metrics), not the text — readers join the manifest back to
  *     the corpus by id when materializing the training set.
  */
object Corpus {

  /** Keep docs with at least this many whitespace tokens… */
  val MinTokens = 20
  /** …and at least this composite quality score (fixture median ≈ 0.41,
    * so the gate does real work at every SF). */
  val MinQuality = 0.35

  /** The pipeline core over any `(doc_id, text)` frame — unordered manifest
    * of survivors. q77 wraps it with the fixture read + determinism sort;
    * CorpusSpec drives it with planted duplicates and junk docs. */
  def clean(docs: DataFrame): DataFrame = {
    val rep = docs
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
    val scored = Text.withLangScores(rep)
      .select(col("keep_id"), col("n_copies"),
        Text.langPredCol.as("pred_lang"), col("text"))
    val metrics = rep
      .select(col("keep_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("keep_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(length(col("tok"))).as("sum_tok_len"),
        sum(when(col("tok").isin(Text.stopwords: _*), 1L).otherwise(0L))
          .as("n_stop"))
    scored.drop("text")
      .join(metrics, "keep_id")
      .withColumn("quality_score", Text.qualityScoreCol)
      .filter(col("n_tokens") >= MinTokens &&
        col("quality_score") >= MinQuality)
      .select(col("keep_id"), col("pred_lang"), col("n_tokens"),
        col("quality_score"), col("n_copies"))
  }

  /** q77_corpus_clean — dedup → langid → quality → filter; returns the
    * surviving-corpus manifest ordered by representative id. */
  def q77CorpusClean(spark: SparkSession, sfDir: String): DataFrame =
    clean(Tables.documents(spark, sfDir))
      .orderBy(col("keep_id"))

  val q77Sql: String = {
    val stops = Text.stopwords.map(s => s"'$s'").mkString("(", ", ", ")")
    s"""WITH rep AS (
       |  SELECT text, min(doc_id) AS keep_id, count(*) AS n_copies
       |  FROM documents GROUP BY text),
       |scored0 AS (
       |  SELECT keep_id, n_copies, text,
       |         ${Text.langScoreSqlExprs}
       |  FROM rep),
       |scored AS (
       |  SELECT keep_id, n_copies, ${Text.langCaseSql} AS pred_lang
       |  FROM scored0),
       |toks AS (
       |  SELECT keep_id, unnest(string_split(text, ' ')) AS tok FROM rep),
       |m AS (
       |  SELECT keep_id, count(*) AS n_tokens,
       |         sum(length(tok)) AS sum_tok_len,
       |         sum(CASE WHEN tok IN $stops THEN 1 ELSE 0 END) AS n_stop
       |  FROM toks WHERE tok <> '' GROUP BY keep_id),
       |q AS (
       |  SELECT s.keep_id, s.pred_lang, m.n_tokens,
       |         ${Text.qualityScoreSql("m.")} AS quality_score,
       |         s.n_copies
       |  FROM scored s JOIN m ON s.keep_id = m.keep_id)
       |SELECT keep_id, pred_lang, n_tokens, quality_score, n_copies
       |FROM q
       |WHERE n_tokens >= $MinTokens AND quality_score >= $MinQuality
       |ORDER BY keep_id""".stripMargin
  }

  /** q149_source_overlap — pairwise 3-gram Jaccard between SOURCES: the
    * corpus-composition audit that catches mirror sites, cross-posted
    * content, and scraper overlap before dedup ever runs doc-level.
    * Distinct (source, gram) sets → self-join on gram → exact
    * intersection counts; Jaccard is one IEEE division.
    *
    * Scale: the join key is the gram, so a gram shared by s sources
    * expands to ≤ s² pair rows — bounded by the SOURCE count squared,
    * never the corpus. Grams stay strings here because the oracle needs
    * exact identity; a production run would hash them first
    * ([[Dedup.hashedGrams]]) and shuffle 8-byte keys instead. The gram
    * build is the [[Dedup.wordGrams]] zero-HOF slice pattern keyed by
    * source directly, so document ids never enter the shuffle.
    */
  def q149SourceOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    val t = split(col("text"), " ")
    val m = greatest(size(t) - 2, lit(0))
    val grams = Tables.documents(spark, sfDir)
      .select(col("source"),
        explode(arrays_zip(
          slice(t, lit(1), m).as("a"),
          slice(t, lit(2), m).as("b"),
          slice(t, lit(3), m).as("c"))).as("z"))
      .select(col("source"),
        concat_ws(" ", col("z").getField("a"), col("z").getField("b"),
          col("z").getField("c")).as("gram"))
      .distinct()
      .localCheckpoint() // sizes + both join sides read it
    val sizes = grams.groupBy(col("source")).agg(count(lit(1)).as("n_grams"))
    val inter = grams.select(col("source").as("src_a"), col("gram"))
      .join(grams.select(col("source").as("src_b"), col("gram")), Seq("gram"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(broadcast(sizes.select(col("source").as("src_a"),
        col("n_grams").as("grams_a"))), Seq("src_a"))
      .join(broadcast(sizes.select(col("source").as("src_b"),
        col("n_grams").as("grams_b"))), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("grams_a"), col("grams_b"),
        col("n_inter"),
        (col("grams_a") + col("grams_b") - col("n_inter")).as("n_union"),
        (col("n_inter").cast("double") /
          (col("grams_a") + col("grams_b") - col("n_inter")).cast("double"))
          .as("jaccard"))
      .orderBy(col("src_a"), col("src_b"))
  }

  val q149Sql: String =
    """WITH toks AS (
      |  SELECT source, string_split(text, ' ') AS t FROM documents),
      |grams AS (
      |  SELECT DISTINCT source,
      |         unnest(list_transform(range(1, greatest(len(t) - 1, 2)),
      |                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gram
      |  FROM toks WHERE len(t) >= 3),
      |sizes AS (SELECT source, count(*) AS n_grams FROM grams GROUP BY source),
      |inter AS (
      |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_inter
      |  FROM grams a JOIN grams b
      |    ON a.gram = b.gram AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT i.src_a, i.src_b, sa.n_grams AS grams_a, sb.n_grams AS grams_b,
      |       i.n_inter,
      |       sa.n_grams + sb.n_grams - i.n_inter AS n_union,
      |       CAST(i.n_inter AS DOUBLE)
      |         / CAST(sa.n_grams + sb.n_grams - i.n_inter AS DOUBLE)
      |         AS jaccard
      |FROM inter i
      |JOIN sizes sa ON sa.source = i.src_a
      |JOIN sizes sb ON sb.source = i.src_b
      |ORDER BY i.src_a, i.src_b""".stripMargin

  /** q191_dataset_card — the one-row "dataset card" a corpus release
    * ships with: document/source/language cardinalities, token and
    * character volume, exact-duplicate share, dominant-language share,
    * and mean document length — every number a release reviewer checks
    * before sign-off, in one query. Counts are exact; shares and the
    * mean are single IEEE divisions of exact integers.
    *
    * Scale: one corpus scan feeding two branched aggregates — a global
    * one (tokens via size(split) per row, no explode shuffle) and a
    * lang-marginal for the dominant share; both map-side combinable.
    * The exact-dup share reuses q36's key (full-text hash grouping)
    * at distinct-count granularity. */
  def q191DatasetCard(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
      .localCheckpoint() // feeds the global aggregate + lang marginal
    val top = d.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("lang")).limit(1)
      .select(col("lang").as("top_lang"), col("n").as("top_lang_n"))
    d.agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_toks")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        countDistinct(col("text")).as("n_unique_texts"))
      .crossJoin(broadcast(top))
      .select(col("n_docs"), col("n_sources"), col("n_langs"),
        col("n_tokens"), col("n_chars"),
        (col("n_docs") - col("n_unique_texts")).as("n_exact_dups"),
        ((col("n_docs") - col("n_unique_texts")).cast("double") /
          col("n_docs").cast("double")).as("dup_share"),
        col("top_lang"),
        (col("top_lang_n").cast("double") / col("n_docs").cast("double"))
          .as("top_lang_share"),
        (col("n_tokens").cast("double") / col("n_docs").cast("double"))
          .as("mean_tokens"))
  }

  val q191Sql: String =
    """WITH d AS (
      |  SELECT doc_id, text, lang, source, n_chars,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
      |  FROM documents),
      |top AS (
      |  SELECT lang AS top_lang, CAST(count(*) AS BIGINT) AS top_lang_n
      |  FROM d GROUP BY lang ORDER BY count(*) DESC, lang LIMIT 1),
      |g AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |         CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
      |         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
      |         CAST(sum(n_toks) AS BIGINT) AS n_tokens,
      |         CAST(sum(n_chars) AS BIGINT) AS n_chars,
      |         CAST(count(DISTINCT text) AS BIGINT) AS n_unique_texts
      |  FROM d)
      |SELECT n_docs, n_sources, n_langs, n_tokens, n_chars,
      |       n_docs - n_unique_texts AS n_exact_dups,
      |       CAST(n_docs - n_unique_texts AS DOUBLE)
      |         / CAST(n_docs AS DOUBLE) AS dup_share,
      |       top_lang,
      |       CAST(top_lang_n AS DOUBLE) / CAST(n_docs AS DOUBLE)
      |         AS top_lang_share,
      |       CAST(n_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE)
      |         AS mean_tokens
      |FROM g CROSS JOIN top""".stripMargin
}
