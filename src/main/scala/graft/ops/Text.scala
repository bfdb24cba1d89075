package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text analysis over `documents` — north-star tier X (BASELINE.json): term
  * statistics, language-ID heuristic, quality scoring, token counting,
  * document fingerprinting.
  *
  * Scale: everything here is either pure map work (langid/quality/tokens/
  * fingerprint are per-document expressions — zero shuffle, fully inside
  * WholeStageCodegen) or a single explode→hash-aggregate (term stats), whose
  * shuffle volume is bounded by vocabulary size after map-side combine, not
  * corpus size. No UDFs anywhere — all built-in expressions.
  *
  * Oracle determinism: token counts and marker scores are exact integer
  * arithmetic; ratios are single correctly-rounded IEEE divisions; the
  * fingerprint is mod-arithmetic on BIGINT with bounds chosen so no
  * intermediate exceeds 2^63 (ANSI-safe).
  */
object Text {

  /** q51_textstats — tokenize + corpus term statistics: explode terms, count
    * occurrences and document frequency per term. */
  def q51Textstats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(desc("n_occurrences"), col("term"))

  val q51Sql: String =
    """SELECT term, count(*) AS n_occurrences,
      |       count(DISTINCT doc_id) AS n_docs
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |      FROM documents)
      |WHERE term <> ''
      |GROUP BY term ORDER BY n_occurrences DESC, term""".stripMargin

  /** Occurrences of a literal marker inside text, via the replace trick —
    * exact integer arithmetic, identical in any engine. */
  private def occ(marker: String): Column =
    (length(col("text")) - length(expr(s"replace(text, '$marker', '')"))) /
      lit(marker.length)

  private[ops] val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("th", "he", "er"),
    "es" -> Seq("os", "ar", "la"),
    "fr" -> Seq("le", "ou", "on"),
    "de" -> Seq("ch", "ei", "en"),
    "zh" -> Seq("sh", "ng", "wi"))

  /** q52_langid — character-bigram language-ID heuristic: score each language
    * by its signature-bigram occurrence count, pick the argmax with a fixed
    * preference order for ties. (The fixture text is synthetic word soup, so
    * the prediction needn't match the `lang` column — the operator is the
    * deliverable, and the oracle checks the identical computation.) */
  /** Add one `score_<lang>` column per language — map-side, reusable by any
    * frame carrying a `text` column (q52 and the q77 cleaning pipeline). */
  private[ops] def withLangScores(df: DataFrame): DataFrame =
    langMarkers.foldLeft(df) {
      case (d, (lang, ms)) =>
        d.withColumn(s"score_$lang",
          ms.map(occ).reduce(_ + _).cast("long"))
    }

  /** Argmax over the `score_<lang>` columns with a fixed preference order
    * for ties. foldRight builds when(en)...when(zh) outermost-first, so
    * earlier languages win ties — mirror the same CASE order in SQL. */
  private[ops] def langPredCol: Column = {
    val best = langMarkers.map { case (l, _) => col(s"score_$l") }
      .reduce((a, b) => greatest(a, b))
    langMarkers.foldRight(lit("und"): Column) {
      case ((l, _), acc) => when(col(s"score_$l") === best, lit(l))
        .otherwise(acc)
    }
  }

  def q52Langid(spark: SparkSession, sfDir: String): DataFrame =
    withLangScores(Tables.documents(spark, sfDir))
      .select(col("doc_id") +: col("lang").as("actual_lang") +:
        langPredCol.as("pred_lang") +:
        langMarkers.map { case (l, _) => col(s"score_$l") }: _*)
      .orderBy(col("doc_id"))

  /** SQL twins of [[withLangScores]]/[[langPredCol]], for oracle
    * generation here and in the q77 pipeline. */
  private[ops] val langScoreSqlExprs: String =
    langMarkers.map { case (l, ms) =>
      val terms = ms.map(m =>
        s"(length(text) - length(replace(text, '$m', ''))) / ${m.length}")
      s"CAST(${terms.mkString(" + ")} AS BIGINT) AS score_$l"
    }.mkString(",\n         ")

  private[ops] val langCaseSql: String = {
    val greatest5 = langMarkers.map { case (l, _) => s"score_$l" }
      .mkString("greatest(", ", ", ")")
    langMarkers.map { case (l, _) =>
      s"WHEN score_$l = $greatest5 THEN '$l'"
    }.mkString("CASE ", " ", " ELSE 'und' END")
  }

  val q52Sql: String = {
    val scoreExprs = langScoreSqlExprs
    val caseExpr = langCaseSql
    s"""WITH scored AS (
       |  SELECT doc_id, lang AS actual_lang,
       |         $scoreExprs
       |  FROM documents)
       |SELECT doc_id, actual_lang, $caseExpr AS pred_lang,
       |       score_en, score_es, score_fr, score_de, score_zh
       |FROM scored ORDER BY doc_id""".stripMargin
  }

  private[ops] val stopwords = Seq("the", "a", "of", "and", "to", "in")

  /** Composite quality score over the per-doc token aggregates
    * (n_tokens, sum_tok_len, n_stop). ONE fixed expression tree shared by
    * q53 and the q77 pipeline — the oracle hash depends on these exact
    * IEEE operations in this exact order. */
  private[ops] def qualityScoreCol: Column =
    least(col("n_tokens") / lit(100.0), lit(1.0)) * lit(0.5) +
      (col("n_stop") / col("n_tokens")) * lit(0.25) +
      least((col("sum_tok_len") / col("n_tokens")) / lit(10.0),
        lit(1.0)) * lit(0.25)

  /** The SQL twin of [[qualityScoreCol]]. */
  private[ops] def qualityScoreSql(prefix: String = ""): String =
    s"least(${prefix}n_tokens / 100.0, 1.0) * 0.5" +
      s" + (${prefix}n_stop / ${prefix}n_tokens) * 0.25" +
      s" + least((${prefix}sum_tok_len / ${prefix}n_tokens) / 10.0, 1.0)" +
      " * 0.25"

  /** q53_quality — document quality scoring: token count, average token
    * length, stopword ratio, and a bounded composite score. All ratios are
    * single IEEE divisions of exact integers; the composite uses one fixed
    * expression tree so both engines produce identical bits. */
  def q53Quality(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"),
        explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    toks.groupBy(col("doc_id"), col("n_chars"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(length(col("tok"))).as("sum_tok_len"),
        sum(when(col("tok").isin(stopwords: _*), 1L).otherwise(0L))
          .as("n_stop"))
      .select(
        col("doc_id"), col("n_tokens"),
        (col("sum_tok_len") / col("n_tokens")).as("avg_tok_len"),
        (col("n_stop") / col("n_tokens")).as("stop_ratio"),
        qualityScoreCol.as("quality_score"))
      .orderBy(col("doc_id"))
  }

  val q53Sql: String = {
    val stops = stopwords.map(s => s"'$s'").mkString("(", ", ", ")")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |  FROM documents),
       |agg AS (
       |  SELECT doc_id, count(*) AS n_tokens,
       |         sum(length(tok)) AS sum_tok_len,
       |         sum(CASE WHEN tok IN $stops THEN 1 ELSE 0 END) AS n_stop
       |  FROM toks WHERE tok <> '' GROUP BY doc_id)
       |SELECT doc_id, n_tokens,
       |       sum_tok_len / n_tokens AS avg_tok_len,
       |       n_stop / n_tokens AS stop_ratio,
       |       ${qualityScoreSql()} AS quality_score
       |FROM agg ORDER BY doc_id""".stripMargin
  }

  /** q54_tokens — token counting two ways: whitespace split and a BPE-ish
    * regex pass (lowercase runs / digit runs / single other non-space chars —
    * the pattern is RE2-and-Java-compatible by construction). */
  def q54Tokens(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("ws_tokens"),
        size(regexp_extract_all(col("text"),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("re_tokens"),
        length(col("text")).as("text_chars"),
        col("n_chars"))
      .orderBy(col("doc_id"))

  val q54Sql: String =
    """SELECT doc_id,
      |       len(string_split_regex(trim(text), '\s+')) AS ws_tokens,
      |       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
      |         AS re_tokens,
      |       length(text) AS text_chars,
      |       n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q55_fingerprint — position-weighted rolling-hash document fingerprint in
    * exact BIGINT mod-arithmetic: fp = Σ tokval(t_i)·w(i) mod p, where
    * w(i) = i·2654435761 mod p (Knuth multiplicative constant) and
    * tokval = ascii(first)·131 + ascii(last) + 7·len. Bounds: tokval < 2^15,
    * w < 2^30, per-term product < 2^45, row sums < 2^53 — no ANSI overflow.
    * Equal documents always collide; position-weighting makes reorderings
    * almost surely differ. */
  def q55Fingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    val p = 1000000007L
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .filter(col("tok") =!= "")
    val tokval = ascii(substring(col("tok"), 1, 1)) * lit(131L) +
      ascii(col("tok").substr(length(col("tok")), lit(1))) +
      length(col("tok")) * lit(7L)
    val weight = pmod((col("pos") + 1) * lit(2654435761L), lit(p))
    toks
      .groupBy(col("doc_id"))
      .agg(pmod(sum(tokval * weight), lit(p)).as("fingerprint"),
        count(lit(1)).as("n_tokens"))
      .orderBy(col("doc_id"))
  }

  val q55Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |         unnest(string_split(text, ' ')) AS tok,
      |         generate_subscripts(string_split(text, ' '), 1) AS pos1
      |  FROM documents)
      |SELECT doc_id,
      |       CAST(sum((ascii(substring(tok, 1, 1)) * 131
      |                 + ascii(right(tok, 1)) + length(tok) * 7)
      |                * ((pos1 * 2654435761) % 1000000007)) % 1000000007
      |            AS BIGINT) AS fingerprint,
      |       count(*) AS n_tokens
      |FROM toks WHERE tok <> ''
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Boilerplate-removal doc-frequency threshold: a term present in more
    * than this percentage of documents is corpus boilerplate (the
    * cross-document analogue of navigation chrome / license headers in web
    * scrapes). 78 is fixture-tuned so roughly half the synthetic vocabulary
    * trips it — real corpora use 90+. */
  val boilerplateDocPct = 78

  /** Corpus-driven boilerplate removal core: drop every token whose
    * document frequency exceeds `docPct`% of the corpus, preserving the
    * original token order of what survives.
    *
    * Scale: one explode→hash-aggregate bounded by vocabulary size builds the
    * doc-frequency table; the boilerplate set (vocabulary-sized, tiny) is
    * broadcast into an anti-join against the exploded positions; the
    * re-assembly shuffle is keyed by doc_id with map-side combine on
    * collect_list partials. No whole-corpus self-join anywhere.
    */
  def removeBoilerplate(docs: DataFrame, docPct: Int): DataFrame = {
    val pos = docs
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
    val total = docs.agg(count(lit(1)).as("n_total_docs"))
    val common = pos
      .groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .crossJoin(broadcast(total))
      .filter(col("n_docs") * 100 > col("n_total_docs") * docPct)
      .select(col("term"))
    val cleaned = pos
      .join(broadcast(common), Seq("term"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        // order-preserving re-assembly: sort the (pos, term) pairs, then
        // project the terms — pos is unique per doc, so the order is total.
        // getField (GetArrayStructFields) stays inside codegen where a
        // transform() lambda would fall back to per-element interpretation
        concat_ws(" ",
          array_sort(collect_list(struct(col("pos"), col("term"))))
            .getField("term")).as("clean_text"))
    // left join back so fully-boilerplate documents still appear (empty)
    docs
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_total"))
      .join(cleaned, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_total"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** q99_boilerplate — corpus boilerplate removal over `documents`. */
  def q99Boilerplate(spark: SparkSession, sfDir: String): DataFrame =
    removeBoilerplate(Tables.documents(spark, sfDir), boilerplateDocPct)
      .orderBy(col("doc_id"))

  val q99Sql: String =
    s"""WITH pos AS (
       |  SELECT doc_id,
       |         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
       |         unnest(string_split(text, ' ')) AS term
       |  FROM documents),
       |common AS (
       |  SELECT term FROM pos GROUP BY term
       |  HAVING count(DISTINCT doc_id) * 100 >
       |         $boilerplateDocPct * (SELECT count(*) FROM documents)),
       |cleaned AS (
       |  SELECT p.doc_id, count(*) AS n_kept,
       |         string_agg(p.term, ' ' ORDER BY p.pos) AS clean_text
       |  FROM pos p ANTI JOIN common c ON p.term = c.term
       |  GROUP BY p.doc_id)
       |SELECT d.doc_id, len(string_split(d.text, ' ')) AS n_total,
       |       coalesce(c.n_kept, 0) AS n_kept,
       |       coalesce(c.clean_text, '') AS clean_text
       |FROM documents d LEFT JOIN cleaned c ON d.doc_id = c.doc_id
       |ORDER BY d.doc_id""".stripMargin
  /** q128_lexical — per-document lexical-diversity quality signals: the
    * type-token ratio, hapax share, and head-token concentration that
    * LLM-corpus filters use alongside q53's surface stats and q58's
    * repetition signals. Every ratio is an int/int IEEE division over
    * exact counts — no transcendental (entropy's log stays out of checked
    * outputs per the determinism contract; TTR and head-share carry the
    * same signal exactly).
    *
    * Scale: one hash aggregate on (doc, token) with map-side combine, one
    * on doc — shuffle volume is per-doc vocabulary, never corpus tokens.
    */
  def q128Lexical(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("n_hapax"),
        max(col("cnt")).as("top_cnt"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        col("n_hapax"), col("top_cnt"),
        (col("n_distinct").cast("double") / col("n_tokens").cast("double"))
          .as("ttr"),
        (col("top_cnt").cast("double") / col("n_tokens").cast("double"))
          .as("top_share"))
      .orderBy(col("doc_id"))

  val q128Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, tok, count(*) AS cnt
      |  FROM toks WHERE tok <> '' GROUP BY doc_id, tok),
      |per_doc AS (
      |  SELECT doc_id,
      |         CAST(sum(cnt) AS BIGINT) AS n_tokens,
      |         count(*) AS n_distinct,
      |         CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |           AS n_hapax,
      |         max(cnt) AS top_cnt
      |  FROM tf GROUP BY doc_id)
      |SELECT doc_id, n_tokens, n_distinct, n_hapax, top_cnt,
      |       CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr,
      |       CAST(top_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE)
      |         AS top_share
      |FROM per_doc
      |ORDER BY doc_id""".stripMargin
  /** q143_entropy — per-document Shannon token entropy, the
    * information-density quality signal (low-entropy docs are boilerplate /
    * keyword stuffing; Gopher and its descendants gate on it next to the
    * q128 diversity ratios). H = log2(n) − (Σ c·log2(c))/n over token
    * counts c.
    *
    * Cross-engine determinism: a double Σ c·log2(c) would depend on
    * summation order, which no engine pins. Each TERM is instead rounded
    * to DECIMAL(18,6) — the same double, rounded at the same digit, in
    * both engines — and the decimal sum is exact integer arithmetic in any
    * order. The residual risk (libm log2 differing by 1 ulp exactly at a
    * rounding boundary) is checked empirically by the oracle gate: counts
    * are small integers, so the term domain is tiny and fixed.
    *
    * Scale: one vocabulary-bounded aggregate after a map-side token
    * explode — the same two-level shape as q128; nothing widens with
    * corpus size except the (doc, token) shuffle, which partial
    * aggregation collapses.
    */
  def q143Entropy(spark: SparkSession, sfDir: String): DataFrame =
    tokenEntropy(Tables.documents(spark, sfDir))
      .orderBy(col("doc_id"))

  /** Per-document token entropy core of q143 over any (doc_id, text)
    * frame: exact token counts, the order-free decimal Σ c·log2(c), and
    * the entropy + band derived from them. */
  def tokenEntropy(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_tokens"),
        sum((col("cnt").cast("double") * log2(col("cnt")))
          .cast("decimal(18,6)")).as("sum_clog2_dec"))
      .select(col("doc_id"), col("n_tokens"),
        col("sum_clog2_dec").cast("double").as("sum_clog2"),
        (log2(col("n_tokens")) -
          col("sum_clog2_dec").cast("double") /
            col("n_tokens").cast("double")).as("entropy"))
      .withColumn("band",
        when(col("entropy") >= 3.5, lit("high"))
          .when(col("entropy") >= 2.5, lit("mid"))
          .otherwise(lit("low")))

  val q143Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, tok, count(*) AS cnt
      |  FROM toks WHERE tok <> '' GROUP BY doc_id, tok),
      |per_doc AS (
      |  SELECT doc_id,
      |         CAST(sum(cnt) AS BIGINT) AS n_tokens,
      |         sum(CAST(CAST(cnt AS DOUBLE) * log2(cnt)
      |                  AS DECIMAL(18,6))) AS sum_clog2_dec
      |  FROM tf GROUP BY doc_id),
      |scored AS (
      |  SELECT doc_id, n_tokens,
      |         CAST(sum_clog2_dec AS DOUBLE) AS sum_clog2,
      |         log2(n_tokens) - CAST(sum_clog2_dec AS DOUBLE)
      |                          / CAST(n_tokens AS DOUBLE) AS entropy
      |  FROM per_doc)
      |SELECT doc_id, n_tokens, sum_clog2, entropy,
      |       CASE WHEN entropy >= 3.5 THEN 'high'
      |            WHEN entropy >= 2.5 THEN 'mid'
      |            ELSE 'low' END AS band
      |FROM scored
      |ORDER BY doc_id""".stripMargin

  /** q148_lm_score — unigram language-model scoring: each document's
    * cross-entropy (bits/token) under the corpus unigram distribution,
    * the cheap KenLM-shaped fluency/quality prior curation pipelines
    * attach before an expensive model ever sees the text. A doc of common
    * words scores low (predictable); rare-word soup scores high.
    * H(doc) = −(1/n)·Σ_pos log2(c_tok/N) = log2(N) − (Σ_tok cnt·log2(c_tok))/n.
    *
    * Same order-free determinism as q143: each cnt·log2(c_corpus) term is
    * rounded to DECIMAL(18,6) before the sum. Scale: the vocabulary frame
    * joins into the per-doc term frame UNhinted — AQE broadcasts it at
    * runtime while it fits (Heaps-law sublinear, but unbounded) and
    * shuffles the term-keyed join when a web-scale vocab doesn't; two
    * vocabulary-bounded aggregates, the corpus shuffles once as
    * (doc, token) counts.
    */
  def q148LmScore(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("c_corpus"))
    val total = vocab.agg(sum(col("c_corpus")).as("n_corpus"))
    toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("cnt"))
      // vocabulary-cardinality — unbounded (Heaps-law); AQE sizes it
      .join(vocab, "tok")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_tokens"),
        sum((col("cnt").cast("double") * log2(col("c_corpus")))
          .cast("decimal(18,6)")).as("sum_clogc_dec"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("n_tokens"),
        col("sum_clogc_dec").cast("double").as("sum_clogc"),
        (log2(col("n_corpus")) -
          col("sum_clogc_dec").cast("double") /
            col("n_tokens").cast("double")).as("bits_per_token"))
      .orderBy(col("doc_id"))
  }

  val q148Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |clean AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
      |vocab AS (SELECT tok, count(*) AS c_corpus FROM clean GROUP BY tok),
      |total AS (SELECT CAST(sum(c_corpus) AS BIGINT) AS n_corpus FROM vocab),
      |tf AS (SELECT doc_id, tok, count(*) AS cnt
      |       FROM clean GROUP BY doc_id, tok),
      |per_doc AS (
      |  SELECT tf.doc_id,
      |         CAST(sum(tf.cnt) AS BIGINT) AS n_tokens,
      |         sum(CAST(CAST(tf.cnt AS DOUBLE) * log2(v.c_corpus)
      |                  AS DECIMAL(18,6))) AS sum_clogc_dec
      |  FROM tf JOIN vocab v ON tf.tok = v.tok
      |  GROUP BY tf.doc_id)
      |SELECT doc_id, n_tokens,
      |       CAST(sum_clogc_dec AS DOUBLE) AS sum_clogc,
      |       log2(t.n_corpus) - CAST(sum_clogc_dec AS DOUBLE)
      |                          / CAST(n_tokens AS DOUBLE)
      |         AS bits_per_token
      |FROM per_doc CROSS JOIN total t
      |ORDER BY doc_id""".stripMargin

  /** q237_bigram_lm — bigram language-model cross-entropy per SOURCE:
    * q148's unigram prior upgraded one Markov order. Train add-one-
    * smoothed bigram probabilities on the corpus itself
    * (p(w₂|w₁) = (c₁₂+1)/(c₁+V), c₁ = bigram-prefix count, V = distinct
    * token count), then score each source's token stream:
    * bits/bigram = Σ cnt·(log2(c₁+V) − log2(c₁₂+1)) / n_bigrams. A
    * source whose word SEQUENCES are predictable scores low even when
    * its unigram mix looks normal — the fluency signal unigram scoring
    * cannot see, and the per-source panel is the ingest-stream drift
    * alarm. Determinism: every log2 argument is an exact integer and
    * every product term is rounded ONCE to DECIMAL(18,6) before the
    * exact decimal sum (the q148/q143 rule); the closing division is the
    * only unrounded IEEE op.
    *
    * Scale: gram generation is map-side (carried source column — no
    * join-back); the model is two vocabulary-bounded aggregates; scoring
    * joins the (source, gram) count frame against the bigram/prefix
    * model frames on gram keys — shuffles bounded by |bigram vocab|,
    * never the corpus. V arrives as a broadcast single-row frame. */
  def q237BigramLm(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val grams = Curation.nGrams(
      docs.select(col("doc_id"), col("source"), col("text")), 2,
      carry = Seq("source"))
    val sg = grams.groupBy(col("source"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
    val bg = grams.groupBy(col("gram")).agg(count(lit(1)).as("c12"))
    val c1 = bg
      .select(split(col("gram"), " ").getItem(0).as("w1"), col("c12"))
      .groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val v = docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    val nd = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
    sg
      .join(bg, Seq("gram"))
      .withColumn("w1", split(col("gram"), " ").getItem(0))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(v))
      .select(col("source"), col("cnt"),
        (col("cnt").cast("double") *
          (log2(col("c1") + col("v")) - log2(col("c12") + 1)))
          .cast("decimal(18,6)").as("t_dec"))
      .groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_bigrams"),
        sum(col("t_dec")).as("bits_dec"))
      .join(nd, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_bigrams"),
        col("bits_dec").cast("double").as("sum_bits"),
        (col("bits_dec").cast("double") /
          col("n_bigrams").cast("double")).as("bits_per_bigram"))
      .orderBy(col("source"))
  }

  val q237Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS t
      |  FROM documents),
      |grams AS (
      |  SELECT source, t[i+1] || ' ' || t[i+2] AS gram
      |  FROM toks, UNNEST(range(0, len(t) - 1)) AS u(i)
      |  WHERE len(t) >= 2),
      |sg AS (SELECT source, gram, count(*) AS cnt
      |       FROM grams GROUP BY 1, 2),
      |bg AS (SELECT gram, count(*) AS c12 FROM grams GROUP BY 1),
      |c1 AS (SELECT string_split(gram, ' ')[1] AS w1,
      |              CAST(sum(c12) AS BIGINT) AS c1
      |       FROM bg GROUP BY 1),
      |v AS (SELECT count(DISTINCT tok) AS v
      |      FROM (SELECT unnest(string_split(text, ' ')) AS tok
      |            FROM documents)),
      |nd AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      |       FROM documents GROUP BY 1),
      |terms AS (
      |  SELECT sg.source, sg.cnt,
      |         CAST(CAST(sg.cnt AS DOUBLE) *
      |              (log2(c1.c1 + v.v) - log2(bg.c12 + 1))
      |              AS DECIMAL(18,6)) AS t_dec
      |  FROM sg
      |  JOIN bg ON sg.gram = bg.gram
      |  JOIN c1 ON string_split(sg.gram, ' ')[1] = c1.w1
      |  CROSS JOIN v),
      |per AS (
      |  SELECT source, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
      |         sum(t_dec) AS bits_dec
      |  FROM terms GROUP BY source)
      |SELECT p.source, nd.n_docs, p.n_bigrams,
      |       CAST(p.bits_dec AS DOUBLE) AS sum_bits,
      |       CAST(p.bits_dec AS DOUBLE) / CAST(p.n_bigrams AS DOUBLE)
      |         AS bits_per_bigram
      |FROM per p JOIN nd ON p.source = nd.source
      |ORDER BY p.source""".stripMargin

  /** q238_ccnet_buckets — perplexity bucketing (the CCNet recipe): score
    * every document with the q148 unigram cross-entropy, rank WITHIN its
    * source, and cut each source into head / middle / tail thirds by
    * predictability (head = lowest bits/token ≈ most fluent). Downstream,
    * pretraining keeps head+middle and drops or downweights tail — this
    * query materializes that partition plan with per-bucket volume and
    * score boundaries. Thirds use exact integer quotas (rk·3 ≤ n), ties
    * on (bits, doc_id) — a total order, since the bits double is itself
    * cross-engine deterministic (q148's rounded-decimal discipline).
    *
    * Scale: scoring is q148's shape (vocabulary-bounded shuffles, source
    * and n_chars CARRIED through the per-doc aggregate — never joined
    * back); the rank is a window partitioned by source — thousands of
    * independent partitions; the report is (source × 3) rows. */
  def q238CcnetBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(spark, sfDir)
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
    scored
      .withColumn("rk", row_number().over(
        w.orderBy(col("bits"), col("doc_id"))).cast("long"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("bucket",
        when(col("rk") * 3 <= col("n"), "head")
          .when(col("rk") * 3 <= col("n") * 2, "middle")
          .otherwise("tail"))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        min(col("bits")).as("min_bits"), max(col("bits")).as("max_bits"))
      .orderBy(col("source"), col("bucket"))
  }

  val q238Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, source, n_chars,
      |         unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
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
      |bucketed AS (
      |  SELECT source, n_chars, bits,
      |         CASE WHEN rk * 3 <= n THEN 'head'
      |              WHEN rk * 3 <= n * 2 THEN 'middle'
      |              ELSE 'tail' END AS bucket
      |  FROM ranked)
      |SELECT source, bucket, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |       min(bits) AS min_bits, max(bits) AS max_bits
      |FROM bucketed GROUP BY source, bucket
      |ORDER BY source, bucket""".stripMargin

  /** q137_inverted_index — posting-list construction, the retrieval-side
    * twin of q56's TF-IDF: per (term, doc) the ordered position list and
    * term frequency, rolled up per term with document frequency, corpus
    * frequency, and the best document (max tf, ties to the lower doc_id —
    * the packed-key q118 trick, negated id so arg-MAX prefers SMALLER
    * ids). Positions make the index phrase-query-capable.
    *
    * Determinism: position arrays are sorted INSIDE the aggregate value
    * (array_sort after collect_list — arrival order never shows);
    * everything else is exact counts. Scale: one shuffle to (term, doc),
    * one to term; posting lists bound per-row payload by per-doc tf, and
    * a production index would bucket by term prefix — the shuffle shape
    * is already the right one.
    */
  def q137InvertedIndex(spark: SparkSession, sfDir: String): DataFrame = {
    val pos = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
      .filter(col("term") =!= "")
    val postings = pos.groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"),
        array_sort(collect_list(col("pos"))).as("positions"))
    val df = postings.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    postings.join(df, "term")
      .select(col("term"), col("df"), col("doc_id"), col("tf"),
        // serialized posting list: the driver's comparator hashes scalar
        // cells, so the ordered positions ship as a canonical CSV string
        concat_ws(",", col("positions")).as("positions"))
      .orderBy(col("term"), col("doc_id"))
  }

  val q137Sql: String =
    """WITH pos AS (
      |  SELECT doc_id, t.tok AS term,
      |         CAST(t.i - 1 AS INT) AS pos
      |  FROM documents,
      |       LATERAL (SELECT unnest(string_split(text, ' ')) AS tok,
      |                       generate_subscripts(string_split(text, ' '), 1)
      |                         AS i) t
      |  WHERE t.tok <> ''),
      |postings AS (
      |  SELECT term, doc_id, count(*) AS tf,
      |         list_sort(list(pos)) AS positions
      |  FROM pos GROUP BY term, doc_id),
      |dfreq AS (SELECT term, count(*) AS df FROM postings GROUP BY term)
      |SELECT p.term, d.df, p.doc_id, p.tf,
      |       array_to_string(p.positions, ',') AS positions
      |FROM postings p JOIN dfreq d ON p.term = d.term
      |ORDER BY p.term, p.doc_id""".stripMargin

  /** q138_cooccur — windowed co-occurrence counts (the word2vec/GloVe
    * training-pair extraction): for every token, its neighbors within ±2
    * positions, counted per ordered (center, context) pair with the lift
    * ratio against independence — integer cross-products and one final
    * division, never a log (q102's adjacent-bigram collocations are the
    * distance-1 slice of this).
    *
    * Scale: the self-join is on (doc, pos±k) — position-keyed, so each
    * token meets ≤ 2k rows; shuffle volume is 2k × corpus tokens with
    * map-side combine on the pair key.
    */
  def q138Cooccur(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .filter(col("tok") =!= "")
      .localCheckpoint()
    // explicit aliases: both join inputs descend from the same
    // checkpointed frame, and unqualified doc_id would be ambiguous
    val pairs = toks.as("a")
      .join(toks.as("b"),
        expr("a.doc_id = b.doc_id AND b.pos <> a.pos " +
          "AND b.pos >= a.pos - 2 AND b.pos <= a.pos + 2"))
      .groupBy(col("a.tok").as("center"), col("b.tok").as("context"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= 100)
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("n_tok"))
    val n = toks.count()
    pairs
      .join(freq.select(col("tok").as("center"), col("n_tok").as("n_c")),
        Seq("center"))
      .join(freq.select(col("tok").as("context"), col("n_tok").as("n_x")),
        Seq("context"))
      .select(col("center"), col("context"), col("n_pair"),
        ((col("n_pair") * n).cast("double") /
          (col("n_c") * col("n_x") * lit(4L)).cast("double")).as("lift"))
      .orderBy(col("center"), col("context"))
  }

  val q138Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, t.tok,
      |         CAST(t.i - 1 AS INT) AS pos
      |  FROM documents,
      |       LATERAL (SELECT unnest(string_split(text, ' ')) AS tok,
      |                       generate_subscripts(string_split(text, ' '), 1)
      |                         AS i) t
      |  WHERE t.tok <> ''),
      |pairs AS (
      |  SELECT a.tok AS center, b.tok AS context, count(*) AS n_pair
      |  FROM toks a JOIN toks b
      |    ON a.doc_id = b.doc_id AND b.pos <> a.pos
      |   AND b.pos >= a.pos - 2 AND b.pos <= a.pos + 2
      |  GROUP BY 1, 2 HAVING count(*) >= 100),
      |freq AS (SELECT tok, count(*) AS n_tok FROM toks GROUP BY tok),
      |n AS (SELECT count(*) AS total FROM toks)
      |SELECT center, context, n_pair,
      |       CAST(n_pair * n.total AS DOUBLE) /
      |         CAST(fc.n_tok * fx.n_tok * 4 AS DOUBLE) AS lift
      |FROM pairs
      |JOIN freq fc ON fc.tok = center
      |JOIN freq fx ON fx.tok = context
      |CROSS JOIN n
      |ORDER BY center, context""".stripMargin

  // ---------------------------------------------------- vocabulary growth

  /** Batch width for q167: the corpus is consumed in doc_id order in
    * batches of 50 documents. */
  private val VocabBatch = 50L

  /** q167_vocab_growth — Heaps'-law audit: consume the corpus in doc_id
    * order in fixed batches and report, per batch, token occurrences, the
    * number of NEW vocabulary types (tokens whose first corpus occurrence
    * falls in the batch), and the running vocabulary size. A flattening
    * new-type curve is the signal that a crawl has saturated its domain —
    * the corpus-level counterpart to q65's per-document novelty.
    *
    * Scale: a type's first batch is `min(doc_id) div B` — one token-keyed
    * aggregate with map-side partial min (hot tokens collapse before the
    * exchange), then a batch-cardinality count. The running total is a
    * window over the batch axis — tens of rows at any corpus size, so the
    * unpartitioned window is a non-issue (it never sees row-level data). */
  def q167VocabGrowth(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .withColumn("batch", expr(s"doc_id div $VocabBatch"))
    val occ = toks.groupBy(col("batch"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))
    val firsts = toks.groupBy(col("tok"))
      .agg(min(col("batch")).as("first_batch"))
      .groupBy(col("first_batch").as("batch"))
      .agg(count(lit(1)).as("n_new_types"))
    occ.join(firsts, Seq("batch"), "left")
      .select(col("batch"), col("n_docs"), col("n_occurrences"),
        coalesce(col("n_new_types"), lit(0L)).as("n_new_types"))
      .withColumn("vocab_size",
        sum(col("n_new_types")).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("batch"))
            .rowsBetween(org.apache.spark.sql.expressions.Window
              .unboundedPreceding, 0)))
      .orderBy(col("batch"))
  }

  val q167Sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, doc_id // $VocabBatch AS batch,
       |         unnest(string_split(text, ' ')) AS tok
       |  FROM documents),
       |tf AS (SELECT * FROM toks WHERE tok <> ''),
       |occ AS (
       |  SELECT batch, count(*) AS n_occurrences,
       |         count(DISTINCT doc_id) AS n_docs
       |  FROM tf GROUP BY batch),
       |firsts AS (
       |  SELECT first_batch AS batch, count(*) AS n_new_types FROM (
       |    SELECT tok, min(batch) AS first_batch FROM tf GROUP BY tok)
       |  GROUP BY first_batch),
       |j AS (
       |  SELECT o.batch, o.n_docs, o.n_occurrences,
       |         coalesce(f.n_new_types, 0) AS n_new_types
       |  FROM occ o LEFT JOIN firsts f ON f.batch = o.batch)
       |SELECT batch, n_docs, n_occurrences, n_new_types,
       |       CAST(sum(n_new_types) OVER (ORDER BY batch
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |         AS BIGINT) AS vocab_size
       |FROM j ORDER BY batch""".stripMargin

  /** q180_bpe_pairs — the counting step of byte-pair-encoding tokenizer
    * training: corpus-weighted frequencies of ADJACENT character pairs
    * within words (the quantity whose argmax BPE merges each round —
    * Sennrich et al.'s merge-candidate table; q102's collocations are the
    * cross-word analogue). Reports the top 30 merge candidates with
    * corpus weight (Σ word-frequency over occurrences, counting repeats
    * within a word) and distinct-word support. All-integer output.
    *
    * Scale: the fact-sized corpus collapses to the DISTINCT word-frequency
    * table first (vocabulary-bounded hash aggregate, map-side combine);
    * pair explosion then runs over the vocabulary — corpus length never
    * reaches the explode. Final top-30 is TakeOrderedAndProject. */
  def q180BpePairs(spark: SparkSession, sfDir: String): DataFrame = {
    val words = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    words
      .select(col("word"), col("freq"),
        explode(sequence(lit(1), length(col("word")) - 1)).as("i"))
      .select(expr("substring(word, i, 2)").as("pair"), col("word"),
        col("freq"))
      .groupBy(col("pair"))
      .agg(sum(col("freq")).as("weight"),
        countDistinct(col("word")).as("n_words"))
      .orderBy(desc("weight"), col("pair"))
      .limit(30)
  }

  val q180Sql: String =
    """WITH words AS (
      |  SELECT word, CAST(count(*) AS BIGINT) AS freq
      |  FROM (SELECT unnest(string_split(text, ' ')) AS word
      |        FROM documents)
      |  WHERE len(word) >= 2 GROUP BY word),
      |pairs AS (
      |  SELECT substr(word, i, 2) AS pair, word, freq
      |  FROM (SELECT word, freq, unnest(range(1, len(word))) AS i
      |        FROM words)),
      |agg AS (
      |  SELECT pair, CAST(sum(freq) AS BIGINT) AS weight,
      |         CAST(count(DISTINCT word) AS BIGINT) AS n_words
      |  FROM pairs GROUP BY pair)
      |SELECT pair, weight, n_words FROM agg
      |ORDER BY weight DESC, pair LIMIT 30""".stripMargin

  /** q186_langid_confusion — the audit that closes q52's loop: the
    * confusion matrix of the n-gram language identifier against the
    * labeled `lang` column, with per-cell share of the actual class and
    * per-actual-language recall. The readout that tells a corpus curator
    * WHERE the cheap classifier mislabels (which language pairs bleed)
    * before they gate millions of documents on it. All counts exact;
    * shares are single IEEE divisions.
    *
    * Scale: rides q52's map-side scoring (built-in string expressions,
    * no UDF), then one (actual, pred)-cardinality aggregate — at most
    * |langs|² cells regardless of corpus size. */
  def q186LangidConfusion(spark: SparkSession, sfDir: String): DataFrame = {
    val pred = withLangScores(Tables.documents(spark, sfDir))
      .select(col("lang").as("actual_lang"),
        langPredCol.as("pred_lang"))
    val cells = pred.groupBy(col("actual_lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // |langs|² rows; feeds totals + output
    val totals = cells.groupBy(col("actual_lang"))
      .agg(sum(col("n")).as("n_actual"))
    cells.join(broadcast(totals), "actual_lang")
      .select(col("actual_lang"), col("pred_lang"), col("n"),
        col("n_actual"),
        (col("n").cast("double") / col("n_actual").cast("double"))
          .as("share"),
        (col("actual_lang") === col("pred_lang")).as("is_correct"))
      .orderBy(col("actual_lang"), col("pred_lang"))
  }

  val q186Sql: String = {
    val scoreExprs = langScoreSqlExprs
    val caseExpr = langCaseSql
    s"""WITH scored AS (
       |  SELECT lang AS actual_lang, $scoreExprs
       |  FROM documents),
       |pred AS (
       |  SELECT actual_lang, $caseExpr AS pred_lang FROM scored),
       |cells AS (
       |  SELECT actual_lang, pred_lang, CAST(count(*) AS BIGINT) AS n
       |  FROM pred GROUP BY 1, 2),
       |totals AS (
       |  SELECT actual_lang, CAST(sum(n) AS BIGINT) AS n_actual
       |  FROM cells GROUP BY 1)
       |SELECT c.actual_lang, c.pred_lang, c.n, t.n_actual,
       |       CAST(c.n AS DOUBLE) / CAST(t.n_actual AS DOUBLE) AS share,
       |       c.actual_lang = c.pred_lang AS is_correct
       |FROM cells c JOIN totals t USING (actual_lang)
       |ORDER BY c.actual_lang, c.pred_lang""".stripMargin
  }

  /** q197_normalize — the canonical text-normalization map stage every
    * corpus runs before hashing/dedup/tokenization: lowercase, strip
    * non-alphanumerics to spaces, collapse runs of whitespace, trim.
    * Reported with before/after lengths and a changed flag so the
    * downstream dedup keys (q36/q55) can be re-derived from the
    * normalized form. Pure codegen'd string expressions (lower,
    * regexp_replace ×2, trim) — map-side, no shuffle, no UDF; the RE2-
    * safe patterns are shared verbatim with the oracle.
    *
    * Scale: embarrassingly parallel row-local work; the only shuffle is
    * the determinism orderBy. */
  def q197Normalize(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .withColumn("norm",
        trim(regexp_replace(regexp_replace(lower(col("text")),
          "[^a-z0-9 ]", " "), " +", " ")))
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_before"),
        length(col("norm")).cast("long").as("n_after"),
        (col("norm") =!= col("text")).as("changed"),
        col("norm"))
      .orderBy(col("doc_id"))

  val q197Sql: String =
    """SELECT doc_id,
      |       CAST(len(text) AS BIGINT) AS n_before,
      |       CAST(len(trim(regexp_replace(regexp_replace(lower(text),
      |         '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS BIGINT)
      |         AS n_after,
      |       trim(regexp_replace(regexp_replace(lower(text),
      |         '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) <> text
      |         AS changed,
      |       trim(regexp_replace(regexp_replace(lower(text),
      |         '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------- BPE trainer

  /** Merge rounds the trainer unrolls (and the oracle replays as generated
    * CTEs — the q201 pattern for data-independent loops). */
  val BpeRounds = 3

  /** Token separator inside the tokenization state string. Tokens are
    * concatenations of corpus characters and never contain it, so a merge
    * pattern `a SEP b` can only match at a real token boundary. */
  private val BpeSep = "\u0001"

  /** q225_bpe_train — [[BpeRounds]] rounds of byte-pair-encoding tokenizer
    * TRAINING (q180 counts the initial pair frequencies; this actually
    * learns the merge table): per round, count adjacent token pairs across
    * the corpus, adopt the most frequent pair (ties broken lexicographically
    * — fully deterministic), and re-tokenize. Returns the learned merges —
    * the artifact a tokenizer ships.
    *
    * Two representation choices make this Spark-first and oracle-exact:
    *
    *  1. The corpus collapses to its WORD HISTOGRAM before any round (the
    *     trick every production BPE trainer uses): iteration cost scales
    *     with vocabulary, not corpus — at 100 TB the histogram is one
    *     map-side-combinable aggregate and everything after is
    *     vocab-cardinality.
    *  2. Tokenization state is the word string with [[BpeSep]] between
    *     tokens, so "merge pair (a,b) everywhere, leftmost-first" is plain
    *     `replace(state, a‖SEP‖b, a‖b)` — left-to-right non-overlapping
    *     replacement IS the BPE merge rule, identical in both engines, and
    *     no list-fold machinery is needed.
    *
    * Per round: one narrow explode of the vocab-sized state frame, one
    * pair-count hash aggregate (map-side combine), a 1-row TakeOrdered
    * argmax broadcast back, and a codegen'd replace. State is checkpointed
    * per round — the standard iterative-lineage discipline. */
  def q225BpeTrain(spark: SparkSession, sfDir: String): DataFrame = {
    val (merges, _) = bpeTrainLoop(Tables.documents(spark, sfDir))
    merges.reduce(_.unionByName(_)).orderBy(col("round"))
  }

  /** The trainer loop shared by q225 (returns the merge table) and q226
    * (returns the fully-merged per-word state = the ENCODE of every word
    * under the learned merges — BPE encoding applies the merges in learned
    * order, which is exactly the state the trainer left behind). */
  private def bpeTrainLoop(docs: DataFrame): (Seq[DataFrame], DataFrame) = {
    import graft.ops.Checkpoints.CutOps
    val words = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
    var state = words.select(col("word"),
      concat_ws(BpeSep, filter(split(col("word"), ""), t => t =!= ""))
        .as("state"), col("n"))
      .cutLineage()
    val merges = (1 to BpeRounds).map { r =>
      val t = split(col("state"), BpeSep)
      val m = greatest(size(t) - 1, lit(0))
      val pairs = state
        .select(col("n"), explode(arrays_zip(
          slice(t, lit(1), m).as("a"), slice(t, lit(2), m).as("b"))).as("z"))
        .select(concat(col("z.a"), lit(BpeSep), col("z.b")).as("pair"),
          col("n"))
        .groupBy(col("pair")).agg(sum(col("n")).as("pair_count"))
      val top = pairs.orderBy(desc("pair_count"), col("pair")).limit(1)
        .cutLineage()
      state = state.crossJoin(broadcast(top.select(col("pair"))))
        .select(col("word"), call_function("replace", col("state"),
          col("pair"), translate(col("pair"), BpeSep, "")).as("state"),
          col("n"))
        .cutLineage()
      top.select(lit(r).as("round"),
        element_at(split(col("pair"), BpeSep), 1).as("tok_a"),
        element_at(split(col("pair"), BpeSep), 2).as("tok_b"),
        translate(col("pair"), BpeSep, "").as("merged"),
        col("pair_count"))
    }
    (merges, state)
  }

  /** q226_bpe_encode — ENCODE the corpus with the q225-learned merges and
    * report per-source tokenizer fertility (BPE tokens per whitespace word)
    * and compression (chars per BPE token) — the readout that tells a
    * data-mix designer which sources are token-expensive under a given
    * tokenizer. Encoding rides the trainer's final state: applying the
    * merge table in learned order to a word IS the state the trainer left,
    * so the encode step is a vocab-cardinality lookup, not a re-merge of
    * the corpus.
    *
    * Scale: the corpus-side cost is one word explode; the join against the
    * vocab-sized encode map is left unhinted (AQE broadcasts it at fixture
    * scale; a 100 TB vocabulary shuffles on the word key). */
  def q226BpeEncode(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val (_, st) = bpeTrainLoop(docs)
    val enc = st.select(col("word"),
      size(split(col("state"), BpeSep)).cast("long").as("n_tok"),
      length(col("word")).cast("long").as("n_chr"))
    docs.select(col("source"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .join(enc, "word")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_tok")).as("n_bpe_tokens"),
        sum(col("n_chr")).as("n_chars"))
      .select(col("source"), col("n_words"), col("n_bpe_tokens"),
        col("n_chars"),
        (col("n_bpe_tokens").cast("double") / col("n_words").cast("double"))
          .as("fertility"),
        (col("n_chars").cast("double") / col("n_bpe_tokens").cast("double"))
          .as("chars_per_token"))
      .orderBy(col("source"))
  }

  /** Generated oracle for q225: the same word histogram, then per round a
    * pair-count CTE, a LIMIT-1 argmax with the identical (count DESC,
    * pair ASC) tie-break (BpeSep sorts below every corpus character in both
    * engines' binary collation, so pair-string order equals (a, b) order),
    * and a replace-based re-tokenization. */
  /** The trainer CTE chain shared by [[q225Sql]] and [[q226Sql]]: word
    * histogram, initial state, then per round (pair counts, argmax, merged
    * state) — state CTEs carry the word for the encode join. */
  private def bpeSqlCtes: String = {
    val rounds = (1 to BpeRounds).map { r =>
      s"""p$r AS (
         |  SELECT pair, CAST(sum(n) AS BIGINT) AS pair_count
         |  FROM (SELECT unnest(list_transform(range(1, len(t)),
         |               i -> t[i] || chr(1) || t[i+1])) AS pair, n
         |        FROM (SELECT string_split(state, chr(1)) AS t, n
         |              FROM s${r - 1}))
         |  GROUP BY pair),
         |m$r AS (SELECT pair, pair_count FROM p$r
         |        ORDER BY pair_count DESC, pair LIMIT 1),
         |s$r AS (SELECT s.word, replace(s.state, m.pair,
         |                       replace(m.pair, chr(1), '')) AS state, s.n
         |        FROM s${r - 1} s, m$r m)""".stripMargin
    }.mkString(",\n")
    s"""w AS (
       |  SELECT word, CAST(count(*) AS BIGINT) AS n
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |  WHERE word <> '' GROUP BY word),
       |s0 AS (SELECT word,
       |              array_to_string(string_split(word, ''), chr(1)) AS state,
       |              n
       |       FROM w),
       |$rounds""".stripMargin
  }

  val q225Sql: String = {
    val union = (1 to BpeRounds).map { r =>
      s"""SELECT $r AS round,
         |  string_split(pair, chr(1))[1] AS tok_a,
         |  string_split(pair, chr(1))[2] AS tok_b,
         |  replace(pair, chr(1), '') AS merged, pair_count FROM m$r""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $bpeSqlCtes
       |$union
       |ORDER BY round""".stripMargin
  }

  val q226Sql: String =
    s"""WITH $bpeSqlCtes,
       |enc AS (
       |  SELECT word,
       |         CAST(len(string_split(state, chr(1))) AS BIGINT) AS n_tok,
       |         CAST(len(word) AS BIGINT) AS n_chr
       |  FROM s$BpeRounds),
       |dw AS (
       |  SELECT source, unnest(string_split(text, ' ')) AS word
       |  FROM documents),
       |agg AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_words,
       |         CAST(sum(n_tok) AS BIGINT) AS n_bpe_tokens,
       |         CAST(sum(n_chr) AS BIGINT) AS n_chars
       |  FROM dw JOIN enc USING (word)
       |  WHERE word <> '' GROUP BY source)
       |SELECT source, n_words, n_bpe_tokens, n_chars,
       |       CAST(n_bpe_tokens AS DOUBLE) / CAST(n_words AS DOUBLE)
       |         AS fertility,
       |       CAST(n_chars AS DOUBLE) / CAST(n_bpe_tokens AS DOUBLE)
       |         AS chars_per_token
       |FROM agg ORDER BY source""".stripMargin

  // -------------------------------------------- q266 vocab coverage

  /** Requested vocabulary sizes for the q266 coverage curve; the largest
    * exceeds the fixture's 31-term vocabulary on purpose so the clamp
    * path (k_eff < vocab_k) is exercised by the oracle. */
  val CoverageKs: Seq[Long] = Seq(1L, 2L, 4L, 8L, 16L, 32L)

  /** q266_vocab_coverage — the tokenizer-budget readout: for each
    * candidate vocabulary size K, what fraction of all corpus tokens
    * would a top-K (by frequency) vocabulary cover? Terms are ranked by
    * (frequency desc, term); the coverage at K is the cumulative token
    * count through rank K, clamped to the actual vocabulary size.
    * Emitted as exact integers (covered/total) — the consumer divides.
    *
    * Scale: the term-frequency table is vocabulary-cardinality, and web
    * vocabularies GROW with the corpus (Heaps' law — hundreds of
    * millions of distinct terms at 100 TB), so the rank and the running
    * sum both run distributed: [[Scale.globalRank]] +
    * [[Scale.globalCumSum]] over (freq desc, term), never a
    * single-partition `Window.orderBy`. The K probe table is 6 constant
    * rows crossed with a 1-row total frame — broadcast by hint, the
    * allowed constant-cardinality shape. */
  def q266VocabCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    val freq = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    val order = Seq(col("c").desc, col("term"))
    val ranked = Scale.globalCumSum(Scale.globalRank(freq, order),
      order, Seq("c" -> "covered_tokens"))
      .select((col("rank_idx") + 1L).as("r"), col("covered_tokens"))
    val tot = freq.agg(sum(col("c")).as("total_tokens"),
      count(lit(1)).as("vocab_size"))
    import spark.implicits._
    val ks = CoverageKs.toDF("vocab_k")
    ks.crossJoin(broadcast(tot))
      .withColumn("k_eff", least(col("vocab_k"), col("vocab_size")))
      .join(ranked, col("k_eff") === col("r"))
      .select(col("vocab_k"), col("k_eff"), col("covered_tokens"),
        col("total_tokens"))
      .orderBy(col("vocab_k"))
  }

  val q266Sql: String =
    s"""WITH tok AS (
       |  SELECT unnest(string_split(text, ' ')) AS term FROM documents),
       |freq AS (
       |  SELECT term, count(*) AS c FROM tok WHERE term <> '' GROUP BY 1),
       |ranked AS (
       |  SELECT term, c,
       |         row_number() OVER (ORDER BY c DESC, term) AS r,
       |         CAST(sum(c) OVER (ORDER BY c DESC, term
       |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |           AS BIGINT) AS covered_tokens
       |  FROM freq),
       |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total_tokens,
       |               count(*) AS vocab_size FROM freq),
       |ks AS (SELECT CAST(unnest([${CoverageKs.mkString(", ")}]) AS BIGINT)
       |         AS vocab_k)
       |SELECT ks.vocab_k, least(ks.vocab_k, tot.vocab_size) AS k_eff,
       |       r.covered_tokens, tot.total_tokens
       |FROM ks CROSS JOIN tot
       |JOIN ranked r ON r.r = least(ks.vocab_k, tot.vocab_size)
       |ORDER BY ks.vocab_k""".stripMargin
}
