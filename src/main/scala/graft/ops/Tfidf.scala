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
  *    (it usually does — Heaps' law) AQE's runtime sizing turns it
  *    map-side — the frame is deliberately unhinted, since "usually" is
  *    not a bound and a forced broadcast of a web-scale vocab pins the
  *    driver.
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

  /** q151_bm25 — BM25 "more-like-this" retrieval: score every document
    * against the terms of a fixed query document and return the top 50.
    * This is the ranking function production search (Lucene/Elasticsearch)
    * actually runs on top of a q137-style inverted index.
    *
    * Cross-engine exactness, term by term:
    *  - idf = log2((N−df+0.5)/(df+0.5)), doubled through to integers as
    *    log2(2N−2df+1) − log2(2df+1) and rounded once to DECIMAL(18,6)
    *    (the q143 pattern; log2 replaces ln — a constant 1/ln2 scaling
    *    that preserves BM25's ranking; classic negative idf for
    *    df > N/2 terms is kept, not clamped).
    *  - The tf saturation (k1=1.2, b=0.75) clears its fractions by
    *    multiplying through by 10·TL: tf_norm = 22·tf·TL /
    *    (10·TL·tf + 3·TL + 9·dl·N) — exact BIGINT numerator and
    *    denominator, ONE IEEE division.
    *  - Per-term scores round to DECIMAL(18,6) so the per-doc sum is
    *    order-free.
    *
    * Scale: the query-term set (one doc's tokens — bounded) broadcasts
    * into the tf frame; doc-frequency (vocabulary-cardinality) and doc
    * lengths (doc-cardinality) are UNhinted — AQE broadcasts them at
    * runtime while they fit and shuffles those joins at corpus scale;
    * the corpus shuffles once into (doc, term) counts; the global
    * top-50 is TakeOrderedAndProject. */
  def q151Bm25(spark: SparkSession, sfDir: String,
      queryDoc: Long = 7L, k: Int = 50): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val tf = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tl"))
    val qterms = tf.filter(col("doc_id") === queryDoc)
      .select(col("tok")).distinct()
    // qterms is one document's token set — bounded by doc length, hint
    // it. dfreq is vocabulary-cardinality (Heaps-law sublinear but
    // unbounded) and dl is doc-cardinality (linear): both stay unhinted
    // so AQE sizes them at runtime — at the 100 TB point a web-scale
    // vocab or a billions-row doc-length frame must shuffle, not pin
    // the driver. (The qterms semi-filter also shrinks what of dfreq/dl
    // survives to the join, which AQE sees and a static hint cannot.)
    val scored = tf.filter(col("doc_id") =!= queryDoc)
      .join(broadcast(qterms), "tok")
      .join(dfreq, "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf_dec",
        (log2((lit(2) * col("n_docs") - lit(2) * col("df") + 1)
          .cast("double")) -
          log2((lit(2) * col("df") + 1).cast("double")))
          .cast("decimal(18,6)"))
      .withColumn("tf_norm",
        (lit(22) * col("tf") * col("tl")).cast("double") /
          (lit(10) * col("tl") * col("tf") + lit(3) * col("tl") +
            lit(9) * col("dl") * col("n_docs")).cast("double"))
      .withColumn("term_score",
        (col("idf_dec").cast("double") * col("tf_norm"))
          .cast("decimal(18,6)"))
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_match"), max(col("dl")).as("dl"),
        sum(col("term_score")).cast("double").as("score"))
      .orderBy(desc("score"), col("doc_id"))
      .limit(k)
  }

  val q151Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |tf AS (SELECT doc_id, tok, count(*) AS tf
      |       FROM toks WHERE tok <> '' GROUP BY doc_id, tok),
      |dl AS (SELECT doc_id, count(*) AS dl
      |       FROM toks WHERE tok <> '' GROUP BY doc_id),
      |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
      |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |                 CAST(sum(dl) AS BIGINT) AS tl FROM dl),
      |qterms AS (SELECT DISTINCT tok FROM tf WHERE doc_id = 7),
      |scored AS (
      |  SELECT tf.doc_id,
      |         CAST(CAST(22 * tf.tf * s.tl AS DOUBLE) /
      |              CAST(10 * s.tl * tf.tf + 3 * s.tl
      |                   + 9 * dl.dl * s.n_docs AS DOUBLE)
      |              * CAST(CAST(log2(CAST(2 * s.n_docs - 2 * f.df + 1
      |                                     AS DOUBLE))
      |                          - log2(CAST(2 * f.df + 1 AS DOUBLE))
      |                          AS DECIMAL(18,6)) AS DOUBLE)
      |              AS DECIMAL(18,6)) AS term_score,
      |         dl.dl
      |  FROM tf
      |  JOIN qterms q ON tf.tok = q.tok
      |  JOIN dfreq f ON tf.tok = f.tok
      |  JOIN dl ON tf.doc_id = dl.doc_id
      |  CROSS JOIN stats s
      |  WHERE tf.doc_id <> 7)
      |SELECT doc_id, count(*) AS n_match, max(dl) AS dl,
      |       CAST(sum(term_score) AS DOUBLE) AS score
      |FROM scored GROUP BY doc_id
      |ORDER BY score DESC, doc_id
      |LIMIT 50""".stripMargin

  /** q176_rrf — reciprocal-rank fusion of the lexical (BM25, q151) and
    * vector (exact cosine over the doc's embedding, the q75 kernel)
    * retrieval lists for the same query document: the standard hybrid-
    * search combiner (Cormack et al.), rrf(d) = Σ_lists 1/(60+rank_d).
    * Each list contributes its top 50; docs missing from a list simply
    * lack that term. Per-list terms are rounded once to DECIMAL(18,6)
    * (the proven q143/q148/q151 boundary) so the two-term sum is exact;
    * ranks themselves are integers from already-hash-checked orderings
    * (BM25 decimal scores; cosine rounded to 4dp — the q75 contract).
    *
    * Scale: both lists end in TakeOrderedAndProject(50) before the fuse,
    * so the full-outer join and re-rank run on ≤100 rows regardless of
    * corpus size; the heavy stages are exactly q151's and q75's, both
    * already scale-audited. */
  def q176Rrf(spark: SparkSession, sfDir: String,
      queryDoc: Long = 7L): DataFrame = {
    val lex = q151Bm25(spark, sfDir, queryDoc)
      .select(col("doc_id"),
        row_number().over(Window.orderBy(desc("score"), col("doc_id")))
          .as("rank_lex"))
    val e = Tables.embeddings(spark, sfDir)
    val qv = e.filter(col("vec_id") === queryDoc)
      .select(col("embedding").as("q_emb"))
    val vec = e.filter(col("vec_id") =!= queryDoc)
      .crossJoin(broadcast(qv))
      .select(col("vec_id").as("doc_id"),
        round(Similarity.cosine(col("q_emb"), col("embedding")), 4)
          .as("cos_sim"))
      .orderBy(desc("cos_sim"), col("doc_id")).limit(50)
      .select(col("doc_id"),
        row_number().over(Window.orderBy(desc("cos_sim"), col("doc_id")))
          .as("rank_vec"))
    lex.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("rank_lex"), col("rank_vec"),
        (coalesce((lit(1.0) / (lit(60) + col("rank_lex")))
            .cast("decimal(18,6)"), lit(BigDecimal(0)).cast("decimal(18,6)"))
          + coalesce((lit(1.0) / (lit(60) + col("rank_vec")))
            .cast("decimal(18,6)"), lit(BigDecimal(0)).cast("decimal(18,6)")))
          .cast("double").as("rrf"))
      .orderBy(desc("rrf"), col("doc_id"))
      .limit(20)
  }

  val q176Sql: String =
    s"""WITH lex AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id)
       |           AS rank_lex
       |  FROM ($q151Sql)),
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 7),
       |p AS (
       |  SELECT e.vec_id AS doc_id,
       |         unnest(e.embedding)::DOUBLE AS x, unnest(q.qe)::DOUBLE AS y
       |  FROM embeddings e, q WHERE e.vec_id <> 7),
       |s AS (
       |  SELECT doc_id,
       |         round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 4)
       |           AS cos_sim
       |  FROM p GROUP BY doc_id),
       |vec AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY cos_sim DESC, doc_id)
       |           AS rank_vec
       |  FROM (SELECT * FROM s ORDER BY cos_sim DESC, doc_id LIMIT 50)),
       |fused AS (
       |  SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
       |         l.rank_lex, v.rank_vec,
       |         CAST(coalesce(CAST(CAST(1.0 AS DOUBLE) / (60 + l.rank_lex)
       |                            AS DECIMAL(18,6)), 0)
       |            + coalesce(CAST(CAST(1.0 AS DOUBLE) / (60 + v.rank_vec)
       |                            AS DECIMAL(18,6)), 0) AS DOUBLE) AS rrf
       |  FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id)
       |SELECT doc_id, rank_lex, rank_vec, rrf
       |FROM fused ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin

  /** Document-frequency band for q184's candidate generation: features
    * must appear in [2, DfCap] documents to generate pairs. df=1 features
    * cannot pair; high-df features contribute little tf-idf weight yet
    * dominate the self-join's fan-out (a df-d feature emits d² pairs).
    * The cap bounds the join at Σ df² ≤ DfCap·Σ df — linear in corpus
    * size, the standard prefix-filter compromise every sparse-similarity
    * system makes. The features are word BIGRAMS: the fixture's unigram
    * vocabulary is ~31 tokens at df ≈ 75% (no sparse signal at all),
    * while its ~900 bigram types spread over df 1..46 — the same reason
    * production near-dup/similarity systems shingle before indexing. */
  val SparseKnnDfCap = 100

  /** q184_sparse_knn — all-documents "more-like-this": top-3 nearest
    * neighbors per document under tf-idf cosine, computed in the
    * df-banded feature space (see [[SparseKnnDfCap]]) via an
    * inverted-index self-join — the sparse-vector sibling of the dense
    * ANN stack (q74/q75/q76), and the engine behind related-content
    * recommendation over corpora.
    *
    * Exactness: per-term pair products tf_a·tf_b·(N/df)² and norm terms
    * (tf·N/df)² are rounded once to DECIMAL(18,6) (products of exact
    * ints with one IEEE division and square — identical shape in both
    * engines), summed exactly; the final cosine is rounded to 4dp (the
    * q75 contract) before ranking with a total tie-break.
    *
    * Scale: the corpus collapses to the (doc, term) tf table once
    * (localCheckpoint'd — feeds df, norms, and both join sides); the
    * pair join's fan-out is df-bounded; everything downstream is
    * pair-cardinality. No row-scaled window: the top-3 partitions by
    * doc over its candidate list only. */
  def q184SparseKnn(spark: SparkSession, sfDir: String,
      k: Int = 3): DataFrame = {
    // bigram features via posexplode + lead (the row-stream shingle form —
    // HOF lambdas are interpreted per element and measurably slower)
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .filter(col("tok") =!= "")
    val nxt = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val tf = toks
      .withColumn("tok2", lead(col("tok"), 1).over(nxt))
      .filter(col("tok2").isNotNull)
      .select(col("doc_id"),
        concat_ws(" ", col("tok"), col("tok2")).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint() // feeds df, norms, and both pair-join sides
    val n = Tables.documents(spark, sfDir)
      .agg(count(lit(1)).as("n"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= SparseKnnDfCap)
    val banded = tf.join(broadcast(dfreq), "tok")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("tok"), col("tf"), col("df"), col("n"),
        (col("n").cast("double") / col("df").cast("double")).as("idf"))
      .localCheckpoint() // banded features; feeds norms + both sides
    val norms = banded
      .groupBy(col("doc_id"))
      .agg(sum(((col("tf") * col("tf")).cast("double") *
        col("idf") * col("idf")).cast("decimal(18,6)")).as("norm_sq"))
      .select(col("doc_id"),
        sqrt(col("norm_sq").cast("double")).as("norm"))
    val a = banded.select(col("tok"), col("doc_id").as("a"),
      col("tf").as("tf_a"), col("idf"))
    val b = banded.select(col("tok"), col("doc_id").as("b"),
      col("tf").as("tf_b"))
    val pairs = a.join(b, Seq("tok")).filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(sum(((col("tf_a") * col("tf_b")).cast("double") *
        (col("idf") * col("idf"))).cast("decimal(18,6)")).as("num_dec"),
        count(lit(1)).as("n_shared"))
    val scored = pairs
      .join(norms.select(col("doc_id").as("a"), col("norm").as("norm_a")),
        "a")
      .join(norms.select(col("doc_id").as("b"), col("norm").as("norm_b")),
        "b")
      .select(col("a"), col("b"), col("n_shared"),
        round(col("num_dec").cast("double") /
          (col("norm_a") * col("norm_b")), 4).as("cos_sim"))
      // the audit's 6-op diamond: both symmetrizing union branches
      // re-derived the pair join + two norm joins (exchanges shared,
      // post-shuffle join tails not). The cut frame is pair-cardinality
      // (df-cap-bounded, linear in corpus size); r12 A/B kept it:
      // sf0.1 1.31→1.19 s, sf1 2.92→2.85, sf2 4.90→4.62 (and q192,
      // which composes this operator, follows).
      .localCheckpoint()
    val sym = scored.select(col("a").as("doc_id"), col("b").as("nbr"),
        col("n_shared"), col("cos_sim"))
      .union(scored.select(col("b").as("doc_id"), col("a").as("nbr"),
        col("n_shared"), col("cos_sim")))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(desc("cos_sim"), col("nbr"))
    sym.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("doc_id"), col("rank"))
  }

  val q184Sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         generate_subscripts(string_split(text, ' '), 1) AS pos,
       |         unnest(string_split(text, ' ')) AS tok
       |  FROM documents),
       |seq AS (SELECT doc_id, pos, tok FROM toks WHERE tok <> ''),
       |tf AS (
       |  SELECT doc_id, tok, count(*) AS tf
       |  FROM (SELECT doc_id,
       |               tok || ' ' || lead(tok) OVER (PARTITION BY doc_id
       |                 ORDER BY pos) AS tok
       |        FROM seq)
       |  WHERE tok IS NOT NULL GROUP BY doc_id, tok),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
       |dfreq AS (
       |  SELECT tok, count(*) AS df FROM tf GROUP BY tok
       |  HAVING count(*) BETWEEN 2 AND $SparseKnnDfCap),
       |banded AS (
       |  SELECT t.doc_id, t.tok, t.tf, f.df,
       |         CAST(n.n AS DOUBLE) / CAST(f.df AS DOUBLE) AS idf
       |  FROM tf t JOIN dfreq f USING (tok) CROSS JOIN n),
       |norms AS (
       |  SELECT doc_id,
       |         sqrt(CAST(CAST(sum(CAST(
       |           CAST(tf * tf AS DOUBLE) * idf * idf
       |           AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE)) AS norm
       |  FROM banded GROUP BY doc_id),
       |pairs AS (
       |  SELECT a.doc_id AS a, b.doc_id AS b,
       |         CAST(sum(CAST(CAST(a.tf * b.tf AS DOUBLE) * (a.idf * a.idf)
       |           AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS num_dec,
       |         CAST(count(*) AS BIGINT) AS n_shared
       |  FROM banded a JOIN banded b
       |    ON a.tok = b.tok AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT a, b, n_shared,
       |         round(CAST(num_dec AS DOUBLE) / (na.norm * nb.norm), 4)
       |           AS cos_sim
       |  FROM pairs
       |  JOIN norms na ON na.doc_id = a
       |  JOIN norms nb ON nb.doc_id = b),
       |sym AS (
       |  SELECT a AS doc_id, b AS nbr, n_shared, cos_sim FROM scored
       |  UNION ALL
       |  SELECT b AS doc_id, a AS nbr, n_shared, cos_sim FROM scored),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id
       |            ORDER BY cos_sim DESC, nbr) AS rank
       |  FROM sym)
       |SELECT doc_id, nbr, n_shared, cos_sim, rank
       |FROM ranked WHERE rank <= 3
       |ORDER BY doc_id, rank""".stripMargin

  /** q192_rec_coverage — catalog-coverage audit of the q184 recommender:
    * per source, how many of its documents ever appear as a NEIGHBOR in
    * someone's top-3 (exposure), the max single-doc exposure count (the
    * popularity-concentration red flag), and the coverage share. A
    * recommender that only ever surfaces 10% of the catalog has a
    * feedback-loop problem — this is the query that catches it before
    * launch. Counts exact; shares one IEEE division.
    *
    * Scale: q184's output is (docs × 3) rows; everything here is
    * source-cardinality aggregation over it plus a broadcast dimension
    * join back to `documents` for the source attribute. */
  def q192RecCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    val recs = q184SparseKnn(spark, sfDir)
      .select(col("nbr"))
      .groupBy(col("nbr")).agg(count(lit(1)).as("n_exposed"))
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"))
    docs.join(recs, col("doc_id") === col("nbr"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_exposed").isNotNull, 1L).otherwise(0L))
          .as("n_covered"),
        max(coalesce(col("n_exposed"), lit(0L))).as("max_exposure"),
        sum(coalesce(col("n_exposed"), lit(0L))).as("total_exposure"))
      .select(col("source"), col("n_docs"), col("n_covered"),
        col("max_exposure"), col("total_exposure"),
        (col("n_covered").cast("double") / col("n_docs").cast("double"))
          .as("coverage"))
      .orderBy(col("source"))
  }

  /** Composed oracle: q184's full SQL as the recommendation source. */
  val q192Sql: String =
    s"""WITH recs AS (
       |  SELECT nbr, CAST(count(*) AS BIGINT) AS n_exposed
       |  FROM ($q184Sql) GROUP BY nbr),
       |docs AS (SELECT doc_id, source FROM documents)
       |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(CASE WHEN r.n_exposed IS NOT NULL THEN 1 ELSE 0
       |                END) AS BIGINT) AS n_covered,
       |       CAST(max(coalesce(r.n_exposed, 0)) AS BIGINT)
       |         AS max_exposure,
       |       CAST(sum(coalesce(r.n_exposed, 0)) AS BIGINT)
       |         AS total_exposure,
       |       CAST(sum(CASE WHEN r.n_exposed IS NOT NULL THEN 1 ELSE 0
       |                END) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |         AS coverage
       |FROM docs d LEFT JOIN recs r ON r.nbr = d.doc_id
       |GROUP BY d.source ORDER BY d.source""".stripMargin

  /** Minimum in-source occurrences for a q196 keyword candidate — the
    * standard low-support guard (a term seen twice can't characterize a
    * source). */
  val KeywordMinSupport = 5L

  /** q196_source_keywords — per-source distinctive terms: the top-5 terms
    * by rate lift (in-source rate over corpus rate, the pure-ratio form
    * of PMI — exact BIGINT cross-products, ONE IEEE division, no log).
    * This is source-level keyword extraction: "what is THIS shard
    * about?", the label a corpus browser shows next to each source.
    *
    * Scale: one (source, term) hash aggregate (map-side combine,
    * vocabulary-bounded shuffle), corpus marginals derived from it, and
    * a per-source top-5 via partitioned window over the candidate set
    * (Spark 4's WindowGroupLimit keeps it bounded). */
  def q196SourceKeywords(spark: SparkSession, sfDir: String,
      k: Int = 5): DataFrame = {
    val st = Tables.documents(spark, sfDir)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("n_st"))
      .localCheckpoint() // (source × vocab); feeds both marginals + lift
    val perSrc = st.groupBy(col("source")).agg(sum(col("n_st")).as("t_s"))
    val perTok = st.groupBy(col("tok")).agg(sum(col("n_st")).as("n_t"))
    val tot = perSrc.agg(sum(col("t_s")).as("t"))
    val w = Window.partitionBy(col("source"))
      .orderBy(desc("lift"), col("tok"))
    st.filter(col("n_st") >= KeywordMinSupport)
      .join(broadcast(perSrc), "source")
      .join(broadcast(perTok), "tok")
      .crossJoin(broadcast(tot))
      .select(col("source"), col("tok"), col("n_st"),
        ((col("n_st") * col("t")).cast("double") /
          (col("t_s") * col("n_t")).cast("double")).as("lift"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("source"), col("rank"))
  }

  val q196Sql: String =
    s"""WITH st AS (
       |  SELECT source, tok, CAST(count(*) AS BIGINT) AS n_st
       |  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
       |        FROM documents)
       |  WHERE tok <> '' GROUP BY source, tok),
       |per_src AS (SELECT source, CAST(sum(n_st) AS BIGINT) AS t_s
       |            FROM st GROUP BY source),
       |per_tok AS (SELECT tok, CAST(sum(n_st) AS BIGINT) AS n_t
       |            FROM st GROUP BY tok),
       |tot AS (SELECT CAST(sum(t_s) AS BIGINT) AS t FROM per_src),
       |lifted AS (
       |  SELECT st.source, st.tok, st.n_st,
       |         CAST(st.n_st * tot.t AS DOUBLE)
       |           / CAST(ps.t_s * pt.n_t AS DOUBLE) AS lift
       |  FROM st
       |  JOIN per_src ps USING (source)
       |  JOIN per_tok pt USING (tok)
       |  CROSS JOIN tot
       |  WHERE st.n_st >= $KeywordMinSupport),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY source
       |            ORDER BY lift DESC, tok) AS rank
       |  FROM lifted)
       |SELECT source, tok, n_st, lift, rank
       |FROM ranked WHERE rank <= 5
       |ORDER BY source, rank""".stripMargin
}
