package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Corpus

/** The composed cleaning pipeline on planted data — the fixture corpus has
  * no exact duplicates and few sub-threshold docs, so the oracle row alone
  * can't prove the dedup and filter stages bite. */
class CorpusSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.session
  import spark.implicits._

  // 45 tokens incl. stopwords → quality ≈ 0.41, passes both thresholds
  private val good =
    "the quick brown fox jumps over a lazy dog and then runs to the river " +
    "in the morning light of a bright clear day while the birds sing songs " +
    "of summer and the wind moves over the tall green trees near the quiet " +
    "valley path"
  private val junk = "too short to keep" // 4 tokens → filtered

  test("clean dedups exact copies and filters sub-threshold docs") {
    val docs = Seq(
      (10L, good), (3L, good), (7L, good), // dup cluster, min id = 3
      (1L, junk),
      (5L, good + " extra")) // distinct text, still above thresholds
      .toDF("doc_id", "text")
    val out = Corpus.clean(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(out === Map(3L -> 3L, 5L -> 1L),
      "expected the min-id representative with copy count, junk dropped")
  }

  test("clean carries the language prediction through composition") {
    val docs = Seq((1L, good)).toDF("doc_id", "text")
    val row = Corpus.clean(docs).collect().head
    // 'the'/'he'/'er' bigrams dominate this English text
    assert(row.getString(1) === "en")
    assert(row.getLong(2) === 45L) // token count survives the join
  }
}
