package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup

/** Property tests (SURVEY.md §5): algebraic laws of the dedup/set operators
  * on ScalaCheck-generated corpora, sampled with fixed seeds so runs are
  * reproducible. */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.session

  private val word = Gen.oneOf("spark", "row", "data", "key", "join",
    "scan", "agg", "sort", "hash", "col")
  private val textGen: Gen[String] =
    Gen.chooseNum(3, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val corpusGen: Gen[List[String]] =
    Gen.chooseNum(1, 15).flatMap(n => Gen.listOfN(n, textGen))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("exact dedup is idempotent and keeps one row per distinct text") {
    val sp = spark
    import sp.implicits._
    samples(corpusGen, 10).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val once = docs.groupBy(col("text"))
        .agg(min(col("doc_id")).as("keep_id"))
      assert(once.count() === texts.distinct.size.toLong)
      val twice = once.groupBy(col("text")).agg(min(col("keep_id")))
      assert(twice.count() === once.count())
    }
  }

  test("union-then-dedup equals distinct union (set semantics)") {
    val sp = spark
    import sp.implicits._
    samples(Gen.zip(corpusGen, corpusGen), 10).foreach { case (a, b) =>
      val viaUnion = a.toDF("text").unionByName(b.toDF("text"))
        .distinct().count()
      assert(viaUnion === (a.toSet ++ b.toSet).size.toLong)
    }
  }

  test("duplicated corpus: every clone clusters with its original") {
    val sp = spark
    import sp.implicits._
    val smallCorpus = Gen.chooseNum(1, 5)
      .flatMap(n => Gen.listOfN(n, textGen))
    samples(smallCorpus, 5).foreach { texts =>
      val n = texts.size
      val all = (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
        texts.zipWithIndex.map { case (t, i) => ((i + n).toLong, t) })
        .toDF("doc_id", "text")
      val clusters = Dedup.minhashClusters(all)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      texts.indices.foreach { i =>
        assert(clusters((i + n).toLong) === clusters(i.toLong),
          s"clone ${i + n} not clustered with original $i in $texts")
      }
    }
  }
}
