package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Text

/** q167 vocabulary growth — the batch-wise new-type accounting must tie
  * out against the corpus-level distinct count. */
class GrowthSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.session

  test("q167: final vocab_size equals the corpus distinct-token count") {
    import org.apache.spark.sql.functions._
    val rows = Text.q167VocabGrowth(spark, SparkSuite.sf).collect()
    val finalVocab = rows.last.getLong(4)
    val distinctToks = Tables.documents(spark, SparkSuite.sf)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .agg(countDistinct(col("tok"))).collect()(0).getLong(0)
    assert(finalVocab === distinctToks)
    assert(rows.map(_.getLong(3)).sum === finalVocab,
      "new types across batches partition the vocabulary")
  }

  test("q167: vocab_size is the running sum and batches are ordered") {
    val rows = Text.q167VocabGrowth(spark, SparkSuite.sf).collect()
    assert(rows.map(_.getLong(0)).toSeq === rows.map(_.getLong(0)).sorted.toSeq)
    var run = 0L
    rows.foreach { r =>
      run += r.getLong(3)
      assert(r.getLong(4) === run, s"running total breaks at batch ${r.getLong(0)}")
    }
  }
}
