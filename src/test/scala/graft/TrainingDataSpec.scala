package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TrainingData

class TrainingDataSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.session
  private val sf = SparkSuite.sf

  test("q203 shards partition the corpus exactly and stay balanced") {
    val out = TrainingData.q203ShuffleShard(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(out.map(_.getAs[Long]("n_docs")).sum === total,
      "every document must land in exactly one shard")
    assert(out.map(_.getAs[Long]("shard")).toSet.size === out.length)
    // multiplicative-mix balance: no shard more than 2× the uniform share
    val uniform = total.toDouble / TrainingData.Shards
    out.foreach { r =>
      assert(r.getAs[Long]("n_docs") <= (uniform * 2).toLong + 1,
        s"shard ${r.getAs[Long]("shard")} is skewed: ${r.getAs[Long]("n_docs")} vs uniform $uniform")
    }
  }

  test("q204 weights respect the cap and final shares sum to 1") {
    val out = TrainingData.q204MixWeights(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val w = r.getAs[Double]("weight")
      assert(w > 0.0 && w <= TrainingData.MixCap + 1e-12)
    }
    val shareSum = out.map(_.getAs[Double]("final_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-9, s"final shares sum to $shareSum")
    // a source above target share must be downsampled strictly below 1
    val n = out.length.toDouble
    out.foreach { r =>
      if (r.getAs[Double]("actual_share") > 1.0 / n + 1e-12)
        assert(r.getAs[Double]("weight") < 1.0)
    }
  }

  test("q205 OOV rates are consistent fractions of the token stream") {
    val out = TrainingData.q205OovRate(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val rate = r.getAs[Double]("oov_rate")
      val n = r.getAs[Long]("n_tokens")
      val oov = r.getAs[Long]("n_oov")
      assert(oov >= 0 && oov <= n)
      assert(math.abs(rate - oov.toDouble / n) < 1e-15)
    }
    // a top-1000 vocabulary over a zipfy corpus must cover most instances
    val totTok = out.map(_.getAs[Long]("n_tokens")).sum.toDouble
    val totOov = out.map(_.getAs[Long]("n_oov")).sum.toDouble
    assert(totOov / totTok < 0.5,
      s"vocabulary covers only ${1 - totOov / totTok} of token instances")
  }

  test("q206 incremental dedup accounts for every incoming document") {
    val out = TrainingData.q206IncrementalDedup(spark, sf).collect()
    assert(out.nonEmpty)
    val totalIncoming = Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 === 0).count()
    assert(out.map(_.getAs[Long]("n_incoming")).sum === totalIncoming)
    out.foreach { r =>
      assert(r.getAs[Long]("n_dup") + r.getAs[Long]("n_new") ===
        r.getAs[Long]("n_incoming"))
    }
    // cross-check one source's dup count against a direct intersect
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text")).as("digest"))
    val direct = docs.filter(col("doc_id") % 10 === 0).alias("i")
      .join(docs.filter(col("doc_id") % 10 =!= 0).select("digest").distinct()
        .alias("c"), Seq("digest"), "left_semi")
      .count()
    assert(out.map(_.getAs[Long]("n_dup")).sum === direct)
  }
}
