package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Centroids

/** q165 power iteration — the factored O(N·d) plan must equal the direct
  * y = Σ_v (q_v·x)·q_v computed by hand on a tiny frame. */
class PowerIterSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.session

  private def q(v: Double): Long = math.floor(v * 1024.0).toLong
  private def x(pos: Int): Long = ((pos + 1) * 2654435761L) % 1001L - 500L

  test("q165: factored step equals the hand-computed matrix-vector product") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(0.5f, -0.25f, 1.0f)),
      (1L, Array(-1.0f, 0.125f, 0.0f)),
      (2L, Array(0.75f, 0.75f, -0.5f))).toDF("vec_id", "embedding")
    val out = Centroids.powerIterStep(vecs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val qs = Seq(
      Seq(0.5, -0.25, 1.0), Seq(-1.0, 0.125, 0.0), Seq(0.75, 0.75, -0.5))
      .map(_.zipWithIndex.map { case (v, p) => q(v) })
    val expected = (0 until 3).map { pos =>
      qs.map(qv => (0 until 3).map(p => qv(p) * x(p)).sum * qv(pos)).sum
    }
    (0 until 3).foreach { pos =>
      assert(out(pos.toLong)._1 === x(pos), s"seed component at pos $pos")
      assert(out(pos.toLong)._2 === expected(pos), s"y at pos $pos")
      assert(out(pos.toLong)._3 === 3L)
    }
  }

  test("q165: fixture output is one row per dimension with full membership") {
    val rows = Centroids.q165PowerIter(spark, SparkSuite.sf).collect()
    assert(rows.length === 64, "one row per embedding dimension")
    val n = rows.map(_.getLong(3)).distinct
    assert(n.length === 1, "every dimension sees every vector")
    assert(rows.map(_.getLong(0)).toSeq === (0L until 64L))
  }
}
