package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DataQuality, Graph, Tfidf}

/** q194/q195/q196 — degree distribution, file sizing, source keywords. */
class LayoutGraphSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.session

  test("q194: histogram mass equals the node count; slope is negative") {
    import org.apache.spark.sql.functions._
    val rows = Graph.q194DegreeDist(spark, SparkSuite.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val o = Tables.orders(spark, SparkSuite.sf)
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(spark, SparkSuite.sf)
      .select(col("l_orderkey"), col("l_suppkey"))
    val nNodes = o.join(li, o("o_orderkey") === li("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("a"),
        concat(lit("s"), col("l_suppkey")).as("b"))
      .distinct()
      .select(explode(array(col("a"), col("b"))).as("n"))
      .distinct().count()
    assert(rows.map(_._2).sum === nNodes, "histogram covers every node")
    val slope = rows.head._3
    assert(rows.forall(_._3 === slope), "slope repeated per row")
    // co-purchase graphs are heavy-tailed: many low-degree, few hubs
    assert(slope < 0, s"expected negative log-log slope, got $slope")
  }

  test("q195: the plan's integer identities hold") {
    val rows = DataQuality.q195FileSizing(spark, SparkSuite.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, bytes, files, rpf) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(files === (bytes + DataQuality.TargetFileBytes - 1) /
        DataQuality.TargetFileBytes, "ceil-division file count")
      assert(files >= 1)
      assert(rpf === n / files)
      // every file except possibly the last is within one doc of target:
      // implied bytes-per-file stays below target + max doc size
      assert(bytes <= files * DataQuality.TargetFileBytes +
        DataQuality.TargetFileBytes)
    }
  }

  test("q196: lifts reconcile and every source gets its own keywords") {
    import org.apache.spark.sql.functions._
    val rows = Tfidf.q196SourceKeywords(spark, SparkSuite.sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getInt(4)))
    val srcs = Tables.documents(spark, SparkSuite.sf)
      .select("source").distinct().collect().map(_.getString(0)).toSet
    assert(rows.map(_._1).toSet === srcs, "all sources represented")
    rows.groupBy(_._1).foreach { case (s, ks) =>
      assert(ks.map(_._5).sorted.toSeq === (1 to ks.length))
      assert(ks.length <= 5)
      // support guard honored
      ks.foreach(k => assert(k._3 >= Tfidf.KeywordMinSupport))
    }
    // independent recomputation of one source's top lift
    val toks = Tables.documents(spark, SparkSuite.sf)
      .select(col("source"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val total = toks.length.toLong
    val bySrc = toks.groupBy(_._1).view.mapValues(_.length.toLong)
    val byTok = toks.groupBy(_._2).view.mapValues(_.length.toLong)
    val s0 = rows.head._1
    val expected = toks.filter(_._1 == s0).groupBy(_._2).view
      .mapValues(_.length.toLong).toSeq
      .filter(_._2 >= Tfidf.KeywordMinSupport)
      .map { case (t, nst) =>
        (t, (nst * total).toDouble / (bySrc(s0) * byTok(t)).toDouble)
      }
      .sortBy { case (t, l) => (-l, t) }.take(5)
    val got = rows.filter(_._1 == s0).sortBy(_._5)
      .map(r => (r._2, r._4))
    assert(got.toSeq === expected)
  }
}
