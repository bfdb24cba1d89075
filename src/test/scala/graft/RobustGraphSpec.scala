package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Graph, Robust, Scale, SetSim}

/** Round-3 additions: prefix-filtered set-similarity join, fixed-point
  * PageRank, robust stats, distributed exact rank, and the stream-stream
  * interval join. Each test checks the operator against an independent
  * formulation (brute force, hand-computed fixture, or the batch twin). */
class RobustGraphSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.session
  private val sf = SparkSuite.sf

  test("q113 prefix filter finds exactly the brute-force pair set") {
    val docs = Tables.documents(spark, sf)
    val filtered = SetSim.similarPairs(docs)
      .select("d1", "d2", "n_inter", "n_union")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet

    // Brute force: all pairs via cross join of the same shingle sets.
    val t = split(col("text"), " ")
    val gram = (i: org.apache.spark.sql.Column) => concat_ws(" ",
      (0 until SetSim.W).map(o => element_at(col("t"), i + lit(o))): _*)
    val sh = docs.select(col("doc_id"), t.as("t"))
      .filter(size(col("t")) >= SetSim.W)
      .select(col("doc_id"), array_distinct(transform(
        sequence(lit(1), size(col("t")) - (SetSim.W - 1)),
        i => gram(i))).as("g"))
    val brute = sh.as("a").crossJoin(sh.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        size(array_intersect(col("a.g"), col("b.g"))).as("ni"),
        (size(col("a.g")) + size(col("b.g")) -
          size(array_intersect(col("a.g"), col("b.g")))).as("nu"))
      .filter(col("ni") * SetSim.Den >= col("nu") * SetSim.Num)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getInt(2).toLong, r.getInt(3).toLong)).toSet

    assert(filtered === brute)
    assert(filtered.nonEmpty)
  }

  test("fixed-point PageRank: hand-checked 3-node fixture") {
    // A→B, B→A (2-cycle, stationary at 1.0) and C dangling in-only.
    val edges = spark.createDataFrame(
      java.util.List.of(Row("A", "B", 1L), Row("B", "A", 1L)),
      StructType(Seq(StructField("src", StringType),
        StructField("dst", StringType), StructField("outdeg", LongType))))
    val ranks = spark.createDataFrame(
      java.util.List.of(Row("A", Graph.Unit), Row("B", Graph.Unit)),
      StructType(Seq(StructField("node", StringType),
        StructField("rank", LongType))))
    val r1 = Graph.iterate(ranks, edges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // (15·1e6 + 85·1e6) div 100 = 1e6: the symmetric cycle is a fixed point
    assert(r1 === Map("A" -> Graph.Unit, "B" -> Graph.Unit))
  }

  test("q114 rank mass: every rank ≥ teleport floor, ≤ total mass") {
    val out = Graph.q114Pagerank(spark, sf).collect()
    assert(out.nonEmpty)
    val floor = 15L * Graph.Unit / 100
    out.foreach { r =>
      val rank = r.getAs[Long]("rank")
      assert(rank >= floor, s"${r.getString(0)} below teleport floor")
    }
  }

  test("globalRank equals the single-partition row_number ordering") {
    val o = Tables.orders(spark, sf).select(col("o_orderkey"),
      col("o_totalprice"))
    val ranked = Scale.globalRank(o,
      Seq(col("o_totalprice"), col("o_orderkey")), partitions = 7)
      .orderBy(col("rank_idx"))
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    val expected = o.orderBy(col("o_totalprice"), col("o_orderkey"))
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    assert(ranked.toSeq === expected.toSeq)
  }

  test("q115 MAD: hand-computed fixture with one gross outlier") {
    val rows = (1 to 9).map(i => Row("g", i.toLong, i.toDouble)) :+
      Row("g", 10L, 100.0)
    val df = spark.createDataFrame(java.util.List.of(rows: _*),
      StructType(Seq(StructField("event_type", StringType),
        StructField("event_id", LongType),
        StructField("value", DoubleType))))
    df.createOrReplaceTempView("madfix")
    // lower median of 1..9,100 is 5; devs sorted 0,1,1,2,2,3,3,4,4,95 → MAD 2
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val med = df.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("value")).head().getDouble(0)
    assert(med === 5.0)
    val dev = df.withColumn("dev", abs(col("value") - lit(med)))
    val wd = Window.partitionBy(col("event_type"))
      .orderBy(col("dev"), col("event_id"))
    val mad = dev.withColumn("rn", row_number().over(wd))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("dev")).head().getDouble(0)
    assert(mad === 2.0)
    assert(dev.filter(col("dev") > lit(3.0) * lit(mad)).count() === 1)
  }

  test("q116 buckets are equal-frequency within one row") {
    val out = Robust.q116Discretize(spark, sf).collect()
    assert(out.length === Robust.Buckets)
    val sizes = out.map(_.getAs[Long]("n_rows"))
    assert(sizes.max - sizes.min <= 1)
    // boundaries are non-overlapping and ordered
    val los = out.map(_.getAs[Double]("lo"))
    val his = out.map(_.getAs[Double]("hi"))
    (1 until out.length).foreach { i =>
      assert(his(i - 1) <= los(i))
    }
  }

  test("q117 transition probabilities sum to 1 per source state") {
    val sums = ops.Events.q117Markov(spark, sf)
      .groupBy(col("prev")).agg(sum(col("p")).as("sp"))
      .collect().map(_.getDouble(1))
    assert(sums.nonEmpty)
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-9))
  }

  test("q118 arg-extremum carries its group's extreme value") {
    val ev = Tables.events(spark, sf)
    val out = ops.Aggregates.q118Argmax(spark, sf).collect()
    out.foreach { r =>
      val et = r.getString(0)
      val hiVal = ev.filter(col("event_type") === et &&
        col("event_id") === r.getAs[Long]("hi_event_id"))
        .select(col("value")).head().getDouble(0)
      assert(hiVal === r.getAs[Double]("hi_value"))
    }
  }

  test("q119 streaming interval join equals its batch twin") {
    val streamed = graft.streaming.Streams.q119StreamJoin(spark, sf)
      .select("view_id", "buy_id", "gap_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ev = Tables.events(spark, sf)
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("view_ts"))
    val b = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("buy_id"), col("user_id").as("u2"),
        col("ts").as("buy_ts"))
    val batch = v.join(b, col("user_id") === col("u2") &&
        col("buy_ts") >= col("view_ts") &&
        col("buy_ts") <= col("view_ts") + expr("INTERVAL 60 MINUTES"))
      .select(col("view_id"), col("buy_id"),
        (unix_micros(col("buy_ts")) - unix_micros(col("view_ts")))
          .as("gap_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("q255 HITS: shape, score bounds, and brute-force round replay") {
    val rows = Graph.q255Hits(spark, sf).collect()
    val (auths, hubs) = rows.partition(_.getAs[String]("side") == "authority")
    assert(auths.length === Graph.HitsTopK && hubs.length === Graph.HitsTopK)
    // max-normalized: rank 1 holds the unit score, scores non-increasing
    Seq(auths, hubs).foreach { side =>
      assert(side.head.getAs[Long]("score") === Graph.HitsQ)
      assert(side.map(_.getAs[Int]("rnk")).toSeq === (1 to Graph.HitsTopK))
      val s = side.map(_.getAs[Long]("score")).toSeq
      assert(s.zip(s.tail).forall { case (a, b) => a >= b })
    }
    // replay the iteration in local Scala over the collected edge list
    val o = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_partkey"))
    val edges = o.join(li, o("o_orderkey") === li("l_orderkey"))
      .select(col("o_custkey").cast("long"), col("l_partkey").cast("long"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    def rescale(m: Map[Long, Long]): Map[Long, Long] = {
      val mx = m.values.max
      m.map { case (k, v) => k -> v * Graph.HitsQ / mx }
    }
    var auth = rescale(edges.groupBy(_._2).map { case (p, es) =>
      p -> es.size * Graph.HitsQ })
    var hub = Map.empty[Long, Long]
    for (_ <- 1 to Graph.HitsRounds) {
      hub = rescale(edges.groupBy(_._1).map { case (c, es) =>
        c -> es.map(e => auth(e._2)).sum })
      auth = rescale(edges.groupBy(_._2).map { case (p, es) =>
        p -> es.map(e => hub(e._1)).sum })
    }
    auths.foreach { r =>
      assert(auth(r.getAs[Long]("node")) === r.getAs[Long]("score"))
    }
    hubs.foreach { r =>
      assert(hub(r.getAs[Long]("node")) === r.getAs[Long]("score"))
    }
    // and the top-10 IS the global argmax set under (score desc, node asc)
    val wantTop = auth.toSeq.sortBy { case (n, s) => (-s, n) }
      .take(Graph.HitsTopK).map(_._1)
    assert(auths.map(_.getAs[Long]("node")).toSeq === wantTop)
  }

  test("q256 LPA: partition of the node set; local synchronous replay") {
    val rows = Graph.q256LabelProp(spark, sf).collect()
    assert(rows.nonEmpty)
    // rebuild the adjacency locally and replay the synchronous rounds
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byBasket = items.toSeq.groupBy(_._1).values
    val und = byBasket.flatMap { es =>
      val ps = es.map(_._2).distinct
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSet
    val adj = (und.toSeq ++ und.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var labels = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to Graph.LpaRounds) {
      labels = adj.map { case (node, nbrs) =>
        val counts = nbrs.groupBy(labels).map { case (l, v) => l -> v.size }
        // highest count, then smallest label — the pinned argmax
        node -> counts.toSeq.sortBy { case (l, n) => (-n, l) }.head._1
      }
    }
    val want = labels.groupBy(_._2).map { case (l, m) =>
      l -> (m.size.toLong, m.keys.min)
    }
    assert(rows.length === want.size)
    rows.foreach { r =>
      val (n, mn) = want(r.getAs[Long]("label"))
      assert(r.getAs[Long]("n_nodes") === n)
      assert(r.getAs[Long]("min_node") === mn)
    }
    // communities partition the node set
    assert(rows.map(_.getAs[Long]("n_nodes")).sum === adj.size.toLong)
  }

  test("q257 SSSP: local Bellman-Ford replay; K rounds converged here") {
    val rows = Graph.q257Sssp(spark, sf).collect()
    assert(rows.length === Graph.SsspTopK)
    assert(rows.head.getAs[Long]("dist") === 0L) // the source itself
    // weighted adjacency rebuilt locally
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val shared = items.toSeq.groupBy(_._1).values.flatMap { es =>
      val ps = es.map(_._2).distinct
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.groupBy(identity).map { case (e, v) => e -> v.size.toLong }
    val adj = shared.toSeq.flatMap { case ((a, b), n) =>
      val w = 100L / n + 1
      Seq((a, b, w), (b, a, w))
    }.groupBy(_._1).map { case (k, v) => k -> v.map(e => (e._2, e._3)) }
    val deg = adj.map { case (n, es) => n -> es.size }
    val seed = deg.toSeq.sortBy { case (n, d) => (-d, n) }.head._1
    var dist = Map(seed -> 0L)
    for (_ <- 1 to Graph.SsspRounds) {
      val relaxed = dist.toSeq.flatMap { case (u, du) =>
        adj(u).map { case (v, w) => (v, du + w) }
      } ++ dist.toSeq
      dist = relaxed.groupBy(_._1)
        .map { case (n, ds) => n -> ds.map(_._2).min }
    }
    // K rounds actually converged on the fixture (one more round is a
    // no-op) — so the ≤ K-edge distances ARE the shortest distances
    val once = (dist.toSeq ++ dist.toSeq.flatMap { case (u, du) =>
      adj(u).map { case (v, w) => (v, du + w) }
    }).groupBy(_._1).map { case (n, ds) => n -> ds.map(_._2).min }
    assert(once === dist)
    val want = dist.toSeq.sortBy { case (n, d) => (d, n) }
      .take(Graph.SsspTopK)
    assert(rows.map(r => (r.getAs[Long]("node"), r.getAs[Long]("dist")))
      .toSeq === want)
    rows.foreach(r => assert(r.getAs[Long]("n_reached") === dist.size.toLong))
  }
}
