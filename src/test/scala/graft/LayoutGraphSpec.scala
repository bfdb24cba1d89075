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

  test("q197: normalization is idempotent and shrinks or preserves") {
    import graft.ops.Text
    val rows = Text.q197Normalize(spark, SparkSuite.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getString(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, before, after, changed, norm) =>
      assert(norm === norm.toLowerCase, s"doc $id lowercased")
      assert(!norm.contains("  "), s"doc $id no double spaces")
      assert(norm == norm.trim, s"doc $id trimmed")
      assert(norm.forall(c => c.isLetterOrDigit || c == ' '),
        s"doc $id alphanumeric")
      assert(after === norm.length.toLong)
      // idempotent: re-normalizing the normal form is identity
      val again = norm.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
        .replaceAll(" +", " ").trim
      assert(again === norm, s"doc $id idempotent")
    }
  }

  test("q198: the histogram prediction equals the materialized join size") {
    import graft.ops.Scale
    val rows = Scale.q198JoinSize(spark, SparkSuite.sf).collect()
    assert(rows.length === 10)
    val predicted = rows.head.getLong(6)
    val actual = Tables.events(spark, SparkSuite.sf)
      .join(Tables.orders(spark, SparkSuite.sf),
        org.apache.spark.sql.functions.col("user_id") ===
          org.apache.spark.sql.functions.col("o_custkey"))
      .count()
    assert(predicted === actual, "Σ n_a·n_b = |A ⋈ B| exactly")
    rows.foreach { r =>
      assert(r.getLong(4) === r.getLong(2) * r.getLong(3))
    }
  }

  test("q199: the dimension is gap-free and accounts for every order") {
    import graft.ops.Calendar
    val rows = Calendar.q199DateDim(spark, SparkSuite.sf).collect()
    val dates = rows.map(_.getDate(0).toLocalDate)
    dates.sliding(2).foreach {
      case Array(a, b) => assert(b === a.plusDays(1), s"gap after $a")
      case _ => ()
    }
    assert(rows.map(_.getLong(9)).sum ===
      Tables.orders(spark, SparkSuite.sf).count())
    rows.foreach { r =>
      val d = r.getDate(0).toLocalDate
      // java.time: MONDAY=1..SUNDAY=7; ours: MONDAY=0..SUNDAY=6
      assert(r.getInt(5) === d.getDayOfWeek.getValue - 1, s"$d weekday")
      assert(r.getBoolean(6) === (r.getInt(5) >= 5))
      assert(r.getInt(1) === d.getYear)
      assert(r.getInt(2) === d.getMonthValue)
      assert(r.getInt(3) === d.getDayOfMonth)
    }
  }

  test("q08/q09: line-format round-trips are row-identical to parquet") {
    import graft.ops.Federated
    val truth = Tables.documents(spark, SparkSuite.sf)
      .select("doc_id", "lang", "source", "n_chars", "text")
      .orderBy("doc_id").collect().map(_.toSeq)
    Seq(Federated.q08CsvRoundtrip(spark, SparkSuite.sf),
      Federated.q09JsonlRoundtrip(spark, SparkSuite.sf)).foreach { rt =>
      val got = rt.collect().map(_.toSeq)
      assert(got.length === truth.length)
      got.zip(truth).foreach { case (g, t) => assert(g === t) }
    }
  }

  test("q201: the core is a fixpoint — every member keeps degree >= k") {
    val rows = Graph.q201Kcore(spark, SparkSuite.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(rows.nonEmpty, "p75 threshold must leave a non-empty core")
    assert(rows.forall(_._4), "peel converged inside the unrolled rounds")
    val k = rows.head._3
    rows.foreach { case (n, d, _, _) =>
      assert(d >= k, s"node $n below k=$k in its own core")
    }
    // maximality spot check: the reported degree counts only core-internal
    // edges, so the members form a self-sustaining subgraph by definition
    assert(rows.map(_._1).distinct.length === rows.length)
  }

  test("q202: weekly accounting identities hold against a replay") {
    import org.apache.spark.sql.functions._
    val out = graft.ops.Events.q202Churn(spark, SparkSuite.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val wu = Tables.events(spark, SparkSuite.sf)
      .select(unix_micros(date_trunc("week", col("ts"))).as("w"),
        col("user_id"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byWeek = wu.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val weeks = byWeek.keys.toSeq.sorted
    assert(out.map(_._1).toSeq === weeks)
    out.foreach { case (w, active, retained, nNew, churned) =>
      val cur = byWeek(w)
      assert(active === cur.size.toLong, s"week $w active")
      val prev = byWeek.getOrElse(w - 604800000000L, Set.empty[Long])
      assert(retained === (cur & prev).size.toLong, s"week $w retained")
      assert(nNew === (cur -- prev).size.toLong, s"week $w new")
      assert(churned === (prev -- cur).size.toLong, s"week $w churned")
    }
  }
}
