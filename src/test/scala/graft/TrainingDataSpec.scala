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

  test("q207 packing plan conserves tokens and chunk arithmetic") {
    val out = TrainingData.q207PackingPlan(spark, sf).collect()
    assert(out.length === TrainingData.Contexts.length)
    out.foreach { r =>
      assert(r.getAs[Long]("n_fit") + r.getAs[Long]("n_split") ===
        r.getAs[Long]("n_docs"))
      // chunks·ctx covers the token mass; pad is exactly the slack
      assert(r.getAs[Long]("pad_tokens") ===
        r.getAs[Long]("n_chunks") * r.getAs[Long]("ctx") -
          r.getAs[Long]("total_tokens"))
      assert(r.getAs[Long]("n_chunks") >= r.getAs[Long]("n_docs"))
      val w = r.getAs[Double]("waste_rate")
      assert(w >= 0.0 && w < 1.0)
    }
    // the same corpus token mass under every context size
    assert(out.map(_.getAs[Long]("total_tokens")).distinct.length === 1)
  }

  test("q208 duplication stats are internally consistent") {
    val r = TrainingData.q208DupGramRate(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_shared_grams") <= r.getAs[Long]("n_grams"))
    assert(r.getAs[Long]("n_shared_instances") <= r.getAs[Long]("n_instances"))
    // a shared gram has at least 2 instances, so instance mass ≥ 2× gram count
    assert(r.getAs[Long]("n_shared_instances") >=
      2 * r.getAs[Long]("n_shared_grams"))
    if (r.getAs[Long]("n_shared_grams") > 0)
      assert(r.getAs[Long]("max_df") >= 2)
  }

  test("q209 selects a contiguous rank prefix within budget") {
    val out = TrainingData.q209BudgetCurriculum(spark, sf).collect()
    assert(out.map(_.getAs[Long]("rank")).toSeq ===
      (1L to out.length.toLong).toSeq)
    // selected must be a prefix: once a row is unselected, all after are
    val flags = out.map(_.getAs[Int]("selected")).toSeq
    assert(flags === flags.sortBy(-_), s"selection is not a prefix: $flags")
    // cumulative chars reconcile with per-source chars in rank order
    assert(out.map(_.getAs[Long]("chars")).scanLeft(0L)(_ + _).drop(1).toSeq
      === out.map(_.getAs[Long]("cum_chars")).toSeq)
  }

  test("q210 centroid cosines are bounded and cover each label pair once") {
    val out = TrainingData.q210CentroidSim(spark, sf).collect()
    val labels = Tables.embeddings(spark, sf)
      .select("label").distinct().count().toInt
    assert(out.length === labels * (labels - 1) / 2)
    val pairs = out.map(r => (r.getAs[Int]("label_a"), r.getAs[Int]("label_b")))
    assert(pairs.distinct.length === pairs.length)
    pairs.foreach { case (a, b) => assert(a < b) }
    out.foreach { r =>
      val c = r.getAs[Double]("cosine")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"cosine out of range: $c")
    }
  }

  test("q211 zipf fit reports a falling, sane rank-frequency head") {
    val r = TrainingData.q211ZipfFit(spark, sf).collect()(0)
    // the head is min(ZipfK, distinct tokens) — the sf0.001 synthetic
    // vocabulary is smaller than ZipfK
    assert(r.getAs[Long]("k") >= 20 &&
      r.getAs[Long]("k") <= TrainingData.ZipfK)
    val slope = r.getAs[Double]("slope")
    // frequencies are sorted descending by construction, so the OLS slope
    // is necessarily ≤ 0; the synthetic fixture's near-uniform vocabulary
    // sits around −0.18 with a weak fit (real text: ≈ −1, r² ≈ 0.9+) —
    // the operator must REPORT that honestly, so pin sign and bounds only
    assert(slope < 0.0, s"head frequencies must fall with rank: $slope")
    assert(slope > -3.0, s"implausibly steep head: $slope")
    val r2 = r.getAs[Double]("r2")
    assert(r2 > 0.0 && r2 <= 1.0, s"r2 out of range: $r2")
  }

  test("q212 prefix-dup groups are consistent with a direct recount") {
    val out = TrainingData.q212PrefixDup(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_in_dup_group") <= r.getAs[Long]("n_docs"))
      if (r.getAs[Long]("n_dup_groups") > 0)
        assert(r.getAs[Long]("n_in_dup_group") >=
          2 * 1L * r.getAs[Long]("n_dup_groups") -
            r.getAs[Long]("n_dup_groups"), "each dup group has ≥2 members")
    }
    val totalDup = out.map(_.getAs[Long]("n_in_dup_group")).sum
    val direct = {
      val pfx = Tables.documents(spark, sf)
        .select(substring(col("text"), 1, TrainingData.PrefixChars).as("p"))
      val sizes = pfx.groupBy("p").count()
      sizes.filter(col("count") > 1)
        .agg(sum("count")).collect()(0).getLong(0)
    }
    assert(totalDup === direct)
  }

  test("q213 outlier screen: every label accounted, worst is a real minimum") {
    val out = TrainingData.q213LabelOutliers(spark, sf).collect()
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(out.map(_.getAs[Long]("n_vecs")).sum === nVecs)
    out.foreach { r =>
      assert(r.getAs[Long]("n_outliers") <= r.getAs[Long]("n_vecs"))
      val worst = r.getAs[Double]("worst_cos")
      assert(worst >= -1.0 - 1e-9 && worst <= 1.0 + 1e-9)
      if (r.getAs[Long]("n_outliers") > 0)
        assert(worst < TrainingData.OutlierCos)
    }
  }

  test("q214 snapshot diff reconciles retained/added/removed per source") {
    val out = TrainingData.q214SnapshotDiff(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_a") ===
        r.getAs[Long]("n_retained") + r.getAs[Long]("n_removed"))
      assert(r.getAs[Long]("n_b") ===
        r.getAs[Long]("n_retained") + r.getAs[Long]("n_added"))
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.0 && j <= 1.0)
    }
    // the snapshots share 3/5 of the id space — corpus-wide overlap must
    // be real (a single tiny source may legitimately retain nothing)
    assert(out.map(_.getAs[Long]("n_retained")).sum > 0)
  }

  test("q215 FK audit covers all four relations on a clean star schema") {
    val out = graft.ops.DataQuality.q215FkHealth(spark, sf).collect()
    assert(out.map(_.getAs[String]("relation")).toSet === Set(
      "lineitem.orderkey", "lineitem.partkey", "lineitem.suppkey",
      "orders.custkey"))
    val li = Tables.lineitem(spark, sf).count()
    out.filter(_.getAs[String]("relation").startsWith("lineitem"))
      .foreach(r => assert(r.getAs[Long]("n_rows") === li))
    // the synthetic schema is referentially clean — the audit must SAY so
    out.foreach { r =>
      assert(r.getAs[Long]("n_dangling") === 0,
        s"${r.getAs[String]("relation")} dangling")
      assert(r.getAs[Long]("n_null_fk") === 0)
    }
  }

  test("q216 diversity ratio is a proper fraction and counts reconcile") {
    val out = TrainingData.q216GramDiversity(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("distinct_grams") <= r.getAs[Long]("total_grams"))
      val d = r.getAs[Double]("diversity")
      assert(d > 0.0 && d <= 1.0)
      assert(r.getAs[Long]("max_gram_count") >= 1)
    }
  }

  test("q217 quotas are exact and the three splits partition each source") {
    val out = TrainingData.q217EvalSplit(spark, sf).collect()
    val bySource = out.groupBy(_.getAs[String]("source"))
    val direct = Tables.documents(spark, sf)
      .groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    bySource.foreach { case (src, rows) =>
      val n = direct(src)
      val q = math.floor(n * TrainingData.EvalFrac).toLong
      val m = rows.map(r =>
        r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
      assert(m.values.sum === n, s"$src splits must partition the source")
      // exact quotas, not expected proportions
      assert(m.getOrElse("val", 0L) === q, s"$src val quota")
      assert(m.getOrElse("test", 0L) === q, s"$src test quota")
      assert(m.getOrElse("train", 0L) === n - 2 * q, s"$src train remainder")
    }
  }

  test("q218 dedup impact reconciles with direct digest counting") {
    val out = TrainingData.q218DedupImpact(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    assert(out.map(_.getAs[Long]("docs_before")).sum === docs.count())
    // total survivors = distinct digests corpus-wide
    val distinctDigests = docs.select(md5(col("text"))).distinct().count()
    assert(out.map(_.getAs[Long]("docs_after")).sum === distinctDigests)
    out.foreach { r =>
      assert(r.getAs[Long]("docs_removed") ===
        r.getAs[Long]("docs_before") - r.getAs[Long]("docs_after"))
      val rate = r.getAs[Double]("mass_removed_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("q219 streamed custom sessions equal batch session_window sessions") {
    val streamed = graft.streaming.Streams.q219StreamSessions(spark, sf)
      .select("user_id", "session_start", "session_end", "n_events")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3))).toSet
    val batch = graft.ops.Events.q62Sessionize(spark, sf)
      .select("user_id", "session_start", "session_end", "n_events")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("q220 length bands are ordered and bracketed per source") {
    val out = TrainingData.q220LengthBands(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (mn, p10, p50, p90, mx) = (r.getAs[Long]("min_chars"),
        r.getAs[Long]("p10_chars"), r.getAs[Long]("p50_chars"),
        r.getAs[Long]("p90_chars"), r.getAs[Long]("max_chars"))
      assert(mn <= p10 && p10 <= p50 && p50 <= p90 && p90 <= mx,
        s"bands out of order for ${r.getAs[String]("source")}: " +
          s"$mn $p10 $p50 $p90 $mx")
    }
  }

  test("q221 leakage counts equal a direct digest cross-check") {
    val out = TrainingData.q221SplitLeakage(spark, sf).collect()
    assert(out.map(_.getAs[String]("split")).toSet === Set("val", "test"))
    val assigned = TrainingData.evalSplitAssign(
      Tables.documents(spark, sf)
        .select(col("doc_id"), col("source"), md5(col("text")).as("digest")))
    val train = assigned.filter(col("split") === "train")
      .select("digest").distinct()
    out.foreach { r =>
      val split = r.getAs[String]("split")
      val direct = assigned.filter(col("split") === split)
        .join(train, Seq("digest"), "left_semi").count()
      assert(r.getAs[Long]("n_leaked") === direct, s"$split leak count")
      assert(r.getAs[Long]("n_leaked") <= r.getAs[Long]("n_docs"))
    }
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

  test("q228 applies exactly the q204-quantized weights, copies bounded") {
    val apply228 = TrainingData.q228MixApply(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val report204 = TrainingData.q204MixWeights(spark, sf).collect()
    assert(report204.length === apply228.size)
    report204.foreach { r =>
      val a = apply228(r.getAs[String]("source"))
      // the sampler consumes the SAME 2^20 quantization q204 reports
      assert(a.getAs[Long]("w_q") ===
        math.floor(r.getAs[Double]("weight") * (1L << 20)).toLong)
      // ⌊w⌋ copies always; at most one fractional extra per doc
      val (n, sel, wq) = (a.getAs[Long]("n_docs"),
        a.getAs[Long]("n_selected"), a.getAs[Long]("w_q"))
      assert(sel >= n * (wq / 1048576) && sel <= n * (wq / 1048576 + 1),
        s"copies out of bounds for ${r.getAs[String]("source")}")
    }
  }

  test("q243 temperature mix: shares normalize; damping direction holds") {
    val out = graft.ops.TrainingData.q243TempMix(spark, sf).collect()
    assert(math.abs(out.map(_.getAs[Double]("p_share")).sum - 1.0) < 1e-9)
    assert(math.abs(out.map(_.getAs[Double]("w_share")).sum - 1.0) < 1e-9)
    out.foreach { r =>
      val (p, w, b) = (r.getAs[Double]("p_share"),
        r.getAs[Double]("w_share"), r.getAs[Double]("boost"))
      assert(math.abs(b - w / p) < 1e-12)
      // α=1/2 damps above-average sources, boosts below-average ones
      // (w ∝ √p, so w_share ⋛ p_share exactly when p ⋚ the √-weighted
      // pivot); verify the monotone consequence: boost is ANTITONE in p
      assert(b > 0.0)
      // weight really is floor(√chars·2^20)
      val wq = r.getAs[Long]("wq")
      assert(wq === math.floor(
        math.sqrt(r.getAs[Long]("chars").toDouble) * (1L << 20)).toLong)
    }
    val sorted = out.sortBy(_.getAs[Double]("p_share"))
    sorted.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("boost") >= b.getAs[Double]("boost") - 1e-12,
        "boost must decrease as natural share grows")
    }
  }

  test("q233 Neyman seats sum to K exactly and match a BigInt re-deal") {
    import graft.ops.Sampling
    val out = Sampling.q233NeymanAlloc(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val k = docs.length / Sampling.NeymanBudgetDiv
    assert(out.map(_.getAs[Long]("n_alloc")).sum === k.toLong,
      "largest-remainder must conserve the budget exactly")
    // independent BigInt recomputation of the whole deal
    val wq = docs.groupBy(_._1).map { case (src, rows) =>
      val n = BigInt(rows.length)
      val sx = rows.map(r => BigInt(r._2)).sum
      val sx2 = rows.map(r => BigInt(r._2) * BigInt(r._2)).sum
      val vn = n * sx2 - sx * sx
      src -> BigInt(math.floor(
        math.sqrt(vn.toDouble) * (1L << 20)).toLong)
    }
    val wTot = wq.values.sum
    val base = wq.map { case (s, w) => s -> (BigInt(k) * w / wTot) }
    val rem = wq.map { case (s, w) => s -> (BigInt(k) * w % wTot) }
    val nLeft = (BigInt(k) - base.values.sum).toInt
    val extras = rem.toSeq.sortBy { case (s, r) => (-r, s) }
      .take(nLeft).map(_._1).toSet
    out.foreach { r =>
      val s = r.getAs[String]("source")
      val expect = base(s) + (if (extras(s)) 1 else 0)
      assert(BigInt(r.getAs[Long]("n_alloc")) === expect, s"seats for $s")
      assert(r.getAs[Long]("var_num") >= 0L)
      assert(r.getAs[Long]("n_alloc") <= r.getAs[Long]("n_docs"),
        s"uncapped allocation binds on the fixture for $s")
    }
  }
}
