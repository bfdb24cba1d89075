package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Chunking, Privacy, Reshape, Text}

/** Semantics of the round-3 pipeline operators: PII redaction, boilerplate
  * removal, chunking, unpivot/histogram, media dedup. (Value-level parity
  * vs DuckDB is the driver's t2 gate; these tests pin the operator
  * contracts on tiny known inputs.) */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.session
  import spark.implicits._
  private val sf = SparkSuite.sf

  test("q69: redaction removes every planted PII match") {
    val out = Privacy.q69PiiRedact(spark, sf).cache()
    try {
      // each doc plants exactly one email, one ID-shaped number, one IPv4
      val bad = out.filter(
        col("n_emails") =!= 1 || col("n_ids") =!= 1 || col("n_ips") =!= 1)
      assert(bad.count() === 0)
      // and after redaction no pattern matches anything anymore
      val residual = Privacy.piiPatterns.map { case (_, pat, _) =>
        out.filter(Privacy.matchCount(col("redacted"), pat) > 0).count()
      }.sum
      assert(residual === 0L)
    } finally out.unpersist()
  }

  test("q99: boilerplate terms are exactly the high-DF ones, order kept") {
    val docs = Seq(
      (1L, "the cat sat"),
      (2L, "the dog ran"),
      (3L, "the end")).toDF("doc_id", "text")
    // "the" is in 3/3 docs -> df 100% > 50% threshold; everything else 1/3
    val out = Text.removeBoilerplate(docs, 50)
      .orderBy("doc_id").collect()
    assert(out.map(_.getString(3)).toSeq ===
      Seq("cat sat", "dog ran", "end"))
    assert(out.map(_.getLong(2)).toSeq === Seq(2L, 2L, 1L))
    assert(out.map(_.getLong(1)).toSeq === Seq(3L, 3L, 2L))
  }

  test("q99: fully-boilerplate documents survive as empty rows") {
    val docs = Seq((1L, "x x"), (2L, "x"), (3L, "x y"))
      .toDF("doc_id", "text")
    val out = Text.removeBoilerplate(docs, 60).orderBy("doc_id").collect()
    // "x" in 3/3 docs; "y" in 1/3
    assert(out.length === 3)
    assert(out.map(_.getString(3)).toSeq === Seq("", "", "y"))
    assert(out.map(_.getLong(2)).toSeq === Seq(0L, 0L, 1L))
  }

  test("q100: chunk boundaries and overlap on a known doc") {
    val docs = Seq((7L, "a b c d e")).toDF("doc_id", "text")
    val out = Chunking.chunkTokens(docs, "text", size = 2, stride = 1)
      .orderBy("chunk_start").collect()
    assert(out.map(r => (r.getLong(1), r.getString(2), r.getLong(3))).toSeq ===
      Seq((0L, "a b", 2L), (1L, "b c", 2L), (2L, "c d", 2L),
        (3L, "d e", 2L), (4L, "e", 1L)))
  }

  test("q100: stride >= size tiles the doc without overlap") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val out = Chunking.chunkTokens(docs, "text", size = 2, stride = 2)
      .orderBy("chunk_start").collect()
    assert(out.map(_.getString(2)).mkString(" ") === "a b c d e")
  }

  test("q06: melted sums equal the per-column aggregates") {
    val li = Tables.lineitem(spark, sf)
    val direct = li.agg(
      sum(col("l_quantity").cast("decimal(18,4)")).cast("double"),
      sum(col("l_discount").cast("decimal(18,4)")).cast("double"))
      .collect()(0)
    val melted = Reshape.q06Unpivot(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(melted("l_quantity") === direct.getDouble(0))
    assert(melted("l_discount") === direct.getDouble(1))
    assert(melted.keySet === Reshape.measures.toSet)
    // each measure contributes exactly |lineitem| rows
    val n = li.count()
    Reshape.q06Unpivot(spark, sf).collect()
      .foreach(r => assert(r.getLong(1) === n))
  }

  test("q07: histogram partitions the table exactly") {
    val out = Reshape.q07Histogram(spark, sf).collect()
    val n = Tables.lineitem(spark, sf).count()
    assert(out.map(_.getLong(2)).sum === n)
    assert(out.forall { r =>
      r.getLong(0) >= 0 && r.getLong(0) < Reshape.nBuckets
    })
  }

  test("q102: collocations respect support cutoff and lift ordering") {
    val res = ops.Collocations.q102Collocations(spark, sf).collect()
    assert(res.nonEmpty)
    assert(res.forall(_.getLong(2) >= ops.Collocations.minSupport))
    assert(res.map(_.getDouble(3)).toSeq ===
      res.map(_.getDouble(3)).sortBy(-_).toSeq, "must be lift-descending")
  }

  test("q103: every dirty name links back to its clean twin at distance 1") {
    val out = ops.Fuzzy.q103FuzzyJoin(spark, sf).cache()
    try {
      val nNames = Tables.part(spark, sf).select("p_name").distinct().count()
      // twin pair = the dirty name IS the corruption of that clean name
      val twins = out.filter(
        concat(substring(col("clean_name"), 1, 3), lit("x"),
          expr("substring(clean_name, 5)")) === col("dirty_name"))
      assert(twins.count() === nNames, "a twin match is lost")
      assert(twins.filter(col("distance") =!= 1).count() === 0)
      assert(out.filter(col("distance") > ops.Fuzzy.maxDistance).count() === 0)
    } finally out.unpersist()
  }

  test("q104: interpolated gaps sit between their endpoints") {
    val out = ops.Events.q104Interpolate(spark, sf)
    val gaps = out.filter(col("is_gap"))
    // every gap value must lie within [min, max] of the user's observed
    // hourly sums (linear interpolation never extrapolates outside them)
    val bounds = out.filter(!col("is_gap"))
      .groupBy("user_id")
      .agg(min("interp_value").as("lo"), max("interp_value").as("hi"))
    val outside = gaps.join(bounds, "user_id")
      .filter(col("interp_value") < col("lo") - 1e-9 ||
        col("interp_value") > col("hi") + 1e-9)
    assert(outside.count() === 0)
    assert(gaps.filter(col("interp_value").isNull).count() === 0,
      "every grid hour between first and last observation interpolates")
  }

  test("q105: z-scores are null exactly when the window lacks variance") {
    val out = ops.Windows.q105RollingZscore(spark, sf).cache()
    try {
      // first event of each user: n_window = 1 -> no z
      assert(out.filter(col("n_window") === 1 && col("zscore").isNotNull)
        .count() === 0)
      // every non-null z has a matching outlier verdict
      assert(out.filter(col("zscore").isNotNull)
        .filter(col("is_outlier") =!= (abs(col("zscore")) > 2.0))
        .count() === 0)
      // mean over the window stays within the window's value range: spot
      // check via global bounds
      val b = Tables.events(spark, sf)
        .agg(min("value"), max("value")).collect()(0)
      assert(out.filter(col("mean_w") < b.getDouble(0) - 1e-9 ||
        col("mean_w") > b.getDouble(1) + 1e-9).count() === 0)
    } finally out.unpersist()
  }

  test("q251 IVM: the four delta terms tile the full join exactly") {
    import org.apache.spark.sql.functions._
    val out = ops.Incremental.q251IvmJoin(spark, sf).collect()
    // per segment: term counts sum to the row count
    out.foreach { r =>
      assert(r.getAs[Long]("n_rows") === r.getAs[Long]("n_base") +
        r.getAs[Long]("n_do_c") + r.getAs[Long]("n_o_dc") +
        r.getAs[Long]("n_do_dc"), s"${r.getString(0)} tiling")
    }
    // the incrementally-built view equals the naive full join
    val full = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long")).as("cents"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    out.foreach { r =>
      val (n, cents) = full(r.getString(0))
      assert(r.getAs[Long]("n_rows") === n, s"${r.getString(0)} rows")
      assert(r.getAs[Long]("sum_cents") === cents, s"${r.getString(0)} sum")
    }
    // every delta term is genuinely populated on the fixture
    assert(out.map(_.getAs[Long]("n_do_c")).sum > 0L)
    assert(out.map(_.getAs[Long]("n_o_dc")).sum > 0L)
    assert(out.map(_.getAs[Long]("n_do_dc")).sum > 0L)
  }

  test("q260 IVM agg: delta ∘ delta = batch, and the fold matches a " +
    "direct recompute with eviction") {
    import org.apache.spark.sql.functions._
    import ops.Incremental._
    val keys = Seq("l_returnflag", "l_linestatus")
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_linestatus"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"),
        pmod(col("l_orderkey"), lit(IvmAggMod)).as("slot"))
      .localCheckpoint()
    val base = li.filter(col("slot") =!= IvmAggInsRem)
      .withColumn("sign", lit(1L))
    val ins = li.filter(col("slot") === IvmAggInsRem)
      .withColumn("sign", lit(1L))
    val del = li.filter(col("slot") === IvmAggDelRem)
      .withColumn("sign", lit(-1L))
    val v0 = signedState(base, keys)
      .withColumn("n_inserted", lit(0L)).withColumn("n_deleted", lit(0L))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(keys.map(col): _*).collect().toSeq
    // associativity: applying the two deltas one at a time equals
    // applying their union in one batch
    val sequential =
      applyDelta(applyDelta(v0, signedState(ins, keys), keys),
        signedState(del, keys), keys)
    val batched =
      applyDelta(v0, signedState(ins.unionByName(del), keys), keys)
    assert(rows(sequential) === rows(batched))
    // the maintained view equals a from-scratch recompute of the final
    // membership (base − deletes + inserts)
    val direct = li.filter(col("slot") =!= IvmAggDelRem)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sum_cents"))
    assert(rows(batched.select(col(keys.head), col(keys(1)),
        col("n_rows"), col("sum_cents"))) === rows(direct))
    // eviction: deleting an entire group removes its state row
    val only = li.limit(1).withColumn("sign", lit(1L)).localCheckpoint()
    val tiny = signedState(only, keys)
      .withColumn("n_inserted", lit(0L)).withColumn("n_deleted", lit(0L))
    val killed = applyDelta(tiny,
      signedState(only.withColumn("sign", lit(-1L)), keys), keys)
    assert(killed.count() === 0L, "emptied group not evicted")
    // deletes are genuinely populated on the fixture
    assert(del.count() > 0L)
  }

  test("q106: incremental merge equals full recompute for any cutoff") {
    val li = Tables.lineitem(spark, sf)
    val keys = Seq("l_returnflag", "l_linestatus")
    val full = ops.Incremental.partialState(li, keys)
    // three-way split (not just the query's two) must still merge exactly
    val thirds = Seq(
      li.filter(col("l_orderkey") % 3 === 0),
      li.filter(col("l_orderkey") % 3 === 1),
      li.filter(col("l_orderkey") % 3 === 2))
      .map(ops.Incremental.partialState(_, keys))
    val merged = ops.Incremental.mergeStates(thirds, keys)
    assert(merged.orderBy(keys.map(col): _*).collect().toSeq ===
      full.orderBy(keys.map(col): _*).collect().toSeq)
  }

  test("q107: growth columns are consistent with the lag") {
    val out = ops.Windows.q107MomGrowth(spark, sf).collect()
    out.filter(!_.isNullAt(3)).foreach { r =>
      assert(math.abs(r.getDouble(4) - (r.getDouble(2) - r.getDouble(3)))
        < 1e-9)
    }
    // first month per flag has no predecessor
    val flags = out.map(_.getString(0)).distinct.length
    assert(out.count(_.isNullAt(3)) === flags)
  }

  test("q108: profile counts are internally consistent") {
    val out = ops.DataQuality.q108Profile(spark, sf).collect()
    val n = Tables.orders(spark, sf).count()
    assert(out.length === 6)
    out.foreach { r =>
      assert(r.getLong(1) === n, s"${r.getString(0)} n_rows")
      assert(r.getLong(3) <= n - r.getLong(2), s"${r.getString(0)} distinct")
      assert(r.getString(4) <= r.getString(5), s"${r.getString(0)} min<=max")
      assert(r.getLong(7) >= 1, s"${r.getString(0)} top_count")
    }
  }

  test("q109: fixture satisfies every expectation; planted violations counted") {
    val out = ops.DataQuality.q109Expectations(spark, sf).collect()
    assert(out.length === 6)
    assert(out.forall(_.getBoolean(3)), "fixture data should pass all rules")
    assert(out.forall(_.getLong(2) === 0L))
  }

  test("q110: composed pipeline — no PII, no boilerplate, chunk contract") {
    val out = ops.TrainingPipeline.preprocess(
      Tables.documents(spark, sf)).cache()
    try {
      assert(out.count() > 0)
      // no chunk may contain a redaction marker (boilerplate stage strips
      // them) or any raw PII shape
      assert(out.filter(col("chunk_text").contains("<EMAIL>") ||
        col("chunk_text").contains("<ID>") ||
        col("chunk_text").contains("<IP>") ||
        col("chunk_text").contains("@example.com")).count() === 0)
      ops.Privacy.piiPatterns.foreach { case (name, pat, _) =>
        assert(out.filter(
          ops.Privacy.matchCount(col("chunk_text"), pat) > 0).count() === 0,
          s"residual $name in chunks")
      }
      // every surviving doc meets the gate and chunks tile n_kept
      assert(out.filter(col("n_kept") <
        ops.TrainingPipeline.MinKeptTokens).count() === 0)
      val perDoc = out.groupBy("keep_id")
        .agg(max(col("chunk_start") + col("n_tokens")).as("covered"),
          max("n_kept").as("nk"))
      assert(perDoc.filter(col("covered") =!= col("nk")).count() === 0,
        "chunks must cover exactly n_kept tokens")
    } finally out.unpersist()
  }

  test("q111: skew metrics are internally consistent") {
    val out = ops.Scale.q111SkewReport(spark, sf).collect()
    val n = Tables.lineitem(spark, sf).count()
    assert(out.length === 4)
    out.foreach { r =>
      assert(r.getLong(1) === n, s"${r.getString(0)} n_rows")
      assert(r.getLong(4) >= 1 && r.getLong(4) <= n)
      assert(r.getDouble(6) >= 1.0 - 1e-9,
        s"${r.getString(0)} skew_factor below uniform")
    }
    // the 3-value flag column concentrates the most rows on one key
    val byShare = out.map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(byShare("l_returnflag") === byShare.values.max)
  }

  test("q112: winsorization clips ~5% per tail and shrinks the sum spread") {
    val out = ops.Reshape.q112Winsorize(spark, sf).collect()
    out.foreach { r =>
      val (n, lo, hi) = (r.getLong(1), r.getLong(4), r.getLong(5))
      assert(r.getDouble(2) <= r.getDouble(3), "p05 <= p95")
      // each tail clips strictly less than the target percentile count
      assert(lo <= n * 5 / 100 && hi <= n * 5 / 100,
        s"tail clipped too much: $lo/$hi of $n")
      // clipping pulls the sum toward the middle but preserves the count
      assert((r.getDouble(7) != r.getDouble(6)) || (lo == 0 && hi == 0))
    }
  }

  test("q224: geometric-mechanism bins partition [0,2^40); widths decay ~α") {
    val t = ops.Privacy.dpThresholds
    // bins tile the uniform's whole range with no gap or overlap
    assert(t.head._2 === 0L && t.last._3 === (1L << 40))
    t.sliding(2).foreach { case Seq(a, b) => assert(a._3 === b._2) }
    // Pr(k) ∝ α^|k| with α=4/5: adjacent INTERIOR bin widths obey
    // 5·w(|k|+1) = 4·w(|k|) up to the two floors' rounding (|error| ≤ 9)
    def w(k: Int) = { val r = t(k + 40); r._3 - r._2 }
    (0 until 39).foreach { k =>
      assert(math.abs(5 * w(k + 1) - 4 * w(k)) <= 9,
        s"width decay broken at k=$k: ${w(k)} -> ${w(k + 1)}")
      assert(math.abs(5 * w(-(k + 1)) - 4 * w(-k)) <= 9,
        s"width decay broken at k=-$k")
    }
    // symmetric mechanism: Pr(k) = Pr(-k) on interior bins
    (1 until 40).foreach(k => assert(math.abs(w(k) - w(-k)) <= 2))
    // the release applies exactly this mechanism, keyed by the source hash
    val out = ops.Privacy.q224DpCounts(spark, sf).collect()
    out.foreach { r =>
      val noise = r.getAs[Long]("noise")
      assert(noise >= -40 && noise <= 40)
      assert(r.getAs[Long]("dp_count") === r.getAs[Long]("n_true") + noise)
    }
    // noise actually varies across sources (the hash isn't degenerate)
    assert(out.map(_.getAs[Long]("noise")).distinct.length > 1)
  }

  test("q239: DP sum = snap(clip) + C*k; clipping audit reconciles") {
    import org.apache.spark.sql.functions._
    val c = ops.Privacy.DpClip
    val out = ops.Privacy.q239DpSum(spark, sf).collect()
    val direct = Tables.documents(spark, sf)
      .groupBy(col("source"))
      .agg(sum(col("n_chars")).as("s"),
        sum(least(col("n_chars"), lit(c))).as("cs"),
        sum(when(col("n_chars") > c, 1L).otherwise(0L)).as("nc"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    out.foreach { r =>
      val (s, cs, nc) = direct(r.getString(0))
      assert(r.getAs[Long]("true_sum") === s)
      assert(r.getAs[Long]("clipped_sum") === cs)
      assert(r.getAs[Long]("n_clipped") === nc)
      val k = r.getAs[Long]("noise_k")
      assert(k >= -40 && k <= 40)
      val snap = (2 * cs + c) / (2 * c) * c
      assert(math.abs(snap - cs) <= c / 2, "snap within half a granule")
      assert(r.getAs[Long]("dp_sum") === snap + k * c,
        s"${r.getString(0)} mechanism identity")
    }
    // clipping binds somewhere on the fixture (the audit column is live)
    assert(out.map(_.getAs[Long]("n_clipped")).sum > 0L)
    // and the q239 salt draws independently of q224's
    val k224 = ops.Privacy.q224DpCounts(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("noise")).toMap
    val differs = out.count(r =>
      k224(r.getString(0)) != r.getAs[Long]("noise_k"))
    assert(differs > 0, "q239 noise must not replay q224's draws")
  }

  test("q101: media dup groups cover the corpus; reps belong to groups") {
    val out = ops.Multimodal.q101MediaDedup(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(out.map(_.getLong(1)).sum === nDocs)
    assert(out.forall(r => r.getLong(3) >= 1 && r.getLong(3) <= r.getLong(1)))
  }

  test("q250 curation v2: ledger accounting is exact per source") {
    import org.apache.spark.sql.functions._
    val out = ops.TrainingPipeline.q250CurationV2(spark, sf).collect()
    val rawSizes = Tables.documents(spark, sf)
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    var wShareSum = 0.0
    out.foreach { r =>
      val src = r.getString(0)
      assert(r.getAs[Long]("n_raw") === rawSizes(src), s"$src raw")
      // the ledger balances: raw = dedup cut + tail cut + kept
      assert(r.getAs[Long]("n_raw") ===
        r.getAs[Long]("n_dedup_cut") + r.getAs[Long]("n_tail_cut") +
          r.getAs[Long]("n_kept"), s"$src balance")
      // the tail cut is about a third of survivors (integer-quota thirds
      // of n_raw - n_dedup_cut)
      val surv = r.getAs[Long]("n_raw") - r.getAs[Long]("n_dedup_cut")
      // kept = #{rk : 3·rk ≤ 2·surv} = ⌊2·surv/3⌋ exactly
      assert(r.getAs[Long]("n_kept") === surv * 2 / 3,
        s"$src kept ${r.getAs[Long]("n_kept")} of $surv")
      wShareSum += r.getAs[Double]("w_share")
      assert(r.getAs[Double]("per_doc_boost") > 0.0)
    }
    assert(math.abs(wShareSum - 1.0) < 1e-9, s"shares sum $wShareSum")
    // the sf0.001 fixture contains at least one containment duplicate
    // pair at sf0.01 — at this sf the dedup stage may be empty, but the
    // column must never go negative
    assert(out.forall(_.getAs[Long]("n_dedup_cut") >= 0L))
  }
}
