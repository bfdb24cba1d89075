package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The durable gate store (VERDICT r12 #7): probe-gated strategy
  * decisions persist across sessions keyed by an EXACT corpus
  * fingerprint (canonicalized plan text + file inventory with lengths
  * and mtimes), so an unchanged corpus snapshot is never re-probed —
  * and a REWRITTEN one (same path, same row count — the ADVICE r12 memo
  * gap) always is. */
class GateStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.session

  /** A private file-backed copy of the fixture's embeddings so the spec
    * can rewrite it without touching shared state. */
  private def copyFixture(tag: String): String = {
    val dir = Files.createTempDirectory(s"graft-gate-$tag")
    Files.copy(Paths.get(SparkSuite.sf, "embeddings.parquet"),
      dir.resolve("embeddings.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  test("fingerprint: file-backed frames get (plan text, inventory); " +
    "in-memory frames get None; a rewrite changes the inventory") {
    val sp = spark
    import sp.implicits._
    val dir = copyFixture("fp")
    val e = sp.read.parquet(s"$dir/embeddings.parquet")
    val Some((canon1, inv1)) = ops.GateStore.fingerprint(
      ops.Centroids.quantized(e))
    assert(canon1.nonEmpty && inv1.contains("embeddings.parquet"),
      "file-backed frame must fingerprint to its input files")
    // a DIFFERENT computation over the same files fingerprints apart
    val Some((canon2, inv2)) = ops.GateStore.fingerprint(
      ops.Centroids.quantized(e.filter(col("vec_id") < 100)))
    assert(inv2 === inv1, "same files, same inventory")
    assert(canon2 !== canon1,
      "a different filter must change the plan-text side of the key")
    // in-memory: no durable identity
    val local = Seq((1L, Array(0.1f, 0.2f))).toDF("vec_id", "embedding")
    assert(ops.GateStore.fingerprint(local).isEmpty,
      "a LocalRelation frame has no file-backed fingerprint")
    // rewrite in place (same bytes, new mtime): inventory must change.
    // The sleep sits ABOVE 1 s (ADVICE r13): on a filesystem with
    // coarse mtime granularity a 5 ms guard can flake — and the store's
    // own documented contract only promises rewrite detection past the
    // filesystem's mtime resolution.
    Thread.sleep(1100)
    Files.copy(Paths.get(SparkSuite.sf, "embeddings.parquet"),
      Paths.get(dir, "embeddings.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val e2 = sp.read.parquet(s"$dir/embeddings.parquet")
    val Some((_, inv3)) = ops.GateStore.fingerprint(
      ops.Centroids.quantized(e2))
    assert(inv3 !== inv1,
      "an in-place rewrite (same path, same length) must change the " +
        "inventory via its mtime — the ADVICE r12 stale-replay gap")
  }

  test("cross-session reuse: the second session takes the stored " +
    "decision without probing; a rewrite forces a fresh probe") {
    val fixDir = copyFixture("store")
    val gateDir = Files.createTempDirectory("graft-gate-decisions")
      .resolve("decisions").toString
    def resolveIn(sess: org.apache.spark.sql.SparkSession): Long = {
      val e = sess.read.parquet(s"$fixDir/embeddings.parquet")
      val qv = ops.Centroids.quantized(e)
      ops.Centroids.resolveAssignGate(qv, 500L, 23L, None,
        ops.Centroids.HierAssignGate, 0L, gateDir = Some(gateDir))
    }
    // session 1: no store, no memo -> probes once and records
    ops.Centroids.clearGateMemoForTest()
    val runs0 = ops.Centroids.hierProbeRuns.get()
    val g1 = resolveIn(spark)
    assert(ops.Centroids.hierProbeRuns.get() === runs0 + 1,
      "first resolve must run the probe")
    // same session, memo intact -> memo serves it
    val g1b = resolveIn(spark)
    assert(g1b === g1 &&
      ops.Centroids.hierProbeRuns.get() === runs0 + 1,
      "memoized resolve must not re-probe")
    // "session 2": fresh session state AND a cleared memo (the memo is
    // JVM-wide, so clearing it is what a new JVM would look like) ->
    // the durable store must serve the decision with ZERO probe runs
    ops.Centroids.clearGateMemoForTest()
    val spark2 = spark.newSession()
    val g2 = resolveIn(spark2)
    assert(g2 === g1, "second session must reach the same decision")
    assert(ops.Centroids.hierProbeRuns.get() === runs0 + 1,
      "second session must take the STORED decision without probing")
    // the store holds exactly the one accounting row, with the exact
    // integer threshold recorded
    val rows = ops.GateStore.readAll(spark, gateDir).collect()
    assert(rows.length === 1, s"expected one decision row, got ${rows.length}")
    val r = rows.head
    assert(r.getAs[Long]("n") === 500L && r.getAs[Long]("k") === 23L &&
      r.getAs[Long]("thr_num") === 9L && r.getAs[Long]("thr_den") === 10L)
    assert(r.getAs[Long]("tot") > 0L && r.getAs[Long]("agree") >= 0L)
    // rewrite the corpus in place: same path, same row count -> the
    // fingerprint changes, the stored row no longer matches, re-probe
    Thread.sleep(1100) // above mtime granularity (ADVICE r13)
    Files.copy(Paths.get(SparkSuite.sf, "embeddings.parquet"),
      Paths.get(fixDir, "embeddings.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    ops.Centroids.clearGateMemoForTest()
    val g3 = resolveIn(spark)
    assert(g3 === g1, "identical bytes re-probe to the same decision")
    assert(ops.Centroids.hierProbeRuns.get() === runs0 + 2,
      "a rewritten snapshot must be re-probed, not replayed stale")
    assert(ops.GateStore.readAll(spark, gateDir).count() === 2L,
      "the fresh decision adds its own accounting row")
  }

  test("nprobe decisions persist too: the second session reuses the " +
    "stored dial point without re-running the sweep") {
    val fixDir = copyFixture("nprobe")
    val gateDir = Files.createTempDirectory("graft-gate-nprobe")
      .resolve("decisions").toString
    def resolveIn(sess: org.apache.spark.sql.SparkSession): Long = {
      val e = sess.read.parquet(s"$fixDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      ops.Similarity.resolveNprobe(e, 500L, autoProbeGate = 0L,
        gateDir = Some(gateDir))
    }
    ops.Similarity.clearNprobeMemoForTest()
    val runs0 = ops.Similarity.nprobeRuns.get()
    val p1 = resolveIn(spark)
    assert(ops.Similarity.nprobeRuns.get() === runs0 + 1,
      "first resolve must run the dial sweep")
    ops.Similarity.clearNprobeMemoForTest()
    val p2 = resolveIn(spark.newSession())
    assert(p2 === p1, "second session must reach the same dial point")
    assert(ops.Similarity.nprobeRuns.get() === runs0 + 1,
      "second session must take the STORED pick without sweeping")
    val rows = ops.GateStore.readAll(spark, gateDir)
      .filter(col("kind") === "ivf-nprobe").collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("choice") === p1 &&
      rows.head.getAs[Long]("tot") > 0L,
      "the stored row carries the pick and its recall accounting")
    assert(rows.head.getAs[Long]("k") === 8L,
      "the fixed-quantizer resolve records its k")
    // the SCALED-k resolver records the REAL k (VERDICT r13 #2): a
    // fresh resolve at k = ⌈√n⌉ = 23 must land its own store row
    // keyed by that k
    ops.Similarity.clearNprobeMemoForTest()
    resolveIn(spark.newSession()) // re-warm the memo path is irrelevant
    ops.Similarity.clearNprobeMemoForTest()
    val e23 = spark.newSession().read
      .parquet(s"$fixDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val pScaled = ops.Similarity.resolveNprobe(e23, 500L,
      autoProbeGate = 0L, gateDir = Some(gateDir), k = 23L)
    val scaledRows = ops.GateStore.readAll(spark, gateDir)
      .filter(col("kind") === "ivf-nprobe" && col("k") === 23L).collect()
    assert(scaledRows.length === 1 &&
      scaledRows.head.getAs[Long]("choice") === pScaled,
      "the scaled resolve must record its real k in the store")
  }

  test("probeConclusive: the exact-integer 2-SE test matches its IEEE " +
    "definition and reads conclusive on both measured regimes") {
    // (10a - 9t)^2 * t > 400 * a * (t - a)  <=>  |a/t - 0.9| > 2*SE
    def ieee(a: Long, t: Long): Boolean = {
      val p = a.toDouble / t
      math.abs(p - 0.9) > 2.0 * math.sqrt(p * (1 - p) / t)
    }
    // exhaustive cross-check at small tot (every boundary case the
    // squaring could distort lives here) ...
    for (t <- 1L to 60L; a <- 0L to t)
      assert(ops.Centroids.probeConclusive(a, t) === ieee(a, t),
        s"a=$a t=$t: integer form must match the IEEE definition")
    // ...and spot values at the sample cap scale
    Seq((151L, 541L), (232L, 1000L), (900L, 1000L), (905L, 1000L),
      (950L, 1000L), (1000L, 1000L)).foreach { case (a, t) =>
      assert(ops.Centroids.probeConclusive(a, t) === ieee(a, t),
        s"a=$a t=$t")
    }
    assert(!ops.Centroids.probeConclusive(0L, 0L),
      "an empty sample is never conclusive")
    // a corpus sitting exactly ON the gate is inconclusive at any tot
    assert(!ops.Centroids.probeConclusive(9L, 10L) &&
      !ops.Centroids.probeConclusive(900L, 1000L),
      "p-hat = 0.90 exactly must read inconclusive")
    // both measured regimes sit far outside 2 SEs: the r11/r12/r13
    // committed readings (isotropic 151/541, blob-mixed 232/1000) and
    // planted locality (tot/tot)
    assert(ops.Centroids.probeConclusive(151L, 541L) &&
      ops.Centroids.probeConclusive(232L, 1000L) &&
      ops.Centroids.probeConclusive(500L, 500L),
      "the committed regimes must read conclusive")
    // the FULL resolver rule (gateGo = threshold AND conclusive): a
    // corpus within 2 SEs of the gate never commits to the approximate
    // index, even when its point estimate clears 9/10
    assert(!ops.Centroids.gateGo(18L, 20L),
      "18/20 = 0.90 exactly clears the threshold but is inconclusive " +
        "at tot=20 — the conservative flat path must win")
    assert(!ops.Centroids.gateGo(19L, 20L),
      "19/20 = 0.95 sits inside 2 SEs (0.0975) of the gate at tot=20")
    assert(ops.Centroids.gateGo(20L, 20L),
      "a unanimous sample has zero SE and goes")
    assert(ops.Centroids.gateGo(950L, 1000L),
      "0.95 at the production cap is 5+ SEs above the gate and goes")
    assert(!ops.Centroids.gateGo(905L, 1000L),
      "0.905 at the cap is inside the ~(0.881, 0.919) band and stays flat")
    assert(!ops.Centroids.gateGo(151L, 541L) &&
      !ops.Centroids.gateGo(0L, 0L),
      "below-threshold and empty samples stay flat")
  }

  test("per-decision directories: concurrent-style records never " +
    "collide; compaction folds to one file and lookups survive it") {
    val gateDir = Files.createTempDirectory("graft-gate-compact")
      .resolve("decisions").toString
    def dec(i: Long) = ops.GateStore.Decision(
      "hier-assign-gate", s"plan-$i", "", s"f-$i:1:$i", 100L + i, 10L,
      9L, 10L, go = false, 9L, 10L, choice = 0L)
    (0L until 5L).foreach(i => ops.GateStore.record(spark, gateDir, dec(i)))
    // one subdirectory per decision — no shared staging path to race on
    val fs = new org.apache.hadoop.fs.Path(gateDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(gateDir))
      .count(_.isDirectory) === 5)
    def look(i: Long) = ops.GateStore.lookup(spark, gateDir,
      "hier-assign-gate", s"plan-$i", "", s"f-$i:1:$i", 100L + i, 10L,
      9L, 10L)
    assert((0L until 5L).forall(i => look(i).exists(_.n === 100L + i)))
    // compact: five single-row directories fold to one; every lookup
    // still serves, and the store is one directory with one data file
    assert(ops.GateStore.compact(spark, gateDir) === 5L)
    assert((0L until 5L).forall(i => look(i).exists(_.n === 100L + i)))
    val kids = fs.listStatus(new org.apache.hadoop.fs.Path(gateDir))
      .filter(_.isDirectory)
    assert(kids.length === 1, "compaction must leave one directory")
    // a duplicate IDENTICAL record (the legal concurrent-writer
    // outcome) is tolerated by lookup...
    ops.GateStore.record(spark, gateDir, dec(0L))
    assert(look(0L).isDefined)
    // ...but a CONFLICTING decision under the same key is corruption
    // and must be loud
    ops.GateStore.record(spark, gateDir,
      dec(1L).copy(go = true, choice = 1L))
    assertThrows[IllegalArgumentException] { look(1L) }
  }

  test("a record landing DURING compact survives it (VERDICT r14 #6): " +
    "the fold reads and deletes only its child-listing snapshot") {
    val gateDir = Files.createTempDirectory("graft-gate-race")
      .resolve("decisions").toString
    def dec(i: Long) = ops.GateStore.Decision(
      "hier-assign-gate", s"plan-$i", "", s"f-$i:1:$i", 100L + i, 10L,
      9L, 10L, go = false, 9L, 10L, choice = 0L)
    def look(i: Long) = ops.GateStore.lookup(spark, gateDir,
      "hier-assign-gate", s"plan-$i", "", s"f-$i:1:$i", 100L + i, 10L,
      9L, 10L)
    (0L until 3L).foreach(i => ops.GateStore.record(spark, gateDir, dec(i)))
    // inject the concurrent record at the worst moment: after compact
    // snapshots its child listing, before it folds and deletes — the
    // r14 ordering (read-all THEN list) deleted exactly this decision
    val folded = ops.GateStore.compactWithHook(spark, gateDir,
      () => ops.GateStore.record(spark, gateDir, dec(99L)))
    assert(folded === 3L, "only the snapshot's three decisions fold")
    assert(look(99L).exists(_.n === 199L),
      "the mid-compact record must survive the compaction")
    assert((0L until 3L).forall(i => look(i).exists(_.n === 100L + i)),
      "the folded decisions still serve")
    assert(ops.GateStore.readAll(spark, gateDir).count() === 4L,
      "no row dropped, no row duplicated")
    // and the NEXT compact folds the straggler in
    assert(ops.GateStore.compact(spark, gateDir) === 4L)
    assert(look(99L).isDefined)
  }

  test("a rule-version bump invalidates stored rows instead of " +
    "replaying them") {
    val gateDir = Files.createTempDirectory("graft-gate-rulever")
      .resolve("decisions").toString
    val old = ops.GateStore.Decision(
      "hier-assign-gate", "plan-x", "", "f:1:1", 500L, 23L,
      9L, 10L, go = false, 9L, 10L, choice = 0L,
      ruleVer = ops.GateStore.RuleVer - 1L)
    ops.GateStore.record(spark, gateDir, old)
    assert(ops.GateStore.lookup(spark, gateDir, "hier-assign-gate",
      "plan-x", "", "f:1:1", 500L, 23L, 9L, 10L).isEmpty,
      "a row probed under an older rule version must not replay")
    // and a different threshold under the current rule is its own key
    ops.GateStore.record(spark, gateDir, old.copy(
      ruleVer = ops.GateStore.RuleVer, thrNum = 8L))
    assert(ops.GateStore.lookup(spark, gateDir, "hier-assign-gate",
      "plan-x", "", "f:1:1", 500L, 23L, 9L, 10L).isEmpty,
      "a row probed under a different threshold must not replay")
  }

  test("resolveNprobe on a corpus missing the probe-query ids: " +
    "conservative endpoint, nothing recorded durably") {
    val sp = spark
    import sp.implicits._
    val gateDir = Files.createTempDirectory("graft-gate-emptydial")
      .resolve("decisions").toString
    // ids start at 1000 — the [8, 13) probe slice is empty
    val rng = new scala.util.Random(7)
    val e = (0 until 60).map(i =>
      (1000L + i, Array.fill(64)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    ops.Similarity.clearNprobeMemoForTest()
    val pick = ops.Similarity.resolveNprobe(e, 60L, autoProbeGate = 0L,
      gateDir = Some(gateDir))
    assert(pick === 8L,
      "an empty dial must fall back to the conservative endpoint")
    assert(!Files.exists(Paths.get(gateDir)),
      "a zero-evidence endpoint pick must not persist durably")
  }

  test("in-memory corpora never touch the durable store") {
    val sp = spark
    import sp.implicits._
    val gateDir = Files.createTempDirectory("graft-gate-mem")
      .resolve("decisions").toString
    val rng = new scala.util.Random(11)
    val centers = Array.fill(9)(Array.fill(64)(rng.nextGaussian() * 10))
    val loc = (0 until 500).map { i =>
      (i.toLong, centers(i % 9).map(c =>
        (c + 0.01 * rng.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding")
    ops.Centroids.clearGateMemoForTest()
    val g = ops.Centroids.resolveAssignGate(ops.Centroids.quantized(loc),
      500L, 23L, None, ops.Centroids.HierAssignGate, 0L,
      gateDir = Some(gateDir))
    assert(g === 0L, "locality corpus still auto-selects two-level")
    assert(!Files.exists(Paths.get(gateDir)),
      "a LocalRelation corpus has no durable identity and must leave " +
        "the store untouched")
  }
}
