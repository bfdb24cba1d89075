package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Components, Dedup}

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

  test("connected components agree with a reference union-find on random graphs") {
    val sp = spark
    import sp.implicits._
    val graphGen = for {
      n <- Gen.chooseNum(2, 30)
      m <- Gen.chooseNum(0, 40)
      edges <- Gen.listOfN(m,
        Gen.zip(Gen.chooseNum(0, n - 1), Gen.chooseNum(0, n - 1)))
    } yield (n, edges.filter { case (a, b) => a != b })
    samples(graphGen, 8).foreach { case (n, edges) =>
      // reference: plain union-find with min-label normalization
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected =
        (0 until n).map(i => i.toLong -> find(i).toLong).toMap
      // localSolveMax = 0 forces the iterative join loop — otherwise this
      // property would compare the single-task union-find path against a
      // driver-side union-find, which proves nothing about the loop
      val got = Components.connectedComponents(
          (0 until n).map(_.toLong).toDF("id"),
          edges.map { case (a, b) => (a.toLong, b.toLong) }.toDF("src", "dst"),
          maxIter = 30, localSolveMax = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"n=$n edges=$edges")
      // and the local path must agree with the loop on the same graph
      val local = Components.connectedComponents(
          (0 until n).map(_.toLong).toDF("id"),
          edges.map { case (a, b) => (a.toLong, b.toLong) }.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(local === expected, s"local solve diverged: n=$n edges=$expected")
    }
  }

  test("chunking reconstructs the document: strided prefixes + last chunk") {
    val sp = spark
    import sp.implicits._
    val size = 5; val stride = 3
    samples(textGen, 15).foreach { text =>
      val docs = Seq((1L, text)).toDF("doc_id", "text")
      val chunks = graft.ops.Chunking
        .chunkTokens(docs, "text", size, stride)
        .orderBy("chunk_start").collect()
        .map(r => (r.getLong(1), r.getString(2)))
      // take the first `stride` tokens of every chunk except the last,
      // then the whole last chunk — must equal the original token stream
      val rebuilt = (chunks.dropRight(1).flatMap {
        case (_, t) => t.split(" ").take(stride)
      } ++ chunks.last._2.split(" ")).mkString(" ")
      assert(rebuilt === text, s"reconstruction failed for: $text")
      // starts are exactly 0, stride, 2·stride, … < n_tokens
      val n = text.split(" ").length
      assert(chunks.map(_._1).toSeq ===
        (0 until n by stride).map(_.toLong))
    }
  }

  test("fuzzy join blocking is match-complete for single substitutions") {
    val sp = spark
    import sp.implicits._
    val nameGen = Gen.chooseNum(5, 12)
      .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)
    val catalogGen = Gen.chooseNum(2, 12).flatMap(n =>
      Gen.listOfN(n, nameGen)).map(_.distinct)
    samples(catalogGen, 10).foreach { names =>
      val clean = names.zipWithIndex
        .map { case (s, i) => (i.toLong, s) }.toDF("k", "clean_name")
      val dirty = names.zipWithIndex
        .map { case (s, i) => (i.toLong, s.updated(3, 'x')) }
        .toDF("k2", "dirty_name")
      val block = (c: org.apache.spark.sql.Column) =>
        concat(substring(c, 1, 2), lit("|"), length(c).cast("string"))
      val out = graft.ops.Fuzzy.fuzzyJoin(dirty, clean, "dirty_name",
        "clean_name", block, maxDist = 1).collect()
      // every corrupted name must find its original (distance 0 if the
      // char at index 3 was already 'x', else 1)
      val matched = out.map(r =>
        (r.getAs[Long]("k2"), r.getAs[Long]("k"))).toSet
      names.indices.foreach { i =>
        assert(matched.contains((i.toLong, i.toLong)),
          s"lost twin for ${names(i)}")
      }
    }
  }

  test("PII redaction is exact: clean text is untouched, planted PII dies") {
    val sp = spark
    import sp.implicits._
    samples(textGen, 15).foreach { text =>
      val planted = s"$text mail to a.b-c_9@test-site.org now 123-45-6789 " +
        s"at 192.168.0.1 end"
      val df = Seq((text, planted)).toDF("clean", "dirty")
        .select(
          graft.ops.Privacy.redact(col("clean")).as("clean_out"),
          graft.ops.Privacy.redact(col("dirty")).as("dirty_out"))
      val r = df.collect()(0)
      // fixture vocabulary contains no PII shapes: redaction is identity
      assert(r.getString(0) === text)
      assert(r.getString(1) ===
        s"$text mail to <EMAIL> now <ID> at <IP> end")
    }
  }

  test("salted aggregate equals the plain aggregate for any salt count") {
    val sp = spark
    import sp.implicits._
    val rowGen = Gen.zip(Gen.oneOf("a", "b", "c"), Gen.chooseNum(-50, 50))
    val dataGen = Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, rowGen))
    samples(Gen.zip(dataGen, Gen.chooseNum(1, 16)), 8).foreach {
      case (rows, salts) =>
        val df = rows.toDF("k", "v")
        val salted = graft.ops.Scale.saltedAggregate(df, Seq("k"), salts,
          partials = Seq(sum(col("v").cast("decimal(18,0)")).as("pv"),
            count(lit(1)).as("pn")),
          merges = Seq(sum(col("pv")).cast("long").as("sum_v"),
            sum(col("pn")).as("n")),
          saltCols = Seq("k", "v"))
          .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
          .toMap
        val plain = df.groupBy("k")
          .agg(sum(col("v").cast("decimal(18,0)")).cast("long").as("sum_v"),
            count(lit(1)).as("n"))
          .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
          .toMap
        assert(salted === plain, s"salts=$salts rows=$rows")
    }
  }

  test("compressed overlap count join equals brute pair counting") {
    val sp = spark
    import sp.implicits._
    def days(n: Int) = java.sql.Date.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(n.toLong))
    val ivGen = Gen.zip(Gen.chooseNum(0, 60), Gen.chooseNum(0, 20))
    val sideGen = Gen.chooseNum(1, 25).flatMap(n => Gen.listOfN(n, ivGen))
    samples(Gen.zip(sideGen, sideGen), 8).foreach { case (as, bs) =>
      val a = as.zipWithIndex
        .map { case ((s, len), i) => (i.toLong, days(s), days(s + len)) }
        .toDF("id", "start", "end")
      val b = bs.map { case (s, len) => (days(s), days(s + len)) }
        .toDF("start", "end")
      val compressed = graft.ops.Intervals.overlapCountJoin(a, b)
        .agg(coalesce(sum(col("b_cnt")), lit(0L))).collect()(0).getLong(0)
      val brute = as.zipWithIndex.flatMap { case ((s1, l1), _) =>
        bs.filter { case (s2, l2) => s1 <= s2 + l2 && s2 <= s1 + l1 }
      }.size.toLong
      assert(compressed === brute, s"a=$as b=$bs")
    }
  }

  test("distributed global rank equals a single-partition row_number") {
    val sp = spark
    import sp.implicits._
    val dataGen = Gen.chooseNum(1, 60)
      .flatMap(n => Gen.listOfN(n, Gen.chooseNum(-100, 100)))
    samples(dataGen, 8).foreach { vs =>
      // unique tiebreaker idx makes the order total (the operator contract)
      val df = vs.zipWithIndex.map { case (v, i) => (v, i.toLong) }
        .toDF("v", "idx")
      val ranked = graft.ops.Scale.globalRank(df,
        Seq(col("v"), col("idx")), partitions = 4)
        .collect().map(r => (r.getAs[Long]("idx"), r.getAs[Long]("rank_idx")))
        .toMap
      val expected = vs.zipWithIndex.map { case (v, i) => (v, i.toLong) }
        .sortBy(identity).zipWithIndex
        .map { case ((_, idx), rk) => idx -> rk.toLong }.toMap
      assert(ranked === expected, s"vs=$vs")
    }
  }

  test("distributed global cum-sum equals a single-partition running sum") {
    val sp = spark
    import sp.implicits._
    val dataGen = Gen.chooseNum(1, 60)
      .flatMap(n => Gen.listOfN(n, Gen.zip(
        Gen.chooseNum(-50, 50), Gen.chooseNum(-1000L, 1000L))))
    samples(dataGen, 8).foreach { rows =>
      // unique tiebreaker idx makes the order total (the operator contract)
      val df = rows.zipWithIndex.map { case ((k, x), i) =>
        (k, x, i.toLong) }.toDF("k", "x", "idx")
      val got = graft.ops.Scale.globalCumSum(df,
        Seq(col("k"), col("idx")), Seq("x" -> "cx"), partitions = 4)
        .collect().map(r => r.getAs[Long]("idx") -> r.getAs[Long]("cx"))
        .toMap
      val expected = rows.zipWithIndex
        .map { case ((k, x), i) => (k, i.toLong, x) }
        .sortBy { case (k, i, _) => (k, i) }
        .scanLeft((0L, 0L)) { case ((_, acc), (_, i, x)) => (i, acc + x) }
        .drop(1).toMap
      assert(got === expected, s"rows=$rows")
    }
  }

  test("exact-quota rank-cut split partitions any group into val/test/train") {
    val sp = spark
    import sp.implicits._
    samples(Gen.chooseNum(1, 200), 10).foreach { n =>
      val df = (0 until n).map(i => (i.toLong, "s"))
        .toDF("doc_id", "source")
        .withColumn("n_chars", lit(10L))
      // mirror q217's assignment on an arbitrary group size
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
      val q = math.floor(n * graft.ops.TrainingData.EvalFrac).toLong
      val split = df
        .withColumn("h", expr(s"(doc_id * ${graft.ops.TrainingData.MixA}) % ${graft.ops.TrainingData.Mod32}"))
        .withColumn("rk", row_number().over(w.orderBy(col("h"), col("doc_id"))).cast("long"))
        .withColumn("split", when(col("rk") <= q, "val")
          .when(col("rk") <= q * 2, "test").otherwise("train"))
        .groupBy("split").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(split.getOrElse("val", 0L) === q)
      assert(split.getOrElse("test", 0L) === q)
      assert(split.getOrElse("train", 0L) === n - 2 * q)
    }
  }
}
