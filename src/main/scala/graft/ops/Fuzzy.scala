package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Fuzzy (edit-distance) joins with blocking — the entity-resolution /
  * record-linkage staple: match dirty strings back to a clean catalog
  * without a quadratic cross join.
  *
  * The scale-safe shape: a cheap BLOCKING key that provably co-locates
  * every true match goes into the equi-join (so Spark plans an ordinary
  * hash/sort-merge join), and the expensive `levenshtein` runs only as a
  * residual filter on within-block candidate pairs. An unblocked fuzzy
  * join is a cartesian product — at 100 TB the blocking key IS the
  * operator.
  */
object Fuzzy {

  /** Max edit distance accepted by q103. */
  val maxDistance = 2

  /** Deterministic single-substitution corruption (4th char → 'x') —
    * preserves length and the first three characters, which is what makes
    * [[prefixLengthBlock]] match-complete. Shared by q103 and the Soak
    * flat-pairs probe so they can never measure different queries. */
  def corruptName(c: Column): Column =
    concat(substring(c, 1, 3), lit("x"), c.substr(lit(5), length(c)))

  /** The match-complete blocking key for single substitutions. */
  def prefixLengthBlock(c: Column): Column =
    concat(substring(c, 1, 2), lit("|"), length(c).cast("string"))

  /** Name-level (dirty, clean) frames for a part catalog: DISTINCT names
    * with min-key representatives and row counts — the dedup-before-pair-
    * work shape q103 and the Soak probe both join. */
  def nameLevelFrames(part: DataFrame): (DataFrame, DataFrame) = {
    val clean = part.groupBy(col("p_name").as("clean_name"))
      .agg(min(col("p_partkey")).as("clean_rep"),
        count(lit(1)).as("n_clean_rows"))
    val dirty = part
      .select(col("p_partkey"), corruptName(col("p_name")).as("dirty_name"))
      .groupBy(col("dirty_name"))
      .agg(min(col("p_partkey")).as("dirty_rep"),
        count(lit(1)).as("n_dirty_rows"))
    (dirty, clean)
  }

  /** Fuzzy-match `dirty` rows to `clean` rows: equi-join on `blockKey`
    * applied to both sides, residual-filter on edit distance ≤ maxDist.
    * The caller guarantees the blocking function is match-complete (a true
    * match never lands in a different block). */
  def fuzzyJoin(dirty: DataFrame, clean: DataFrame, dirtyText: String,
      cleanText: String, blockKey: Column => Column,
      maxDist: Int): DataFrame =
    dirty.withColumn("__block", blockKey(col(dirtyText)))
      .join(clean.withColumn("__block", blockKey(col(cleanText))), "__block")
      // thresholded levenshtein (Spark 3.5+) runs a banded DP that aborts
      // as soon as the distance must exceed the bound — O(d·min(m,n))
      // instead of O(m·n) on the (majority) non-matching candidate pairs;
      // it returns -1 past the bound, hence the >= 0 guard. Kept rows
      // carry the exact distance, so the plain-levenshtein oracle matches.
      .withColumn("distance",
        levenshtein(col(dirtyText), col(cleanText), maxDist))
      .filter(col("distance") >= 0 && col("distance") <= maxDist)
      .drop("__block")

  /** q103_fuzzy_join — corrupt every part name deterministically (replace
    * the 4th char with 'x'), then link the dirty names back to the clean
    * catalog. Two scale decisions:
    *
    *  1. Match DISTINCT NAMES, not rows. Catalog names repeat heavily, and
    *     identical values explode quadratically inside any block (the
    *     fuzzy-join face of the mega-bucket problem); each side therefore
    *     collapses to (name, min key as representative, row count) BEFORE
    *     the pair join — rows rejoin the name-level verdicts cheaply if
    *     key-level output is needed.
    *  2. The corruption is a single substitution preserving length and the
    *     first three characters, so (first 2 chars, length) is a
    *     match-COMPLETE blocking key: every true (dirty, clean-twin) pair
    *     shares it by construction. */
  def q103FuzzyJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val (dirty, clean) = nameLevelFrames(Tables.part(spark, sfDir))
    fuzzyJoin(dirty, clean, "dirty_name", "clean_name", prefixLengthBlock,
      maxDistance)
      .select(col("dirty_name"), col("clean_name"),
        col("distance").cast("long").as("distance"),
        col("dirty_rep"), col("n_dirty_rows"),
        col("clean_rep"), col("n_clean_rows"))
      .orderBy(col("dirty_name"), col("clean_name"))
  }

  val q103Sql: String =
    s"""WITH clean AS (
       |  SELECT p_name AS clean_name, min(p_partkey) AS clean_rep,
       |         count(*) AS n_clean_rows,
       |         substr(p_name, 1, 2) || '|' || length(p_name) AS block
       |  FROM part GROUP BY p_name),
       |dirty AS (
       |  SELECT dirty_name, min(p_partkey) AS dirty_rep,
       |         count(*) AS n_dirty_rows,
       |         substr(dirty_name, 1, 2) || '|' || length(dirty_name) AS block
       |  FROM (SELECT p_partkey,
       |               substr(p_name, 1, 3) || 'x' || substr(p_name, 5)
       |                 AS dirty_name
       |        FROM part)
       |  GROUP BY dirty_name)
       |SELECT d.dirty_name, c.clean_name,
       |       CAST(levenshtein(d.dirty_name, c.clean_name) AS BIGINT)
       |         AS distance,
       |       d.dirty_rep, d.n_dirty_rows, c.clean_rep, c.n_clean_rows
       |FROM dirty d JOIN clean c ON d.block = c.block
       |WHERE levenshtein(d.dirty_name, c.clean_name) <= $maxDistance
       |ORDER BY d.dirty_name, c.clean_name""".stripMargin
}
