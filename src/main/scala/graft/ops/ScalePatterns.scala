package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale patterns the 100 TB deployment leans on, packaged as reusable
  * operators: bucketed co-located joins (no shuffle at join time) and
  * two-phase salted aggregation for skewed keys. */
object ScalePatterns {

  /** Persist a DataFrame as a bucketed+sorted table: joins/aggregations on
    * `keyCol` between tables bucketed the same way need NO shuffle — the
    * bucketing is the shuffle, paid once at write time. This is the
    * catalog-table analog of the pipeline's pmod-bucketed directory layout.
    */
  def writeBucketed(df: DataFrame, table: String, keyCol: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — plan contains no
    * Exchange on either side (asserted in ScalePatternsSpec). */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      keyCol: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(keyCol))

  /** Two-phase salted aggregation for skewed grouping keys (the hot-host
    * case): phase 1 aggregates on (key, salt) — the hot key's rows spread
    * over `saltFactor` reducers — phase 2 merges the partials per key.
    * Generalizes to any algebraic aggregate; count/sum provided.
    *
    * The salt mixes a content hash of the full row WITH the partition id,
    * NOT monotonically_increasing_id: a retried/speculated task re-reads
    * the same partition (same id, same rows) and re-hashes to the same
    * salts, so phase-1 partials are replayable — identical across runs
    * (asserted in ScalePatternsSpec). The partition-id term matters for
    * duplicate-heavy hot keys: a content hash alone maps identical rows to
    * ONE salt, collapsing the very case salting targets; mixing the
    * partition id spreads cross-partition duplicates while keeping the
    * salt deterministic under whole-partition retry. (Duplicates within a
    * single partition still share a salt, but those are already reduced by
    * map-side combine before the shuffle.) */
  def saltedCounts(df: DataFrame, keyCol: String, saltFactor: Int,
      sumCols: Seq[String] = Seq.empty): DataFrame = {
    val salt = pmod(
      xxhash64(df.columns.map(col) :+ spark_partition_id().cast("long"): _*),
      lit(saltFactor))
    val partialAggs: Seq[Column] =
      count(lit(1)).as("_cnt") +: sumCols.map(c => sum(col(c)).as(s"_sum_$c"))
    val partial = df
      .withColumn("_salt", salt)
      .groupBy(col(keyCol), col("_salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs: Seq[Column] =
      sum(col("_cnt")).as("cnt") +: sumCols.map(c => sum(col(s"_sum_$c")).as(s"sum_$c"))
    partial.groupBy(col(keyCol)).agg(finalAggs.head, finalAggs.tail: _*)
  }
}
