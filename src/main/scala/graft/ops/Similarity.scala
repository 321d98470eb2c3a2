package graft.ops

import java.util.SplittableRandom

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the exact baseline (broadcast the small query
  * side — corpus-side stays partition-local, no corpus shuffle); the
  * random-hyperplane LSH bucketing is the scale path: bucket ids are
  * computed row-locally from literal plane vectors, and the candidate join
  * shuffles on the bucket key, turning O(queries × corpus) into
  * O(bucket collisions). */
object Similarity {

  /** Cosine similarity of two array<double> columns via higher-order
    * functions — codegen'd, no UDF. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, x) => acc + x * x))
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(dot / (na * nb))
  }

  /** Exact brute-force top-k: for each query vector, the k nearest corpus
    * vectors by cosine. `queries` must be small (it is broadcast). */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic ±1 hyperplanes (seeded), embedded as literal arrays so
    * the bucket computation is a pure codegen'd expression. */
  private def planes(numPlanes: Int, dim: Int, seed: Long): Seq[Array[Double]] = {
    val rng = new SplittableRandom(seed)
    Seq.fill(numPlanes)(Array.fill(dim)(if (rng.nextBoolean()) 1.0 else -1.0))
  }

  /** Sign-random-projection bucket id: bit h = sign of dot(v, plane_h). */
  def lshBucket(vec: Column, numPlanes: Int, dim: Int, seed: Long = 42L): Column = {
    val ps = planes(numPlanes, dim, seed)
    ps.zipWithIndex.map { case (p, h) =>
      val planeLit = array(p.map(lit): _*)
      val dot = aggregate(zip_with(vec, planeLit, (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0.0, lit(1L << h)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** LSH-bucketed approximate top-k: candidates share the query's bucket;
    * ranked by exact cosine within bucket. Trades recall for a join that
    * shuffles on bucket ids instead of a cross product. */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numPlanes: Int = 12,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val bucket = (v: Column) => lshBucket(v, numPlanes, dim, seed)
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
      .withColumn("bucket", bucket(col("cv")))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
      .withColumn("bucket", bucket(col("qv")))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs within a blocking group. */
  def cosineNearDups(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      groupCol: String,
      threshold: Double): DataFrame = {
    val base = df.select(col(groupCol).as("grp"), col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val l = base.select(col("grp"), col("id").as("id_a"), col("v").as("v_a"))
    val r = base.select(col("grp"), col("id").as("id_b"), col("v").as("v_b"))
    l.join(r, Seq("grp"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
