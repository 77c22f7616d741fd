package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search (SURVEY §2.B.12): brute-force cosine as
  * the exact baseline, and a random-hyperplane LSH bucketing as the
  * approximate scale path (an IVF-style partitioner: candidate pairs
  * only within a bucket).
  *
  * All arithmetic is double-precision with a fixed left-to-right
  * fold, so the DuckDB oracle (list_dot_product over DOUBLE[]) matches
  * bit-for-bit.
  *
  * Scale: brute-force top-k is O(Q·N) with a broadcast of the Q query
  * vectors — right when Q is small; the LSH path shuffles once on
  * bucket id, making candidate generation output-linear. A custom
  * codegen'd Expression for the dot product is the next optimization
  * (SURVEY §7 candidates); `aggregate(zip_with(…))` already stays inside
  * whole-stage codegen.
  */
object Similarity {

  /** Dot product of two array<double> columns: strict left-to-right
    * IEEE accumulation via the codegen'd [[graft.plans.DotProduct]]
    * kernel (bit-identical to the HOF fold
    * `aggregate(zip_with(a,b,(x,y)=>x*y), 0.0, _+_)` it replaces, but
    * stays inside whole-stage codegen). */
  def dot(a: Column, b: Column): Column = graft.plans.DotProduct.dot(a, b)

  /** The interpreted HOF formulation, kept for cross-checking the
    * native kernel in tests. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for a small set of query ids (broadcast the
    * queries; scan the corpus once). */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int): DataFrame = {
    val v = emb.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
    val q = v.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("qid"), col("v").as("qv"))
    val scored = v.join(broadcast(q), col(idCol) =!= col("qid"))
      .select(col("qid"), col(idCol).as("nn"), cosine(col("qv"), col("v")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("nn").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic ±1 hyperplane component for plane i, dimension j —
    * md5-mixed (a linear formula like (a·i+b·j) mod 2 degenerates to a
    * single hyperplane up to sign) and embedded as a literal in both the
    * Spark plan and the SQL oracle. */
  def planeSign(i: Int, j: Int): Int = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane_${i}_$j".getBytes("UTF-8"))
    if ((h(0) & 1) == 0) 1 else -1
  }

  /** Random-hyperplane LSH bucket id over `numPlanes` fixed ±1 planes:
    * bit i = [dot(v, plane_i) > 0]. */
  def lshBucket(vec: Column, dim: Int, numPlanes: Int): Column =
    (0 until numPlanes).map { i =>
      val plane = array((0 until dim).map(j => lit(planeSign(i, j).toDouble)): _*)
      when(dot(vec, plane) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Bucketed ANN: candidates share a bucket; exact cosine re-rank
    * within bucket. */
  def annTopK(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
      numPlanes: Int, k: Int): DataFrame = {
    val v = emb.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .withColumn("bucket", lshBucket(col("v"), dim, numPlanes))
    val a = v.select(col("bucket"), col(idCol).as("qid"), col("v").as("qv"))
    val b = v.select(col("bucket"), col(idCol).as("nn"), col("v").as("nv"))
    val scored = a.join(b, Seq("bucket")).filter(col("qid") =!= col("nn"))
      .select(col("qid"), col("nn"), cosine(col("qv"), col("nv")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("nn").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
