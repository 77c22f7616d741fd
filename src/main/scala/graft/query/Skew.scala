package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY §7 "100 TB posture":
  * skewed keys → salting or AQE skew-join).
  *
  * First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`,
  * on by default), which splits oversized shuffle partitions at runtime.
  * Salting is the declarative fallback when a SINGLE key is hot enough
  * that even a split partition hammers one reducer — e.g. a celebrity
  * node's edges in the traversal joins, or a stop-shingle in the dedup
  * inverted-index join.
  */
object Skew {

  /** Salted equi-join of a skewed fact side against a (smaller) build
    * side: fact rows scatter deterministically over `salts` buckets
    * (hash of all columns — no RNG, so plans stay replayable), the build
    * side is replicated once per bucket, and the join key becomes
    * (key, salt) — spreading one hot key over `salts` reducers.
    * Result is bag-equal to `fact.join(build, key)`. */
  def saltedJoin(fact: DataFrame, build: DataFrame, factKey: String,
      buildKey: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(fact.columns.map(fact.col).toIndexedSeq: _*), lit(salts)))
    val replicatedBuild = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact
      .join(replicatedBuild,
        saltedFact(factKey) === replicatedBuild(buildKey) &&
          saltedFact("__salt") === replicatedBuild("__salt"))
      .drop("__salt")
  }

  /** Key-frequency profile — the diagnostic that decides between AQE,
    * salting, or a broadcast: top-k hottest keys with counts. */
  def keyProfile(df: DataFrame, key: String, topK: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(key)).limit(topK)
}
