package graft.load

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** UNIFIED resident-index freshness (VERDICT r12 order #9): the
  * signature index, span index, epoch authorities, IVF index, and
  * trained-model caches each fingerprint their SOURCE so a regenerated
  * corpus can never serve a stale authority — but before this module
  * each derived the fingerprint its own way (mtime__size pseudo-hash
  * vs manifest inspection), so a source that is a GRAFT STORE paid the
  * mtime trade (BASELINE #14: a byte-identical rewrite re-keys, a
  * same-second same-size overwrite doesn't) even though the store
  * already maintains the exact invalidation signal: the manifest
  * `seq`, bumped atomically with EVERY commit (data swap, DML append,
  * DDL, postings — `Store.Manifest`: every `with*` is `seq + 1`).
  *
  * The rule: a graft-store source keys on `seq<N>` — dependent indexes
  * re-key on exactly the commits that can change their content, and
  * NOT on irrelevant mtime churn (a backup's copy, a sweep's touch);
  * every other source keeps the reference's own attribute pseudo-hash
  * (`HashUtils.java:21-24` — the checksum-gate model, A17).
  *
  * Two serving disciplines are covered:
  *   - KEY-ADDRESSED caches (band/span/epoch indexes under
  *     `cacheRoot/key`): the fingerprint is IN the key, so staleness
  *     is structurally impossible through the build-or-open path;
  *     [[openFresh]] is the probe-only entry that REFUSES when the
  *     current-source key is absent (instead of silently rebuilding —
  *     the serving tier must never pay a surprise 100 TB build).
  *   - IN-PLACE layouts (the IVF index dir, which appendToIvfIndex
  *     legitimately mutates): [[stamp]] records the source fingerprint
  *     in a sidecar at build/append time, [[requireFresh]] refuses
  *     loudly on mismatch (a DML append bumps the store seq, so the
  *     index is stale until its own append catches it up and
  *     re-stamps).
  */
object IndexKeys {

  /** Fingerprint of an index source path: manifest `seq` for a graft
    * store, mtime__size pseudo-hash otherwise. */
  def fingerprint(source: String): String = {
    val p = Paths.get(source)
    if (Files.exists(Store.manifestPath(source)))
      s"seq${Store.readManifest(source).seq}"
    else if (Files.isDirectory(p)) Checksum.pseudoHashDir(p)
    else Checksum.pseudoHash(p)
  }

  /** Cache key of index `family` over `source` — embed this in every
    * key-addressed cache path (`cacheRoot/key(...)`). */
  def key(family: String, source: String): String =
    s"$family-${fingerprint(source)}"

  /** Probe-only open of a key-addressed cache: the index must already
    * exist AT THE CURRENT source fingerprint. Refuses loudly otherwise,
    * naming any stale generations found on disk — never a silent
    * rebuild, never a silent stale serve. */
  def openFresh(spark: SparkSession, cacheRoot: String, family: String,
      source: String): DataFrame = {
    val k = key(family, source)
    val dest = Paths.get(cacheRoot, k)
    if (!Files.isDirectory(dest)) {
      val stale = listFamily(Paths.get(cacheRoot), family).filterNot(_ == k)
      throw new IllegalStateException(
        s"index '$family' for $source is ${if (stale.isEmpty) "missing" else "STALE"}: " +
          s"expected $cacheRoot/$k" +
          (if (stale.isEmpty) "" else s"; found ${stale.mkString(", ")} " +
            "(built against a previous source generation)") +
          " — rebuild the index against the current source first")
    }
    spark.read.parquet(dest.toString)
  }

  private def listFamily(root: Path, family: String): Seq[String] = {
    if (!Files.isDirectory(root)) return Nil
    import scala.jdk.CollectionConverters._
    val s = Files.list(root)
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(n => n.startsWith(s"$family-") && !n.startsWith(".build-"))
      .toSeq.sorted
    finally s.close()
  }

  private def sidecar(indexDir: String): Path =
    Paths.get(indexDir, "source.fp")

  /** Record the source fingerprint inside an in-place index layout —
    * called at build time and after every index append that catches
    * the index up to the source's current state. */
  def stamp(indexDir: String, source: String): Unit = {
    Files.createDirectories(Paths.get(indexDir))
    Files.writeString(sidecar(indexDir), fingerprint(source))
  }

  /** The stale probe for in-place layouts: refuse loudly when the
    * index's recorded source fingerprint is missing or no longer the
    * source's current one. */
  def requireFresh(indexDir: String, source: String): Unit = {
    val sc = sidecar(indexDir)
    val cur = fingerprint(source)
    val rec = if (Files.exists(sc)) Some(Files.readString(sc).trim) else None
    if (!rec.contains(cur))
      throw new IllegalStateException(
        s"index at $indexDir is STALE for $source: source is at '$cur', " +
          s"index was built against '${rec.getOrElse("<unstamped>")}' — " +
          "rebuild or append-refresh the index first")
  }
}
