package graft.load

import java.nio.file.{Files, Path}
import java.security.MessageDigest

/** Change-detection pseudo-hash + rebuild gate (SURVEY §2.A A17).
  *
  * The reference computes `md5(lastModifiedTime + "__" + size)` of the
  * input file — an O(1) attribute hash, NOT a content hash
  * (`/root/reference/src/src/main/java/de/unibi/agbi/biodwh2/arcadedb/server/HashUtils.java:21-24`;
  * its full-content variant at `:15-19` is dead code) — stores it in
  * `arcadedb/checksum.txt` after a build
  * (`ArcadeDBServer.java:76-90`) and compares on serve, warning when
  * stale (`ArcadeDBServer.java:105-119`).
  */
object Checksum {

  def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** `md5(mtime + "__" + size)` — format pinned to `HashUtils.java:23`
    * (`lastModifiedTime.toString + "__" + size`). */
  def pseudoHash(input: Path): String = {
    val attrs = Files.readAttributes(input, classOf[java.nio.file.attribute.BasicFileAttributes])
    md5Hex(attrs.lastModifiedTime().toString + "__" + attrs.size())
  }

  /** Directory inputs: combine the per-file pseudo-hashes of the sorted
    * file listing (the Spark-side generalization for multi-file parquet
    * inputs; same O(attrs) cost model as the reference). */
  def pseudoHashDir(dir: Path): String = {
    import scala.jdk.CollectionConverters._
    // Files.walk holds directory handles until closed — the CLI calls
    // the gate on every create/serve, so an unclosed stream leaks fds
    val walk = Files.walk(dir)
    try {
      val files = walk.iterator().asScala
        .filter(Files.isRegularFile(_)).toSeq.sortBy(_.toString)
      md5Hex(files.map(pseudoHash).mkString("__"))
    } finally walk.close()
  }

  def store(checksumFile: Path, hash: String): Unit = {
    Files.createDirectories(checksumFile.getParent)
    Files.writeString(checksumFile, hash)
  }

  /** Rebuild gate: Some(stored) if a checksum exists, None otherwise —
    * caller warns/rebuilds exactly like `ArcadeDBServer.java:105-119`
    * (missing or mismatched ⇒ stale). */
  def isFresh(checksumFile: Path, input: Path): Boolean =
    Files.exists(checksumFile) &&
      Files.readString(checksumFile).trim ==
        (if (Files.isDirectory(input)) pseudoHashDir(input) else pseudoHash(input))
}
