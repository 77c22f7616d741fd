package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import graft.load.IndexKeys
import graft.queries.GraphQueries

/** The persisted co-purchase layout (VERDICT r17 order #2): the graph
  * analytics family's shared edge list is a store-backed,
  * fingerprint-keyed parquet layout — built once per source
  * generation, opened cold by any later JVM, and refused loudly once
  * the source moves on (the buildIvfIndex / residentBandIndex
  * discipline applied to the derived graph).
  */
class CoPurchaseLayoutSpec extends SparkSpec {

  private def tmpRoot(): String =
    Files.createTempDirectory("graft-copurchase").toString

  test("first build publishes the layout under the source fingerprint key; " +
       "contents equal the direct derivation") {
    val root = tmpRoot()
    val built = GraphQueries.coPurchasePersisted(spark, sfDir, root)
    val key = IndexKeys.key("copurchase", s"$sfDir/lineitem.parquet")
    assert(Files.isDirectory(Paths.get(root, key)), s"expected $root/$key")
    val direct = graft.operators.Triangles.cooccurrenceEdges(
      spark.read.parquet(s"$sfDir/lineitem.parquet"), "l_orderkey", "l_partkey", 50)
    assert(built.count() == direct.count())
    assert(built.exceptAll(direct).isEmpty && direct.exceptAll(built).isEmpty)
  }

  test("a cold open (openFresh — no builder in scope) serves the published " +
       "layout without re-deriving") {
    val root = tmpRoot()
    val built = GraphQueries.coPurchasePersisted(spark, sfDir, root)
    // openFresh is the probe-only entry a cold serving JVM uses: it must
    // find the current-generation key on disk and read it as-is
    val cold = IndexKeys.openFresh(spark, root, "copurchase",
      s"$sfDir/lineitem.parquet")
    assert(cold.count() == built.count())
    assert(cold.schema.fieldNames.toSeq == Seq("a", "b"))
  }

  test("a regenerated source re-keys: the old generation is refused by " +
       "openFresh, naming the stale key; a rebuild publishes the new key") {
    val root = tmpRoot()
    // a private copy of the source so the test can regenerate it
    val srcDir = Files.createTempDirectory("graft-copurchase-src").toString
    Files.copy(Paths.get(s"$sfDir/lineitem.parquet"),
      Paths.get(s"$srcDir/lineitem.parquet"))
    GraphQueries.coPurchasePersisted(spark, srcDir, root)
    val oldKey = IndexKeys.key("copurchase", s"$srcDir/lineitem.parquet")
    assert(Files.isDirectory(Paths.get(root, oldKey)))

    // regenerate: rewrite the file with different size (append-free
    // parquet rewrite isn't needed — the fingerprint is mtime__size, and
    // a REAL regeneration always moves at least one of them)
    val bytes = Files.readAllBytes(Paths.get(s"$sfDir/lineitem.parquet"))
    val tmp = Paths.get(s"$srcDir/.lineitem.tmp")
    Files.write(tmp, bytes ++ Array[Byte]()) // same bytes, fresh mtime
    Files.move(tmp, Paths.get(s"$srcDir/lineitem.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    Files.setLastModifiedTime(Paths.get(s"$srcDir/lineitem.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 5000))

    val newKey = IndexKeys.key("copurchase", s"$srcDir/lineitem.parquet")
    assert(newKey != oldKey, "regeneration must move the fingerprint")
    val ex = intercept[IllegalStateException] {
      IndexKeys.openFresh(spark, root, "copurchase", s"$srcDir/lineitem.parquet")
    }
    assert(ex.getMessage.contains("STALE") && ex.getMessage.contains(oldKey),
      s"refusal must name the stale generation: ${ex.getMessage}")
    // the build-or-open path publishes the new generation; the stale one
    // stays inert under its dead key (never consulted again)
    GraphQueries.coPurchasePersisted(spark, srcDir, root)
    assert(Files.isDirectory(Paths.get(root, newKey)))
    IndexKeys.openFresh(spark, root, "copurchase", s"$srcDir/lineitem.parquet")
  }
}
