package graft

import java.nio.file.Files
import graft.cli.Main

/** A19/A20 CLI surface: create is checksum-gated (A17), serve exposes
  * the per-label catalog as temp views (§2.B.1 type scans). */
class CliSpec extends SparkSpec {

  test("create builds the store; second create skips via checksum gate") {
    val out = Files.createTempDirectory("graftcli").toString
    Main.create(spark, sfDir, out)
    val ck = java.nio.file.Paths.get(s"$out/checksum.txt")
    val stamp1 = Files.getLastModifiedTime(ck)
    Main.create(spark, sfDir, out) // fresh → skip, checksum untouched
    assert(Files.getLastModifiedTime(ck) == stamp1)
    Main.serve(spark, out, Some(sfDir))
    assert(spark.sql("SELECT count(*) FROM nodes_Customer").collect()(0).getLong(0) == 150)
    assert(spark.table("edges_CONTAINS").count() == 6000)
    // SQL over the served views: 1-hop traversal as a view join
    val r = spark.sql("""SELECT count(*) FROM edges_PLACED e
      JOIN nodes_Customer c ON e.src = c.id""").collect()(0).getLong(0)
    assert(r == 1500)
  }
}
