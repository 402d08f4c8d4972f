package graft.crawl

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Manifest round-trip properties the Jackson writer/reader must hold —
  * in particular under HOSTILE names (a counter named like a table, a
  * quote/bracket in a name), the class of inputs that silently corrupted
  * the former string-built + regex-parsed manifest.
  */
class SnapshotSpec extends SparkSpec {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("snapspec").toString

  test("manifest round-trips counters whose names collide with table " +
      "names and contain JSON metacharacters") {
    val base = tmpDir()
    val snap = new Snapshot(base)
    val df = spark.range(5).toDF("v")
    // "results" is ALSO an appended-table name; the quote/bracket names
    // are raw JSON metacharacters — the regex parser mis-binds both
    val hostile = Map(
      "results" -> 7L,
      """quote"inside""" -> -3L,
      "bracket]name" -> 42L,
      "total_fetched" -> 9L)
    snap.write(0, tables = Map("frontier" -> df),
      counters = hostile,
      appends = Map("results" -> df, "lineage" -> df))
    assert(snap.counters(0) === hostile)
    assert(snap.appendPaths(0) ===
      Map("results" -> Seq(s"$base/round=0/results"),
        "lineage" -> Seq(s"$base/round=0/lineage")))
    assert(snap.read(0, "frontier").count() === 5)
    assert(snap.read(0, "results").count() === 5)
  }

  test("append slice-paths accumulate across rounds and readSlice stays " +
      "per-round") {
    val base = tmpDir()
    val snap = new Snapshot(base)
    val d1 = spark.range(3).toDF("v")
    val d2 = spark.range(4).toDF("v").withColumn("v", col("v") + 100)
    snap.write(0, tables = Map("seen" -> d1),
      counters = Map("round_fetched" -> 3L), appends = Map("results" -> d1))
    snap.write(1, tables = Map("seen" -> d2),
      counters = Map("round_fetched" -> 4L), appends = Map("results" -> d2))
    assert(snap.latest() === 1)
    assert(snap.read(1, "results").count() === 7) // union of both slices
    assert(snap.readSlice(1, "results").count() === 4)
    assert(snap.read(0, "results").count() === 3) // round-0 view unchanged
    assert(snap.counters(1) === Map("round_fetched" -> 4L))
  }
}
