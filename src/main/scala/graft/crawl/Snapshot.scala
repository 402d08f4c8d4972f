package graft.crawl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import scala.jdk.CollectionConverters._

/** Snapshot/manifest layer — Iceberg-emulation (SURVEY.md §7.0).
  *
  * No Iceberg runtime ships in /opt/spark/jars, so the three Iceberg
  * properties the north rule uses — snapshot-id checkpointing, lineage,
  * exact resume — are provided by a minimal manifest layer over
  * partitioned Parquet:
  *
  *   {base}/round=N/{frontier,seen,results,lineage}/  (parquet dirs)
  *   {base}/manifest_N.json   {"round":N,"tables":{...},"counters":{...}}
  *
  * `latest()` finds the highest committed manifest; a crash mid-round
  * leaves no manifest, so resume restarts that round from the previous
  * snapshot — exactly-once table state per committed round. The API is
  * shaped so a real Iceberg catalog (append + snapshot-id time travel)
  * could be swapped in behind it.
  */
final class Snapshot(base: String)(implicit spark: SparkSession) {

  private def dir(round: Int, table: String): String =
    s"$base/round=$round/$table"
  private def manifestPath(round: Int): Path =
    Paths.get(s"$base/manifest_$round.json")

  def write(round: Int, tables: Map[String, DataFrame],
      counters: Map[String, Long]): Unit = {
    Files.createDirectories(Paths.get(base))
    tables.foreach { case (name, df) =>
      df.write.mode(SaveMode.Overwrite).parquet(dir(round, name))
    }
    val tablesJson = tables.keys.map(n =>
      s""""$n": "${dir(round, n)}"""").mkString(",")
    val countersJson = counters.map { case (k, v) => s""""$k": $v""" }
      .mkString(",")
    val json =
      s"""{"round": $round, "tables": {$tablesJson}, "counters": {$countersJson}}"""
    // write-then-move for atomic commit
    val tmp = Paths.get(s"$base/.manifest_$round.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(round),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Highest committed round, or -1 when none. */
  def latest(): Int = {
    val p = Paths.get(base)
    if (!Files.exists(p)) return -1
    Files.list(p).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("manifest_") && s.endsWith(".json") =>
        s.stripPrefix("manifest_").stripSuffix(".json").toInt }
      .foldLeft(-1)(math.max)
  }

  def read(round: Int, table: String): DataFrame =
    spark.read.parquet(dir(round, table))

  def counters(round: Int): Map[String, Long] = {
    val json = new String(Files.readAllBytes(manifestPath(round)),
      StandardCharsets.UTF_8)
    """"([a-zA-Z_]+)":\s*(-?\d+)""".r.findAllMatchIn(json)
      .collect { case m if m.group(1) != "round" =>
        m.group(1) -> m.group(2).toLong }
      .toMap
  }
}
