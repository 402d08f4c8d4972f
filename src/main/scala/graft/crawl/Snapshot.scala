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
  *   {base}/manifest_N.json
  *     {"round":N,"tables":{...},"appends":{...},"counters":{...}}
  *
  * Two table kinds, mirroring Iceberg's overwrite vs append commits:
  *
  *  - REPLACED tables (frontier, seen): each round writes the full new
  *    state under its own round dir; the manifest points at it.
  *  - APPENDED tables (results, lineage): each round writes ONLY its
  *    slice under round=N/name; the manifest carries the cumulative
  *    slice-path list (previous manifest's list + this round's path), and
  *    `read` unions all listed paths. Per-round write volume is O(slice),
  *    not O(total) — round N no longer rewrites all N slices, which at
  *    10^10-frontier scale was the one write-amplification hot spot in
  *    the layer that exists to emulate Iceberg appends.
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

  /** Commit one round: `tables` are replaced (full state written under
    * this round), `appends` are append-only (only the round's slice is
    * written; the manifest accumulates the slice paths). */
  def write(round: Int, tables: Map[String, DataFrame],
      counters: Map[String, Long],
      appends: Map[String, DataFrame] = Map.empty): Unit = {
    Files.createDirectories(Paths.get(base))
    tables.foreach { case (name, df) =>
      df.write.mode(SaveMode.Overwrite).parquet(dir(round, name))
    }
    appends.foreach { case (name, df) =>
      df.write.mode(SaveMode.Overwrite).parquet(dir(round, name))
    }
    val prevAppends: Map[String, Seq[String]] = {
      val prev = latest()
      if (prev < 0 || prev >= round) Map.empty else appendPaths(prev)
    }
    val allAppends = (prevAppends.keySet ++ appends.keySet).map { n =>
      n -> (prevAppends.getOrElse(n, Nil) ++
        (if (appends.contains(n)) Seq(dir(round, n)) else Nil))
    }.toMap
    val tablesJson = tables.keys.map(n =>
      s""""$n": "${dir(round, n)}"""").mkString(",")
    val appendsJson = allAppends.map { case (n, ps) =>
      s""""$n": [${ps.map(p => s""""$p"""").mkString(",")}]"""
    }.mkString(",")
    val countersJson = counters.map { case (k, v) => s""""$k": $v""" }
      .mkString(",")
    val json = s"""{"round": $round, "tables": {$tablesJson}, """ +
      s""""appends": {$appendsJson}, "counters": {$countersJson}}"""
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

  private def manifestJson(round: Int): String =
    new String(Files.readAllBytes(manifestPath(round)),
      StandardCharsets.UTF_8)

  /** Slice-path lists of the appended tables at a given round. */
  def appendPaths(round: Int): Map[String, Seq[String]] = {
    val json = manifestJson(round)
    """"([a-zA-Z_]+)":\s*\[([^\]]*)\]""".r.findAllMatchIn(json).map { m =>
      m.group(1) -> """"([^"]+)"""".r.findAllMatchIn(m.group(2))
        .map(_.group(1)).toSeq
    }.toMap
  }

  /** Read a table at a round: appended tables union all their committed
    * slices; replaced tables read the round's dir. */
  def read(round: Int, table: String): DataFrame = {
    val ap = appendPaths(round)
    ap.get(table) match {
      case Some(paths) if paths.nonEmpty => spark.read.parquet(paths: _*)
      case _ => spark.read.parquet(dir(round, table))
    }
  }

  /** Read ONLY the slice a given round appended to a table. */
  def readSlice(round: Int, table: String): DataFrame =
    spark.read.parquet(dir(round, table))

  def counters(round: Int): Map[String, Long] = {
    val json = manifestJson(round)
    // counters live in the trailing {"k": v} object; appends are arrays
    // and tables are string values, so the scalar-int pattern only hits
    // counters (plus "round", filtered)
    """"([a-zA-Z_]+)":\s*(-?\d+)""".r.findAllMatchIn(json)
      .collect { case m if m.group(1) != "round" =>
        m.group(1) -> m.group(2).toLong }
      .toMap
  }
}
