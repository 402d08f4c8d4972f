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
    // Jackson on both ends (ships in /opt/spark/jars): hand-rolled
    // string-building + regex-parsing silently corrupted on hostile
    // names (a counter named like a table, a quote in a path) — a real
    // writer/parser removes the collision class. Format unchanged.
    val root = Snapshot.mapper.createObjectNode()
    root.put("round", round)
    val tNode = root.putObject("tables")
    tables.keys.toSeq.sorted.foreach(n => tNode.put(n, dir(round, n)))
    val aNode = root.putObject("appends")
    allAppends.toSeq.sortBy(_._1).foreach { case (n, ps) =>
      val arr = aNode.putArray(n); ps.foreach(arr.add)
    }
    val cNode = root.putObject("counters")
    counters.toSeq.sortBy(_._1).foreach { case (k, v) => cNode.put(k, v) }
    val json = Snapshot.mapper.writeValueAsString(root)
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

  private def manifest(round: Int): com.fasterxml.jackson.databind.JsonNode =
    Snapshot.mapper.readTree(Files.readAllBytes(manifestPath(round)))

  private def fields(node: com.fasterxml.jackson.databind.JsonNode)
      : Iterator[(String, com.fasterxml.jackson.databind.JsonNode)] =
    node.properties().iterator().asScala.map(e => e.getKey -> e.getValue)

  /** Slice-path lists of the appended tables at a given round. */
  def appendPaths(round: Int): Map[String, Seq[String]] =
    fields(manifest(round).path("appends")).map { case (name, arr) =>
      name -> arr.elements().asScala.map(_.asText()).toSeq
    }.toMap

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

  def counters(round: Int): Map[String, Long] =
    fields(manifest(round).path("counters"))
      .map { case (k, v) => k -> v.asLong() }.toMap
}

object Snapshot {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
}
