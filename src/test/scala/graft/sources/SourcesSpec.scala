package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.SparkSpec

class SourcesSpec extends SparkSpec {

  private def tmpDir(): String =
    Files.createTempDirectory("graft-src").toString

  test("jsonDir: good rows parse, corrupt rows go to the side channel") {
    val dir = tmpDir()
    Files.writeString(Paths.get(s"$dir/a.json"),
      """{"lesson": "Algebra", "ects": 6}""")
    Files.writeString(Paths.get(s"$dir/b.json"),
      """{"lesson": "Databases", "ects": 5}""")
    Files.writeString(Paths.get(s"$dir/c.json"),
      """{"lesson": "Broken""")
    val (good, corrupt) = Sources.jsonDir(spark, dir, multiLine = false)
    assert(good.count() === 2)
    assert(good.select("lesson").collect().map(_.getString(0)).sorted
      .toSeq === Seq("Algebra", "Databases"))
    assert(corrupt.count() === 1)
  }

  test("cleanCsv: header aliases + quote stripping (ESCO header variants)") {
    val dir = tmpDir()
    Files.writeString(Paths.get(s"$dir/skills.csv"),
      "conceptUri,preferredLabel,skillType\n" +
      "\"http://esco/s1\",\" machine learning \",knowledge\n" +
      "http://esco/s2,databases,skill/competence\n")
    val labels = Sources.escoFromCsv(spark, s"$dir/skills.csv")
    assert(labels.toSet === Set(
      ("http://esco/s1", "machine learning"),
      ("http://esco/s2", "databases")))
  }

  test("partitioned sink + csv export roundtrip") {
    import spark.implicits._
    val df = Seq(("u1", "Algebra", 6), ("u1", "Calculus", 5),
      ("u2", "Databases", 4)).toDF("university", "lesson", "ects")
    val pDir = tmpDir()
    Sources.writePartitioned(df, s"$pDir/p", "university")
    val back = spark.read.parquet(s"$pDir/p")
    assert(back.count() === 3)
    assert(back.filter(col("university") === "u1").count() === 2)
    Sources.exportCsv(df, s"$pDir/csv")
    val csv = spark.read.option("header", "true").csv(s"$pDir/csv")
    assert(csv.count() === 3)
    assert(csv.columns.toSet === Set("university", "lesson", "ects"))
  }
}
