package graft.similarity

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AnnSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")

  test("brute-force top-k: k rows per query, rank ordered by cosine desc") {
    val out = Ann.bruteForceTopK(emb, emb.filter(col("vec_id") < 3), 5)
      .collect()
    assert(out.length === 15)
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getInt(1))
      assert(byRank.map(_.getInt(1)).toSeq === (1 to 5))
      val cosines = byRank.map(_.getDouble(3))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    }
  }

  test("cosine column matches a hand-computed value") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(3.0, 2.0, 1.0)))
      .toDF("a", "b")
    val got = df.select(Ann.cosine(col("a"), col("b"))).head.getDouble(0)
    val want = 10.0 / (math.sqrt(14.0) * math.sqrt(14.0))
    assert(math.abs(got - want) < 1e-12)
  }

  test("LSH signature is deterministic and table-dependent") {
    val v = Seq.tabulate(64)(i => math.sin(i.toDouble))
    assert(Ann.signature(v, 0) === Ann.signature(v, 0))
    assert((0 until Ann.NumTables)
      .map(t => Ann.signature(v, t)).distinct.size > 1)
  }

  test("LSH ANN: meaningful recall vs brute force while scanning a " +
    "fraction of the corpus") {
    val queries = emb.filter(col("vec_id") < 10)
    val brute = Ann.bruteForceTopK(emb, queries, 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = Ann.lshTopK(emb, queries, 10)(spark).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (lsh & brute).size.toDouble / brute.size
    info(s"LSH recall@10 = $recall (${(lsh & brute).size}/${brute.size})")
    assert(recall >= 0.2,
      s"recall $recall — LSH params no longer match corpus similarity level")
    // every LSH hit must be a true candidate (exact re-scoring)
    assert(lsh.forall { case (q, n) => q != n })
  }

  test("qAnnTopK / qAnnLsh / qEmbSimilarPairs run and keep their schema") {
    val topk = Ann.qAnnTopK(spark, dir)
    assert(topk.columns.toSeq ===
      Seq("query_id", "rank", "neighbor_id", "cos"))
    assert(topk.count() === 50)
    assert(Ann.qAnnLsh(spark, dir).count() > 0)
    assert(Ann.qEmbSimilarPairs(spark, dir).count() > 0)
  }
}
