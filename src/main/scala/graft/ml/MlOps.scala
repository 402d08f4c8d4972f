package graft.ml

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.{CountVectorizer, IDF, PCA, Tokenizer}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spark ML operator surface (SURVEY.md F25-F28): TF-IDF + cosine
  * recommendation and seeded KMeans + PCA(2) clustering — the
  * reference's sklearn pipelines
  * (/root/reference/recommendation_system/backend/student_recommender.py:139-146,
  * 450-457; /root/reference/main.py:4716-4730 KMeans seed=42 + PCA(2))
  * re-expressed with org.apache.spark.ml (all present in
  * /opt/spark/jars spark-mllib).
  *
  * Determinism: fixed seed 42 everywhere, vocabulary ordered by
  * (frequency desc, term asc) via CountVectorizer defaults; outputs
  * project cluster sizes / top similarities rather than raw vectors so
  * results are stable across runs.
  */
object MlOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** TF-IDF document vectors over `documents.text`. */
  def tfidf(docs: DataFrame, vocabSize: Int = 1 << 12): DataFrame = {
    val tok = new Tokenizer().setInputCol("text").setOutputCol("words")
    val cv = new CountVectorizer().setInputCol("words")
      .setOutputCol("tf").setVocabSize(vocabSize)
    val words = tok.transform(docs)
    val cvModel = cv.fit(words)
    val tf = cvModel.transform(words)
    val idf = new IDF().setInputCol("tf").setOutputCol("tfidf").fit(tf)
    idf.transform(tf)
  }

  private val cosineVec = udf((a: Vector, b: Vector) => {
    val na = math.sqrt(a.toArray.map(x => x * x).sum)
    val nb = math.sqrt(b.toArray.map(x => x * x).sum)
    if (na == 0 || nb == 0) 0.0
    else {
      var dot = 0.0
      val da = a.toArray; val db = b.toArray
      var i = 0
      while (i < da.length) { dot += da(i) * db(i); i += 1 }
      dot / (na * nb)
    }
  })

  /** F25: TF-IDF cosine recommender — for each query doc (doc_id < 5),
    * the top-5 most similar other docs. */
  val qTfidfSimilar: (SparkSession, String) => DataFrame = (s, dir) => {
    val vecs = tfidf(t(s, dir, "documents"))
      .select(col("doc_id"), col("tfidf"))
    val q = vecs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"), col("tfidf").as("qv"))
    val scored = vecs.crossJoin(broadcast(q))
      .filter(col("doc_id") =!= col("query_id"))
      .withColumn("cos", round(cosineVec(col("tfidf"), col("qv")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("doc_id").as("similar_id"),
        col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Sparse-vector bucket signature: the same deterministic hyperplane
    * family as graft.similarity.Ann, with the plane dot taken over the
    * vector's NON-ZERO components only — O(nnz × planes × tables) per
    * doc regardless of vocabulary size, so a 10^6-term vocabulary costs
    * the same as this 4096-term one. */
  def sparseSignature(v: Vector, table: Int): Int = {
    import graft.similarity.Ann
    var sig = 0
    var p = 0
    while (p < Ann.NumPlanes) {
      var dot = 0.0
      v.foreachActive((j, x) => dot += Ann.planeComponent(table, p, j) * x)
      if (dot >= 0) sig |= (1 << p)
      p += 1
    }
    sig
  }

  /** F25 scale twin: TF-IDF top-k via random-hyperplane LSH buckets —
    * candidates come from a (table, signature) equi-join instead of the
    * crossJoin qTfidfSimilar uses, so the corpus is scanned once (× the
    * table count) and never paired all-against-all. Recall < 1 by
    * construction; MlSpec pins a floor against the brute-force twin. */
  def tfidfLshTopK(vecs: DataFrame, queryIds: Column, k: Int): DataFrame = {
    import graft.similarity.Ann
    val sigUdf = udf((v: Vector, t: Int) => sparseSignature(v, t))
    def bucketize(df: DataFrame, idCol: String, vecCol: String) =
      df.withColumn("table", explode(lit((0 until Ann.NumTables).toArray)))
        .withColumn("sig", sigUdf(col(vecCol), col("table")))
        .select(col("table"), col("sig"), col(idCol), col(vecCol))
    val qb = bucketize(vecs.filter(queryIds)
      .select(col("doc_id").as("query_id"), col("tfidf").as("qv")),
      "query_id", "qv")
    val cb = bucketize(vecs
      .select(col("doc_id").as("similar_id"), col("tfidf").as("cv")),
      "similar_id", "cv")
    val cands = cb.join(broadcast(qb), Seq("table", "sig"))
      .filter(col("query_id") =!= col("similar_id"))
      .dropDuplicates("query_id", "similar_id")
      .withColumn("cos", round(cosineVec(col("cv"), col("qv")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("similar_id").asc)
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("similar_id"), col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  val qTfidfLsh: (SparkSession, String) => DataFrame = (s, dir) => {
    val vecs = tfidf(t(s, dir, "documents"))
      .select(col("doc_id"), col("tfidf"))
    tfidfLshTopK(vecs, col("doc_id") < 5, 5)
  }

  /** F26: KMeans(seed=42) over the embeddings + PCA(2) coordinates —
    * cluster sizes + per-cluster PCA centroid (stable summary). */
  val qKmeansClusters: (SparkSession, String) => DataFrame = (s, dir) => {
    val toVec = udf((a: Seq[Float]) =>
      org.apache.spark.ml.linalg.Vectors.dense(a.map(_.toDouble).toArray))
    val vecs = t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), toVec(col("embedding")).as("features"))
      .cache()
    val km = new KMeans().setK(8).setSeed(42L).setFeaturesCol("features")
      .setPredictionCol("cluster")
    val clustered = km.fit(vecs).transform(vecs)
    val pca = new PCA().setK(2).setInputCol("features")
      .setOutputCol("pca").fit(vecs)
    val first = udf((v: Vector) => v(0))
    val second = udf((v: Vector) => v(1))
    val out = pca.transform(clustered)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("size"),
        round(avg(first(col("pca"))), 4).as("pca_x"),
        round(avg(second(col("pca"))), 4).as("pca_y"),
        countDistinct(col("label")).as("n_labels"))
      .orderBy(col("cluster"))
      // the k-row summary is materialized eagerly so the feature-vector
      // cache (pinned for the two ML fits above) can be released before
      // returning — the lazy shape leaked one embeddings-sized cache per
      // invocation for the life of the session
      .localCheckpoint(true)
    vecs.unpersist()
    out
  }

  /** F27/F28: composite recommender score — weighted column arithmetic
    * with a compatibility penalty
    * (course_recommender_for_university.py:345-365). */
  val qCompositeScore: (SparkSession, String) => DataFrame = (s, dir) => {
    val p = t(s, dir, "part")
    val freqNorm = col("p_size").cast("double") / 50.0
    val compat = (col("p_retailprice") % 100.0) / 100.0
    val novelty = (col("p_partkey") % 7).cast("double") / 7.0
    p.withColumn("raw_score",
        lit(0.40) * freqNorm + lit(0.35) * compat + lit(0.15) * novelty +
          lit(0.10) * 0.5)
      .withColumn("score",
        when(compat < 0.1, col("raw_score") * 0.05)
          .otherwise(col("raw_score")))
      .select(col("p_partkey"), col("score"))
      .orderBy(col("score").desc, col("p_partkey").asc)
      .limit(50)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tfidf_similar" -> qTfidfSimilar,
    "q_tfidf_lsh" -> qTfidfLsh,
    "q_kmeans_clusters" -> qKmeansClusters,
    "q_composite_score" -> qCompositeScore)

  /** The ML pipelines have no SQL twin; the composite score does. */
  val oracles: Map[String, String] = Map(
    "q_composite_score" ->
      """SELECT p_partkey, score FROM (
        | SELECT p_partkey,
        |  CASE WHEN (p_retailprice % 100.0) / 100.0 < 0.1
        |   THEN (0.40 * (CAST(p_size AS DOUBLE) / 50.0) +
        |     0.35 * ((p_retailprice % 100.0) / 100.0) +
        |     0.15 * (CAST(p_partkey % 7 AS DOUBLE) / 7.0) +
        |     0.10 * 0.5) * 0.05
        |   ELSE 0.40 * (CAST(p_size AS DOUBLE) / 50.0) +
        |     0.35 * ((p_retailprice % 100.0) / 100.0) +
        |     0.15 * (CAST(p_partkey % 7 AS DOUBLE) / 7.0) +
        |     0.10 * 0.5 END AS score
        | FROM part)
        |ORDER BY score DESC, p_partkey ASC LIMIT 50""".stripMargin)
}
