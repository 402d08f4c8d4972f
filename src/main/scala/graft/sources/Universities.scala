package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.url.Canonical

/** University-by-domain resolution (SURVEY.md S7/J8) — the reference
  * resolves a crawled page's university by scanning the
  * world-universities list and matching `host == domain` or
  * `host.endswith("." + domain)`
  * (/root/reference/test_pipeline.py:283-297, world_universities_and_domains.json).
  *
  * Spark-first scale shape: the containment predicate is NOT expressed as
  * a nested-loop `exists(domains, ...)` against a broadcast list (that is
  * rows × |universities| work). Instead each host explodes into its ≤
  * label-count domain-suffix candidates ("www.cs.rug.nl" → [www.cs.rug.nl,
  * cs.rug.nl, rug.nl, nl]) and the match is an EQUI join suffix = domain —
  * hashable, broadcastable, AQE-friendly, and exactly the reference's
  * equals-or-dot-suffix semantics (a substring like "notrug.nl" can never
  * match "rug.nl").
  *
  * Winner on multiple matches: the reference takes file order (first
  * entry wins — load-order dependent); the rebuild defines the
  * deterministic rule "longest matching domain, then university name
  * asc".
  */
object Universities {

  /** All dot-suffix candidates of a host, longest first, as a pure column
    * expression (no UDF): suffix i = parts[i..] re-joined with '.'. */
  def hostSuffixes(host: Column): Column = {
    val parts = split(host, "\\.")
    transform(sequence(lit(0), size(parts) - 1),
      i => array_join(slice(parts, i + 1, size(parts) - i), "."))
  }

  /** Resolve a university per row of `df` by its `urlCol`. `universities`
    * has (name: string, domains: array<string>). Adds `university`
    * (null when unmatched, like the reference's None). */
  def resolveByDomain(df: DataFrame, urlCol: String,
      universities: DataFrame): DataFrame = {
    val uniByDomain = universities
      .select(col("name").as("__uni"), explode(col("domains")).as("__domain"))
    val hosts = df.select(col(urlCol)).distinct()
      .withColumn("__host", lower(Canonical.urlHost(col(urlCol))))
      .withColumn("__suffix", explode(hostSuffixes(col("__host"))))
    val resolved = hosts
      .join(uniByDomain, col("__suffix") === col("__domain"))
      .groupBy(col(urlCol))
      // longest domain wins, then name asc — min over (-len, name)
      .agg(min(struct((-length(col("__domain"))).as("neg_len"),
        col("__uni").as("u"))).as("best"))
      .select(col(urlCol), col("best.u").as("university"))
    df.join(resolved, Seq(urlCol), "left")
  }
}
