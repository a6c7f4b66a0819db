package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Advanced, Corpus, Dedup, EventAnalytics2, Events, Multimodal, Q, Relational, Search, Security, Similarity, Stats, Subqueries, Text}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Every implemented operator, one [[Q]] each (SURVEY.md §2 inventory). */
  def allQueries: Seq[Q] =
    Relational.all ++ Events.all ++ EventAnalytics2.all ++ Stats.all ++
      Advanced.all ++ Subqueries.all ++ Text.all ++ Dedup.all ++
      Similarity.all ++ Multimodal.all ++ Corpus.all ++ Search.all ++
      Security.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01_pricing_summary.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
