package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CdcOps, ExtOps, FuncOps, PartitionOps, Q, RefQueries,
  RelOps, SeqOps, TemporalOps, TypedOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each module registers its operators as [[graft.queries.Q]] values
  * (Spark program + optional DuckDB oracle SQL); this object is just the
  * aggregation point.
  */
object SparkEntry {

  /** Every registered operator, in registration order. */
  def registry: Seq[Q] =
    RefQueries.all ++ RelOps.all ++ FuncOps.all ++ ExtOps.all ++
      CdcOps.all ++ SeqOps.all ++ TemporalOps.all ++ TypedOps.all ++
      PartitionOps.all ++
      graft.text.TextOps.all ++ graft.text.IndexOps.all ++
      graft.dedup.Dedup.all ++ graft.graph.GraphOps.all ++
      graft.similarity.Similarity.all ++
      graft.multimodal.Multimodal.all ++
      graft.streaming.StreamOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Q2-shaped: scan → broadcast join → agg → top-k (SURVEY.md §7.2). */
  def entry(spark: SparkSession): DataFrame =
    RefQueries.q2TopProducts.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case Q(n, _, Some(sql)) => n -> sql }.toMap
}
