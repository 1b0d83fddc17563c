package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.{BpeOps, Curation, DataQuality, Dedup, GraphOps,
  LayoutOps, Multimodal, QueryDef, Relational, Similarity, SkewOps,
  Tables, TextOps, TimeSeries, TpcH}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 is declared here as a named query;
  * those with a DuckDB-expressible equivalent also declare an oracle
  * (same column names, deterministic ordering, exact-decimal float
  * aggregation — see graft.ops.Parity).
  */
object SparkEntry {

  /** All registered operator queries, in registration order. */
  def defs: Seq[QueryDef] =
    Relational.all ++ TpcH.all ++ TextOps.all ++ Dedup.all ++
      Similarity.all ++ Multimodal.all ++ TimeSeries.all ++
      Curation.all ++ DataQuality.all ++ GraphOps.all ++ LayoutOps.all ++
      BpeOps.all ++ SkewOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(o => d.name -> o.trim)).toMap
}
