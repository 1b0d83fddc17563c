package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.{BpeOps, Curation, DataQuality, Dedup, GraphOps,
  LayoutOps, Multimodal, QueryDef, Relational, Similarity, SkewOps,
  Tables, TextOps, TimeSeries, TpcH, Train}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 is declared here as a named query;
  * those with a DuckDB-expressible equivalent also declare an oracle
  * (same column names, deterministic ordering, exact-decimal float
  * aggregation — see graft.ops.Parity).
  */
object SparkEntry {

  /** Query families in registration order — one entry per ops object.
    * Bench clears session caches (edge lists, shingle frames,
    * localCheckpoint blocks) at each family boundary: the caches are
    * family-internal, and letting 263 queries' worth of blocks pile
    * up in one JVM raises GC pressure on everything that runs later
    * (measured as a +13% committed-channel drift in round 9).
    */
  def families: Seq[(String, Seq[QueryDef])] = Seq(
    "relational" -> Relational.all, "tpch" -> TpcH.all,
    "text" -> TextOps.all, "dedup" -> Dedup.all,
    "similarity" -> Similarity.all, "multimodal" -> Multimodal.all,
    "timeseries" -> TimeSeries.all, "curation" -> Curation.all,
    "dq" -> DataQuality.all, "graph" -> GraphOps.all,
    "layout" -> LayoutOps.all, "bpe" -> BpeOps.all,
    "skew" -> SkewOps.all, "train" -> Train.all)

  /** All registered operator queries, in registration order. */
  def defs: Seq[QueryDef] = families.flatMap(_._2)

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
