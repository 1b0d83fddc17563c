package graft.engine

import java.io.File
import java.sql.Timestamp
import scala.collection.immutable.TreeMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement,
  LogicalPlan}
import org.apache.spark.sql.types._

import graft.buffer.{MemBuffer, MeasurementsView}
import graft.core.WriteRequest
import graft.tier.ParquetTier
import graft.wal.Wal

/** Query result: schema + rows, ready for a sink adapter. */
final case class QueryResult(schema: StructType, rows: Seq[Row])

/** The engine: Spark-native rebuild of the reference's `Lynx` struct
  * (reference lynx.rs:28-150).
  *
  * Write path (reference lynx.rs:63-68): WAL append FIRST — "Data MUST
  * be appended to the WAL before making its way into the in-memory
  * buffer" (lynx.rs:32-33) — then buffer insert.
  *
  * Query path (reference lynx.rs:70-148): gatekeeper-parse the SQL,
  * snapshot the namespace, build DataFrames with the dynamically
  * inferred schema, register temp views, delegate to spark.sql —
  * Catalyst plays the role DataFusion plays behind lynx.rs:141.
  *
  * Improvements over the reference, by design (SURVEY.md §3.4):
  *  - per-query `SparkSession.newSession()` gives each request an
  *    isolated temp-view catalog, fixing the shared-SessionContext
  *    race between concurrent queries on the same table name;
  *  - every table referenced by the query is registered (multi-table
  *    joins work instead of depending on stale registrations);
  *  - CTEs and derived tables pass the gatekeeper;
  *  - tag columns appear in deterministic sorted order (the reference
  *    iterates a HashSet — nondeterministic across runs, lynx.rs:110).
  *
  * At scale the buffer tiers to day-partitioned parquet via
  * [[graft.tier.ParquetTier]]; queries union the sealed segments with
  * the in-RAM tail, and Catalyst prunes `day=` partitions the
  * reference always scans (SURVEY.md §4.1).
  */
final class LynxEngine(
    val spark: SparkSession,
    walDir: File,
    maxSegmentSize: Long = 50L * 1024 * 1024,
    tier: Option[ParquetTier] = None,
    maxBufferedRows: Int = Int.MaxValue) {

  val buffer = new MemBuffer
  private val (replayedHighest, replayedIds) = Wal.replay(walDir, buffer)
  val wal = new Wal(walDir, replayedHighest + 1, maxSegmentSize)
  def replayedSegments: Seq[Long] = replayedIds

  private val writeLock = new Object
  private val bufferedPerTable =
    scala.collection.mutable.Map.empty[(String, String), Int]

  def write(w: WriteRequest): Unit = writeLock.synchronized {
    wal.write(w) // WAL-first invariant (reference lynx.rs:32-33,64)
    buffer.insert(w)
    // auto-seal: once a table's RAM tail exceeds the threshold, spill
    // it to the day-partitioned parquet tier (the 100 TB path; the
    // reference keeps everything in RAM forever, SURVEY.md §3.3)
    if (tier.isDefined && maxBufferedRows != Int.MaxValue) {
      val key = (w.namespace, w.measurement)
      val n = bufferedPerTable.getOrElse(key, 0) + 1
      if (n >= maxBufferedRows) {
        seal(w.namespace, w.measurement)
        bufferedPerTable.remove(key)
      } else bufferedPerTable.update(key, n)
    }
  }

  /** Seal a table's buffered partitions to the parquet tier (absent
    * in the reference, which keeps all data in RAM forever —
    * SURVEY.md §3.3; this is the 100 TB path).
    */
  def seal(namespace: String, table: String): Unit =
    tier.foreach { t =>
      buffer.drainTable(namespace, table).foreach { parts =>
        t.seal(spark, namespace, table,
          LynxEngine.toDataFrame(spark, parts).withColumn(
            "day", org.apache.spark.sql.functions.date_format(
              org.apache.spark.sql.functions.col("timestamp"),
              "yyyy-MM-dd")))
      }
    }

  /** Run `sql` against namespace `namespace`. None = unknown
    * namespace/table → HTTP 404 (reference lynx.rs:144-148).
    */
  def query(namespace: String, sql: String): Option[QueryResult] = {
    val tables = LynxEngine.referencedTables(spark, sql)
    val snapshot = buffer.tables(namespace)
    val tiered = tier.map(_.tables(namespace)).getOrElse(Set.empty)
    if (snapshot.isEmpty && tiered.isEmpty) return None

    val session = spark.newSession()
    val inMem = snapshot.getOrElse(
      TreeMap.empty[String, TreeMap[String, MeasurementsView]])
    for (t <- tables) {
      val mem: Option[DataFrame] =
        inMem.get(t).map(LynxEngine.toDataFrame(session, _))
      val sealedDf: Option[DataFrame] = if (tiered.contains(t))
        tier.map(_.read(session, namespace, t)) else None
      val df = (mem, sealedDf) match {
        case (Some(m), Some(sd)) =>
          m.unionByName(sd, allowMissingColumns = true)
        case (Some(m), None) => m
        case (None, Some(sd)) => sd
        case (None, None) => return None // table unknown → 404
      }
      // Deterministic column order regardless of tier/buffer mix:
      // timestamp, value, then tags sorted (SURVEY.md §1.4 deviation).
      val ordered = Seq("timestamp", "value") ++
        df.columns.filterNot(Set("timestamp", "value")).sorted
      df.select(ordered.map(org.apache.spark.sql.functions.col): _*)
        .createOrReplaceTempView(t)
    }
    val df = session.sql(sql)
    Some(QueryResult(df.schema, df.collect().toSeq))
  }
}

object LynxEngine {

  /** Gatekeeper (reference parse_table_name, lynx.rs:153-172): parse
    * the SQL with Spark's parser, reject DML/DDL, and collect every
    * base relation the query reads. The reference takes only the
    * first FROM table and rejects CTEs/derived tables; we accept them
    * (documented improvement, SURVEY.md §2B).
    */
  def referencedTables(spark: SparkSession, sql: String): Seq[String] = {
    val plan: LogicalPlan =
      try spark.sessionState.sqlParser.parsePlan(sql)
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"failed to parse query: ${e.getMessage}")
      }
    plan match {
      case _: InsertIntoStatement =>
        throw new IllegalArgumentException(
          "only SELECT queries are supported")
      case p if p.nodeName.endsWith("Command") =>
        throw new IllegalArgumentException(
          "only SELECT queries are supported")
      case _ =>
    }
    // CTE definitions live in UnresolvedWith.cteRelations, which are
    // not `children` — walk them explicitly. CTE aliases themselves
    // are not base tables.
    def walk(p: LogicalPlan): (Seq[String], Seq[String]) = {
      val withs = p.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith => w
      }
      val cteNames = withs.flatMap(_.cteRelations.map(_._1))
      val nested = withs.flatMap(_.cteRelations.map(_._2))
        .map(walk)
      val rels = p.collect {
        case r: UnresolvedRelation => r.multipartIdentifier.last
      }
      (rels ++ nested.flatMap(_._1), cteNames ++ nested.flatMap(_._2))
    }
    val (rels, cteNames) = walk(plan)
    val tables = rels.distinct.filterNot(cteNames.toSet.contains)
    if (tables.isEmpty)
      throw new IllegalArgumentException(
        "only basic 'SELECT .. FROM' style queries are supported")
    tables
  }

  /** Dynamic schema inference + row→columnar conversion (reference
    * lynx.rs:93-134): fixed non-nullable `timestamp`/`value` columns,
    * one nullable string column per tag key in the union of all tag
    * keys; rows missing a tag get NULL; numeric tags stringify.
    */
  def inferSchema(parts: TreeMap[String, MeasurementsView]): StructType = {
    val tagKeys = parts.valuesIterator
      .flatMap(_.metadata.iterator.flatMap(_.keysIterator))
      .toSeq.distinct.sorted
    StructType(
      StructField("timestamp", TimestampType, nullable = false) +:
      StructField("value", StringType, nullable = false) +:
      tagKeys.map(k => StructField(k, StringType, nullable = true)))
  }

  def toDataFrame(spark: SparkSession,
      parts: TreeMap[String, MeasurementsView]): DataFrame = {
    val schema = inferSchema(parts)
    val tagKeys = schema.fields.drop(2).map(_.name)
    val rows = new java.util.ArrayList[Row]()
    parts.valuesIterator.foreach { m =>
      var i = 0
      while (i < m.timestamps.length) {
        val micros = m.timestamps(i)
        val ts = new Timestamp(Math.floorDiv(micros, 1000L))
        ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        val tags = m.metadata(i)
        val cells = new Array[Any](2 + tagKeys.length)
        cells(0) = ts
        cells(1) = m.values(i)
        var j = 0
        while (j < tagKeys.length) {
          cells(2 + j) = tags.get(tagKeys(j)).map(_.render).orNull
          j += 1
        }
        rows.add(Row.fromSeq(cells.toIndexedSeq))
        i += 1
      }
    }
    spark.createDataFrame(rows, schema)
  }
}
