package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.tier.ParquetTier

/** Incremental per-segment rollup maintenance over a tier table — the
  * "never rescan for the dashboard" path at 100 TB. Tier segments are
  * immutable once published (MVCC manifests; compaction/expiry only
  * ever swap the FILE LIST), so a segment's partial aggregate is
  * immutable too: the store keeps one (group → count, exact sum) map
  * per (rollup, file), and serving a rollup
  *
  *   1. pins the current manifest (same snapshot discipline as a
  *      query — a racing compactor can't GC files mid-read),
  *   2. computes partials ONLY for files it has not seen, in ONE
  *      Spark job over just those files (grouped by
  *      `input_file_name()`), and
  *   3. merges partials driver-side over the pinned file list.
  *
  * A fresh dashboard refresh after a seal therefore reads the NEW
  * segment only — O(new data), not O(table) — and a compaction
  * swap simply makes the compacted files the "new" ones once (their
  * partials are then cached again; superseded files' entries are
  * unreachable because the merge walks the pinned manifest, and
  * [[prune]] drops them).
  *
  * Exactness: partial sums are DECIMAL(28,10) (graft.ops.Parity
  * discipline), so the driver merge is order-independent and the
  * served rollup is EQUAL to a full re-aggregation — spec-pinned
  * against the engine's own SQL over the same table, including across
  * a compaction swap.
  *
  * Memory contract: driver state is (groups × live files) cells per
  * rollup — the dashboard-dimension assumption (bounded group
  * cardinality: hosts, days, sources), NOT arbitrary-cardinality
  * group-bys; compaction keeps the file factor at one per day
  * partition. High-cardinality rollups belong in the query path,
  * not a maintained rollup.
  */
final class RollupStore(spark: SparkSession, tier: ParquetTier) {

  final case class RollupKey(ns: String, table: String,
      groupCol: String, valueCol: String)

  // (rollup, absolute file path) -> group -> (count, exact sum)
  private val partials = scala.collection.concurrent.TrieMap
    .empty[(RollupKey, String),
      Map[Option[String], (Long, java.math.BigDecimal)]]

  /** Files the LAST serve had to aggregate — the spec hook proving
    * incrementality (empty on a fully warm serve).
    */
  @volatile private[graft] var lastComputedFiles: Seq[String] = Nil

  private def canon(path: String): String = {
    val p = if (path.startsWith("file:")) path.stripPrefix("file:")
      else path
    new java.io.File(p).getAbsolutePath
  }

  /** Serve `SELECT groupCol, count(*), sum(valueCol)` over the
    * table's current pinned manifest, computing only unseen segments.
    * Group keys are served as strings (None = NULL group); sums are
    * exact decimals surfaced as doubles.
    *
    * `dayBounds` (inclusive yyyy-MM-dd pair) serves a time-windowed
    * dashboard: the merge walks only manifest files whose
    * `__lynx_day=` path falls in range — partials for other days are
    * neither computed nor touched, so a 7-day pane over years of
    * tier data costs O(7 days of new segments). Day granularity is
    * exact because the tier day-partitions every segment; a file
    * without a parseable day is included conservatively (same rule
    * as ParquetTier.readFiles).
    */
  def rollup(ns: String, table: String, groupCol: String,
      valueCol: String, dayBounds: Option[(String, String)] = None)
      : Seq[(Option[String], Long, Double)] = {
    // valueCol reaches expr() — a SQL parser — so enforce bare column
    // names here too, independent of the HTTP layer's own check
    require(groupCol.matches("[A-Za-z_][A-Za-z0-9_]*") &&
      valueCol.matches("[A-Za-z_][A-Za-z0-9_]*"),
      "group/value must be bare column names")
    val key = RollupKey(ns, table, groupCol, valueCol)
    val snap = tier.snapshotPinned(ns, table)
    try {
      val inRange: String => Boolean = dayBounds match {
        case Some((lo, hi)) => path =>
          ParquetTier.DayFromPath.findFirstMatchIn(path) match {
            case Some(m) => val d = m.group(1); d >= lo && d <= hi
            case None => true
          }
        case None => _ => true
      }
      val files = snap.files.map(canon).filter(inRange)
      val missing = files.filterNot(f => partials.contains((key, f)))
      lastComputedFiles = missing
      if (missing.nonEmpty) {
        val rows = tier.readFiles(spark, ns, table, missing, None)
          .withColumn("__file", input_file_name())
          .groupBy(col("__file"), col(groupCol).cast("string").as("g"))
          .agg(count(lit(1)).as("c"),
            sum(expr(s"try_cast($valueCol AS DECIMAL(28,10))")).as("s"))
          .collect()
        val byFile = rows.groupBy(r => canon(r.getString(0)))
        missing.foreach { f =>
          val m = byFile.getOrElse(f, Array.empty[org.apache.spark.sql.Row])
            .map { r =>
              Option(r.getString(1)) ->
                (r.getLong(2),
                  Option(r.getDecimal(3))
                    .getOrElse(java.math.BigDecimal.ZERO))
            }.toMap
          partials.put((key, f), m)
        }
      }
      val merged = scala.collection.mutable.Map
        .empty[Option[String], (Long, java.math.BigDecimal)]
      files.foreach { f =>
        partials.getOrElse((key, f), Map.empty).foreach {
          case (g, (c, s)) =>
            val (c0, s0) = merged.getOrElse(g,
              (0L, java.math.BigDecimal.ZERO))
            merged(g) = (c0 + c, s0.add(s))
        }
      }
      merged.toSeq
        .map { case (g, (c, s)) => (g, c, s.doubleValue) }
        .sortBy(_._1)
    } finally tier.release(snap)
  }

  /** Drop cached partials for files no longer in any live manifest —
    * call after compaction/expiry GC if driver memory matters. Never
    * required for correctness (the merge only walks pinned files).
    */
  def prune(): Unit = {
    val live = partials.keys.map { case (k, _) => (k.ns, k.table) }.toSet
      .flatMap { nsTable: (String, String) =>
        tier.dataFiles(nsTable._1, nsTable._2).map(canon)
      }
    partials.keys
      .filterNot { case (_, f) => live.contains(f) }
      .foreach(partials.remove)
  }

  /** Cached cell count (files × groups summed) — observability. */
  def cachedCells: Int = partials.values.map(_.size).sum
}
