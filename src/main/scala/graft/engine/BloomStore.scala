package graft.engine

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.tier.ParquetTier

/** Per-sealed-file value blooms: equality-predicate FILE SKIPPING for
  * the tier read path — the point-lookup sibling of the day-partition
  * pruning the engine already does for time predicates. A query like
  * `WHERE host = 'web-17'` over years of tiered segments currently
  * opens every manifest file; with a bloom index on `host` the engine
  * drops every file whose bloom provably excludes the literal BEFORE
  * the scan is planned — metadata-only pruning, the zone-map/
  * small-materialized-index class of OLAP optimizations.
  *
  * Design mirrors [[RollupStore]] (the maintained-aggregate sibling):
  *  - per-file partials keyed by canonical path: sealed files are
  *    immutable, so a bloom computed once is valid forever; a
  *    compaction's new files are simply unindexed until the next
  *    `index()` call (unindexed ⇒ conservatively read);
  *  - `index()` computes ONLY unindexed manifest files, under a full
  *    tier snapshot (pin + lease) so a racing compactor cannot GC the
  *    files mid-read;
  *  - `prune()` drops entries for files no longer in any manifest.
  *
  * The bloom math is EXACTLY q_dedup_bloom's (ops/Dedup.scala): k=3
  * positions from 10-hex-char md5 slices, here over m=2^15 bits per
  *  file (4 KB) — small enough that a million-file tier's whole index
  * is 4 GB of driver/heap metadata, large enough that a file with
  * 10k distinct values sits at ~60% fill (FP rate ≈ 0.6³ ≈ 22%: a
  * miss still skips the file, a false positive only costs the scan
  * that would have happened anyway — bloom pruning is ALWAYS sound,
  * only sometimes unprofitable).
  *
  * Soundness: a file is skipped only when some queried position bit
  * is UNSET in a bloom built from that very file's values — a bloom
  * never false-negatives, so a skipped file cannot contain the
  * literal. Files without an index entry, columns absent from a
  * file's schema (the dynamic-tag case: absent column ⇒ the file
  * cannot match an equality on it — indexed as an empty bloom), and
  * non-string literals are all handled conservatively.
  */
final class BloomStore(spark: SparkSession, tier: ParquetTier) {
  import BloomStore._

  // (ns, table, lowercase column) -> canonical file path -> words
  private val blooms = mutable.Map
    .empty[(String, String, String), mutable.Map[String, Array[Long]]]
  // per-file (min, max) ZONE MAP for the same column, computed in the
  // same index() scan: blooms answer equality/IN, min/max answers
  // string ranges (`col >= 'lit'`), and equality consults both. None
  // = the file has no non-null values for the column (skip for every
  // equality OR range — both predicate classes are null-rejecting).
  private val ranges = mutable.Map.empty[(String, String, String),
    mutable.Map[String, Option[(String, String)]]]

  /** Newly indexed file count for the current manifest of
    * (ns, table) on `column`. Idempotent and incremental: files
    * already indexed are never re-read.
    */
  def index(ns: String, table: String, column: String): Int =
    synchronized {
      require(column.matches("[A-Za-z_][A-Za-z0-9_]*"),
        "column must be a bare column name")
      val snap = tier.snapshot(ns, table)
      try {
        val key = (ns, table.toLowerCase, column.toLowerCase)
        val m = blooms.getOrElseUpdate(key, mutable.Map.empty)
        val rg = ranges.getOrElseUpdate(key, mutable.Map.empty)
        val missing = snap.files.map(canon).distinct.filterNot(m.contains)
        if (missing.isEmpty) 0
        else {
          // build into a LOCAL map and commit only after the scan
          // succeeds: a file whose scan yields no rows for the column
          // (empty file, absent column) legitimately indexes as the
          // EMPTY bloom — which skips it for every literal — so a
          // half-failed read must never leave empty entries behind
          // (for blooms that would be UNSOUND, not just stale)
          val built = missing.map(f => f -> new Array[Long](Words)).toMap
          val builtRg = mutable.Map[String, Option[(String, String)]](
            missing.map(f => f -> (None: Option[(String, String)])): _*)
          val df = tier.readFiles(spark, ns, table, missing, None)
          // string columns ONLY: on a non-string column (timestamp),
          // `col = 'literal'` coerces the LITERAL to the column type,
          // so rows can match while their string cast differs from
          // the literal — a bloom over string casts would then skip a
          // matching file. In this tier every tag and the value
          // column are strings; refuse the rest at the source.
          df.schema.fields.find(_.name.equalsIgnoreCase(column))
            .foreach { fld =>
              require(
                fld.dataType == org.apache.spark.sql.types.StringType,
                s"only string columns can be bloom-indexed; " +
                  s"'$column' is ${fld.dataType.simpleString}")
            }
          if (df.columns.exists(_.equalsIgnoreCase(column))) {
            val rows = df
              .select(input_file_name().as("f"),
                col(column).cast("string").as("v"))
              .filter(col("v").isNotNull)
              .withColumn("r", explode(array(lit(0), lit(1), lit(2))))
              .select(col("f"),
                (conv(md5(col("v"))
                  .substr(lit(1) + lit(10) * col("r"), lit(10)), 16, 10)
                  .cast("long") % MBits).as("p"))
              .selectExpr("f", "p div 64 AS w",
                "CAST(p % 64 AS INT) AS b")
              .groupBy("f", "w")
              .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), b))")
                .as("bits"))
              .collect()
            rows.foreach { r =>
              val f = canon(r.getString(0))
              // the RollupStore canonicalization-drift guard: a stray
              // key would silently leave a file's bloom EMPTY — which
              // for blooms is UNSOUND (it would skip a file that has
              // the value) — so fail loudly
              require(built.contains(f),
                s"bloom partial keyed to unrequested file: $f — " +
                  "input_file_name()/manifest canonicalization drifted")
              built(f)(r.getLong(1).toInt) |= r.getLong(2)
            }
            // zone map: per-file min/max of the same column, same scan
            tier.readFiles(spark, ns, table, missing, None)
              .select(input_file_name().as("f"),
                col(column).cast("string").as("v"))
              .filter(col("v").isNotNull)
              .groupBy("f")
              .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
              .collect()
              .foreach { r =>
                val f = canon(r.getString(0))
                require(built.contains(f),
                  s"zone-map partial keyed to unrequested file: $f")
                builtRg(f) = Some((r.getString(1), r.getString(2)))
              }
          }
          built.foreach { case (f, words) => m(f) = words }
          builtRg.foreach { case (f, r) => rg(f) = r }
          missing.size
        }
      } finally tier.release(snap)
    }

  /** Columns indexed for (ns, table). */
  def indexedColumns(ns: String, table: String): Set[String] =
    synchronized {
      blooms.keysIterator
        .collect { case (n, t, c) if n == ns && t == table.toLowerCase => c }.toSet
    }

  /** The subset of `files` a scan for `column = 'value'` must read.
    * Unindexed files are kept (conservative); a file is dropped only
    * when its own bloom excludes the literal.
    */
  def skipFiles(ns: String, table: String, column: String,
      value: String, files: Seq[String]): Seq[String] =
    skipFilesAny(ns, table, column, Seq(value), files)

  /** IN-list variant: the subset of `files` a scan for
    * `column IN (values…)` must read — a file is kept when ANY listed
    * value hits its bloom (the disjunction is sound per value: every
    * value that could match keeps the file).
    */
  def skipFilesAny(ns: String, table: String, column: String,
      values: Seq[String], files: Seq[String]): Seq[String] = {
    val key = (ns, table.toLowerCase, column.toLowerCase)
    val (m, rg) = synchronized {
      (blooms.get(key).map(_.toMap), ranges.get(key).map(_.toMap))
    }
    m match {
      case None => files
      case Some(idx) =>
        val pss = values.map(positions)
        files.filter { f =>
          val cf = canon(f)
          idx.get(cf) match {
            case None => true // unindexed: must read
            case Some(words) =>
              val bloomHit = pss.exists(_.forall(p =>
                (words(p >>> 6) & (1L << (p & 63))) != 0L))
              // equality also consults the zone map: a bloom false
              // positive outside [lo, hi] is still provably absent
              val rangeHit = rg.flatMap(_.get(cf)) match {
                case Some(None) => false // no non-null values at all
                case Some(Some((lo, hi))) =>
                  values.exists(v => v >= lo && v <= hi)
                case None => true // no zone map: can't exclude
              }
              bloomHit && rangeHit
          }
        }
    }
  }

  /** Range variant: the subset of `files` a scan for
    * `column >= lo AND column <= hi` (either bound optional) must
    * read — a file is dropped when its zone map proves the string
    * interval and the file's [min, max] are disjoint. `>`/`<` are
    * treated as their inclusive forms (boundary file kept:
    * conservative and sound).
    */
  def skipFilesRange(ns: String, table: String, column: String,
      lo: Option[String], hi: Option[String], files: Seq[String])
      : Seq[String] = {
    val rg = synchronized {
      ranges.get((ns, table.toLowerCase, column.toLowerCase)).map(_.toMap)
    }
    rg match {
      case None => files
      case Some(idx) =>
        files.filter { f =>
          idx.get(canon(f)) match {
            case None => true // unindexed: must read
            case Some(None) => false // no non-null values: no row matches
            case Some(Some((mn, mx))) =>
              lo.forall(l => mx >= l) && hi.forall(h => mn <= h)
          }
        }
    }
  }

  /** Drop cached blooms for files no longer in any current manifest
    * (post-compaction hygiene — mirrors RollupStore.prune).
    */
  def prune(): Unit = synchronized {
    (blooms.iterator ++ ranges.iterator).foreach {
      case ((ns, table, _), m) =>
        val live = tier.dataFiles(ns, table).map(canon).toSet
        m.keysIterator.filterNot(live).toSeq.foreach(m.remove)
    }
  }

  def cachedFiles: Int = synchronized(blooms.values.map(_.size).sum)
}

object BloomStore {
  /** 2^15 bloom bits per file; 64-bit words (JVM-only — no
    * cross-engine sign-bit concern here, unlike q_dedup_bloom's
    * 32-bit oracle-mirrored words).
    */
  val MBits = 32768L
  val Words: Int = (MBits / 64).toInt

  /** The k=3 bit positions of a value — the JVM mirror of the Spark
    * expression in [[BloomStore.index]]: md5 hex of the UTF-8 bytes,
    * three 10-hex-char slices parsed base-16, mod MBits.
    */
  def positions(value: String): Array[Int] = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(value.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    Array.tabulate(3) { r =>
      (java.lang.Long.parseLong(hex.substring(10 * r, 10 * r + 10), 16)
        % MBits).toInt
    }
  }

  private[engine] def canon(path: String): String = {
    val p =
      if (path.startsWith("file:"))
        try {
          val u = new java.net.URI(path).getPath
          if (u != null) u else path.stripPrefix("file:")
        } catch {
          case _: java.net.URISyntaxException =>
            path.stripPrefix("file:")
        }
      else path
    new java.io.File(p).getAbsolutePath
  }
}
