package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-mitigation building block: salted join. When one join key
  * carries a disproportionate share of rows (hot user, hot document
  * cluster), a plain shuffle join puts the whole hot key in one task.
  * Salting splits the hot side's key into `saltBuckets` sub-keys and
  * replicates the other side across all buckets — turning one
  * straggler task into `saltBuckets` even ones.
  *
  * AQE's skew-join handles this automatically for sort-merge joins
  * (see SkewSpec); the explicit salt remains the tool for aggregations
  * and for joins AQE can't rewrite (e.g. when one side is streamed).
  */
object Skew {

  /** Inner equi-join of `big` (skewed) with `small`, salted.
    * Result equals `big.join(small, bigKey === smallKey)` with both
    * key columns retained.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, saltBuckets: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      (rand(seed = 42) * saltBuckets).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated,
        salted(bigKey) === replicated(smallKey) &&
          salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Skew-safe two-phase aggregation: count per key via a salted
    * partial (key, salt) aggregate, then the final merge over the
    * (at most `saltBuckets` × distinct-keys) partial rows.
    */
  def saltedCount(df: DataFrame, key: String, saltBuckets: Int): DataFrame =
    df.withColumn("__salt", (rand(seed = 42) * saltBuckets).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))
}

/** Oracle-checked skew operators: the salted join's defining property
  * is salt-INVARIANCE — the result must equal the plain equi-join no
  * matter how the salt scattered the hot key — so its oracle IS the
  * unsalted join. (`SkewSpec` covers the plan shape and AQE's
  * automatic skew-split; this query puts the equivalence under the
  * same cross-engine hash gate as every other operator.)
  */
object SkewOps {

  /** Salted fact-dim join, aggregated: lineitem (fact, salted on
    * l_suppkey — the hot-supplier scenario) joined to supplier
    * replicated ×8, then rolled up per nation. The salt column never
    * escapes the join, so the aggregate is bit-equal to the plain
    * join's; sums go through exact decimals (Parity). Scale shape:
    * the fact side shuffles on (key, salt) — 8 even tasks where the
    * plain join puts every hot-key row in one — and the dim side's
    * ×8 explode is proportional to the SMALL side only.
    */
  val qJoinSalted = QueryDef(
    "q_join_salted",
    (s, dir) => {
      val li = Tables.t(s, dir, "lineitem")
        .select("l_suppkey", "l_quantity", "l_extendedprice")
      val sup = Tables.t(s, dir, "supplier")
        .select("s_suppkey", "s_nationkey")
      Skew.saltedJoin(li, sup, "l_suppkey", "s_suppkey", 8)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_items"),
          Parity.dsum(col("l_quantity")).as("sum_qty"),
          Parity.dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("s_nationkey")
    },
    Some(s"""
      SELECT s_nationkey, count(*) AS n_items,
        ${Parity.dsumSql("l_quantity")} AS sum_qty,
        ${Parity.dsumSql("l_extendedprice")} AS sum_price
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY s_nationkey ORDER BY s_nationkey"""))

  val all: Seq[QueryDef] = Seq(qJoinSalted)
}
