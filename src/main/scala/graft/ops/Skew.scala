package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
