package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  AttributeSet, BindReferences, GenericInternalRow, JoinedRow,
  SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode,
  LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan,
  SparkStrategy}
import org.apache.spark.sql.types.LongType

/** A whole-operator as-of join implemented the way the brief's option
  * (c) prescribes: a custom `LogicalPlan` node, a `SparkStrategy` that
  * lowers it, and a `SparkPlan` whose `requiredChildDistribution` /
  * `requiredChildOrdering` contracts let Catalyst's EnsureRequirements
  * plan the exchanges and sorts — the operator itself is then ONE
  * streaming merge pass per co-partition, O(|left| + |right|), with
  * O(1) state (the single current candidate row). Compare the
  * composed q_ts_asof_join (window + filter): that plan carries every
  * left row through a window sort; this one never materializes
  * anything beyond the candidate.
  *
  * Semantics (LEFT ASOF, like DuckDB's `ASOF LEFT JOIN ... ON l.k =
  * r.k AND r.t <= l.t`): for each left row, the right row with equal
  * key and the greatest time <= left time, within `toleranceUs` when
  * positive; unmatched left rows null-extend. Time columns must be
  * LongType (epoch micros); null keys/times never match.
  */
case class AsofJoin(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    toleranceUs: Long) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  // every child column survives into the output — declare them all as
  // referenced so column pruning never inserts a Project underneath
  override def references: AttributeSet =
    AttributeSet(left.output ++ right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt, tol) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    toleranceUs: Long) extends BinaryExecNode {

  require(leftTime.dataType == LongType && rightTime.dataType == LongType,
    "as-of time columns must be LongType epoch micros")
  require(leftKey.dataType == rightKey.dataType,
    "as-of key columns must share a data type")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey), requireAllClusterKeys = true) ::
      ClusteredDistribution(Seq(rightKey),
        requireAllClusterKeys = true) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val nRight = right.output.size
    val tol = toleranceUs
    val lkB = BindReferences.bindReference(leftKey: org.apache.spark.sql
      .catalyst.expressions.Expression, left.output)
    val ltB = BindReferences.bindReference(leftTime: org.apache.spark.sql
      .catalyst.expressions.Expression, left.output)
    val rkB = BindReferences.bindReference(rightKey: org.apache.spark.sql
      .catalyst.expressions.Expression, right.output)
    val rtB = BindReferences.bindReference(rightTime: org.apache.spark
      .sql.catalyst.expressions.Expression, right.output)
    val outAttrs = output
    val inAttrs = left.output ++ right.output
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(outAttrs, inAttrs)
      val rBuf = rIt.buffered
      // O(1) merge state: the latest eligible right row for the
      // current key, copied out of the unsafe-row reuse window
      var cand: InternalRow = null
      var candKey: Any = null
      var candTime: Long = 0L
      lIt.map { lrow =>
        val lkv = lkB.eval(lrow)
        val ltvAny = ltB.eval(lrow)
        if (lkv == null || ltvAny == null) {
          resultProj(joined(lrow, nullRight))
        } else {
          val ltv = ltvAny.asInstanceOf[Long]
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val peek = rBuf.head
            val rkv = rkB.eval(peek)
            val rtvAny = rtB.eval(peek)
            if (rkv == null || rtvAny == null) {
              rBuf.next() // unmatched by definition; discard
            } else {
              val c = keyOrd.compare(rkv, lkv)
              if (c < 0) { rBuf.next(); cand = null }
              else if (c == 0 &&
                  rtvAny.asInstanceOf[Long] <= ltv) {
                val r = rBuf.next()
                candTime = rtvAny.asInstanceOf[Long]
                cand = r.copy()
                // re-derive the key from the COPIED row: rkv may point
                // into the sorter's reused record buffer (UTF8String
                // etc.), which later rBuf.next() calls clobber once the
                // sort spills; eval on the copy is backed by stable
                // memory
                candKey = rkB.eval(cand)
              } else advancing = false
            }
          }
          val ok = cand != null && keyOrd.compare(candKey, lkv) == 0 &&
            (tol <= 0L || ltv - candTime <= tol)
          resultProj(joined(lrow, if (ok) cand else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public entry: register the strategy (idempotent) and build the
  * joined DataFrame. Key/time columns are referenced by name on each
  * side; callers disambiguate overlapping output names by renaming
  * the right side first.
  */
object GraftAsof {
  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
  }

  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      toleranceUs: Long = 0L): DataFrame = {
    val spark = left.sparkSession
    ensureRegistered(spark)
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def att(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in ${p.output.map(_.name).mkString(",")}"))
    val node = AsofJoin(lp, rp, att(lp, leftKey), att(rp, rightKey),
      att(lp, leftTime), att(rp, rightTime), toleranceUs)
    org.apache.spark.sql.GraftSqlBridge.ofRows(spark, node)
  }
}
