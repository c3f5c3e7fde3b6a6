package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join: for every left row, the latest right row of the same
  * key with right.ts strictly before left.ts (SURVEY.md §2 "as-of join" —
  * the operator Spark's built-ins lack; preference order (c): full
  * LogicalPlan + Strategy + SparkPlan, per the builder guide).
  *
  * Physical algorithm: both sides hash-clustered on the key and sorted by
  * (key, ts) — requirements declared to Catalyst, which inserts the
  * exchanges/sorts (and can satisfy them for free from bucketed or
  * pre-sorted data). Each co-partition pair is then merged in one forward
  * pass carrying the last-seen right row per key: O(n_l + n_r) per
  * partition, no per-row probing, no window buffering of the whole group —
  * at 100 TB the shuffle is one pass over each side and state is a single
  * row.
  *
  * Key must be LongType; ts must be TimestampType (micros) or LongType.
  * Right-side columns come back null when no prior row exists (left
  * outer semantics).
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTs: Expression, rightTs: Expression)
  extends BinaryNode {
  // The exec reads keys/timestamps as raw 8-byte words; any other type
  // would produce silently wrong joins, so fail fast at plan build.
  require(leftKey.dataType == org.apache.spark.sql.types.LongType &&
          rightKey.dataType == org.apache.spark.sql.types.LongType,
    s"as-of join keys must be LongType, got ${leftKey.dataType}/${rightKey.dataType}")
  // TIMESTAMP_NTZ is the same physical 8-byte micros value as TIMESTAMP,
  // so the raw-word merge below is oblivious to the distinction — accept it
  // (the driver's parquet testdata ships isAdjustedToUTC=false micros,
  // which Spark 4 infers as NTZ by default). The two SIDES must agree,
  // though: mixing an instant (LTZ) with a wall-clock (NTZ) column would
  // compare values offset by the session zone with no error raised.
  private def tsOk(e: Expression) = e.dataType match {
    case org.apache.spark.sql.types.TimestampType |
         org.apache.spark.sql.types.TimestampNTZType |
         org.apache.spark.sql.types.LongType => true
    case _ => false
  }
  require(tsOk(leftTs) && tsOk(rightTs) && leftTs.dataType == rightTs.dataType,
    s"as-of join timestamps must be matching TimestampType, TimestampNTZType or LongType, got ${leftTs.dataType}/${rightTs.dataType}")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoinPlan =
    copy(left = l, right = r)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTs: Expression, rightTs: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
        Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfJoinExec =
    copy(left = l, right = r)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKey
    val lt = leftTs
    val rk = rightKey
    val rt = rightTs
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lProj = UnsafeProjection.create(Seq(lk, lt), lOut)
      val rProj = UnsafeProjection.create(Seq(rk, rt), rOut)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      // downstream operators require UnsafeRow output; bind against the
      // nullability-adjusted output attrs so null right-side fields are
      // read as nulls (the raw right attrs may be non-nullable)
      val outProj = UnsafeProjection.create(output, output)

      // lookahead on the right side
      var rHasNext = rIter.hasNext
      var rRow: InternalRow = null
      var rKeyV = 0L; var rTsV = 0L; var rValid = false
      def advanceRight(): Unit = {
        if (rHasNext) {
          // copy: rows from a shuffle/sort iterator are only valid until
          // the next next() — and this lookahead row must survive pulls on
          // the LEFT iterator too (observed: the left reader reuses the
          // same deserialization buffer in local mode)
          rRow = rIter.next().copy()
          val kt = rProj(rRow)
          rValid = !kt.isNullAt(0) && !kt.isNullAt(1)
          rKeyV = if (rValid) kt.getLong(0) else 0L
          rTsV = if (rValid) kt.getLong(1) else 0L
          rHasNext = rIter.hasNext
        } else { rRow = null }
      }
      advanceRight()

      // last right row seen for `matchKey`
      var matchKey = 0L
      var hasMatch = false
      var matchRow: InternalRow = null

      lIter.map { lRow =>
        val kt = lProj(lRow)
        if (kt.isNullAt(0) || kt.isNullAt(1)) outProj(joined(lRow, nullRight))
        else {
          val lKeyV = kt.getLong(0)
          val lTsV = kt.getLong(1)
          // consume right rows strictly before (lKeyV, lTsV)
          while (rRow != null &&
                 (!rValid || rKeyV < lKeyV || (rKeyV == lKeyV && rTsV < lTsV))) {
            if (rValid) {
              matchKey = rKeyV; hasMatch = true
              matchRow = rRow   // already a private copy from advanceRight
            }
            if (rHasNext) advanceRight() else rRow = null
          }
          if (hasMatch && matchKey == lKeyV) outProj(joined(lRow, matchRow))
          else outProj(joined(lRow, nullRight))
        }
      }
    }
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level API. Registers the strategy in the session on first
  * use (also injectable via graft.functions.GraftExtensions). */
object AsOfJoin {
  def apply(left: DataFrame, right: DataFrame,
            leftKey: String, rightKey: String,
            leftTsCol: String, rightTsCol: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lPlan = left.queryExecution.analyzed
    // Same-lineage inputs (self-as-of) share exprIds; the analyzer's
    // DeduplicateRelations rewrites the right child but not this custom
    // node's key/ts expressions — re-alias the right side with fresh
    // exprIds up front so both resolve consistently.
    val rPlan0 = right.queryExecution.analyzed
    val rPlan: LogicalPlan =
      if (lPlan.outputSet.intersect(rPlan0.outputSet).nonEmpty)
        org.apache.spark.sql.catalyst.plans.logical.Project(
          rPlan0.output.map(a =>
            org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()), rPlan0)
      else rPlan0
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${p.output.map(_.name)}"))
    org.apache.spark.sql.graftshim.Shim.ofRows(spark,
      AsOfJoinPlan(lPlan, rPlan,
        attr(lPlan, leftKey), attr(rPlan, rightKey),
        attr(lPlan, leftTsCol), attr(rPlan, rightTsCol)))
  }
}
