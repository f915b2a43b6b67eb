// Lives under org.apache.spark.sql because SparkPlan/SparkStrategy and the
// classic Dataset.ofRows bridge are private[sql] extension surface — same
// rationale as KmvSketchAgg / VectorExpressions.
package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the tier-(c) extension path from the build brief
  * (custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`), complementing
  * the tier-(a) composition in `graft.operators.AsOfJoin` and proven
  * row-identical to it by AsOfJoinNativeSpec and the q_asof_native oracle.
  *
  * Why a physical operator can beat the (already single-shuffle) window
  * composition: the composition unions BOTH sides into one frame, sorts
  * the union, and runs a `last(ignoreNulls)` window whose state is the
  * carried struct per row — every right row is materialized into the
  * window frame alongside every left row. This exec keeps the sides
  * separate: each shuffles and sorts independently (often one side is
  * already bucketed/sorted on disk, making its exchange free), and the
  * per-partition merge carries O(1) state — ONE buffered candidate right
  * row per key — never a frame. Same exchange count in the worst case,
  * strictly less memory and row traffic always; this is how kdb/QuestDB
  * execute as-of.
  *
  * Semantics (identical to AsOfJoin.asOf): for each left row, the latest
  * right row with the same key and rightTs <= leftTs; ties on rightTs
  * resolve to the largest tiebreak; no qualifying row → nulls. Null keys
  * match each other (window-partition semantics, not SQL-join semantics).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTs: Attribute,
    rightTs: Attribute,
    rightTie: Attribute) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, tie) =>
      AsOfJoinExec(lk, rk, lts, rts, tie, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    rightTie: Expression,
    left: SparkPlan,
    right: SparkPlan) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // co-clustered children: EnsureRequirements plants one exchange per
  // side (or none when a side is already hash-distributed on the key)
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)),
      ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
        SortOrder(rightTie, Ascending)))

  // rows stream out in the left child's (key, ts) order
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOutput = left.output
    val rightOutput = right.output
    val lKeyExpr = leftKey
    val rKeyExpr = rightKey
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val keyType = leftKey.dataType
    val tsType = leftTs.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // task-side: projections/orderings are not serializable
      val lKeyProj = UnsafeProjection.create(Seq(lKeyExpr), leftOutput)
      val rKeyProj = UnsafeProjection.create(Seq(rKeyExpr), rightOutput)
      val cKeyProj = UnsafeProjection.create(Seq(rKeyExpr), rightOutput)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), leftOutput)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rightOutput)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(keyType))
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
      val nullRight = new GenericInternalRow(rightOutput.size)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var rHead: InternalRow = _ // un-consumed right row (raw)
        private var cand: InternalRow = _ // latest qualifying right (copy)

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          // consume right rows that are at-or-before this left row; the
          // last consumed with a matching key is the as-of candidate
          var continue = true
          while (continue && (rHead != null || rIter.hasNext)) {
            if (rHead == null) rHead = rIter.next()
            val c = keyOrd.compare(rKeyProj(rHead), lk)
            if (c < 0) {
              rHead = null // right key fell behind: discard
            } else if (c == 0 &&
                tsOrd.compare(rTsProj(rHead), lTsProj(l)) <= 0) {
              cand = rHead.copy() // qualifies; later rows may supersede
              rHead = null
            } else {
              continue = false // right is ahead of this left row
            }
          }
          // one buffered candidate is the ENTIRE merge state; it must
          // still belong to this left key (left may have advanced)
          val r =
            if (cand != null && keyOrd.compare(cKeyProj(cand), lk) == 0) cand
            else nullRight
          joined(l, r)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level entry point. The strategy self-registers idempotently
  * on the session's experimental strategies (the supported mutable hook
  * for exactly this); `register(ext)` offers the SparkSessionExtensions
  * path for spark.sql.extensions deployments. */
object AsOfJoinNative {

  def register(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)

  /** As-of join `left` to `right` on `key` with `rightTs <= leftTs`,
    * latest (then largest `tiebreak`) right row wins; right columns come
    * back null-padded when nothing qualifies. The right-side key column is
    * dropped from the output (USING-join style); other right column names
    * must not collide with left's (rename first, as with any join). */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, tiebreak: String,
      selfRegister: Boolean = true): DataFrame = {
    val spark = left.sparkSession
    // deployments that install GraftExtensions via spark.sql.extensions
    // pass selfRegister = false: the strategy is already injected and the
    // session stays unmutated (GraftExtensionsSpec proves that path)
    if (selfRegister &&
        !spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val lp = left.queryExecution.analyzed
    // fresh-alias the right side: when both sides derive from the same
    // base frame (the self-join norm for event tables), their plans share
    // attribute exprIds, and DeduplicateRelations cannot know which side
    // this node's key/ts expressions meant. Alias exprIds are stable
    // under dedup (only below-alias refs get remapped), so anchoring the
    // node's right-side references to fresh aliases makes the self-join
    // unambiguous — the same mechanism as DataFrame.alias.
    val rBase = right.queryExecution.analyzed
    val rAliases = rBase.output.map(a =>
      org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)())
    val rp = org.apache.spark.sql.catalyst.plans.logical.Project(rAliases, rBase)
    val rightAttrs = rAliases.map(_.toAttribute)
    def lattr(name: String): Attribute =
      lp.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${lp.output.map(_.name).mkString(",")}"))
    def rattr(name: String): Attribute =
      rightAttrs.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${rightAttrs.map(_.name).mkString(",")}"))
    val rKey = rattr(key)
    val node = AsOfJoinPlan(lp, rp,
      lattr(key), rKey, lattr(leftTs), rattr(rightTs), rattr(tiebreak))
    val out = org.apache.spark.sql.catalyst.plans.logical.Project(
      node.output.filterNot(_.exprId == rKey.exprId), node)
    Dataset.ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], out)
  }
}
