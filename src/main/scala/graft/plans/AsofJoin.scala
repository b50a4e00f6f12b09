package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  AttributeReference, Expression, GenericInternalRow, JoinedRow, RowOrdering,
  SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The engine's one whole-operator custom plan: a native as-of join.
  *
  * Spark has no as-of join operator (pandas-on-Spark's merge_asof
  * rewrites to window functions; SURVEY.md §2.10 lists as-of among the
  * join types absent from the reference too). The composable form
  * (graft.ops.StreamMatch.asofJoin: union + last(ignoreNulls) window)
  * answers it with one shuffle of left+right combined plus a WindowExec
  * that buffers and re-materializes every column through the window
  * frame. This operator expresses the semantics directly:
  *
  *   logical [[AsofJoinNode]]  — resolved attributes only, built by
  *     [[AsofJoin.apply]]; flows through Catalyst untouched
  *   [[AsofJoinStrategy]]      — SparkStrategy planning the node, injected
  *     via GraftExtensions (config path) or
  *     ClassicBridge.ensureStrategy (runtime path)
  *   physical [[AsofJoinExec]] — declares ClusteredDistribution on the
  *     keys and (key, ts) child orderings, so EnsureRequirements inserts
  *     exactly one co-partitioning Exchange + Sort per side, then a
  *     single forward merge scan pairs each left row with the latest
  *     right row at-or-before it: O(1) state (one carried row), no
  *     buffering, no window frame.
  *
  * Semantics match StreamMatch.asofJoin: left-outer; ties at equal
  * timestamp take the right row (<=); right rows should be unique per
  * (key, ts) for a deterministic winner.
  */
case class AsofJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute,
    carried: Seq[Attribute],
    asofOut: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ asofOut
  // the appended columns are synthesized by this operator, not inherited
  // from a child — declare them or CheckAnalysis flags missing inputs
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(asofOut)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

class AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsofJoinNode =>
      AsofJoinExec(n.leftKeys, n.rightKeys, n.leftTs, n.rightTs, n.carried,
        n.output, planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    carried: Seq[Expression],
    output: Seq[Attribute],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      output.filterNot(left.outputSet.contains))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val nCarried = carried.length + 1
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, leftOut)
      val rKeyProj = UnsafeProjection.create(rightKeys, rightOut)
      val lTsProj = UnsafeProjection.create(Seq(leftTs), leftOut)
      val rTsProj = UnsafeProjection.create(Seq(rightTs), rightOut)
      // carried values + the as-of timestamp, in output order
      val carriedProj = UnsafeProjection.create(carried :+ rightTs, rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
      val nullCarried = new GenericInternalRow(nCarried)
      val joined = new JoinedRow
      // the exec contract: emitted rows must be UnsafeRows (downstream
      // serializers/collect cast to UnsafeRow directly)
      val outProj = UnsafeProjection.create(output, output)

      new Iterator[InternalRow] {
        private var rPending: InternalRow = _          // fetched, not yet consumed
        private var carriedRow: InternalRow = _        // copy of best match so far
        private var carriedKey: InternalRow = _        // copy of its key
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          // SQL equality: a NULL key never equals anything, including
          // another NULL (the natural ordering would compare them equal
          // — ADVICE r2; matches DuckDB ASOF). Null-key left rows emit
          // null-extended output without touching the merge cursor
          // (nulls sort first, so nothing downstream is skipped).
          if (lk.anyNull) {
            outProj(joined(l, nullCarried))
          } else {
            val lts = lTsProj(l)                       // single-field row buffer
            // a carried match from a previous (smaller) key is stale
            if (carriedKey != null && keyOrd.compare(carriedKey, lk) != 0) {
              carriedKey = null
              carriedRow = null
            }
            // advance the right side up to (lk, lts)
            var advance = true
            while (advance && (rPending != null || rIter.hasNext)) {
              if (rPending == null) rPending = rIter.next()
              val rk = rKeyProj(rPending)
              if (rk.anyNull) {
                rPending = null                        // null key: never a match
              } else {
                val cmp = keyOrd.compare(rk, lk)
                if (cmp < 0) {
                  rPending = null                      // behind in key: discard
                } else if (cmp == 0) {
                  if (tsOrd.compare(rTsProj(rPending), lts) <= 0) {
                    carriedRow = carriedProj(rPending).copy()
                    carriedKey = rk.copy()
                    rPending = null                    // consumed as best-so-far
                  } else advance = false               // ahead in time: keep
                } else advance = false                 // ahead in key: keep
              }
            }
            outProj(joined(l, if (carriedRow != null) carriedRow else nullCarried))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsofJoin {
  /** Native as-of join over resolved DataFrames — same contract as
    * StreamMatch.asofJoin: `rightCols` (from `right`) plus
    * `asof_<rightTs>` are appended to `left`'s columns, null where the
    * key has no right row at-or-before the left timestamp. Column names
    * in `rightCols` must not collide with `left`'s.
    */
  def apply(left: DataFrame, right: DataFrame, keyCol: String,
            leftTs: String, rightTs: String, rightCols: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    org.apache.spark.sql.graft.ClassicBridge.ensureStrategy(spark, new AsofJoinStrategy)
    val lPlan = left.queryExecution.analyzed
    // Re-alias every right column so the right output's expr-ids are
    // fresh. When both sides derive from the same base relation they
    // otherwise share expr-ids; the analyzer's DeduplicateRelations
    // rewrites the right subtree but cannot disambiguate this node's
    // flat attribute lists, and the stale ids then alias to LEFT
    // attributes — column pruning strips the right key and the exec
    // fails to bind. Alias expr-ids survive relation deduplication.
    val rightAliased = right.select(right.columns.toSeq.map(c =>
      org.apache.spark.sql.functions.col(c).as(c)): _*)
    val rPlan = rightAliased.queryExecution.analyzed
    def attrOf(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"asof join: no column '$name' in [${plan.output.map(_.name).mkString(", ")}]"))
    val carried = rightCols.map(attrOf(rPlan, _))
    val rTs = attrOf(rPlan, rightTs)
    val (lKey, lTs) = (attrOf(lPlan, keyCol), attrOf(lPlan, leftTs))
    // the exec compares raw projected rows and hash-partitions each side
    // independently — mismatched types would silently mis-pair keys, so
    // insert-a-cast-upstream is the caller's job and we fail loudly here
    require(lKey.dataType == attrOf(rPlan, keyCol).dataType,
      s"asof join: key '$keyCol' types differ: ${lKey.dataType.catalogString}" +
        s" vs ${attrOf(rPlan, keyCol).dataType.catalogString}")
    require(lTs.dataType == rTs.dataType,
      s"asof join: timestamp types differ: ${lTs.dataType.catalogString}" +
        s" vs ${rTs.dataType.catalogString}")
    // fresh expr-ids for the appended columns (they are new, nullable
    // outputs of this operator, not pass-throughs of right's attributes)
    val asofOut = (carried :+ rTs.withName(s"asof_$rightTs")).map(a =>
      AttributeReference(a.name, a.dataType, nullable = true)())
    org.apache.spark.sql.graft.ClassicBridge.ofRows(spark,
      AsofJoinNode(lPlan, rPlan,
        Seq(lKey), Seq(attrOf(rPlan, keyCol)),
        lTs, rTs, carried, asofOut))
  }
}
