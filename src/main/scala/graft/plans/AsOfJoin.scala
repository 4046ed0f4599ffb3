package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.{ColumnBridge, PlanBridge}
import org.apache.spark.sql.types.LongType

/** Native as-of join: for every left row, the greatest `rightTime` of
  * the same key with `rightTime <= leftTime` (or null) — the point-in-
  * time lookup a feature-store / market-data join needs. Spark has no
  * such operator (SURVEY §2.8 lists joins as wholly absent from the
  * reference; the window/union trick in `r18_asof_join` is the
  * declarative fallback). This is the engine's whole-operator Catalyst
  * tier: custom `LogicalPlan` → `SparkStrategy` → `SparkPlan`,
  * injected via `SparkSessionExtensions` / `experimental.extraStrategies`.
  *
  * Physical contract: both sides hash-clustered on the key and sorted
  * by (key, time) — `EnsureRequirements` inserts the exchanges/sorts —
  * then a single zipPartitions merge pass with O(1) state (current key
  * + last matching time). No window buffering, no union, no state
  * store; shuffles carry only the two inputs. Keys and times are
  * LongType (ids / epoch micros) by contract.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    leftTime: Expression,
    rightKey: Expression,
    rightTime: Expression,
    outAttr: AttributeReference) extends BinaryNode {

  override def output: Seq[Attribute] = left.output :+ outAttr

  override def producedAttributes: AttributeSet = AttributeSet(outAttr)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lt, rk, rt, out) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, out) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    leftTime: Expression,
    rightKey: Expression,
    rightTime: Expression,
    outAttr: AttributeReference) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ outAttr

  override def producedAttributes: AttributeSet = AttributeSet(outAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTime, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTime, right.output)
    val outSchema = output
    val leftOut = left.output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rBuf = rIter.buffered
      val timeRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(
        outSchema.map(_.asInstanceOf[Expression]), leftOut :+ outAttr)
      // O(1) merge state: key + as-of time of the last consumed right row
      var haveLast = false
      var lastKey = 0L
      var lastTime = 0L
      lIter.map { lRow =>
        val kAny = lk.eval(lRow)
        if (kAny == null) {
          timeRow.update(0, null)
        } else {
          val k = kAny.asInstanceOf[Long]
          val t = lt.eval(lRow).asInstanceOf[Long]
          var advance = true
          while (advance && rBuf.hasNext) {
            val head = rBuf.head
            val hkAny = rk.eval(head)
            if (hkAny == null) { rBuf.next(); () } // skip null keys
            else {
              val hk = hkAny.asInstanceOf[Long]
              val ht = rt.eval(head).asInstanceOf[Long]
              if (hk < k || (hk == k && ht <= t)) {
                haveLast = true; lastKey = hk; lastTime = ht
                rBuf.next(); ()
              } else advance = false
            }
          }
          if (haveLast && lastKey == k) timeRow.update(0, lastTime)
          else timeRow.update(0, null)
        }
        proj(joined(lRow, timeRow))
      }
    }
  }
}

/** Optimizer rule (the `Rule[LogicalPlan]` extension tier): Catalyst's
  * built-in ColumnPruning cannot see through a custom node, so without
  * this, every left column rides the exchange + sort even when the
  * parent projects a subset. Prunes the left child to the columns the
  * parent actually references plus the join key/time.
  */
object AsOfJoinColumnPruning
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.Project

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, aj: AsOfJoinPlan) =>
      val needed = AttributeSet(p.projectList.flatMap(_.references)) ++
        aj.leftKey.references ++ aj.leftTime.references
      val kept = aj.left.output.filter(needed.contains)
      if (kept.length == aj.left.output.length) p
      else p.copy(child = aj.copy(left = Project(kept, aj.left)))
  }
}

/** DataFrame-level API. The right side is re-projected through fresh
  * aliases, so self-joins (left and right scanning the same table) are
  * safe without relying on analyzer dedup of a custom node.
  */
object AsOfJoin {
  def apply(left: DataFrame, right: DataFrame,
            key: String, leftTime: String, rightTime: String,
            outName: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val r2 = right.select(col(key).as("__asof_key"),
      col(rightTime).as("__asof_time"))
    val rPlan = PlanBridge.analyzed(r2)
    val lPlan = PlanBridge.analyzed(left)
    def attr(df: DataFrame, name: String): Expression =
      ColumnBridge.expression(df(name))
    val plan = AsOfJoinPlan(
      lPlan, rPlan,
      attr(left, key), attr(left, leftTime),
      rPlan.output.head, rPlan.output(1),
      AttributeReference(outName, LongType, nullable = true)())
    PlanBridge.ofRows(left.sparkSession, plan)
  }
}
