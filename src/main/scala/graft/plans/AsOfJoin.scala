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

/** Native as-of join: for every left row, the matching `rightTime` of
  * the same key (or null) — the point-in-time lookup a feature-store /
  * market-data join needs. Three directions:
  *  - `backward` (default): greatest rightTime <= leftTime;
  *  - `forward`: smallest rightTime >= leftTime;
  *  - `nearest`: whichever of the two is closer (ties -> backward).
  * Spark has no such operator (SURVEY §2.8 lists joins as wholly
  * absent from the reference; the window/union trick in
  * `r18_asof_join` is the declarative fallback). This is the engine's
  * whole-operator Catalyst tier: custom `LogicalPlan` →
  * `SparkStrategy` → `SparkPlan`, injected via
  * `SparkSessionExtensions` / `experimental.extraStrategies`.
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
    outAttr: AttributeReference,
    direction: AsOfDirection = AsOfBackward) extends BinaryNode {

  override def output: Seq[Attribute] = left.output :+ outAttr

  override def producedAttributes: AttributeSet = AttributeSet(outAttr)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Match direction. Sealed ADT (not a string) so the plan node stays
  * comparable/copyable the Catalyst way.
  */
sealed trait AsOfDirection { def name: String }
case object AsOfBackward extends AsOfDirection { val name = "backward" }
case object AsOfForward  extends AsOfDirection { val name = "forward" }
case object AsOfNearest  extends AsOfDirection { val name = "nearest" }
object AsOfDirection {
  def apply(s: String): AsOfDirection = s.toLowerCase match {
    case "backward" => AsOfBackward
    case "forward"  => AsOfForward
    case "nearest"  => AsOfNearest
    case other => throw new IllegalArgumentException(
      s"as-of direction must be backward|forward|nearest, got '$other'")
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lt, rk, rt, out, dir) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, out, dir) :: Nil
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
    outAttr: AttributeReference,
    direction: AsOfDirection = AsOfBackward) extends BinaryExecNode {

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
        val tAny = lt.eval(lRow)
        if (kAny == null || tAny == null) {
          // Null key or null as-of time on the left: no match (mirrors
          // SQL join-on-null). A null time must NOT unbox to epoch 0.
          timeRow.update(0, null)
        } else {
          val k = kAny.asInstanceOf[Long]
          val t = tAny.asInstanceOf[Long]
          // Consume right rows strictly behind the current left
          // position. backward also consumes ht == t (so `last` IS the
          // match); forward/nearest stop before ht >= t, leaving the
          // head unconsumed as the forward candidate — later left rows
          // (same key, time >= t) may need it too.
          val consumeEq = direction == AsOfBackward
          var advance = true
          var peekValid = false
          var peekKey = 0L
          var peekTime = 0L
          while (advance && rBuf.hasNext) {
            val head = rBuf.head
            val hkAny = rk.eval(head)
            val htAny = rt.eval(head)
            // Skip right rows with null key OR null time: a null time
            // would otherwise unbox to 0L and spuriously match any
            // left time >= epoch 0. (Nulls sort first, so skipping
            // preserves the merge invariant.)
            if (hkAny == null || htAny == null) { rBuf.next(); () }
            else {
              val hk = hkAny.asInstanceOf[Long]
              val ht = htAny.asInstanceOf[Long]
              if (hk < k || (hk == k && (ht < t || (consumeEq && ht == t)))) {
                haveLast = true; lastKey = hk; lastTime = ht
                rBuf.next(); ()
              } else {
                advance = false
                peekValid = true; peekKey = hk; peekTime = ht
              }
            }
          }
          val hasBack = haveLast && lastKey == k // lastTime <= t
          val hasFwd = peekValid && peekKey == k // peekTime >= t
          direction match {
            case AsOfBackward =>
              if (hasBack) timeRow.update(0, lastTime)
              else timeRow.update(0, null)
            case AsOfForward =>
              if (hasFwd) timeRow.update(0, peekTime)
              else timeRow.update(0, null)
            case AsOfNearest =>
              if (hasBack && hasFwd) timeRow.update(0,
                if (t - lastTime <= peekTime - t) lastTime else peekTime)
              else if (hasBack) timeRow.update(0, lastTime)
              else if (hasFwd) timeRow.update(0, peekTime)
              else timeRow.update(0, null)
          }
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
            outName: String,
            direction: String = "backward"): DataFrame = {
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
      AttributeReference(outName, LongType, nullable = true)(),
      AsOfDirection(direction))
    PlanBridge.ofRows(left.sparkSession, plan)
  }
}
