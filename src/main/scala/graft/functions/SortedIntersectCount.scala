package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}
import org.apache.spark.sql.functions.sort_array

/** `sorted_intersect_count(a, b)`: |a ∩ b| for two ascending-sorted
  * long-array columns, as a native Catalyst expression with codegen.
  *
  * Built-in `size(array_intersect(a, b))` allocates a hash set per *call*
  * — ruinous inside a pairwise similarity join where it runs millions of
  * times (the hot loop of [[graft.ext.NgramJaccard]] /
  * [[graft.ext.MinHashDedup]] verification). A merge scan over pre-sorted
  * arrays needs zero allocation and ~|a|+|b| primitive comparisons, and
  * `doGenCode` keeps it inside whole-stage codegen so the join loop never
  * leaves generated code.
  *
  * Inputs must be sorted ascending and distinct (use
  * `sort_array(array_distinct(...))` once per *row*, not per pair);
  * output then equals `size(array_intersect(a, b))` exactly.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count requires array<bigint> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    val nx = x.numElements(); val ny = y.numElements()
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $i = 0, $j = 0;
         |final int $nx = $a.numElements(), $ny = $b.numElements();
         |int ${ev.value}Tmp = 0;
         |while ($i < $nx && $j < $ny) {
         |  final long $xv = $a.getLong($i);
         |  final long $yv = $b.getLong($j);
         |  if ($xv == $yv) { ${ev.value}Tmp++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = ${ev.value}Tmp;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Column-API entry point (Spark 4 classic Column<->Expression bridge). */
  def ofSorted(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(SortedIntersectCount(expression(a), expression(b)))
  }

  def sortedArr(a: Column): Column = sort_array(a)
}
