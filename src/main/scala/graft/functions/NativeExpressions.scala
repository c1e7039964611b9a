package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native (codegen'd) dot product over two `array<double>` columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(a,b,_*_),...)`)
  * is interpreted per element with boxing — fine for per-row feature columns,
  * ~30 µs/pair in the all-pairs similarity joins where it dominates the whole
  * bench. This expression compiles to a primitive `double[]` loop inside
  * whole-stage codegen. Accumulation order is the same sequential i=0..n-1
  * fold, so results are bit-identical to the HOF version (and to the DuckDB
  * oracle's `list_cosine_similarity` numerator).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Callers pass array<double> (VectorFunctions.toDouble upstream); no
  // implicit-cast mixin because AbstractDataType is private[sql].
  override def dataType: DataType = DoubleType
  require(Seq(left, right).forall(e => !e.resolved ||
    e.dataType == ArrayType(DoubleType) || e.dataType == ArrayType(DoubleType, false)),
    "graft_dot requires array<double> inputs")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    val n = math.min(x.length, y.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += x(i) * y(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |double[] $x = $a.toDoubleArray();
         |double[] $y = $b.toDoubleArray();
         |int $n = Math.min($x.length, $y.length);
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $s += $x[$i] * $y[$i]; }
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object NativeExpressions {
  /** Session-scoped registration of the native functions; idempotent.
    * Registered through the classic FunctionRegistry so call sites can use
    * `call_function("graft_dot", a, b)` without constructing Columns from
    * internal Expressions (that constructor is private in Spark 4).
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "graft_dot", (args: Seq[Expression]) => DotProduct(args(0), args(1)), "built-in")
  }
}
