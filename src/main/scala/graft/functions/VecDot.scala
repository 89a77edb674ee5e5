package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product over float/double array columns.
  *
  * Semantically identical to the declarative form
  * `aggregate(zip_with(a, b, (x, y) -> cast(x AS double) * y),
  *  0d, (acc, x) -> acc + x)` — a sequential left-to-right fold with
  * double accumulation — so it is bit-exact against the DuckDB oracle's
  * `list_reduce(list_transform(...))`. Unlike that form, which runs on
  * the interpreted higher-order-function path (one closure call per
  * element per row), this compiles to a tight scalar loop inside
  * whole-stage codegen: the hot path of every similarity-search /
  * ANN / embedding-dedup operator at 100 TB.
  *
  * Null semantics: null input array, any null element, or mismatched
  * array lengths → null (matching `zip_with`'s null-padding, which
  * turns a ragged zip into a null product).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires array<float>/array<double> args, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def get(arr: String, e: Expression, i: String): String =
      if (elemType(e) == FloatType) s"(double) $arr.getFloat($i)"
      else s"$arr.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (xa, ya) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $xa.numElements();
         |double $acc = 0.0;
         |if ($ya.numElements() != $n) { ${ev.isNull} = true; } else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($xa.isNullAt($i) || $ya.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${get(xa, left, i)} * ${get(ya, right, i)};
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

/** Native codegen'd squared L2 distance over float/double array columns.
  *
  * Semantically identical to
  * `aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0d,
  *  (acc, v) -> acc + v)` — the same left-to-right double fold, so every
  * partial sum is bit-identical to the declarative form (and to the
  * DuckDB oracles' `list_sum(list_transform(...))` on the quantized
  * integer-valued inputs the PQ gates feed it, where every square and
  * sum is exact). Replaces the interpreted higher-order-function path
  * (two closure calls per element per row) with a tight codegen'd loop:
  * the hot kernel of the product-quantization rerank gates.
  *
  * Null semantics match [[VecDot]]: null array, null element, or
  * length mismatch → null.
  */
case class VecL2sq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_l2sq requires array<float>/array<double> args, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xv - yv
      acc += d * d
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def get(arr: String, e: Expression, i: String): String =
      if (elemType(e) == FloatType) s"(double) $arr.getFloat($i)"
      else s"$arr.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (xa, ya) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $xa.numElements();
         |double $acc = 0.0;
         |if ($ya.numElements() != $n) { ${ev.isNull} = true; } else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($xa.isNullAt($i) || $ya.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = ${get(xa, left, i)} - ${get(ya, right, i)};
         |    $acc += $d * $d;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecL2sq =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_l2sq"
}

/** Session-level registration of graft's native expressions, so they are
  * usable from `expr(...)` / `spark.sql(...)` like built-ins. */
object GraftFunctions {
  private[functions] val builders: Seq[(String, String,
      Seq[Expression] => Expression)] = Seq(
    ("vec_dot", classOf[VecDot].getName, { exprs =>
      require(exprs.length == 2, s"vec_dot expects 2 args, got ${exprs.length}")
      VecDot(exprs.head, exprs(1))
    }),
    ("vec_l2sq", classOf[VecL2sq].getName, { exprs =>
      require(exprs.length == 2, s"vec_l2sq expects 2 args, got ${exprs.length}")
      VecL2sq(exprs.head, exprs(1))
    }),
    ("sorted_intersect_count", classOf[SortedIntersectCount].getName, { exprs =>
      require(exprs.length == 2,
        s"sorted_intersect_count expects 2 args, got ${exprs.length}")
      SortedIntersectCount(exprs.head, exprs(1))
    }),
    ("bigram_best_profile", classOf[BigramBestProfile].getName, { exprs =>
      require(exprs.length == 2,
        s"bigram_best_profile expects 2 args, got ${exprs.length}")
      BigramBestProfile(exprs.head, exprs(1))
    }))

  /** Idempotent per session, tracked on OUR side: callers invoke
    * register() per query, and createOrReplaceTempFunction logs a
    * "replaced a previously registered function" warning each time, so
    * re-registration must be skipped — but skipping on a bare
    * `functionExists` would silently keep a FOREIGN temp function a
    * user happened to register under one of these names (wrong results,
    * no error). A session-keyed set records which sessions WE
    * registered into: first call per session always
    * createOrReplace (claiming the name loudly if it was foreign),
    * later calls are no-ops. */
  private val registered = java.util.Collections.newSetFromMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def register(spark: SparkSession): Unit = registered.synchronized {
    if (registered.add(spark)) {
      val reg = spark.sessionState.functionRegistry
      builders.foreach { case (name, _, b) =>
        reg.createOrReplaceTempFunction(name, b, "built-in")
      }
    }
  }
}

/** `spark.sql.extensions` entry point — the deployment-time form of
  * [[GraftFunctions.register]]: sessions built with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * (e.g. via spark-submit on a cluster) get the native expressions
  * injected without any code calling register(). */
class GraftExtensions
    extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(
      ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, className, b) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          className, name),
        b))
    }
}
