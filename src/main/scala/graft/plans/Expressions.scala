package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (SURVEY.md §2.10 / builder guidance: a
  * codegen `Expression` beats a Scala UDF): scalar kernels that belong in
  * whole-stage codegen rather than behind a lambda boundary.
  */

/** Cosine similarity of two float-array columns, fully code-generated —
  * the hot kernel of ANN scans and embedding dedup expressed so Catalyst
  * keeps it inside WholeStageCodegen (no object iterator boundary, no
  * row materialization).
  *
  * Semantics: sums run over min(len(a), len(b)); zero-norm input → 0.0.
  * eval and codegen share the exact float order of operations.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** BM25 per-term impact tf/(tf + k1·(1 − b + b·dl/avgdl)) with the
  * engine's constants (k1=1.2, b=0.75) — code-generated so SQL-side
  * scoring pipelines stay inside whole-stage codegen.
  */
case class Bm25Impact(tf: Expression, dl: Expression, avgDl: Expression)
    extends TernaryExpression {

  override def first: Expression = tf
  override def second: Expression = dl
  override def third: Expression = avgDl
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires three double arguments")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_bm25_impact"

  override def nullSafeEval(t: Any, d: Any, a: Any): Any = {
    val tfv = t.asInstanceOf[Double]
    val dlv = d.asInstanceOf[Double]
    val ad = a.asInstanceOf[Double]
    tfv / (tfv + 1.2 * (1 - 0.75 + 0.75 * dlv / ad))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, d, a) =>
      s"${ev.value} = $t / ($t + 1.2 * (1 - 0.75 + 0.75 * $d / $a));")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(tf = f, dl = s, avgDl = t)
}

/** The engine analyzer as a SQL-visible expression: `graft_tokenize(text)`
  * → array<string>. String segmentation is branchy, allocation-bound work
  * with no profitable arithmetic to fuse, so codegen delegates to the
  * shared static kernel (one static call per row — the loop itself would
  * gain nothing from inlining into generated Java); the index build's hot
  * path uses the same kernel via typed flatMap.
  */
case class Tokenize(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string argument")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokenize"

  override def nullSafeEval(input: Any): Any =
    Tokenize.tokenizeToArrayData(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.Tokenize.tokenizeToArrayData($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Tokenize {
  /** Static kernel shared by eval and generated code. */
  def tokenizeToArrayData(s: UTF8String): ArrayData = {
    val toks = graft.functions.Analyzer.tokenize(s.toString)
    new GenericArrayData(toks.map(t => UTF8String.fromString(t).asInstanceOf[Any]))
  }
}
