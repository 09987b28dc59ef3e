package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for cosine similarity over two
  * `array<double>` columns, with `doGenCode` so the similarity math stays
  * inside WholeStageCodegen.
  *
  * The higher-order-function formulation (`aggregate(zip_with(a,b,*),…)`)
  * is semantically identical but evaluates its lambdas interpreted, one
  * virtual call per element — at 100 TB of 64-dim vectors that is billions
  * of megamorphic calls in the hot loop. This compiles to a tight primitive
  * `for` loop over the unsafe array data instead.
  *
  * The summation order (left-to-right over the array) is exactly the order
  * the HOF fold and DuckDB's `list_cosine_similarity` use, so results stay
  * bit-identical to the oracle (SURVEY D5).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // callers guarantee array<double> inputs (see VectorExpressions.cosine)
  override def dataType: DataType = DoubleType

  // NULL beyond the children's nulls: mismatched dims / zero norm
  override def nullable: Boolean = true

  override def prettyName: String = "graft_cosine"

  /** Cosine is UNDEFINED — NULL, not a truncated or NaN number — when the
    * vectors differ in length (a ragged embedding row is malformed data; a
    * silent min-length dot product would rank it with a wrong similarity)
    * or when either norm is zero (0/0) — or NaN, which a NaN input element
    * produces. The guard is `!(norm > 0)` rather than `norm == 0` so a NaN
    * norm takes the NULL branch too, matching [[graft.llm.Similarity.cosineHof]]
    * whose `na > 0d` predicate already evaluates false for NaN: both
    * formulations share one contract on every input, not just the fixtures.
    * Pinned cross-engine by the round-9 degenerate parity sweep: the oracle
    * twin is Exact.cosineSqlGuarded (DuckDB's raw list_cosine_similarity
    * instead THROWS on ragged pairs and clamps the zero-vector NaN to -1.0).
    * NULL similarities rank last under `DESC` in both engines, so top-k
    * stays aligned.
    */
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (!(nx > 0.0) || !(ny > 0.0)) null
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = $x.getDouble($i);
         |    double $yi = $y.getDouble($i);
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  if (!($nx > 0.0) || !($ny > 0.0)) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column-API entry point for [[CosineSimilarity]]; inputs must be
    * `array<double>` (cast upstream — all call sites read `embedding`
    * through `.cast("array<double>")`).
    */
  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))
}
