package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen'd sign-random-projection LSH bucket id over an
  * ARRAY<DOUBLE> vector: bit j of the result = (v · plane_j >= 0), planes a
  * compile-time ±1 matrix (Charikar STOC'02, same scheme as
  * Similarity.hyperplanes).
  *
  * Why native: the composed form expands each plane dot to a `dim`-term
  * textual sum — at dim 64 × 8 planes that is ~512 expression nodes (fine),
  * but at realistic embedding dims (768+) the generated method exceeds the
  * JVM/janino method-size limits and whole-stage codegen silently falls back
  * to interpreted evaluation (VERDICT r1 #5). Here the matrix is a constant
  * object reference and the dots run in one fused loop whose bytecode size
  * is independent of dimension.
  *
  * Bit-compatibility: accumulation is left-to-right over elements with
  * `acc + s*v[d]`, and `(-1.0)*x` is exactly `-x` in IEEE arithmetic, so the
  * result is bit-identical to the textual `(v[1]) + (-v[2]) + ...` chain —
  * the DuckDB oracle keeps using the textual form (planeDotSql).
  * Null vector → null; elements assumed non-null.
  */
case class LshBucket(child: Expression, planes: Seq[Seq[Int]])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lsh_bucket"

  // don't dump the full ±1 matrix into plan strings
  override def toString: String =
    s"graft_lsh_bucket($child, ${planes.length}x${planes.headOption.map(_.length).getOrElse(0)})"

  @transient private lazy val mat: Array[Array[Double]] =
    planes.map(_.map(_.toDouble).toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var res = 0L
    var j = 0
    while (j < mat.length) {
      val row = mat(j)
      val n = math.min(v.numElements(), row.length)
      var dot = 0.0
      var d = 0
      while (d < n) { dot += row(d) * v.getDouble(d); d += 1 }
      if (dot >= 0.0) res |= 1L << j
      j += 1
    }
    res
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("planesMat", mat, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val res = ctx.freshName("res"); val j = ctx.freshName("j")
      val row = ctx.freshName("row"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val d = ctx.freshName("d")
      s"""
         |long $res = 0L;
         |for (int $j = 0; $j < $matRef.length; $j++) {
         |  double[] $row = $matRef[$j];
         |  int $n = java.lang.Math.min($a.numElements(), $row.length);
         |  double $dot = 0.0;
         |  for (int $d = 0; $d < $n; $d++) $dot += $row[$d] * $a.getDouble($d);
         |  if ($dot >= 0.0) $res |= 1L << $j;
         |}
         |${ev.value} = $res;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBucket {
  /** Register `graft_lsh_bucket_<planes>x<dim>_<h>(v)` for a fixed plane
    * matrix. The name carries a content hash as well as the shape: two
    * DIFFERENT matrices of the same shape (e.g. the q172 multi-table fine
    * slices, all 8×64) must not silently replace each other in the
    * registry. Returns the registered name. Idempotent per matrix. */
  def register(spark: SparkSession, planes: Seq[Seq[Int]]): String = {
    val h = (planes.hashCode.toLong & 0xffffffffL).toHexString
    val name = s"graft_lsh_bucket_${planes.length}x${planes.headOption.map(_.length).getOrElse(0)}_$h"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => LshBucket(exprs.head, planes), "scala_udf")
    name
  }
}
