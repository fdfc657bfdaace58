package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen'd 32-bit SimHash over an ARRAY<BIGINT> of token hashes
  * (Charikar, "Similarity Estimation Techniques from Rounding Algorithms",
  * STOC'02 — the crawler-standard near-dup sketch).
  *
  * Bit j of the result is set when at least half the token hashes have bit j
  * set; ties round up (`2*count >= n`), matching the HOF reference
  * formulation `2 * aggregate(hs, 0L, (acc,h) -> acc + ((h >> j) & 1)) >= n`
  * and the DuckDB oracle, so results are bit-for-bit identical.
  *
  * Why native: the HOF form runs 32 independent `aggregate()` passes per row
  * — 32 interpreted lambda chains over the token array (the q30 bench
  * outlier, 28.6 s at sf0.1). This expression is one fused loop inside
  * whole-stage codegen: O(tokens) array reads with the 32-bit inner loop in
  * registers. Null array → null; elements are md5-derived and non-null.
  */
case class SimHash(child: Expression) extends UnaryExpression {

  // input is ARRAY<BIGINT> by construction at the call site (Dedup.simhash);
  // ExpectsInputTypes is private[sql] in Spark 4
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  private val Bits = 32

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val cnt = new Array[Int](Bits)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < Bits) { cnt(j) += ((h >> j) & 1L).toInt; j += 1 }
      i += 1
    }
    var res = 0L
    var j = 0
    while (j < Bits) { if (2L * cnt(j) >= n) res |= 1L << j; j += 1 }
    res
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val h = ctx.freshName("h"); val cnt = ctx.freshName("cnt"); val res = ctx.freshName("res")
      s"""
         |int $n = $a.numElements();
         |int[] $cnt = new int[$Bits];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $j = 0; $j < $Bits; $j++) $cnt[$j] += (int) (($h >> $j) & 1L);
         |}
         |long $res = 0L;
         |for (int $j = 0; $j < $Bits; $j++) if (2L * $cnt[$j] >= $n) $res |= 1L << $j;
         |${ev.value} = $res;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash {
  /** Register `graft_simhash(hashes)` in the session's function registry so
    * it is usable from `expr(...)` and `spark.sql(...)`. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash", exprs => SimHash(exprs.head), "scala_udf")
}
