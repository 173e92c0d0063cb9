package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/**
 * Codegen'd 64-bit SimHash over the DISTINCT n-gram shingle-hash set of a
 * token array: each distinct shingle hash votes ±1 per bit position; signs
 * become the fingerprint. One generated Java pass (token hashes → chain
 * hashes → dedupe → votes) — the higher-order-function formulation ran 64
 * interpreted aggregates that each re-derived the shingle set.
 */
case class SimHashExpr(child: Expression, ngram: Int) extends UnaryExpression {

  require(ngram > 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    SimHashExpr.compute(input.asInstanceOf[ArrayData], ngram)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val obj = SimHashExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $obj.compute($c, $ngram);"
    })
}

object SimHashExpr {

  /** Shared by interpreted eval and generated code (the loop itself is the
    * hot path; a single JVM-compiled method serves both). */
  def compute(arr: ArrayData, ngram: Int): Long = {
    val m = arr.numElements()
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      th(i) =
        if (arr.isNullAt(i)) 42L
        else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      i += 1
    }
    val nsh = if (m < ngram) 1 else m - ngram + 1
    val seen = new java.util.HashSet[java.lang.Long](nsh * 2)
    val votes = new Array[Int](64)
    var j = 0
    while (j < nsh) {
      var h = 42L
      if (m < ngram) {
        var k = 0
        while (k < m) { h = XXH64.hashLong(th(k), h); k += 1 }
      } else {
        var k = 0
        while (k < ngram) { h = XXH64.hashLong(th(j + k), h); k += 1 }
      }
      if (seen.add(h)) {
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** Column wrapper: `simhash(tokensCol)`. */
  def simhash(tokens: Column, ngram: Int = 3): Column =
    ColumnBridge.column(SimHashExpr(ColumnBridge.expression(tokens), ngram))
}
