package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/**
 * Native codegen'd MinHash: token array → `numPerm`-long signature in ONE
 * pass of tight generated Java (token xxhash64 → n-gram chain hash →
 * per-permutation multiply-add min).
 *
 * Why a custom Catalyst `Expression`: the same computation written with
 * `transform`/`array_min` higher-order functions is evaluated INTERPRETED
 * (HOF lambdas don't participate in whole-stage codegen), costing
 * numPerm × shingles lambda invocations per document — measured ~20s for
 * 5000 docs at 64 perms. This expression generates a plain Java loop;
 * multiply-add permutations are raw long arithmetic (wrap-around is fine
 * for a permutation family and invisible to ANSI mode).
 */
case class MinHashSignatureExpr(child: Expression, numPerm: Int, ngram: Int)
    extends UnaryExpression {

  require(numPerm > 0 && ngram > 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureExpr =
    copy(child = newChild)

  @transient private lazy val (aConsts, bConsts) = MinHashSignatureExpr.consts(numPerm)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
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
    val sh = new Array[Long](nsh)
    if (m < ngram) {
      var h = 42L; var j = 0
      while (j < m) { h = XXH64.hashLong(th(j), h); j += 1 }
      sh(0) = h
    } else {
      var j = 0
      while (j < nsh) {
        var h = 42L; var k = 0
        while (k < ngram) { h = XXH64.hashLong(th(j + k), h); k += 1 }
        sh(j) = h; j += 1
      }
    }
    val sig = new Array[Long](numPerm)
    var p = 0
    while (p < numPerm) {
      val a = aConsts(p); val b = bConsts(p)
      var mn = Long.MaxValue; var j = 0
      while (j < nsh) { val v = a * sh(j) + b; if (v < mn) mn = v; j += 1 }
      sig(p) = mn; p += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      val aRef = ctx.addReferenceObj("minhashA", aConsts, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", bConsts, "long[]")
      val m = ctx.freshName("m")
      val th = ctx.freshName("th")
      val nsh = ctx.freshName("nsh")
      val sh = ctx.freshName("sh")
      val sig = ctx.freshName("sig")
      s"""
         |final int $m = $c.numElements();
         |final long[] $th = new long[$m];
         |for (int i = 0; i < $m; i++) {
         |  $th[i] = $c.isNullAt(i) ? 42L
         |    : $xxh.hashUTF8String($c.getUTF8String(i), 42L);
         |}
         |final int $nsh = ($m < $ngram) ? 1 : $m - $ngram + 1;
         |final long[] $sh = new long[$nsh];
         |if ($m < $ngram) {
         |  long h = 42L;
         |  for (int j = 0; j < $m; j++) h = $xxh.hashLong($th[j], h);
         |  $sh[0] = h;
         |} else {
         |  for (int j = 0; j < $nsh; j++) {
         |    long h = 42L;
         |    for (int k = 0; k < $ngram; k++) h = $xxh.hashLong($th[j + k], h);
         |    $sh[j] = h;
         |  }
         |}
         |final long[] $sig = new long[$numPerm];
         |for (int p = 0; p < $numPerm; p++) {
         |  final long a = $aRef[p]; final long b = $bRef[p];
         |  long mn = Long.MAX_VALUE;
         |  for (int j = 0; j < $nsh; j++) {
         |    final long v = a * $sh[j] + b;
         |    if (v < mn) mn = v;
         |  }
         |  $sig[p] = mn;
         |}
         |${ev.value} = new $gad($sig);
       """.stripMargin
    })
}

/**
 * Codegen'd n-gram shingle hashes: token array → one xxhash64 chain hash per
 * n-gram window (the same shingle identity [[MinHashSignatureExpr]] uses
 * internally), for set algebra over 64-bit shingle hashes instead of
 * shingle strings. A higher-order-function formulation re-evaluates the
 * token-hash subtree per element (quadratic per document) and runs
 * interpreted; this is one generated Java pass.
 */
case class ShingleHashesExpr(child: Expression, ngram: Int) extends UnaryExpression {

  require(ngram > 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
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
    val sh = new Array[Long](nsh)
    if (m < ngram) {
      var h = 42L; var j = 0
      while (j < m) { h = XXH64.hashLong(th(j), h); j += 1 }
      sh(0) = h
    } else {
      var j = 0
      while (j < nsh) {
        var h = 42L; var k = 0
        while (k < ngram) { h = XXH64.hashLong(th(j + k), h); k += 1 }
        sh(j) = h; j += 1
      }
    }
    new GenericArrayData(sh)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      val m = ctx.freshName("m")
      val th = ctx.freshName("th")
      val nsh = ctx.freshName("nsh")
      val sh = ctx.freshName("sh")
      s"""
         |final int $m = $c.numElements();
         |final long[] $th = new long[$m];
         |for (int i = 0; i < $m; i++) {
         |  $th[i] = $c.isNullAt(i) ? 42L
         |    : $xxh.hashUTF8String($c.getUTF8String(i), 42L);
         |}
         |final int $nsh = ($m < $ngram) ? 1 : $m - $ngram + 1;
         |final long[] $sh = new long[$nsh];
         |if ($m < $ngram) {
         |  long h = 42L;
         |  for (int j = 0; j < $m; j++) h = $xxh.hashLong($th[j], h);
         |  $sh[0] = h;
         |} else {
         |  for (int j = 0; j < $nsh; j++) {
         |    long h = 42L;
         |    for (int k = 0; k < $ngram; k++) h = $xxh.hashLong($th[j + k], h);
         |    $sh[j] = h;
         |  }
         |}
         |${ev.value} = new $gad($sh);
       """.stripMargin
    })
}

object ShingleHashesExpr {
  /** Column wrapper: `shingleHashes(tokensCol)`. */
  def shingleHashes(tokens: Column, ngram: Int = 3): Column =
    ColumnBridge.column(ShingleHashesExpr(ColumnBridge.expression(tokens), ngram))
}

/**
 * Codegen'd n-gram shingle STRINGS: token array → one space-joined string
 * per n-gram window, in a single generated pass. The higher-order-function
 * formulation (`transform(sequence(...), i => array_join(slice(tokens, ...)))`)
 * re-evaluates the whole `tokens` subtree — regexp normalize + split — for
 * EVERY element, making shingling O(m²) in document length; measured 15s
 * for one corpus pass at sf0.1 where this expression does it in well under
 * a second. Fewer than `ngram` tokens yield ONE whole-stream window (the
 * same fallback [[ShingleHashesExpr]] hashes); callers that want a
 * different short-document identity branch before calling.
 */
case class WordShinglesExpr(child: Expression, ngram: Int) extends UnaryExpression {

  require(ngram > 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
    copy(child = newChild)

  private val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.unsafe.types.UTF8String
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val tk = new Array[UTF8String](m)
    var i = 0
    while (i < m) { tk(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i); i += 1 }
    val nsh = if (m < ngram) 1 else m - ngram + 1
    val sh = new Array[AnyRef](nsh)
    if (m < ngram) sh(0) = UTF8String.concatWs(space, tk: _*)
    else {
      var j = 0
      while (j < nsh) {
        sh(j) = UTF8String.concatWs(space,
          java.util.Arrays.copyOfRange(tk, j, j + ngram): _*)
        j += 1
      }
    }
    new GenericArrayData(sh)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val utf8 = "org.apache.spark.unsafe.types.UTF8String"
      val gad = classOf[GenericArrayData].getName
      val sep = ctx.addReferenceObj("shingleSep", space, utf8)
      val m = ctx.freshName("m")
      val tk = ctx.freshName("tk")
      val win = ctx.freshName("win")
      val nsh = ctx.freshName("nsh")
      val sh = ctx.freshName("sh")
      // One reused window buffer + arraycopy per window — deliberately NOT
      // Arrays.copyOfRange: Janino resolves the generic copyOfRange as
      // Object[] (no generics), the concatWs overload then fails to bind,
      // and the whole stage silently falls back to interpreted evaluation.
      s"""
         |final int $m = $c.numElements();
         |final $utf8[] $tk = new $utf8[$m];
         |for (int i = 0; i < $m; i++) {
         |  $tk[i] = $c.isNullAt(i) ? null : $c.getUTF8String(i);
         |}
         |final int $nsh = ($m < $ngram) ? 1 : $m - $ngram + 1;
         |final Object[] $sh = new Object[$nsh];
         |if ($m < $ngram) {
         |  $sh[0] = $utf8.concatWs($sep, $tk);
         |} else {
         |  final $utf8[] $win = new $utf8[$ngram];
         |  for (int j = 0; j < $nsh; j++) {
         |    System.arraycopy($tk, j, $win, 0, $ngram);
         |    $sh[j] = $utf8.concatWs($sep, $win);
         |  }
         |}
         |${ev.value} = new $gad($sh);
       """.stripMargin
    })
}

object WordShinglesExpr {
  /** Column wrapper: `shingles(tokensCol, n)`. */
  def shingles(tokens: Column, ngram: Int): Column =
    ColumnBridge.column(WordShinglesExpr(ColumnBridge.expression(tokens), ngram))
}

object MinHashSignatureExpr {

  /** Deterministic permutation constants (odd multipliers), fixed seed. */
  private[graft] def consts(numPerm: Int): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(0x5EED5EEDL)
    val a = Array.fill(numPerm)(rnd.nextLong() | 1L)
    val b = Array.fill(numPerm)(rnd.nextLong())
    (a, b)
  }

  /** Column wrapper: `minhashSignature(tokensCol)`. */
  def signature(tokens: Column, numPerm: Int = 64, ngram: Int = 3): Column =
    ColumnBridge.column(
      MinHashSignatureExpr(ColumnBridge.expression(tokens), numPerm, ngram))
}
