package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two double arrays — the similarity hot path.
  *
  * The `zip_with` + `aggregate` fold form is NOT codegen-compatible (Spark
  * evaluates higher-order functions interpreted, row by row); inside a pair
  * join that interpreter cost dominates and degrades unpredictably as more
  * lambda shapes pollute the JIT's call sites. This expression generates a
  * tight primitive loop with the IDENTICAL float semantics: accumulate
  * left-to-right from 0.0, so results are bit-equal to the fold and to the
  * DuckDB oracle's sequential kernels.
  *
  * Mismatched lengths yield null (the fold's zip_with null-pad semantics);
  * null ELEMENTS are not supported (embeddings are dense).
  */
/** Word n-gram shingles of a token array as a native expression — replaces
  * the `transform(sequence(...), i => concat_ws(element_at...))` form, whose
  * higher-order lambdas are interpreted per element (~1000 interpreted
  * expression-node evaluations per document; the dominant CPU in the minhash
  * sketch stage). Semantics are IDENTICAL to the HOF form, including edges:
  * fewer than n tokens -> one truncated shingle; zero tokens -> [""].
  */
case class WordShingles(child: Expression, n: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.eval(input.asInstanceOf[ArrayData], n)

  // NB: must call through MODULE$ — scalac suppresses the companion's static
  // `eval` forwarder because this class inherits `eval(InternalRow)` from
  // Expression, so the bare `WordShingles.eval(...)` form fails to compile in
  // Janino and silently de-optimizes the whole stage to interpreted mode.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles$$.MODULE$$.eval($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
  override def prettyName: String = "word_shingles"
}

object WordShingles {
  private val SEP = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  def eval(tokens: ArrayData, n: Int): ArrayData = {
    val size = tokens.numElements()
    val count = math.max(1, size - (n - 1))
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      val hi = math.min(i + n, size)
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](math.max(hi - i, 0))
      var k = i
      while (k < hi) { parts(k - i) = tokens.getUTF8String(k); k += 1 }
      out(i) = org.apache.spark.unsafe.types.UTF8String.concatWs(SEP, parts: _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** k MinHash minima over a shingle-hash array in ONE native loop — the
  * per-ROW signature form. The batch pipeline aggregates minima over exploded
  * skinny rows (map-side combine, one shuffle); that shape is unavailable in
  * a stateless streaming select, and the HOF alternative
  * (`array_min(transform(...))` × k) re-inlines the hash array per signature
  * column AND runs interpreted. This expression evaluates the array once and
  * emits all k minima; identical arithmetic to the aggregate form
  * ((a·h + b) mod P per seed, empty/null array -> null).
  */
case class MinHashSig(child: Expression, seeds: Seq[(Long, Long)], p: Long)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = true // null on empty input

  @transient private lazy val as: Array[Long] = seeds.map(_._1).toArray
  @transient private lazy val bs: Array[Long] = seeds.map(_._2).toArray

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.eval(input.asInstanceOf[ArrayData], as, bs, p)

  // The seed arrays ride along as codegen references; the helper call goes
  // through MODULE$ (the bare companion reference loses its static forwarder
  // to the inherited eval(InternalRow) — see WordShingles).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhAs", as, "long[]")
    val bRef = ctx.addReferenceObj("mhBs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($c.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.MinHashSig$$.MODULE$$.eval($c, $aRef, $bRef, ${p}L);
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  def eval(hashes: ArrayData, as: Array[Long], bs: Array[Long], p: Long): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return null
    val k = as.length
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < k) {
        val v = (as(j) * h + bs(j)) % p
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null on length mismatch

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_dot"
}
