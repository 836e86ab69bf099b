package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature: all `k` affine mins
  * (h_j(x) = (x·(2j+1) + j² + 7919) mod 1e9+7) in ONE pass over the
  * shingle-hash array. The composed form —
  * `array(array_min(transform(sh, affine_0)), ..., array_min(transform(sh,
  * affine_{k-1})))` — evaluates k interpreted transforms and allocates k
  * intermediate arrays per document; this expression keeps the k running
  * minima in registers. Arithmetic and null semantics match the composed
  * form exactly: a null/empty/all-null input yields an array of k nulls
  * (array_min of nothing is null per position), so results are
  * bit-identical.
  */
object MinHashSig {

  def min_hash_signature(shingleHashes: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      MinHashSignatureExpr(ColumnBridge.expression(shingleHashes), numHashes))
  }

  /** One-pass k-way minima; null input treated as empty (k nulls out). */
  def compute(a: ArrayData, k: Int): ArrayData = {
    val out = new Array[Any](k)
    if (a == null) return new GenericArrayData(out)
    val n = a.numElements()
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var sawValue = false
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        sawValue = true
        val x = a.getLong(i)
        var j = 0
        while (j < k) {
          val h = (x * (2L * j + 1) + j.toLong * j + 7919L) % PolyHash.Prime
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    if (sawValue) {
      var j = 0
      while (j < k) { out(j) = mins(j); j += 1 }
    }
    new GenericArrayData(out)
  }
}

case class MinHashSignatureExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false // empty/null input → array of nulls

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"min_hash_signature requires array<long>, got $t")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    MinHashSig.compute(
      if (v == null) null else v.asInstanceOf[ArrayData], numHashes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.MinHashSig.compute(
            ${childGen.isNull} ? null : ${childGen.value}, $numHashes);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of positions where two minhash signatures agree — the natively
  * codegen'd twin of `size(filter(zip_with(a, b, _ === _), identity))`,
  * which is interpreted and allocates two intermediate arrays per
  * candidate pair (the LSH verify path evaluates it once per candidate —
  * the hottest loop in d3 at scale). Result is identical on the dedup
  * path: positions where both elements are non-null and equal, counted
  * over the zipped length (zip_with pads a shorter array with nulls,
  * which `===` turns into dropped nulls, so padding never counts).
  * NULL-array divergence, documented like marker_count's: this returns
  * NULL for a null array while the HOF form returned size(NULL); no graft
  * path feeds null signatures.
  */
object SignatureOps {

  def signature_agree(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      SignatureAgreeExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Matching-position count; null if either array is null. */
  def agree(a: ArrayData, b: ArrayData): java.lang.Integer = {
    if (a == null || b == null) return null
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    java.lang.Integer.valueOf(c)
  }
}

case class SignatureAgreeExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"signature_agree requires two array<long> inputs, got " +
          s"${left.dataType} and ${right.dataType}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SignatureOps.agree(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""java.lang.Integer ${ev.value}_r = graft.functions.SignatureOps.agree($a, $b);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.intValue();
         |}""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
