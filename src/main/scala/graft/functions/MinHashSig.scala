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
