package graft

import graft.functions.{DotProductExpr, MinHashSignatureExpr, PolyHashExpr,
  ShingleHashExpr, SignatureAgreeExpr, SortedIntersectCountExpr,
  StringEntropyExpr, TokenLengthSumExpr}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the library's native
  * expressions as SQL functions, so `spark.sql("SELECT string_entropy(s),
  * poly_hash(s), dot_product(a, b), shingle_hashes(t, 5) ...")` works
  * anywhere the extension is installed — the full dedup/similarity
  * primitive set is usable from pure SQL.
  *
  * Install via `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Fold a constant argument (e.g. the shingle width) to an Int at
    * resolution time — these expressions bake the constant into codegen,
    * so a non-literal here is a usage error, reported as one. */
  private def constInt(args: Seq[Expression], idx: Int, fname: String): Int = {
    if (args.length <= idx) throw new IllegalArgumentException(
      s"$fname: missing constant integer argument at position ${idx + 1}")
    val e = args(idx)
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fname: the count argument must be a constant integer")
    e.eval() match {
      case n: Number => n.intValue
      case other => throw new IllegalArgumentException(
        s"$fname: the count argument must be a constant integer, got " +
          (if (other == null) "NULL" else other.getClass.getSimpleName))
    }
  }

  private def register(ext: SparkSessionExtensions, name: String,
                       clazz: Class[_])(build: Seq[Expression] => Expression): Unit =
    ext.injectFunction((FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name), build))

  override def apply(ext: SparkSessionExtensions): Unit = {
    register(ext, "string_entropy", classOf[StringEntropyExpr]) {
      c => StringEntropyExpr(c.head) }
    register(ext, "poly_hash", classOf[PolyHashExpr]) {
      c => PolyHashExpr(c.head, 31L) }
    register(ext, "dot_product", classOf[DotProductExpr]) {
      c => DotProductExpr(c(0), c(1)) }
    register(ext, "signature_agree", classOf[SignatureAgreeExpr]) {
      c => SignatureAgreeExpr(c(0), c(1)) }
    register(ext, "token_length_sum", classOf[TokenLengthSumExpr]) {
      c => TokenLengthSumExpr(c.head) }
    // shingle_hashes(text, n): distinct word-n-gram hashes;
    // shingle_hashes_all(text, n): one hash per position, in order
    register(ext, "shingle_hashes", classOf[ShingleHashExpr]) {
      c => ShingleHashExpr(c(0), constInt(c, 1, "shingle_hashes"), 31L) }
    register(ext, "shingle_hashes_all", classOf[ShingleHashExpr]) {
      c => ShingleHashExpr(c(0), constInt(c, 1, "shingle_hashes_all"), 31L,
        distinct = false) }
    // min_hash_signature(shingle_hashes, k): k affine minima in one pass
    register(ext, "min_hash_signature", classOf[MinHashSignatureExpr]) {
      c => MinHashSignatureExpr(c(0), constInt(c, 1, "min_hash_signature")) }
    // sorted_intersect_count(a, b): |a ∩ b| of two sorted distinct-element
    // string arrays — the allocation-free merge walk behind the d12 verify
    register(ext, "sorted_intersect_count", classOf[SortedIntersectCountExpr]) {
      c => SortedIntersectCountExpr(c(0), c(1)) }
  }
}
