package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation operators.
  *
  * AQE's skew-join handling splits oversized shuffle partitions at
  * runtime; salting is the plan-level complement for joins where one key
  * dominates so badly that even split partitions hot-spot, or when AQE is
  * unavailable (streaming, static plans).
  */
object Skew {

  /** Salted inner equi-join: the large side's hot keys are spread across
    * `salt` sub-keys (deterministic hash of the whole row), the small side
    * is replicated `salt` times. Result is row-identical to a plain inner
    * join on `key`; the shuffle for any single join key fans out over
    * `salt` reducers instead of one. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salt: Int): DataFrame = {
    val l = large.withColumn("__salt",
      pmod(hash(struct(large.columns.map(col).toIndexedSeq: _*)), lit(salt)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(s, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
