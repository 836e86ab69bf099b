package graft

import org.apache.spark.sql.SparkSession

/** Scoped lifecycle for `localCheckpoint` blocks.
  *
  * Operators that checkpoint intermediates (dedup band indexes, k-means
  * rounds, PQ codebooks) leave their RDDs registered with the
  * SparkContext until driver GC happens to collect them; in a long-lived
  * session (a 50-query bench, a multi-operator curation run) the orphaned
  * blocks accrete, and whichever query runs later inherits the storage
  * and GC pressure — suite POSITION starts to matter, which is exactly
  * the round-4 bench-contamination mechanism. `withScope` snapshots the
  * persistent-RDD set, runs the body, and unpersists everything the body
  * left behind, returning storage to its pre-scope baseline.
  *
  * The body must CONSUME its results (collect / write / noop-sink) before
  * returning: a lazy DataFrame that still references a scoped checkpoint
  * cannot be recomputed after the scope unpersists it.
  */
object CheckpointScope {

  def withScope[T](spark: SparkSession)(body: => T): T = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    try body
    finally sc.getPersistentRDDs
      .filter { case (id, _) => !before.contains(id) }
      .values.foreach(_.unpersist(blocking = false))
  }

  /** Unpersist EVERY currently-registered RDD — the between-queries sweep
    * for suites whose queries are independent by construction. */
  def sweep(spark: SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
}
