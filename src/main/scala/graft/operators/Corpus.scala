package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Bag-of-words corpus construction: per-(doc, word) counts.
  *
  * Reference: the `(ip, word) -> count` reduceByKey builders
  * (netflow/FlowPreLDA.scala:131-139, dns/DNSPreLDA.scala:114-120,
  * proxy/ProxySuspiciousConnectsModel.scala:189-190) and the ×N feedback
  * row duplication (FlowPreLDA.scala:98). Expressed as a weighted hash
  * aggregation: Spark performs map-side partial aggregation automatically,
  * and feedback weighting is a count multiplier instead of physical row
  * explosion — same corpus, none of the shuffle volume.
  */
object Corpus {

  /** (doc, word, count) with an optional per-row weight. */
  def wordCounts(df: DataFrame, doc: Column, word: Column,
                 weight: Column = lit(1L)): DataFrame =
    df.groupBy(doc.cast("string").as("doc"), word.cast("string").as("word"))
      .agg(sum(weight.cast("long")).as("count"))

  /** Union of two perspectives of the same events (e.g. a flow contributes
    * a document for both endpoint IPs — reference FlowPreLDA.scala:139).
    * Union BEFORE the aggregation so a single shuffle builds both. */
  def dualPerspective(df: DataFrame,
                      docA: Column, wordA: Column,
                      docB: Column, wordB: Column,
                      weight: Column = lit(1L)): DataFrame = {
    val a = df.select(docA.cast("string").as("doc"), wordA.cast("string").as("word"),
      weight.cast("long").as("w"))
    val b = df.select(docB.cast("string").as("doc"), wordB.cast("string").as("word"),
      weight.cast("long").as("w"))
    a.union(b).groupBy("doc", "word").agg(sum("w").as("count"))
  }
}
