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

  /** TF-IDF over a document table: (doc_id, token, tf, df, tfidf) with
    * tfidf = tf · ln(N / df) rounded engine-stably to 6 dp. Two hash
    * aggregations (term counts, then document frequencies — both map-side
    * combined) and one equi join; N is a single count. Raw-count tf keeps
    * every number integral until the one final log/multiply, so the
    * DuckDB twin matches bit-for-bit under the shared rounding rule. */
  def tfidf(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val n = docs.count()
    val toks = docs.select(id.cast("long").as("doc_id"),
      explode(graft.functions.TextFunctions.tokens(text)).as("token"))
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    tf.join(df, "token")
      .withColumn("tfidf",
        floor((col("tf") * log(lit(n.toDouble) / col("df"))) * 1000000 + 0.5) / 1000000.0)
      .select(col("doc_id"), col("token"), col("tf"), col("df"), col("tfidf"))
  }

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
