package graft.pipelines

import graft.functions.TextFunctions
import graft.operators.{Dedup, Sampling}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the canonical LLM-corpus pipeline
  * built from this engine's operators, each stage deterministic so the
  * whole chain is exactly reproducible (and oracle-checkable):
  *
  *   quality filter → language filter → exact dedup (keep min id) →
  *   near-dup removal (n-gram Jaccard, keep lower id of each pair) →
  *   train/val/test split assignment (hash-mod buckets)
  *
  * Scale shape: the filters are scan-stage column work; dedup stages are
  * the inverted-index operators (narrow shuffles, no cross products); the
  * split adds no shuffle at all.
  */
object CurationPipeline {

  final case class Config(minQuality: Double = 0.5,
                          langs: Set[String] = Set("en"),
                          jaccardThreshold: Double = 0.8,
                          shingleN: Int = 5,
                          maxShingleFreq: Long = 1000,
                          // false = greedy-by-id (drop the higher id of every
                          // pair; the oracle-locked default). true = keep one
                          // representative (min id) per CONNECTED COMPONENT of
                          // the pair graph — principled for chains a-b-c where
                          // greedy can drop b and c against different keepers.
                          clusterDedup: Boolean = false,
                          splits: Seq[(String, Int)] =
                            Seq("train" -> 80, "val" -> 10, "test" -> 10))

  /** Adds quality + lang_pred columns (tokens staged once). */
  def annotate(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.cast("long").as("doc_id"), text.as("text"),
        TextFunctions.tokens(text).as("toks"))
      .select(col("doc_id"), col("text"),
        graft.functions.Rounding.r6(TextFunctions.qualityScore(col("toks")))
          .as("quality"),
        TextFunctions.langPredict(col("toks")).as("lang_pred"))

  /** Runs the full chain; returns (doc_id, quality, lang_pred, split) for
    * surviving docs. */
  def curate(docs: DataFrame, id: Column, text: Column,
             config: Config = Config()): DataFrame = {
    val annotated = annotate(docs, id, text)
    val kept = annotated
      .where(col("quality") >= config.minQuality &&
        col("lang_pred").isin(config.langs.toSeq: _*))

    // exact dedup: keep the min doc_id per identical text — ONE window
    // keyed on the 192-bit (xxhash64, md5) content pair (narrow shuffle
    // key, collision-unobservable; no groupBy + self-join round trip).
    // `exact` feeds both pair generation and the final anti join; the lazy
    // localCheckpoint materializes the filtered+deduped corpus once with
    // GC-scoped blocks (no CacheManager pin — ContextCleaner frees them
    // when the result frame is dropped).
    val wDup = org.apache.spark.sql.expressions.Window
      .partitionBy(xxhash64(col("text")), md5(col("text")))
      .orderBy("doc_id")
    val exact = kept.withColumn("__rn", row_number().over(wDup))
      .where(col("__rn") === 1).drop("__rn")
      .localCheckpoint(false)

    // near-dup removal: for every Jaccard pair above threshold, the higher
    // id drops (transitively safe: a surviving doc is one that is not the
    // higher id of ANY pair — the standard greedy-by-id rule). The df-cut
    // stays ACTIVE (finite maxShingleFreq): one boilerplate shingle shared
    // by a million docs must not generate 10^12 candidate pairs; the
    // DuckDB oracle applies the identical cut.
    val dupPairs = Dedup.ngramJaccardPairs(exact, col("doc_id"), col("text"),
      n = config.shingleN, threshold = config.jaccardThreshold,
      maxShingleFreq = config.maxShingleFreq)
    val losers =
      if (config.clusterDedup)
        Dedup.connectedComponents(dupPairs)
          .where(col("doc_id") =!= col("cluster")) // keep each component's min
          .select("doc_id")
      else dupPairs.select(col("id_b").as("doc_id")).distinct()
    val deduped = exact.join(losers, Seq("doc_id"), "left_anti")

    Sampling.splits(deduped, col("doc_id"), config.splits)
      .select(col("doc_id"), col("quality"), col("lang_pred"), col("split"))
  }
}
