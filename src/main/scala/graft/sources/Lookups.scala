package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small lookup-file sources (reference: TopDomains.scala:9-13 — the
  * Alexa `rank,domain` CSV read on the driver into a broadcast Set). The
  * read is a distributed CSV scan; the collected set stays bounded (top-N
  * lists) and is handed to broadcast-closure UDFs or `isin` filters. */
object Lookups {

  /** Load a `rank,domain` CSV into the top-domain set (first label of the
    * domain, matching the reference's `split('.')(0)` normalization). */
  def topDomains(spark: SparkSession, path: String): Set[String] =
    spark.read.csv(path)
      .select(split(col("_c1"), "\\.").getItem(0).as("d"))
      .where(col("d").isNotNull && col("d") =!= "")
      .distinct()
      .collect().map(_.getString(0)).toSet
}
