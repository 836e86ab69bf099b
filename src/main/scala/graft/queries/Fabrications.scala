package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared network-shaped fabrications of the harness tables, used by both
  * the word-semantics gate queries (f5/f8) and the full-pipeline gate
  * queries — ONE definition per fabrication so they cannot drift apart.
  * The DuckDB oracles hard-code the same formulas; change them together.
  */
object Fabrications {

  /** Deterministic netflow-ish ips/ports from events (covers every
    * adjustPort port class: 0, <=1024, >1024, both orders). */
  def flowPorts(events: DataFrame): DataFrame =
    events
      .withColumn("sip", concat(lit("10.0."), (col("user_id") % 200).cast("string"), lit(".1")))
      .withColumn("dip", concat(lit("10.0."), (col("event_id") % 200).cast("string"), lit(".2")))
      .withColumn("sport", ((col("event_id") * 7919) % 2000).cast("int"))
      .withColumn("dport", (((col("event_id") + 3) * 104729) % 2000).cast("int"))

  /** Four DNS qname shapes from documents: deep subdomain, ccTLD,
    * reverse-IP, and bare 2-part. */
  def dnsQname(docId: Column, source: Column): Column =
    when(docId % 4 === 0, concat(lit("api.cdn."), source, lit(".com")))
      .when(docId % 4 === 1, concat(source, lit(".com.mx")))
      .when(docId % 4 === 2, lit("9.8.7.6.in-addr.arpa"))
      .otherwise(concat(source, lit(".net")))
}
