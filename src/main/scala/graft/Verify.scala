package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated substring filters for fast
    // multi-gate iteration — a query runs when ANY listed substring
    // matches its name (the driver's 2-arg contract runs everything;
    // oracle_sql.json is always written in full so oracle_check can
    // still run filtered)
    val (sfDir, outDir, only) = args match {
      case Array(s, o) => (s, o, None)
      case Array(s, o, f) =>
        (s, o, Some(f.split(",").map(_.trim).filter(_.nonEmpty).toSeq))
    }
    // SPARK_GRAFT_VERIFY_SKIP: comma list for large-replica correctness
    // runs — skips the deliberately-quadratic small-corpus fixtures (v4
    // all-pairs, d9's 16-bit fingerprint space saturating). A skipped
    // query writes no result dir, never a silently-empty one.
    val skip = sys.env.get("SPARK_GRAFT_VERIFY_SKIP")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    val spark = GraftSession.fromEnv()
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) =>
        only.forall(_.exists(name.contains)) && !skip(name) }
      .foreach { case (name, fn) =>
      // repartition(1), NOT coalesce(1): both give the single output file
      // the oracle compare wants, but coalesce collapses the query's final
      // stage into one task — at large replica factors that funnels whole
      // join+agg pipelines through a single thread; the repartition
      // exchange keeps upstream compute parallel and serializes only the
      // write.
      try fn(spark, sfDir).repartition(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // Operators cache intermediates (inverted indexes, LDA corpora);
      // drop them between queries so 50+ runs don't accrete dead blocks.
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
