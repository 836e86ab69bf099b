package graft.sources

import org.apache.spark.sql.DataFrame

/** Result sinks. Reference: row.mkString("\t") + saveAsTextFile
  * (FlowPostLDA.scala:80, DNSPostLDA.scala:69-70). Expressed as the CSV
  * writer with a tab separator; `coalesce(1)` only when a single file is
  * requested (top-k results are small by construction). */
object Sinks {

  def writeTsv(df: DataFrame, path: String, singleFile: Boolean = true,
               sep: String = "\t"): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").option("sep", sep).option("header", "false").csv(path)
  }

  def writeParquet(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }
}
