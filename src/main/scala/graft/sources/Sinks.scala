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

  /** Overwrite `path` with a frame that may itself be LAZILY READING from
    * `path` (the load-then-save-to-same-path shape in the pipeline model
    * stores). A direct `mode("overwrite")` there either fails with
    * "Cannot overwrite a path that is also being read from" or corrupts
    * the source mid-scan. Write fully to a sibling temp dir first (the
    * read drains while the old files are intact), then swap via the
    * filesystem: delete target, rename temp. The rename is a metadata op
    * on HDFS/local; on object stores it's a copy, still correct. */
  def overwriteParquetSafely(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val target = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + ".__tmp_swap")
    val fs = target.getFileSystem(hadoopConf)
    df.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(target)) fs.delete(target, true)
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(s"rename $tmp -> $target failed")
  }
}
