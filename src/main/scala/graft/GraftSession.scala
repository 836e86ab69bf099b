package graft

import org.apache.spark.sql.SparkSession

/** Session factory: the engine's recommended configuration in one place
  * (AQE on, shuffle partitions sized to cores — not the 200 default,
  * UTC, nanosecond-parquet compatibility, SQL functions registered). */
object GraftSession {

  def local(cores: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Cores from the driver-contract env (SPARK_GRAFT_CPUS). */
  def fromEnv(defaultCores: String = "4"): SparkSession =
    local(sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCores))
}
