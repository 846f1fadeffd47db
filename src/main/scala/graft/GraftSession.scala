package graft

import org.apache.spark.sql.SparkSession

/** A30: session construction with the engine's tuned defaults.
  *
  * Reference sets app name, shuffle.partitions=4, WARN logs
  * (kafka_to_metrics.py:146-152). We size shuffle partitions to the
  * local core count (SPARK_GRAFT_CPUS) instead of a constant — on a real
  * cluster this is overridden by AQE coalescing anyway. */
object GraftSession {
  def build(appName: String,
            cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
