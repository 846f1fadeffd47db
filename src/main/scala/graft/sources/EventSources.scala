package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** A1: source scan abstraction. All variants produce the same frame shape —
  * (key STRING, value STRING, kafka_ts TIMESTAMP) — so every downstream
  * operator (parse → repair → watermark → agg) is source-agnostic and the
  * correctness suite can feed pipelines from files/MemoryStream without a
  * broker (SURVEY.md §7.1 "graft.ingest").
  *
  * Reference: read_kafka(), kafka_to_metrics.py:156-169 — options
  * bootstrap.servers / subscribe / startingOffsets=earliest /
  * failOnDataLoss=false, projecting CAST(key AS STRING),
  * CAST(value AS STRING), timestamp.
  */
object EventSources {

  /** Kafka streaming source (needs spark-sql-kafka on the classpath at
    * deploy time; semantics identical to the reference's read_kafka). */
  def kafka(spark: SparkSession, topic: String,
            bootstrap: String = sys.env.getOrElse("KAFKA_BOOTSTRAP", "localhost:9092"),
            startingOffsets: String = sys.env.getOrElse("STARTING_OFFSETS", "earliest"),
            failOnDataLoss: Boolean = false): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .option("failOnDataLoss", failOnDataLoss.toString)
      .load()
      .selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value",
        "timestamp AS kafka_ts")

  /** File-backed streaming source of JSON-lines events (same frame shape).
    * `keyExpr` builds the Kafka-style key from the parsed value. */
  def jsonFiles(spark: SparkSession, path: String, schema: StructType,
                keyExpr: String, tsExpr: String = "current_timestamp()"): DataFrame =
    spark.readStream.schema(schema).json(path)
      .select(expr(keyExpr).cast("string").as("key"),
        to_json(struct(col("*"))).as("value"),
        expr(tsExpr).cast("timestamp").as("kafka_ts"))

  /** Batch variant for tests/backfills: wrap any DataFrame of typed events
    * into the Kafka frame shape (value = JSON of all columns). */
  def fromBatch(df: DataFrame, keyExpr: String,
                tsExpr: String): DataFrame =
    df.select(expr(keyExpr).cast("string").as("key"),
      to_json(struct(df.columns.map(col): _*)).as("value"),
      expr(tsExpr).cast("timestamp").as("kafka_ts"))
}
