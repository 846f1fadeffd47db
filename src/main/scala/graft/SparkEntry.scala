package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.entry._

/** Driver contract — one oracle-checked query per implemented operator from
  * SURVEY.md §2, split by operator family:
  *
  *  - [[AQueries]]  a{NN}: §2A streaming operators
  *  - [[BQueries]]  b{NN}: §2B batch dimension-ETL operators
  *  - [[DQueries]]  d/s/t/m{NN}: training-data pipeline extensions
  *    (dedup, similarity search, text analysis, multimodal plumbing)
  *
  * Parity conventions (rounding, decimal sums, epoch window starts) are
  * documented in [[graft.entry.QueryHelpers]].
  */
object SparkEntry {

  /** Flagship: season-score composite (SURVEY.md §3.2) over the events-table
    * analogs at sf=0.001. Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    AQueries.seasonScoreFrame(spark, "/root/testdata/sf0.001", exact = false)

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    AQueries.queries ++ BQueries.queries ++ DQueries.queries ++ OlapQueries.queries

  def oracleSql: Map[String, String] =
    AQueries.oracle ++ BQueries.oracle ++ DQueries.oracle ++ OlapQueries.oracle
}
