package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Directory-of-media-files ingestion — the file-system front of the
  * multimodal family (E13/E121/E124): Spark's built-in `binaryFile`
  * source lists a directory tree and reads each file as one row
  * (path, modificationTime, length, content), and this wrapper shapes it
  * into the (doc_id, payload) frame every decode/hash/resize/dedup
  * operator consumes.
  *
  * - `doc_id` is the portable 60-bit hash of the file PATH — stable
  *   across re-runs, listing orders, and engines (a
  *   monotonically_increasing_id would renumber on every run and break
  *   incremental dedup against a standing corpus); the path rides along
  *   for provenance and collision forensics.
  * - `pathGlobFilter` pushes format selection into the LISTING —
  *   non-matching files are never opened, the cheapest predicate
  *   pushdown there is. Magic-byte routing in [[graft.operators
  *   .Multimodal.MediaDecoder]] still validates whatever arrives (a
  *   `.bmp` file full of junk degrades to `raw`, never throws).
  * - Scale shape: binaryFile plans one task per file (files are opaque
  *   blobs — there is no intra-file split), so parallelism = file count;
  *   fine for media corpora (many files by nature). The source caps
  *   single files at `spark.sql.sources.binaryFile.maxLength` (Int.Max)
  *   — a multi-GB video belongs in chunked storage, not a single row.
  */
object MediaSource {

  /** Read a directory of media files as (doc_id, path, length, payload).
    * `glob` e.g. Some("*.bmp") restricts the listing itself. */
  def readBinaryDir(spark: SparkSession, dir: String,
                    glob: Option[String] = None): DataFrame = {
    val reader = spark.read.format("binaryFile")
    glob.fold(reader)(g => reader.option("pathGlobFilter", g))
      .load(dir)
      .select(Hashing.hash60(col("path")).as("doc_id"), col("path"),
        col("length"), col("content").as("payload"))
  }
}
