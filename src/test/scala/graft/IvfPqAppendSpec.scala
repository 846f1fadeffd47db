package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** Pins the property `graft.tools.StreamingIvfPqDemo` measures at sf1
  * (SCALING r15): a persisted IVF-PQ artifact built by PER-SHARD APPENDS
  * under frozen codebooks is row-for-row identical to a from-scratch
  * rebuild over the union — i.e. the artifact contract
  * ([[SimilarityOps.ivfPqIndexWrite]]: append is the shard path, no
  * rebuild needed) holds through a real foreachBatch ingestion, and a
  * search served from the appended index equals one served from the
  * rebuilt index. The demo's first cut ingested NOTHING because a
  * fractional-division shard predicate matched no rows — this spec
  * asserts non-vacuously (index row count must grow per trigger).
  */
class IvfPqAppendSpec extends SparkSpec {

  private def vecs(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.map { i =>
      (i, Array.tabulate(64) { d =>
        ((graft.functions.Hashing.hash60Scalar(s"ivfapp_${i}_$d") % 2001L)
          - 1000L).toFloat / 1000.0f
      })
    }.toDF("vec_id", "embedding")
  }

  test("foreachBatch shard appends reproduce the from-scratch index exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val path = Files.createTempDirectory("ivfpq-append").toString + "/idx"
    val all = (0L until 96L)
    val shards = all.grouped(24).toSeq // shard 0 trains; 1..3 stream in
    val ivfCb = SimilarityOps.ivfCodebook(spark, nCells = 4, dim = 64)
      .localCheckpoint(true)
    val pqCb = SimilarityOps.pqCodebook(spark, m = 8, k = 16, dim = 64)
      .localCheckpoint(true)
    SimilarityOps.ivfPqIndexWrite(
      SimilarityOps.ivfPqIndex(vecs(shards.head), ivfCb, pqCb),
      ivfCb, pqCb, path)
    var rowCounts = Seq(spark.read.parquet(s"$path/codes").count())

    val mem = MemoryStream[Int]
    val q = mem.toDS().toDF("shard").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.collect().map(_.getInt(0)).foreach { s =>
          SimilarityOps.ivfPqIndexWrite(
            SimilarityOps.ivfPqIndex(vecs(shards(s)), ivfCb, pqCb),
            ivfCb, pqCb, path, append = true)
        }
      }.start()
    try {
      (1 until shards.length).foreach { s =>
        mem.addData(s)
        q.processAllAvailable()
        rowCounts :+= spark.read.parquet(s"$path/codes").count()
      }
    } finally q.stop()
    // non-vacuous: every trigger grew the index by its shard's code rows
    assert(rowCounts === Seq(192L, 384L, 576L, 768L),
      s"index growth wrong: $rowCounts")

    val rebuilt = SimilarityOps.ivfPqIndex(vecs(all), ivfCb, pqCb)
    val appended = spark.read.parquet(s"$path/codes")
      .select("vec_id", "sub", "code", "cell")
    assert(rebuilt.exceptAll(appended).count() === 0L)
    assert(appended.exceptAll(rebuilt).count() === 0L)

    // a search from the appended artifact == a search from the rebuild
    val queries = vecs(Seq(3L, 40L, 77L))
    def search(idx: DataFrame): Seq[String] =
      SimilarityOps.ivfPqTopKFromIndex(idx, queries, ivfCb, pqCb,
          topK = 3, nProbe = 2)
        .orderBy("q_id", "rank").collect().map(_.toString).toSeq
    assert(search(appended) === search(rebuilt))
  }
}
