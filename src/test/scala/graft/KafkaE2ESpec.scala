package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}
import graft.operators.StreamOps
import graft.sources.EventSources

/** The reference's PRIMARY entry point (read_kafka,
  * kafka_to_metrics.py:156-169) driven against a REAL broker — the one
  * path no other suite can reach, because the sandbox ships neither the
  * spark-sql-kafka connector jar nor a broker and has no network to fetch
  * them (docs/KAFKA.md records the attempted resolution and the pinned
  * deploy recipe). Both tests therefore CANCEL (not pass) here, and
  * un-cancel on any machine where the prerequisites exist:
  *
  *  - connector on the classpath: build with `sbt -Dgraft.kafka=1`
  *    (adds spark-sql-kafka-0-10 matching the bundled Spark);
  *  - a live broker: export GRAFT_KAFKA_BOOTSTRAP=host:9092 (the
  *    round-trip test creates/fills its own topic via the kafka-clients
  *    producer, reflectively — this file must compile without the jars).
  *
  * The spec is in the default suite on purpose: the cancellation message
  * IS the deploy checklist, and a CI with a broker gets the real gate
  * with zero config beyond the env var. */
class KafkaE2ESpec extends SparkSpec {

  private def haveConnector: Boolean =
    try {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
      true
    } catch { case _: Throwable => false }

  private def haveProducer: Boolean =
    try {
      Class.forName("org.apache.kafka.clients.producer.KafkaProducer")
      true
    } catch { case _: Throwable => false }

  private val bootstrap = sys.env.get("GRAFT_KAFKA_BOOTSTRAP")

  private val cancelMsg =
    "spark-sql-kafka connector not on classpath; build with -Dgraft.kafka=1 " +
      "on a networked machine (exact coordinates: docs/KAFKA.md)"

  test("EventSources.kafka analyzes to the canonical (key, value, kafka_ts) " +
      "frame without touching a broker") {
    assume(haveConnector, cancelMsg)
    // .load() resolves the source and fixes the schema; no connection is
    // made until the query starts, so this gates the WIRING everywhere
    // the connector jar exists, broker or not
    val df = EventSources.kafka(spark, "graft_events",
      bootstrap = bootstrap.getOrElse("localhost:9092"))
    assert(df.isStreaming, "kafka source must be a streaming frame")
    assert(df.schema.fieldNames.toSeq === Seq("key", "value", "kafka_ts"),
      s"frame shape drifted: ${df.schema.fieldNames.toSeq}")
    assert(df.schema("key").dataType === StringType)
    assert(df.schema("value").dataType === StringType)
  }

  test("kafka -> parse -> repair -> aggregate round-trip against a live broker") {
    assume(haveConnector, cancelMsg)
    assume(haveProducer, "kafka-clients not on the test classpath (-Dgraft.kafka=1)")
    assume(bootstrap.nonEmpty,
      "no broker: export GRAFT_KAFKA_BOOTSTRAP=host:9092 to run the e2e gate")
    val bs = bootstrap.get
    val topic = s"graft_e2e_${System.currentTimeMillis()}"
    val n = 100

    // produce n JSON events reflectively (compile-safe without the jars)
    val props = new java.util.Properties()
    props.put("bootstrap.servers", bs)
    val strSer = "org.apache.kafka.common.serialization.StringSerializer"
    props.put("key.serializer", strSer)
    props.put("value.serializer", strSer)
    val pCls = Class.forName("org.apache.kafka.clients.producer.KafkaProducer")
    val rCls = Class.forName("org.apache.kafka.clients.producer.ProducerRecord")
    val rCtor = rCls.getConstructor(classOf[String], classOf[Object], classOf[Object])
    val producer = pCls.getConstructor(classOf[java.util.Properties])
      .newInstance(props)
    val send = pCls.getMethod("send", rCls)
    (0 until n).foreach { i =>
      val value =
        s"""{"event_id":$i,"event_ts":"2026-01-01T00:00:${f"${i % 60}%02d"}Z","value":${i * 2}}"""
      send.invoke(producer, rCtor.newInstance(topic, s"k$i", value)
        .asInstanceOf[Object])
    }
    pCls.getMethod("flush").invoke(producer)
    pCls.getMethod("close").invoke(producer)

    // the reference pipeline head: read_kafka -> parse -> timestamp repair
    // -> global count (A1 -> A2 -> A3 -> A7), complete-mode memory sink
    val schema = new StructType()
      .add("event_id", "long").add("event_ts", "string").add("value", "long")
    val parsed = StreamOps.repairTimestamps(
      StreamOps.parseJson(EventSources.kafka(spark, topic, bs), schema),
      ingestTs = "event_ts") // no separate ingest clock in this fixture
    val q = StreamOps.globalCount(parsed).writeStream
      .format("memory").queryName("kafka_e2e").outputMode("complete")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_kafka_ckpt").toString)
      .start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      var count = 0L
      while (count < n && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        val rows = spark.sql("SELECT n FROM kafka_e2e").collect()
        count = if (rows.isEmpty) 0L else rows.head.getLong(0)
      }
      assert(count === n, s"round-trip lost events: $count of $n")
    } finally q.stop()
  }
}
