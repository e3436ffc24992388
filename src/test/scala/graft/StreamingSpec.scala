package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpecBase {

  test("streaming windowed counts equal the batch events_window result") {
    val dir = sf("sf0.001")
    // stream over a directory containing just the events file
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/events.parquet"))

    val streamed = EventStream.runAvailableNow(spark, streamDir, "ev_test")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).sorted

    val batch = QueryRegistry.all.toMap.apply("events_window").run(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).sorted

    assert(streamed.toSeq == batch.toSeq)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(streamDir))
  }
}
