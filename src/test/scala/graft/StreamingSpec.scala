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

  test("delete-aware streaming changelog: batch parity, replay no-op, tombstones block stale resurrections") {
    import spark.implicits._
    val log = Seq(
      // key 1: upsert then delete (later) -> absent from live state
      (1L, 1L, "upsert", 100L), (1L, 3L, "delete", 0L),
      // key 2: delete then upsert (later) -> alive at 222
      (2L, 1L, "delete", 0L), (2L, 4L, "upsert", 222L),
      // key 3: single upsert
      (3L, 2L, "upsert", 333L)
    ).toDF("key", "seq", "op", "cents")
    val root = java.nio.file.Files.createTempDirectory("graft_cdc2").toString
    // two micro-batches split ACROSS the per-key histories
    log.filter(col("seq") <= 2).coalesce(1).write.parquet(s"$root/upd/f1.parquet")
    log.filter(col("seq") > 2).coalesce(1).write.parquet(s"$root/upd/f2.parquet")
    val snapDir = s"$root/snapshot"
    val src = spark.readStream.schema(log.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$root/upd/*/")
    val q = graft.operators.Merge.changelogStream(src, snapDir, "key", "cents",
      opCol = "op", deleteOp = "delete", orderCols = Seq("seq"), s"$root/ckpt")
    q.awaitTermination()
    assert(q.recentProgress.length >= 2, "two files must arrive as separate micro-batches")
    def live() = graft.operators.Merge
      .readChangelogSnapshot(spark, snapDir, "op", "delete")
      .select("key", "cents").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(live() == Map(2L -> 222L, 3L -> 333L), s"got ${live()}")
    // replaying the last batch is a no-op (at-least-once safety)
    graft.operators.Merge.applyChangelogBatch(
      spark.read.parquet(s"$root/upd/f2.parquet"), snapDir, "key", "cents",
      "op", "delete", Seq("seq"))
    assert(live() == Map(2L -> 222L, 3L -> 333L), "replay must not change the state")
    // an OUT-OF-ORDER older upsert for the deleted key 1 must NOT
    // resurrect it — the tombstone carries the higher version
    graft.operators.Merge.applyChangelogBatch(
      Seq((1L, 2L, "upsert", 999L)).toDF("key", "seq", "op", "cents"),
      snapDir, "key", "cents", "op", "delete", Seq("seq"))
    assert(live() == Map(2L -> 222L, 3L -> 333L), "stale upsert must lose to the tombstone")
    // ... and a NEWER upsert revives the key
    graft.operators.Merge.applyChangelogBatch(
      Seq((1L, 9L, "upsert", 111L)).toDF("key", "seq", "op", "cents"),
      snapDir, "key", "cents", "op", "delete", Seq("seq"))
    assert(live() == Map(1L -> 111L, 2L -> 222L, 3L -> 333L), "newer upsert must win")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("streaming CDC apply: multi-batch upsert fold equals the batch keep-last snapshot") {
    import org.apache.spark.sql.functions._
    val ev = EventsTable.normalizeTs(
        spark.read.parquet(sf("sf0.001") + "/events.parquet"))
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
    val root = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    val updDir = s"$root/updates"
    // two files -> two micro-batches (maxFilesPerTrigger=1): the fold
    // must be associative across the batch boundary
    ev.filter(col("event_id") % 2 === 0).coalesce(1).write.parquet(s"$updDir/f1.parquet")
    ev.filter(col("event_id") % 2 === 1).coalesce(1).write.parquet(s"$updDir/f2.parquet")
    val snapDir = s"$root/snapshot"
    val src = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$updDir/*/")
    val q = graft.operators.Merge.upsertStream(src, snapDir, "user_id", "event_id",
      s"$root/ckpt")
    q.awaitTermination()
    assert(q.recentProgress.length >= 2, "two files must arrive as separate micro-batches")
    val got = spark.read.parquet(snapDir)
      .select("user_id", "event_id").orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // batch truth: keep the row with the highest event_id per user
    val expect = ev.withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(col("event_id").desc)))
      .filter(col("__rn") === 1)
      .select("user_id", "event_id").orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expect, s"CDC fold must equal the batch keep-last (${got.size}/${expect.size})")
    // re-applying the last batch is idempotent (at-least-once safety)
    graft.operators.Merge.applyBatch(
      spark.read.parquet(s"$updDir/f2.parquet"), snapDir, "user_id", "event_id")
    val again = spark.read.parquet(snapDir)
      .select("user_id", "event_id").orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(again == expect, "re-applied batch must be a no-op")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("streaming validation monitor equals the batch windowed violation counts") {
    import graft.operators.Validate
    import graft.operators.Validate._
    val dir = sf("sf0.001")
    val streamDir = java.nio.file.Files.createTempDirectory("graft_val_stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/events.parquet"))
    val checks = Seq(NotNull("value"), InRange("value", 0, 5),
      Accepted("event_type", Seq("view", "click")))
    val q = Validate.validateStream(
        EventStream.readEvents(spark, streamDir), "ts", "6 hours", checks)
      .writeStream.format("memory").queryName("val_stream_test")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    def flat(df: org.apache.spark.sql.DataFrame) =
      df.select(org.apache.spark.sql.functions.col("window.start").cast("long").as("w"),
          org.apache.spark.sql.functions.col("n_rows"),
          org.apache.spark.sql.functions.col("not_null_value"),
          org.apache.spark.sql.functions.col("in_range_value"),
          org.apache.spark.sql.functions.col("accepted_event_type"))
        .orderBy("w").collect().toSeq
    val streamed = flat(spark.table("val_stream_test"))
    val batch = flat(Validate.validateStream(
      EventsTable.normalizeTs(spark.read.parquet(s"$dir/events.parquet")),
      "ts", "6 hours", checks))
    assert(streamed == batch, "stream must equal batch row for row")
    assert(streamed.nonEmpty && streamed.map(_.getLong(2)).sum >= 0)
    // the in_range check must actually discriminate on this data
    assert(streamed.map(_.getLong(3)).sum > 0, "planted range violations expected")
    // stateful checks are refused on streams
    assert(intercept[IllegalArgumentException](
      Validate.validateStream(EventStream.readEvents(spark, streamDir), "ts", "1 hour",
        Seq(Unique("event_id")))).getMessage.contains("batch-only"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(streamDir))
  }

  test("streaming HLL registers equal the batch sketch (bounded sketch state, no watermark)") {
    val dir = sf("sf0.001")
    val streamDir = java.nio.file.Files.createTempDirectory("graft_hll_stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/events.parquet"))
    val q = EventStream.hllUserRegisters(EventStream.readEvents(spark, streamDir))
      .writeStream.format("memory").queryName("hll_test").outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("hll_test").orderBy("grp", "bucket").collect().toSeq
    val batch = graft.operators.Sketch.hllRegisters(
        spark.read.parquet(s"$dir/events.parquet").select("event_type", "user_id"),
        "event_type", "user_id")
      .orderBy("grp", "bucket").collect().toSeq
    assert(streamed == batch,
      "streaming registers must be bit-identical to the batch sketch")
    // and the estimate path consumes the streamed state directly,
    // bit-identical to the batch pipeline (sf0.001 cardinalities sit
    // far below the raw estimator's ~2.5m accuracy regime — the
    // envelope itself is SketchSpec's concern at real cardinalities;
    // parity of the full streamed pipeline is this test's)
    val streamedEst = graft.operators.Sketch.hllEstimate(spark.table("hll_test"))
      .orderBy("grp").collect().toSeq
    val batchEst = graft.operators.Sketch.hllEstimate(
        graft.operators.Sketch.hllRegisters(
          spark.read.parquet(s"$dir/events.parquet").select("event_type", "user_id"),
          "event_type", "user_id"))
      .orderBy("grp").collect().toSeq
    assert(streamedEst == batchEst)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(streamDir))
  }

  test("streaming CMS cells equal the batch sketch") {
    val dir = sf("sf0.001")
    val streamDir = java.nio.file.Files.createTempDirectory("graft_cms_stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/events.parquet"))
    val q = EventStream.cmsUserCells(EventStream.readEvents(spark, streamDir))
      .writeStream.format("memory").queryName("cms_test").outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("cms_test").orderBy("row", "cell").collect().toSeq
    val batch = graft.operators.Sketch.cmsCells(
        spark.read.parquet(s"$dir/events.parquet").select("user_id"), "user_id")
      .orderBy("row", "cell").collect().toSeq
    assert(streamed == batch, "streaming cells must be bit-identical to the batch sketch")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(streamDir))
  }

  test("streaming dedup drops duplicate event ids (watermark-bounded state)") {
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    val streamDir = java.nio.file.Files.createTempDirectory("graft_dd").toString
    // duplicate the whole file: every event_id appears twice
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/b.parquet"))

    val q = graft.streaming.EventStream.dedupStream(
      graft.streaming.EventStream.readEvents(spark, streamDir))
      .writeStream.format("memory").queryName("dd_test").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val n = spark.table("dd_test").count()
    val distinct = spark.read.parquet(s"$dir/events.parquet").count()
    assert(n == distinct, s"dedup stream must emit each event_id once ($n vs $distinct)")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(streamDir))
  }

  test("stream-stream interval join matches the batch theta join") {
    val dir = sf("sf0.001")
    val streamDir = java.nio.file.Files.createTempDirectory("graft_ij").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/events.parquet"))

    val q = EventStream.purchaseIntervalJoin(EventStream.readEvents(spark, streamDir))
      .writeStream.format("memory").queryName("ij_test").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("ij_test")
      .select("event_id", "p_event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted

    val ev = QueryRegistry.events(spark, dir)
    val batch = ev.as("e").join(
        ev.filter(col("event_type") === "purchase").as("p"),
        col("e.user_id") === col("p.user_id") &&
          col("p.ts") <= col("e.ts") &&
          col("p.ts") >= col("e.ts") - expr("INTERVAL 6 HOURS"))
      .select(col("e.event_id"), col("p.event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted

    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(streamDir))
  }

  test("stateful streaming sessionization matches the batch query") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    val streamDir = java.nio.file.Files.createTempDirectory("graft_sess").toString

    // batch truth on the real events
    val batch = graft.streaming.Sessionize
      .batchSessions(QueryRegistry.events(spark, dir))
      .select("user_id", "session_seq", "session_start", "n_events", "sum_value_e2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .sorted

    // file 1: the real events; file 2: far-future sentinels that push
    // the watermark past every real session so all of them close
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/00_events.parquet"))
    EventsTable.farFutureSentinel(spark, s"$dir/events.parquet")
      .coalesce(1).write.parquet(s"$streamDir/zz_sentinel")
    // move sentinel parquet up (file source reads the dir non-recursively per glob)
    val sent = new java.io.File(s"$streamDir/zz_sentinel").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(sent.toPath, java.nio.file.Paths.get(s"$streamDir/01_sentinel.parquet"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$streamDir/zz_sentinel"))

    val src = graft.streaming.EventStream.readEvents(spark, streamDir)
      .withWatermark("ts", "0 seconds")
    val q = graft.streaming.Sessionize.streamSessions(spark, src)
      .writeStream.format("memory").queryName("sess_test")
      .outputMode("append")
      .option("maxFilesPerTrigger", "1")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.table("sess_test")
      .filter(col("user_id") >= 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .sorted

    assert(streamed.toSeq == batch.toSeq)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(streamDir))
  }

  test("streaming incremental dedup equals the batch operator (append mode, stateless stream side)") {
    import spark.implicits._
    val history = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    // the arriving batch: re-crawls under new ids + genuinely new docs
    val incoming = history.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 50000L).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
      .unionByName(Seq(
        (90001L, "a stream-novel document", "en", "s", 23L),
        (90002L, null: String, "en", "s", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val streamDir = java.nio.file.Files.createTempDirectory("graft_docstream").toString
    incoming.coalesce(1).write.mode("overwrite").parquet(streamDir)

    val fps = graft.streaming.DocIngest.historyFingerprints(history, "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = graft.streaming.DocIngest.incrementalDedupStream(
        graft.streaming.DocIngest.readDocs(spark, streamDir), fps, "text")
      .writeStream.format("memory").queryName("docingest_test")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("docingest_test").select("doc_id").as[Long].collect().toSet
    val batch = graft.operators.Dedup.incrementalDedup(incoming, history, "text")
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == batch, "streamed dedup must equal the batch operator")
    assert(streamed.contains(90001L) && !streamed.contains(90002L),
      "novel doc kept, NULL-text doc dropped (the batch operator's documented semantics)")
    assert(streamed.forall(id => id >= 90001L), "every re-crawl (5xxxx id block) must be dropped")
    fps.unpersist()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(streamDir))
  }

  test("streaming curation signal filter matches the batch operator") {
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    val batch = graft.operators.TextAnalysis.signalFilter(
        spark.read.parquet(s"$dir/documents.parquet"),
        minQualityE4 = 4000, maxDupRatioE4 = 6500, lang = "en")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(batch.nonEmpty, "threshold config must keep some sf0.001 docs")
    val streamDir = java.nio.file.Files.createTempDirectory("graft_curation").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      java.nio.file.Paths.get(s"$streamDir/00_documents.parquet"))
    val src = spark.readStream
      .schema(spark.read.parquet(s"$dir/documents.parquet").schema)
      .parquet(streamDir)
    // the EXACT batch operator applied to a stream — per-row
    // expressions only, so no state/watermark/output-mode friction
    val q = graft.streaming.Curation.signalFilter(src,
        minQualityE4 = 4000, maxDupRatioE4 = 6500, lang = "en")
      .writeStream.format("memory").queryName("curation_test")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("curation_test")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch, "streamed signal filter must equal the batch operator")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(streamDir))
  }

  test("streaming release gate equals the batch composition; stateful stages refused loudly") {
    import org.apache.spark.sql.functions._
    import graft.operators.Validate
    val dir = sf("sf0.001")
    val checks = Seq(Validate.NotNull("doc_id"), Validate.InRange("n_chars", 1, 1e9),
      Validate.Matches("source", "^src"))
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("pred_lang"), col("quality_score_e4"),
        col("n_emails") + col("n_phones") + col("n_ips"), col("redacted"))
      .collect().map(_.toSeq).toSet
    val batchDocs = spark.read.parquet(s"$dir/documents.parquet")
    val batch = key(graft.streaming.ReleaseGate(batchDocs,
      minQualityE4 = 4000, maxDupRatioE4 = 6500, lang = "en", checks = checks))
    assert(batch.nonEmpty, "thresholds must keep some sf0.001 docs")
    val streamDir = java.nio.file.Files.createTempDirectory("graft_relgate").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      java.nio.file.Paths.get(s"$streamDir/00_documents.parquet"))
    val src = spark.readStream.schema(batchDocs.schema).parquet(streamDir)
    val q = graft.streaming.ReleaseGate(src,
        minQualityE4 = 4000, maxDupRatioE4 = 6500, lang = "en", checks = checks)
      .writeStream.format("memory").queryName("release_gate_test")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(key(spark.table("release_gate_test")) == batch,
      "streamed release gate must equal the batch composition")
    // stateful stages refuse loudly: Unique check on the stream...
    val e1 = intercept[IllegalArgumentException] {
      graft.streaming.ReleaseGate(src, 4000, 6500, "en", Seq(Validate.Unique("doc_id")))
    }
    assert(e1.getMessage.contains("STATEFUL"))
    // ...and the k-anonymity gate on a streaming frame
    val e2 = intercept[IllegalArgumentException] {
      graft.streaming.ReleaseGate.kAnonymityGate(src, Seq("source"), 5)
    }
    assert(e2.getMessage.contains("materialize"))
    // the batch face of the gate suppresses exactly the < k groups
    val gated = graft.streaming.ReleaseGate.kAnonymityGate(batchDocs, Seq("source"), 5)
    val counts = gated.groupBy("source").count().collect()
    assert(counts.nonEmpty && counts.forall(_.getLong(1) >= 5))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(streamDir))
  }

  test("streaming alert cross-match equals the brute-force batch oracle") {
    import org.apache.spark.sql.functions._
    import graft.functions.sphere
    import spark.implicits._
    val dir = sf("sf0.001")
    val thresh = 5.0
    val ref = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").as("obj_id"),
        sphere.raOf(col("c_custkey")).as("ra"), sphere.decOf(col("c_custkey")).as("dec"))
    val alerts = spark.read.parquet(s"$dir/supplier.parquet")
      .select(col("s_suppkey").as("alert_id"),
        sphere.raOf(col("s_suppkey") + 7L).as("ra"), sphere.decOf(col("s_suppkey") + 7L).as("dec"))
    // ground truth: brute-force cross join (150 x 100 pairs at sf0.001)
    val truth = alerts.as("a").crossJoin(ref.as("r"))
      .withColumn("d", sphere.gcDist(col("a.ra"), col("a.dec"), col("r.ra"), col("r.dec")))
      .filter(col("d") < thresh)
      .select(col("alert_id"), col("obj_id")).as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "5-degree threshold must match something at sf0.001")
    val prepared = graft.streaming.AlertStream.prepareReference(ref, "ra", "dec", thresh)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val streamDir = java.nio.file.Files.createTempDirectory("graft_alerts").toString
    alerts.coalesce(1).write.parquet(s"$streamDir/b0.parquet")
    val src = spark.readStream.schema(alerts.schema).parquet(s"$streamDir/*/")
    val q = graft.streaming.AlertStream.xmatchStream(src, "ra", "dec", prepared, thresh)
      .select(col("alert_id"), col("ref_obj_id"))
      .writeStream.format("memory").queryName("alert_xmatch")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("alert_xmatch").as[(Long, Long)].collect().toSet
    assert(streamed == truth,
      s"stream-static pixel join must equal brute force (missing ${truth -- streamed}, extra ${streamed -- truth})")
    prepared.unpersist()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(streamDir))
  }

  test("streaming centroid classification equals the batch inline scorer") {
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val isPos = size(filter(graft.operators.TextAnalysis.tokens(col("text")),
      w => w === "spark")) >= 2
    val model = graft.operators.Classify.trainCentroid(
      docs.withColumn("__y", isPos), "__y", "doc_id", "text")
    val cw = graft.operators.Classify.centroidWeights(model)
    val batch = graft.operators.Classify.scoreCentroidInline(docs, "doc_id", "text", cw)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(batch.exists(_._3 == "pos") && batch.exists(_._3 == "neg"),
      "sf0.001 corpus must split under the planted label")
    val streamDir = java.nio.file.Files.createTempDirectory("graft_centroid").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      java.nio.file.Paths.get(s"$streamDir/00_documents.parquet"))
    val src = spark.readStream.schema(docs.schema).parquet(streamDir)
    val q = graft.streaming.Curation.classifyStream(src, "doc_id", "text", cw)
      .writeStream.format("memory").queryName("centroid_test")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("centroid_test")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(streamed == batch, "streamed centroid scoring must equal the batch scorer")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(streamDir))
  }

  test("streaming outlier scoring equals the batch operator (stream-static stats join)") {
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    val ev = QueryRegistry.events(spark, dir)
      .withColumn("v_e3", round(col("value") * 1000).cast("long"))
    val stats = graft.operators.Outliers.robustStats(ev, "event_type", "v_e3")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val batch = graft.operators.Outliers.robustOutliers(ev, "event_type", "event_id", "v_e3")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(batch.nonEmpty, "sf0.001 events must contain some robust outliers")

    val streamDir = java.nio.file.Files.createTempDirectory("graft_outlier").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/events.parquet"))
    val src = graft.streaming.EventStream.readEvents(spark, streamDir)
      .withColumn("v_e3", round(col("value") * 1000).cast("long"))
    val q = graft.operators.Outliers.scoreStream(src, stats, "event_type", "event_id", "v_e3")
      .writeStream.format("memory").queryName("outlier_test").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("outlier_test")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch, "streamed outlier scoring must equal the batch operator")
    stats.unpersist()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(streamDir))
  }

  test("streaming funnel final stages match the batch operator") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    val streamDir = java.nio.file.Files.createTempDirectory("graft_funnel").toString

    // batch truth on the SAME micros-truncated timestamps the stream sees
    val batch = graft.operators.Temporal.funnelStages(
        QueryRegistry.events(spark, dir), "user_id", "ts", "event_id",
        Seq(col("event_type") === "view", col("event_type") === "click",
          col("event_type") === "purchase"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/00_events.parquet"))
    EventsTable.farFutureSentinel(spark, s"$dir/events.parquet")
      .coalesce(1).write.parquet(s"$streamDir/zz_sentinel")
    val sent = new java.io.File(s"$streamDir/zz_sentinel").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(sent.toPath, java.nio.file.Paths.get(s"$streamDir/01_sentinel.parquet"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$streamDir/zz_sentinel"))

    val src = graft.streaming.EventStream.readEvents(spark, streamDir)
      .withWatermark("ts", "0 seconds")
      .withColumn("step",
        when(col("event_type") === "view", 0)
          .when(col("event_type") === "click", 1)
          .when(col("event_type") === "purchase", 2).otherwise(-1))
    val q = graft.streaming.FunnelStream.streamFunnel(spark, src, nSteps = 3)
      .writeStream.format("memory").queryName("funnel_test")
      .outputMode("append")
      .option("maxFilesPerTrigger", "1")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val rows = spark.table("funnel_test").filter(col("user_id") >= 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // one row per stage increase, no duplicates
    assert(rows.length == rows.toSet.size, "each (user, stage) emitted exactly once")
    val streamedStage = rows.groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).max }
    // stream emits only progressing users; everyone else is batch stage 0
    streamedStage.foreach { case (u, st) =>
      assert(batch(u) == st, s"user $u: stream stage $st != batch ${batch(u)}")
    }
    batch.filter(_._2 > 0).keys.foreach(u =>
      assert(streamedStage.contains(u), s"user $u progressed in batch but emitted nothing"))
    // intermediate stages present: a stage-3 user emitted 1, 2 and 3
    val byUser = rows.groupBy(_._1)
    streamedStage.filter(_._2 == 3L).keys.take(5).foreach { u =>
      assert(byUser(u).map(_._2).sorted.toSeq == Seq(1L, 2L, 3L))
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(streamDir))
  }

  test("streaming bitmap words equal the batch index bit for bit") {
    val dir = sf("sf0.001")
    val streamDir = java.nio.file.Files.createTempDirectory("graft_bm_stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/events.parquet"))
    val q = EventStream.bitmapUserWords(EventStream.readEvents(spark, streamDir))
      .writeStream.format("memory").queryName("bm_test").outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("bm_test").orderBy("grp", "wi").collect().toSeq
    val batch = graft.operators.Sketch.bitmapWords(
        spark.read.parquet(s"$dir/events.parquet").select("event_type", "user_id"),
        "event_type", "user_id")
      .orderBy("grp", "wi").collect().toSeq
    assert(streamed == batch)
    // and the streamed words drive the exact intersection pipeline
    // (localCheckpoint: a memory-sink view can't self-join by alias)
    val nBoth = graft.operators.Sketch.bitmapIntersections(
        spark.table("bm_test").localCheckpoint())
      .filter(org.apache.spark.sql.functions.col("grp_a") ===
        org.apache.spark.sql.functions.col("grp_b"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val exact = spark.read.parquet(s"$dir/events.parquet")
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(nBoth == exact, "diagonal of the streamed index = exact distinct counts")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(streamDir))
  }

  test("streaming heavy hitters: MG guarantee holds across micro-batches with bounded state") {
    val dir = sf("sf0.001")
    val streamDir = java.nio.file.Files.createTempDirectory("graft_hh").toString
    // two copies -> with maxFilesPerTrigger=1 the MG fold must carry
    // state across micro-batches
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/b.parquet"))
    val onDisk = graft.EventsTable.read(spark, s"$dir/events.parquet").schema
    val stream = spark.readStream.schema(onDisk)
      .option("maxFilesPerTrigger", "1").parquet(streamDir)
    val q = graft.streaming.HeavyHittersStream.candidates(stream, "event_type", k = 2, shards = 4)
      .writeStream.format("memory").queryName("hh_test").outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val all = spark.table("hh_test").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(all.map(_._5).max >= 2, "state must have folded across >= 2 micro-batches")
    // latest snapshot per shard
    val lastSeq = all.groupBy(_._1).map { case (s, rs) => s -> rs.map(_._5).max }
    val latest = all.filter(r => r._5 == lastSeq(r._1))
    latest.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.length <= 2, s"shard summary exceeds k counters: $rs") }
    // MG guarantee per shard: any term with shard count > n_shard/(k+1)
    // must be present in that shard's final summary
    val termCounts = spark.read.parquet(s"$streamDir/*.parquet")
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val shardOf = (t: String) => math.floorMod(t.##, 4)
    val nShard = latest.groupBy(_._1).map { case (s, rs) => s -> rs.head._4 }
    termCounts.foreach { case (t, c) =>
      val s = shardOf(t)
      if (nShard.contains(s) && c > nShard(s) / 3.0)
        assert(latest.exists(r => r._1 == s && r._2 == t),
          s"term $t (count $c, shard $s, n=${nShard(s)}) must survive MG")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(streamDir))
  }

  test("streaming media ingest: on-stream hashing, exact-dup drop, foreachBatch classification parity") {
    import spark.implicits._
    import graft.operators.Multimodal
    val streamDir = java.nio.file.Files.createTempDirectory("graft_mediastream").toString
    // history: patterns 0..3 under ids 0..7 -> stored hash state
    val histIds = (0L until 8L).map(i => (i, i % 4)).toDF("doc_id", "pattern")
    val hist = Multimodal.imagePhash(spark,
      Multimodal.synthesizePngsKeyed(spark, histIds, "doc_id", "pattern").toDF())
    val state = Multimodal.phashGroups(hist)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    state.count()
    // incoming: two re-crawled patterns (exact dups) + two new patterns
    val batchIds = Seq((100L, 0L), (101L, 2L), (102L, 17L), (103L, 23L)).toDF("doc_id", "pattern")
    val batchMedia = Multimodal.synthesizePngsKeyed(spark, batchIds, "doc_id", "pattern").toDF()
    batchMedia.write.mode("overwrite").parquet(streamDir)

    // face 1: exact-dup drop inside the streaming plan
    val q = graft.streaming.MediaIngest.exactDedupStream(spark,
        graft.streaming.MediaIngest.readMedia(spark, streamDir), state)
      .writeStream.format("memory").queryName("mediaingest_test")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val kept = spark.table("mediaingest_test").select("id").as[Long].collect().toSet
    assert(!kept.contains(100L) && !kept.contains(101L), "re-crawled images dropped on-stream")
    assert(kept.contains(102L) || kept.contains(103L), "novel images pass through")

    // face 2: per-micro-batch classification equals the batch operator
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q2 = graft.streaming.MediaIngest.classifyStream(spark,
        graft.streaming.MediaIngest.readMedia(spark, streamDir), state) { (classified, _) =>
      collected ++= classified.select("id", "status").as[(Long, String)].collect()
    }
    q2.awaitTermination()
    val batchHashed = Multimodal.imagePhash(spark, batchMedia)
    val expect = Multimodal.phashIncremental(batchHashed, state)
      .select("id", "status").as[(Long, String)].collect().toSet
    assert(collected.toSet == expect, "streamed classification must equal the batch operator")
    assert(collected.toMap.apply(100L) == "exact_dup" && collected.toMap.apply(101L) == "exact_dup")
    state.unpersist()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(streamDir))
  }
}
