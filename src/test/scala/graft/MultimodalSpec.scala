package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {

  test("media table plumbing: binary payloads, metadata, batched feature extraction") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val media = Multimodal.asMediaTable(docs, "doc_id", "text", "image")
    assert(media.schema("payload").dataType.typeName == "binary")

    val feats = Multimodal.extractFeatures(spark, media)
    val rows = feats.collect()
    assert(rows.length == docs.count())
    rows.foreach { f =>
      assert(f.features.length == 8)
      assert(f.width >= 16 && f.width < 80 && f.height >= 16 && f.height < 80)
      assert(f.modality == "image")
    }
    // deterministic: same payload -> same features
    val f1 = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    val f2 = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    assert(f1._3.toSeq == f2._3.toSeq && f1._1 == f2._1)
  }

  test("resize bounds payloads to the target budget; frame sampling strides the payload") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val media = Multimodal.asMediaTable(docs, "doc_id", "text", "video")

    val resized = Multimodal.resize(spark, media, 8, 8).collect()
    resized.foreach { r =>
      assert(r.payload.length <= 64 && r.payload.nonEmpty)
      assert(r.width == 8 && r.height == 8)
    }

    val frames = Multimodal.sampleFrames(spark, media, frameBytes = 32, stride = 2)
    val byDoc = frames.collect().groupBy(_.id)
    assert(byDoc.nonEmpty)
    byDoc.values.foreach { fs =>
      assert(fs.map(_.frame_idx).forall(_ % 2 == 0), "only every 2nd frame sampled")
      fs.foreach(f => assert(f.frame_payload.length <= 32 && f.frame_payload.nonEmpty))
    }
  }

  test("byte_len matches utf-8 byte count") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val media = Multimodal.asMediaTable(docs, "doc_id", "text", "text")
    val joined = media.join(docs, media("id") === docs("doc_id"))
      .select(col("byte_len"), col("text")).collect()
    joined.foreach(r => assert(r.getLong(0) == r.getString(1).getBytes("UTF-8").length))
  }
}
