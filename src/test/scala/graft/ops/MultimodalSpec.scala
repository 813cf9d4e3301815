package graft.ops

import graft.{SparkSpec, Tables}

class MultimodalSpec extends SparkSpec {

  private lazy val records = Multimodal.toMediaRecords(Tables.documents(spark, sfDir))

  test("media records carry typed metadata over opaque payloads") {
    val r = records.head()
    assert(Set("image", "audio", "video").contains(r.mediaType))
    assert(r.payload.nonEmpty)
    assert(r.sourceUri.startsWith("synthetic://"))
    assert(records.count() == Tables.documents(spark, sfDir).count())
  }

  test("batched decode preserves rows and partitioning, features deterministic") {
    val before = records.rdd.getNumPartitions
    val feats = Multimodal.decodeFeatures(records, batchSize = 7)
    assert(feats.rdd.getNumPartitions == before) // no shuffle introduced
    assert(feats.count() == records.count())
    val a = feats.collect().sortBy(_.docId)
    val b = Multimodal.decodeFeatures(records, batchSize = 64).collect().sortBy(_.docId)
    assert(a.toSeq == b.toSeq, "batch size must not affect results")
    a.foreach { f =>
      assert(f.byteLen > 0 && f.sha256.length == 64)
      assert(f.width >= 1 && f.width <= 1920 && f.height >= 1 && f.height <= 1080)
      assert(f.mediaType != "image" || f.durationMs == 0L)
    }
  }

  test("frame sampling yields bounded evenly-spaced frames for videos only") {
    val frames = Multimodal.sampleFrames(records, maxFrames = 4).collect()
    assert(frames.nonEmpty)
    val videoIds = records.filter(_.mediaType == "video").collect().map(_.docId).toSet
    assert(frames.map(_.docId).toSet.subsetOf(videoIds))
    frames.groupBy(_.docId).foreach { case (_, fs) =>
      assert(fs.length <= 4)
      assert(fs.map(_.frameIndex).sorted.sameElements(fs.indices))
    }
  }

  test("resize stub preserves aspect ratio within rounding") {
    val feats = Multimodal.decodeFeatures(records)
    val resized = Multimodal.resizeStub(feats, maxDim = 256).collect()
    resized.foreach { f =>
      assert(math.max(f.width, f.height) <= 256)
      assert(f.width >= 1 && f.height >= 1)
    }
  }
}
