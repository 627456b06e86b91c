package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {

  private lazy val media =
    Multimodal.asMediaTable(Tables.load(spark, sf, "documents"), "doc_id", "text")

  test("media table has the contract schema and non-empty payloads") {
    assert(media.schema("payload").dataType.typeName == "binary")
    assert(media.schema("meta").dataType.typeName == "struct")
    val r = media.agg(min(col("meta.n_bytes")), count(lit(1))).head()
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
  }

  test("stub decode produces normalized fixed-dim features") {
    val f = Multimodal.extractFeatures(media, dim = 16)
    val r = f.select(size(col("features")).as("d"),
        aggregate(col("features"), lit(0.0), (a, x) => a + x).as("mass"))
      .agg(min("d"), max("d"), min("mass"), max("mass")).head()
    assert(r.getInt(0) == 16 && r.getInt(1) == 16)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-9 && math.abs(r.getDouble(3) - 1.0) < 1e-9)
  }

  test("resize truncates/pads payloads to the target size") {
    val resized = Multimodal.resizePayload(media, targetBytes = 64)
    val lens = resized.select(length(col("payload")).as("l"))
      .agg(min("l"), max("l")).head()
    assert(lens.getInt(0) == 64 && lens.getInt(1) == 64)
    assert(resized.select(first(col("meta.n_bytes"))).head().getLong(0) == 64L)
  }

  test("frame sampling explodes video payloads into frame rows") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 32, everyNth = 2)
    assert(frames.columns.toSeq == Seq("media_id", "frame_idx", "frame"))
    val n = frames.count()
    val nVideos = media.filter(col("modality") === "video").count()
    assert(n >= nVideos, "every video should yield at least one frame")
  }
}
