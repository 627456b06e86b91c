package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads ride as opaque `binary` columns with typed metadata, and
  * decode/feature steps run as partition-batched transforms.
  *
  * The actual codecs are STUBBED (no image/audio libraries in this
  * environment): `decodeStub` derives deterministic pseudo-features from
  * the payload bytes. Everything Spark-side is real and load-bearing —
  * the schema contract, the binary column handling, the mapPartitions
  * batch shape (one decoder init per partition, streamed rows), and the
  * partition sizing — so swapping in a real codec changes only the inner
  * function.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("source", StringType),
      StructField("n_bytes", LongType),
      StructField("declared_len", LongType))))))

  /** Wrap a text corpus as a fake media table: payload = utf-8 bytes.
    * Stands in for `spark.read.format("binaryFile")` / a payload column
    * from parquet at real scale.
    */
  def asMediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      // deterministic modality assignment across 3 fake modalities
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("modality"),
      col(textCol).cast("binary").as("payload"),
      struct(
        col("source").as("source"),
        length(col(textCol)).cast("long").as("n_bytes"),
        col("n_chars").cast("long").as("declared_len")).as("meta"))

  /** STUB for the real decoder: byte-histogram features of dimension
    * `dim`, L1-normalized. A real implementation would decode the payload
    * (JPEG/PCM/container) here; per-partition init cost amortizes exactly
    * like a real codec handle would.
    */
  private def decodeStub(payload: Array[Byte], dim: Int): Array[Double] = {
    val hist = new Array[Double](dim)
    if (payload != null) {
      var i = 0
      while (i < payload.length) {
        hist((payload(i) & 0xff) % dim) += 1.0
        i += 1
      }
      val total = payload.length.max(1).toDouble
      var j = 0
      while (j < dim) { hist(j) /= total; j += 1 }
    }
    hist
  }

  /** Partition-batched feature extraction over the media table.
    * Output: (media_id, modality, n_bytes, features array<double>).
    *
    * Stays a `Dataset.mapPartitions` (typed, encoder-backed) rather than
    * dropping to `df.rdd`: the transform remains inside the DataFrame
    * lineage — columnar input feeds the deserializer directly, the plan
    * is not severed, and downstream operators keep codegen — while still
    * giving the one-decoder-init-per-partition batch shape a real codec
    * needs.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "modality", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // one "codec handle" per partition — the init-once batch shape
        // a real decoder needs
        rows.map { case (id, modality, payload) =>
          (id, modality,
            if (payload == null) 0L else payload.length.toLong,
            decodeStub(payload, dim))
        }
      }
      .toDF("media_id", "modality", "n_bytes", "features")
  }

  /** STUB "resize / re-encode": truncate or zero-pad the payload to
    * `targetBytes` — the shape of a resize-to-fixed-resolution step.
    */
  def resizePayload(media: DataFrame, targetBytes: Int): DataFrame = {
    val resize = udf { bytes: Array[Byte] =>
      if (bytes == null) new Array[Byte](targetBytes)
      else java.util.Arrays.copyOf(bytes, targetBytes)
    }
    media.withColumn("payload", resize(col("payload")))
      .withColumn("meta", col("meta").withField("n_bytes", lit(targetBytes.toLong)))
  }

  /** STUB "frame sampling": every nth byte-window as a frame row —
    * the explode shape of video→frame extraction.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, everyNth: Int): DataFrame = {
    val slicer = udf { bytes: Array[Byte] =>
      if (bytes == null) Seq.empty[Array[Byte]]
      else bytes.grouped(frameBytes).zipWithIndex
        .collect { case (frame, idx) if idx % everyNth == 0 => frame }
        .toSeq
    }
    media.filter(col("modality") === "video")
      .select(col("media_id"), posexplode(slicer(col("payload"))))
      .withColumnsRenamed(Map("pos" -> "frame_idx", "col" -> "frame"))
  }
}
