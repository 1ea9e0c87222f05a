package graft.pipelines

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for a training-data pipeline: image/audio/video
  * payloads as opaque BINARY columns with typed metadata, processed per
  * partition in batches (the Scala analogue of `mapInPandas` batch UDFs).
  *
  * The actual media decode is STUBBED (this container has no image/audio
  * libraries): `decodeStub` derives deterministic pseudo-features from the
  * bytes. Everything around it — schema, batch shape, partitioning, the
  * mapPartitions seam where a real decoder (JNI/ONNX/javacv) would slot in —
  * is real and tested.
  */
object Multimodal {

  /** Typed metadata carried beside the opaque payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),  // image|audio|video
    StructField("payload", BinaryType, nullable = false),   // opaque encoded bytes
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("format", StringType, nullable = true))), nullable = false)))

  /** Build a synthetic media table from `documents` (payload = utf-8 bytes) —
    * exercises the binary-column path with deterministic content. */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      (when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video")).as("modality"),
      col("text").cast(BinaryType).as("payload"),
      struct(
        (col("doc_id") % 640 + 64).cast(IntegerType).as("width"),
        (col("doc_id") % 480 + 48).cast(IntegerType).as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") * 10).as("duration_ms"),
        lit("synthetic").as("format")).as("meta"))

  /** ??? in spirit — the deterministic stand-in for a real decoder. Features:
    * payload length, simple byte statistics, and an 8-dim byte-histogram
    * "embedding". A real implementation would decode pixels/samples here. */
  private def decodeStub(payload: Array[Byte]): (Long, Double, Array[Float]) = {
    val n = payload.length.toLong
    var sum = 0L
    val hist = new Array[Long](8)
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      sum += b
      hist(b >>> 5) += 1
      i += 1
    }
    val mean = if (n == 0) 0.0 else sum.toDouble / n
    val emb = hist.map(h => if (n == 0) 0f else (h.toDouble / n).toFloat)
    (n, mean, emb)
  }

  private val featSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("byte_mean", DoubleType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Batched per-partition feature extraction — the mapPartitions seam.
    * One decoder init per partition (not per row), rows streamed through it:
    * exactly the batch shape a Pandas-UDF/ONNX runtime wants. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "modality", "payload").rdd.mapPartitions { it =>
      // real impl: val decoder = Decoder.open() once per partition
      it.map { r =>
        val (n, mean, emb) = decodeStub(r.getAs[Array[Byte]]("payload"))
        Row(r.getLong(0), r.getString(1), n, mean, emb.toSeq)
      }
    }
    spark.createDataFrame(rdd, featSchema)
  }

  /** "Resize"/frame-sample stub: truncate payload to maxBytes — stands in for
    * image resize / audio frame sampling; pure column expression (codegen). */
  def samplePayload(media: DataFrame, maxBytes: Int): DataFrame =
    media.withColumn("payload",
      expr(s"substring(payload, 1, $maxBytes)").cast(BinaryType))

  /** Partitioning for 100TB media tables: bucket by media_id so joins against
    * per-media features co-locate, and keep payloads out of shuffles by
    * projecting them away before any wide operation. */
  def featureJoin(media: DataFrame, features: DataFrame): DataFrame =
    media.drop("payload").join(features.drop("modality"), Seq("media_id"))
}
