package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal binary-column plumbing (SURVEY.md §2 #40): image/audio/
  * video payloads travel as opaque `binary` columns with a typed
  * metadata struct; decode/feature-extract runs batched inside
  * `mapPartitions`.
  *
  * The decode itself is a clearly-marked deterministic STUB (no imaging
  * libraries in this container); everything around it — schema, batch
  * shape, partition-local iteration, output encoding — is the real
  * plumbing a production decoder (e.g. JNI libjpeg / ffmpeg frame
  * sampler) would plug into.
  */
object Multimodal {

  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("features", ArrayType(FloatType))))

  /** Attach a binary payload column. In this repo the payload is the
    * UTF-8 bytes of `text` (a deterministic fake "image"); in production
    * this column is read straight from parquet/object storage.
    */
  def withBinaryPayload(docs: DataFrame, textCol: String = "text",
                        binCol: String = "payload"): DataFrame =
    docs.withColumn(binCol, col(textCol).cast("binary"))

  /** STUB decode of one payload. Deterministic fake standing in for a
    * real image decode: dimensions derived from the byte length, a
    * 4-float feature vector from simple byte statistics.
    */
  private def decodeStub(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    val n = bytes.length
    val width = n % 640 + 1
    val height = n % 480 + 1
    var sum = 0L
    var i = 0
    while (i < n) { sum += bytes(i) & 0xff; i += 1 }
    val mean = if (n == 0) 0f else sum.toFloat / n
    val feat = Array(n.toFloat, mean, (bytes.headOption.getOrElse(0: Byte) & 0xff).toFloat,
      (bytes.lastOption.getOrElse(0: Byte) & 0xff).toFloat)
    (width, height, feat)
  }

  /** Batched decode over partitions: rows are drained in fixed-size
    * batches (the shape a vectorized/JNI decoder wants), each batch is
    * "decoded", results stream out. No partition is ever materialized
    * whole, so executor memory stays bounded regardless of partition
    * size.
    */
  def decodeFeatures(withPayload: DataFrame, batchSize: Int = 64,
                     idCol: String = "doc_id", binCol: String = "payload"): DataFrame = {
    val in = withPayload.select(col(idCol), col(binCol))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(decodedSchema))
    in.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (w, h, feat) = decodeStub(bytes)
          Row(id, bytes.length.toLong, w, h, feat)
        }
      }
    }
  }
}
