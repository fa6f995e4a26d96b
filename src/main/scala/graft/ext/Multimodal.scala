package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star extension): image/audio/video
  * as opaque `BinaryType` columns + a typed metadata struct, with
  * decode / feature-extract / frame-sample stages.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic STUB ([[stubDecode]]) — but everything
  * Spark-side is real and tested: schema, binary packing, batched
  * per-partition processing shape (`mapPartitions` over row batches —
  * the JVM analogue of `mapInPandas` batch processing), and the 1→N
  * frame-sampling generator (`posexplode` over a computed frame index).
  *
  * Scale notes: binary payloads ride normal parquet pages; metadata-only
  * queries never touch the blob column (column pruning); frame sampling
  * fans out via a generator, not a collect.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType),
    StructField("content_md5", StringType),
    StructField("modality", StringType)))

  /** Pack a source column into (binary payload, metadata struct). */
  def pack(df: DataFrame, idCol: String, payload: org.apache.spark.sql.Column,
           modality: String): DataFrame =
    df.select(
      col(idCol).alias("media_id"),
      payload.cast("binary").alias("content"),
      struct(
        length(payload.cast("binary")).cast("long").alias("byte_len"),
        md5(payload.cast("binary")).alias("content_md5"),
        lit(modality).alias("modality")).alias("meta"))

  /** STUB decode kernel: a real codec (JPEG decode, audio PCM, …) is not
    * available in this container. The stub derives a deterministic
    * fixed-width "feature" from the payload bytes so the distributed
    * plumbing (batching, schema, shuffle) is fully exercised. Swap the
    * body for a real codec on a cluster with native libs. */
  def stubDecode(bytes: Array[Byte]): Array[Double] = {
    // ??? <- real codec goes here; deterministic fake below
    val w = 8
    val out = new Array[Double](w)
    var i = 0
    while (i < bytes.length) { out(i % w) += (bytes(i) & 0xFF).toDouble; i += 1 }
    out
  }

  /** Batched feature extraction over the binary column: `mapPartitions`
    * with an explicit batch shape (the `mapInPandas` analogue — one
    * buffer of `batchSize` rows decoded per iteration, amortizing any
    * per-batch codec setup). Output: (media_id, feature array). */
  def extractFeatures(packed: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = packed.sparkSession
    // the id column keeps its INPUT type: pack() accepts any id, and a
    // cast("long") on string ids would null them and NPE in the kernel
    val outSchema = StructType(Seq(
      StructField("media_id", packed.schema("media_id").dataType),
      StructField("feature", ArrayType(DoubleType))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    packed.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // per-batch setup would happen here (codec init, model load)
          batch.iterator.map { r =>
            Row(r.get(0), stubDecode(r.getAs[Array[Byte]](1)).toSeq)
          }
        }
      }(enc)
  }

  /** 1→N frame sampling: every `strideBytes` of payload is one "frame";
    * emits (media_id, frame_idx, frame_md5). Generator-based fan-out —
    * `posexplode` over a computed index sequence, no driver loop. */
  def sampleFrames(packed: DataFrame, strideBytes: Int = 32): DataFrame = {
    val nFrames = greatest(ceil(col("meta.byte_len") / lit(strideBytes.toDouble)), lit(1L))
    packed
      .select(col("media_id"), col("content"),
        posexplode(sequence(lit(0L), nFrames.cast("long") - 1)))
      .withColumnRenamed("col", "frame_idx")
      .select(col("media_id"), col("frame_idx"),
        md5(col("content").substr((col("frame_idx") * strideBytes + 1).cast("int"),
          lit(strideBytes))).alias("frame_md5"))
  }
}
