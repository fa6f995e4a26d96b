package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the library surface). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = sys.env.getOrElse("PROF_DIR", "/tmp/sfscale/sf1")
    def tm[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $name: ${(System.nanoTime()-t0)/1e9}%.3f s"); r
    }
    val ids = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id")).as[Long]
    def imgs = ids.map(id => (id, graft.ext.Multimodal.syntheticCellBmp(id)))
      .union(ids.filter(_ % 10 == 0)
        .map(id => (id + 1000000L, graft.ext.Multimodal.syntheticCellBmp(id, perturbCell = 0))))
      .toDF("doc_id", "img")
    def sigs = graft.ext.Multimodal.imageHash(
      graft.ext.Multimodal.pack(imgs, "doc_id", col("img"), "image"))
      .select(col("media_id").alias("id"), col("simhash"))
    def pairs = graft.ext.Dedup.simhashPairsFromSigs(sigs, maxHamming = 2)
    imgs.write.mode("overwrite").format("noop").save()
    tm("gen_bmps")(imgs.write.mode("overwrite").format("noop").save())
    sigs.write.mode("overwrite").format("noop").save()
    tm("sigs")(sigs.write.mode("overwrite").format("noop").save())
    pairs.write.mode("overwrite").format("noop").save()
    tm("pairs")(pairs.write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
