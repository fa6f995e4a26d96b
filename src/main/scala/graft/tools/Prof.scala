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
    val dir = sys.env.getOrElse("PROF_DIR", "/tmp/sf1")
    def t(label: String)(f: => Unit): Unit = { val t0=System.nanoTime(); f; println(f"MARKER $label ${(System.nanoTime()-t0)/1e9}%.2f s"); spark.catalog.clearCache(); System.gc() }
    val d = spark.read.parquet(dir + "/documents.parquet").select(col("doc_id"), col("text"))
    val corpus = d.unionByName(d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000).alias("doc_id"),
        concat(col("text"), lit(" zzz near dup suffix")).alias("text")))
    def full = graft.ext.Dedup.ngramJaccardPairs(corpus, "doc_id", "text", n = 3, threshold = 0.5)
    t("full_warm")(full.write.mode("overwrite").format("noop").save())
    t("full")(full.write.mode("overwrite").format("noop").save())
    t("full2")(full.write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
