package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the library surface). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t(label: String)(f: => Unit): Unit = { val t0=System.nanoTime(); f; println(f"MARKER $label ${(System.nanoTime()-t0)/1e9}%.2f s") }
    def full = graft.SparkEntry.benchOverrides("dedup_semantic")(spark, dir)
    full.write.mode("overwrite").format("noop").save()
    t("full")(full.write.mode("overwrite").format("noop").save())
    t("full_again")(full.write.mode("overwrite").format("noop").save())
    // phases
    val emb = spark.read.parquet(dir + "/embeddings.parquet")
    val base = emb.select(col("vec_id"), col("embedding").cast("array<double>").alias("embedding"))
    val corpus = base.unionByName(base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).alias("vec_id"),
        transform(col("embedding"), (x, i) => when(i === 0, x + lit(0.1)).otherwise(x)).alias("embedding")))
    t("corpus")(corpus.write.mode("overwrite").format("noop").save())
    val cents = graft.ext.Similarity.centroidDraw(corpus, 16, "vec_id", "embedding", "xxh64")
    t("cents")(cents.write.mode("overwrite").format("noop").save())
    val cells = graft.ext.Similarity.assignToCells(corpus, cents, "vec_id", "embedding", 1)
    t("cells")(cells.write.mode("overwrite").format("noop").save())
    val cells2 = cells.select(col("cell"), col("__rid").alias("id"), col("__rvec").alias("vec"))
    val pairs = graft.ext.Similarity.cellDupPairs(cells2, 0.9, 10000, "drop")
    t("pairs_noorder")(pairs.write.mode("overwrite").format("noop").save())
    t("pairs_order")(pairs.orderBy("a","b").write.mode("overwrite").format("noop").save())
    println("MARKER npairs " + pairs.count())
    spark.stop()
  }
}
