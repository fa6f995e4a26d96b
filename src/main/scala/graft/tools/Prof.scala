package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

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
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        println(f"STAGE ${si.stageId}%4d tasks=${si.numTasks}%3d run=${m.executorRunTime/1000.0}%7.1fs " +
          f"cpu=${m.executorCpuTime/1e9}%7.1fs gc=${m.jvmGCTime/1000.0}%5.1fs " +
          f"shufW=${m.shuffleWriteMetrics.bytesWritten/1e6}%8.1fMB recs=${m.shuffleWriteMetrics.recordsWritten}%10d  ${si.name.take(60)}")
      }
    })
    val dir = sys.env.getOrElse("PROF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(dir + "/documents.parquet")
    def full = graft.ext.TextAnalysis.bm25TopK(docs,
      docs.filter(col("doc_id") % 97 === 0 && col("doc_id") < 1000000L), "doc_id", "text", k = 10)
    full.write.mode("overwrite").format("noop").save()
    println("==== timed run ====")
    val t0=System.nanoTime()
    full.write.mode("overwrite").format("noop").save()
    println(f"MARKER full ${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
