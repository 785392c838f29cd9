package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
object JobProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("jobprobe").getOrCreate()
    functions.GraftFunctions.register(spark)
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.add(s"job ${j.jobId}: stages=${j.stageInfos.size} ${j.stageInfos.map(_.name).mkString(" | ")}")
    })
    val dir = "/root/testdata/sf0.1"
    ops.SimilarityOps.annIvfTrained(spark, dir).collect()
    Thread.sleep(500)
    jobs.forEach(s => println("PROBE " + s))
    spark.stop()
  }
}
