package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Throwaway profiling aid (not part of the driver contract): runs the
  * queries named in args once each with a listener that prints per-job
  * wall time, stage task counts, and shuffle volumes — the data needed
  * to attribute a bench regression to a specific stage.
  */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val stageInfo = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobStart.put(j.jobId, System.nanoTime())
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val m = i.taskMetrics
        stageInfo.put(i.stageId,
          f"    stage ${i.stageId}%4d tasks=${i.numTasks}%4d " +
          f"in=${m.inputMetrics.bytesRead / 1e6}%8.1fMB " +
          f"shR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
          f"shW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB " +
          f"cpu=${m.executorCpuTime / 1e9}%7.2fs " +
          f"run=${m.executorRunTime / 1e3}%7.2fs  ${i.name.take(60)}")
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val t = (System.nanoTime() - jobStart.getOrDefault(j.jobId, 0L)) / 1e9
        println(f"  job ${j.jobId}%4d ${t}%7.2fs")
      }
    })

    val byName = graft.queries.Registry.all.map(q => q.name -> q).toMap
    args.foreach { name =>
      val q = byName(name)
      println(s"=== $name warmup ===")
      q.run(spark, sfDir).count()
      Thread.sleep(500)
      println(s"=== $name timed ===")
      val t0 = System.nanoTime()
      q.run(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"=== $name TOTAL $t%.2fs ===")
      stageInfo.asScala.toSeq.sortBy(_._1).foreach(kv => println(kv._2))
      stageInfo.clear()
    }
    spark.stop()
  }
  import scala.jdk.CollectionConverters._
  implicit class MapOps[K, V](m: java.util.concurrent.ConcurrentHashMap[K, V]) {
    def asScala: scala.collection.mutable.Map[K, V] =
      scala.jdk.CollectionConverters.ConcurrentMapHasAsScala(m).asScala
  }
}
