package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Throwaway per-job profiler: runs one registered query and prints
  * each Spark job's duration + description to isolate driver-trip vs
  * execution cost. Not part of the library surface.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    graft.TempRoots.initJvmScratch()
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir", graft.TempRoots.warehouseDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties).flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, desc) =>
          val ms = (System.nanoTime() - t0) / 1e6
          println(f"[job ${je.jobId}%3d] $ms%8.1f ms  $desc")
        }
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted
      ): Unit = {
        val si = sc.stageInfo
        val ms = for { s <- si.submissionTime; e <- si.completionTime } yield e - s
        if (ms.exists(_ > 150))
          println(
            f"  [stage ${si.stageId}%3d] ${ms.get}%6d ms  tasks=${si.numTasks} ${si.name.take(90)}"
          )
      }
    })
    val fn = graft.SparkEntry.queries(name)
    // warm-up rep (plan cache/codegen), then a labeled timed rep
    fn(spark, sfDir).count()
    println("==== warm rep ====")
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
    Thread.sleep(500)
    spark.stop()
  }
}
