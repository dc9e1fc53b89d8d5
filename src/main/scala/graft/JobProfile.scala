package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Measurement tool (guide §1): runs named gates with a SparkListener and
  * prints per-gate job/stage/task counts, summed task time, summed job
  * wall, and the driver gap (wall − Σjob) — the attribution that
  * separates "slow operator" from "many tiny stage-jobs" from
  * "driver-side planning". Not part of the bench contract; same session
  * conf as Bench so the numbers transfer.
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_ONLY (csv of
  * gate names, required), SPARK_GRAFT_PASSES (default 1; pass 2+ rows
  * show the warm shape without cold JIT).
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "1").toInt
    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(names.nonEmpty, "SPARK_GRAFT_ONLY required")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    // SPARK_GRAFT_CONF="k=v;k=v" — A/B a conf hypothesis in isolation
    sys.env.getOrElse("SPARK_GRAFT_CONF", "").split(";").map(_.trim)
      .filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicLong(0L)
    val taskTimeMs = new AtomicLong(0L)
    val jobWallMs = new AtomicLong(0L)
    val jobStartMs = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
    val stageRows = new java.util.concurrent.ConcurrentLinkedQueue[(String, Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); jobStartMs.put(e.jobId, e.time)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val s = jobStartMs.remove(e.jobId)
        if (s != null) jobWallMs.addAndGet(e.time - s.longValue())
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(e.stageInfo.numTasks.toLong)
        taskTimeMs.addAndGet(e.stageInfo.taskMetrics.executorRunTime)
        stageRows.add((e.stageInfo.name.takeWhile(_ != '\n').take(90),
          e.stageInfo.numTasks, e.stageInfo.taskMetrics.executorRunTime))
      }
    })
    def reset(): Unit = { jobs.set(0); stages.set(0); tasks.set(0); taskTimeMs.set(0); jobWallMs.set(0); stageRows.clear() }
    val topStages = sys.env.get("SPARK_GRAFT_TOPSTAGES").map(_.toInt).getOrElse(0)

    // same warmup as Bench
    try {
      Tables.lineitem(spark, sfDir).count()
      Tables.documents(spark, sfDir).count()
      Tables.embeddings(spark, sfDir).count()
      Tables.events(spark, sfDir).count()
    } catch { case _: Throwable => }

    println(f"${"gate"}%-32s pass   wall_s  jobs stages  tasks task_s jobw_s  gap_s")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      (1 to passes).foreach { p =>
        Thread.sleep(300) // let the listener bus drain between gates
        reset()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"$n%-32s $p%4d $wall%8.2f ${jobs.get()}%5d ${stages.get()}%6d ${tasks.get()}%6d ${taskTimeMs.get() / 1e3}%6.1f ${jobWallMs.get() / 1e3}%6.1f ${wall - jobWallMs.get() / 1e3}%6.1f")
        if (topStages > 0) {
          import scala.jdk.CollectionConverters._
          stageRows.asScala.toSeq.sortBy(-_._3).take(topStages).foreach {
            case (nm, nt, ms) => println(f"    ${ms / 1e3}%7.2fs ${nt}%4d tasks  $nm")
          }
        }
        System.gc()
      }
    }
    spark.stop()
  }
}
