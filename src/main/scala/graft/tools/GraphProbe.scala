package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** Per-op scheduler-cost probe for the bench's expensive ceremonies:
  * runs each selected registry op twice (cold-in-family, then warm)
  * and prints wall seconds alongside the JOB / STAGE / TASK counts a
  * SparkListener observed — separating "the plan moves data" from
  * "the wall is N sequential scheduler round-trips" (VERDICT r14 #3:
  * the graph ceremonies carry ~15 s of the committed record; this is
  * the instrument that says whether round count, task width, or real
  * work is the irreducible part). Usage:
  *   SPARK_GRAFT_ONLY=g_knn_mst,... runMain graft.tools.GraphProbe [sfDir]
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicLong; val stages = new AtomicLong; val tasks = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks.incrementAndGet()
    })
    spark.range(1000).selectExpr("sum(id)").collect()
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    println(f"${"op"}%-28s ${"t1"}%7s ${"t2"}%7s ${"jobs"}%5s ${"stg"}%5s ${"tasks"}%6s  (counts from pass 2)")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def once(): (Double, Long, Long, Long) = {
        val (j0, s0, t0) = (jobs.get, stages.get, tasks.get)
        val w0 = System.nanoTime()
        try fn(spark, sfDir).count()
        finally graft.ScopedCache.releaseAll()
        // listener bus is async: give it a beat to drain
        Thread.sleep(200L)
        ((System.nanoTime() - w0) / 1e9, jobs.get - j0, stages.get - s0, tasks.get - t0)
      }
      val (t1, _, _, _) = once()
      val (t2, j2, s2, k2) = once()
      println(f"$name%-28s $t1%7.2f $t2%7.2f $j2%5d $s2%5d $k2%6d")
    }
    spark.stop()
  }
}
