package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Warm-cache per-op timing probe (dev tool): runs the named ops IN
  * THE GIVEN ORDER in one session with NO cache clearing between
  * them — the in-suite shape, but with visible per-op wall times, so
  * a family-memo miss shows up as the second consumer paying the
  * build again. Repeats each op `SPARK_GRAFT_PROBE_REPS` times
  * (default 2) to split first-touch cost from steady state.
  *
  * Caveat (matches Bench's own methodology): timing via count() lets
  * Catalyst drop the final global ORDER BY, so probe numbers exclude
  * the output sort — fine for attributing memo misses and planning
  * cost, skewed for ops whose cost concentrates in that sort.
  *
  * Usage: runMain graft.tools.Probe <sfDir> <op> [op...]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    require(names.nonEmpty, "pass at least one op name")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "2").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.ScopedCache.releaseAll()
        dt
      }
      println(f"PROBE $n%-28s ${ts.map(t => f"$t%7.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
