package graft.tools

import org.apache.spark.sql.SparkSession

/** Driver for operators.Similarity.crossModalProbe — stage walls of
  * m_cross_modal_dedup from the whole-registry suite's family-boundary
  * state (all caches cleared), on any (possibly ScaleStress-inflated)
  * data dir. Usage: runMain graft.tools.CrossModalProbe [dir]
  */
object CrossModalProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.operators.Similarity.crossModalProbe(spark, dir)
    spark.stop()
  }
}
