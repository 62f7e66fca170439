package graft.tools

import org.apache.spark.sql.SparkSession

/** Driver for operators.Similarity.buildProbe — per-stage walls of
  * the knn-family build chain on any (possibly ScaleStress-inflated)
  * data dir. Usage: runMain graft.tools.KnnBuildProbe [dir]
  */
object KnnBuildProbe {
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
    graft.operators.Similarity.buildProbe(spark, dir)
    spark.stop()
  }
}
