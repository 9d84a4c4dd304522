package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc query runner: executes the named registry queries against a
  * testdata dir and prints row count + wall time — the fast empirical
  * check between full Verify/oracle runs.
  *
  *   runMain graft.Run [sfDir] query [query ...]
  */
object Run {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(spark, sfDir).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"RUN $n rows=$c%d sec=$s%.2f")
    }
    spark.stop()
  }
}
