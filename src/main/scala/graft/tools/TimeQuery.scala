package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time one registry query N times in a single session — the
  * bench's warm-run shape without the full suite. Usage:
  * `runMain graft.tools.TimeQuery <name> [sfDir] [n]`. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to n) {
      val t0 = System.nanoTime()
      val c = fn(spark, sfDir).count()
      println(f"[timequery] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$c)")
    }
    graft.core.Memo.clearSession(spark)
    spark.stop()
  }
}
