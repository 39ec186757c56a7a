package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling main: run one named SparkEntry query repeatedly and
  * print per-iteration wall times (first = cold, rest = warm), plus the
  * formatted physical plan on request.
  *
  * Usage: graft.Profile <queryName> [iters] [--explain]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: Profile <query> [iters] [--explain]"))
    val iters = args.drop(1).headOption.filter(_.forall(_.isDigit)).map(_.toInt).getOrElse(3)
    val explain = args.contains("--explain")
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
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.t(spark, sfDir, "lineitem").selectExpr("count(*)").collect()

    val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
    if (explain) fn(spark, sfDir).explain("formatted")
    (1 to iters).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[profile] $name iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
