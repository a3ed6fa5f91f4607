package graft.dev

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev main (not part of the contract): write `.explain("formatted")`
  * output for the named queries to `<outDir>/<query>_<suffix>.txt` —
  * the plan artifacts the optimization rounds commit under plans/rNN/.
  *
  * Usage: PlanDump <outDir> <suffix> <sfDir> <query> [query...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println(
        "usage: PlanDump <outDir> <suffix> <sfDir> <query> [query...]")
      sys.exit(2)
    }
    val Array(outDir, suffix, sfDir, rest @ _*) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.Scratchspace.sparkLocalDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftExtensions.registerAll(spark)
    Files.createDirectories(Paths.get(outDir))
    rest.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        ExplainMode.fromString("formatted"))
      Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"wrote $outDir/${name}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
