package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway plan-audit / profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    import graft.etl.FhirEtl
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"===== $label%-30s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    def scrub(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
      import scala.jdk.CollectionConverters._
      val pools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      val report = pools.filter(p => p.getName.contains("CodeHeap") ||
          p.getName.contains("Metaspace") || p.getName.contains("Old"))
        .map(p => f"${p.getName}=${p.getUsage.getUsed / 1024 / 1024}%dM")
        .mkString(" ")
      println(s"POOLS $report")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm
    noop(SparkEntry.queries("q56_fhir_pa")(spark, "/root/testdata/sf0.001"))
    scrub()

    for (pass <- 1 to 2) {
      time(s"q27 p$pass")(noop(SparkEntry.queries("q27_incidence")(spark, dir)))
      scrub()
      time(s"q57 p$pass")(noop(SparkEntry.queries("q57_obs_with_pa")(spark, dir)))
      scrub()
      time(s"q61 p$pass")(noop(SparkEntry.queries("q61_samplify")(spark, dir)))
      scrub()
    }
    spark.stop()
  }
}
