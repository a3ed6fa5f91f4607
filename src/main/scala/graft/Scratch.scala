package graft

import org.apache.spark.sql.SparkSession

/** Throwaway plan-audit / profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", Scratchspace.sparkLocalDir)
      // static conf, must precede session creation: the default 100-entry
      // generated-class cache thrashes across 85 queries x several codegen
      // stages each, re-running janino on every pass
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (sys.env.contains("SPARK_GRAFT_JOBLOG"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          private val starts =
            new java.util.concurrent.ConcurrentHashMap[Int, Long]()
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            starts.put(j.jobId, System.nanoTime())
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val t0 = Option(starts.remove(j.jobId)).getOrElse(0L)
            println(f"  [job ${j.jobId}%3d] ${(System.nanoTime() - t0) / 1e9}%6.2fs")
          }
        })
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q55_fhir_encounters", "q56_fhir_pa", "q57_obs_with_pa",
        "q27_incidence", "q79_cc_chain")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"===== $label%-30s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    def scrub(): Unit = if (!sys.env.contains("SPARK_GRAFT_NOSCRUB")) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      if (!sys.env.contains("SPARK_GRAFT_GCPASS")) System.gc()
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
      names.foreach { n =>
        println(s"########## $n")
        SparkEntry.queries(n)(spark, dir).explain("formatted")
      }
    } else {
      val warm = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
      names.foreach { n =>
        try noop(SparkEntry.queries(n)(spark, warm))
        catch { case e: Throwable => println(s"warm $n failed: $e") }
        scrub()
      }
      for (p <- 1 to 2) {
        for (n <- names) {
          time(s"$n p$p")(noop(SparkEntry.queries(n)(spark, dir)))
          scrub()
        }
        if (sys.env.contains("SPARK_GRAFT_GCPASS")) System.gc()
      }
    }
    spark.stop()
  }
}
