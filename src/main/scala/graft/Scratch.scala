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
    val dir = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"===== $label%-30s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    def scrub(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val names = if (args.nonEmpty) args.toSeq
      else Seq("q55_fhir_encounters", "q56_fhir_pa", "q21_minhash_sig",
        "q22_minhash_pairs", "q68_dedup_clusters")
    for (n <- names) { noop(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")); scrub() }
    for (pass <- 1 to 2; n <- names) {
      time(s"$n p$pass")(noop(SparkEntry.queries(n)(spark, dir)))
      scrub()
    }
    spark.stop()
  }
}
