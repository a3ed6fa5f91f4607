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

    import graft.etl.FhirEtl
    import spark.implicits._
    noop(SparkEntry.queries("q55_fhir_encounters")(spark, "/root/testdata/sf0.001"))
    scrub()
    val feed = SparkEntry.fhirFeed55Materialized(spark, dir)
    time("feed noop")(noop(feed))
    time("parseEntries")(noop(FhirEtl.parseEntries(feed)))
    scrub()
    val emptyIdent = Seq.empty[(String, String, String)].toDF("barcode", "uuid", "set_name")
    val emptySamples = Seq.empty[(String, String)].toDF("identifier", "collection_identifier")
    time("statuses only")(noop(FhirEtl.decompose(feed, emptyIdent, emptySamples).statuses))
    scrub()
    time("encounters only")(noop(FhirEtl.decompose(feed, emptyIdent, emptySamples).encounters))
    scrub()
    time("q55 full")(noop(SparkEntry.queries("q55_fhir_encounters")(spark, dir)))
    scrub()
    time("q55 full2")(noop(SparkEntry.queries("q55_fhir_encounters")(spark, dir)))
    spark.stop()
  }
}
