package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway plan-audit / profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
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
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val emptyIdent = Seq.empty[(String, String, String)].toDF("barcode", "uuid", "set_name")
    val emptySamples = Seq.empty[(String, String)].toDF("identifier", "collection_identifier")

    time("feed build (to_json)")(noop(SparkEntry.fhirFeed55(spark, dir)))
    scrub()
    time("parseEntries")(noop(FhirEtl.parseEntries(SparkEntry.fhirFeed55(spark, dir))))
    scrub()
    time("classify only") {
      noop(FhirEtl.classify(SparkEntry.fhirFeed55(spark, dir)))
    }
    scrub()
    time("decompose.statuses") {
      noop(FhirEtl.decompose(SparkEntry.fhirFeed55(spark, dir), emptyIdent, emptySamples).statuses)
    }
    scrub()
    time("decompose.encounters") {
      noop(FhirEtl.decompose(SparkEntry.fhirFeed55(spark, dir), emptyIdent, emptySamples).encounters)
    }
    scrub()
    time("q55 full")(noop(SparkEntry.queries("q55_fhir_encounters")(spark, dir)))
    scrub()
    spark.stop()
  }
}
