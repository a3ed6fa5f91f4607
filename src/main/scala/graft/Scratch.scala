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
    def build(): org.apache.spark.sql.DataFrame = {
      val feed = SparkEntry.fhirFeed55Materialized(spark, dir)
      val emptyIdent = Seq.empty[(String, String, String)].toDF("barcode", "uuid", "set_name")
      val emptySamples = Seq.empty[(String, String)].toDF("identifier", "collection_identifier")
      val delta = FhirEtl.decompose(feed, emptyIdent, emptySamples)
      delta.statuses
        .join(delta.encounters.select(col("id"), col("identifier"),
            date_format(col("encountered"), "yyyy-MM-dd HH:mm:ss").as("encountered"),
            col("individual_identifier"), col("sex"), col("language"),
            col("site_identifier"), col("age")),
          Seq("id"), "left")
    }
    for (p <- 1 to 2) {
      time(s"ckpt+sort p$p")(noop(build().localCheckpoint(false).orderBy("id"))); scrub()
      time(s"plain sort p$p")(noop(build().orderBy("id"))); scrub()
      time(s"no sort p$p")(noop(build())); scrub()
    }
    spark.stop()
  }
}
