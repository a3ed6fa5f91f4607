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

    {
      import graft.shipping.Views
      val enc = spark.read.parquet(dir + "/orders.parquet").select(
        col("o_orderkey").as("encounter_id"), col("o_custkey").as("individual_id"),
        (col("o_custkey") % 25).cast("int").as("site_id"),
        col("o_orderdate").as("encountered"),
        (col("o_orderkey") % 1212).cast("int").as("age_months"),
        to_json(struct(struct(
          when(col("o_orderkey") % 7 === 0, array(lit("true"))).as("FluShot"),
          when(col("o_orderkey") % 3 === 0, array(lit("cough"), lit("fever"))).as("Symptoms"),
          when(col("o_orderkey") % 5 === 0, array(lit("true"))).as("HispanicLatino"))
          .as("responses"))).as("details"))
      time("enc synth only")(noop(enc))
      scrub()
      time("enc + surveyResponses")(noop(
        enc.withColumn("_r", Views.surveyResponses(col("details")))
          .select(col("encounter_id"), col("_r.flu_shot"), col("_r.symptoms"))))
      scrub()
      val site = spark.read.parquet(dir + "/nation.parquet").select(
        col("n_nationkey").as("site_id"), col("n_name").as("identifier"),
        lit("""{"type":"clinic"}""").as("details"))
      val indiv = spark.read.parquet(dir + "/customer.parquet").select(
        col("c_custkey").as("individual_id"), lit("male").as("sex"))
      import graft.operators.DistinctOn
      val sample = DistinctOn(spark.read.parquet(dir + "/lineitem.parquet"),
        Seq("l_orderkey"), Seq(col("l_linenumber").asc))
        .select(col("l_orderkey").as("encounter_id"),
          concat(lit("S"), col("l_orderkey")).as("identifier"))
      time("base joins (no resp, no bins)")(noop(
        enc.drop("details")
          .join(broadcast(site.select(col("site_id"), col("identifier").as("site"))), "site_id")
          .join(indiv, "individual_id")
          .join(sample.withColumnRenamed("identifier", "sample"), Seq("encounter_id"), "left")))
      scrub()
      time("q27 full")(noop(SparkEntry.queries("q27_incidence")(spark, dir)))
      scrub()
      time("q27 full again")(noop(SparkEntry.queries("q27_incidence")(spark, dir)))
      scrub()
    }
    spark.stop()
  }
}
