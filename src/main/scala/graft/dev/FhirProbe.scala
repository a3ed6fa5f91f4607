package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage attribution for the FHIR pair q55/q56 (round-10 item: the
  * biggest remaining sf1 walls at 8.9 s / 6.1 s). Times each layer of
  * the decompose pipeline separately — feed scan, bundle parse,
  * statuses-only, each delta branch, full gate query — so the expensive
  * stage is measured, not guessed. One JVM, min-of-2 passes per layer.
  *
  * Usage: dev/run1.sh graft.dev.FhirProbe <sfDir> [passes]
  */
object FhirProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val passes = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.Scratchspace.sparkLocalDir)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.registerAll(spark)

    def time(name: String)(mk: => DataFrame): Unit = {
      val secs = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"probe":"$name","sec":${secs.min}%.3f}""")
    }

    val feed = graft.SparkEntry.fhirFeed55Materialized(spark, dir)
    import spark.implicits._
    val emptyIdent = Seq.empty[(String, String, String)]
      .toDF("barcode", "uuid", "set_name")
    val emptySamples = Seq.empty[(String, String)]
      .toDF("identifier", "collection_identifier")

    time("feed_scan")(feed)
    time("parse_bundles")(graft.etl.FhirEtl.parseBundles(feed))
    time("statuses_only")(graft.etl.FhirEtl.classify(feed))
    // NOTE each decompose call re-parses (fresh lazy checkpoint), so
    // branch times INCLUDE the parse — subtract parse_bundles to read
    // the branch's own cost; q55_full shows the shared-parse benefit.
    time("encounters_branch")(
      graft.etl.FhirEtl.decompose(feed, emptyIdent, emptySamples).encounters)
    time("samples_branch")(
      graft.etl.FhirEtl.decompose(feed, emptyIdent, emptySamples)
        .sampleUpdates)
    time("pa_branch")(
      graft.etl.FhirEtl.decompose(feed, emptyIdent, emptySamples)
        .presenceAbsence)
    time("q55_full")(graft.SparkEntry.queries("q55_fhir_encounters")(spark, dir))

    // q56 stage attribution: parse-only, pa with empty dims (kills the
    // identifier/sample join mass but keeps parse + DR extraction), full
    val (feed56, idents56, samples56) = graft.SparkEntry.fhirQ56Inputs(spark, dir)
    time("q56_parse")(graft.etl.FhirEtl.parseBundles(feed56))
    time("q56_pa_nodims")(
      graft.etl.FhirEtl.decompose(feed56, emptyIdent, emptySamples)
        .presenceAbsence)
    time("q56_full")(graft.SparkEntry.queries("q56_fhir_pa")(spark, dir))
    spark.stop()
  }
}
