package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe for the q53_pa_v2 drift (VERDICT r6 item 3): time the
  * pipeline's stages separately to attribute the ~2.9 s solo cost.
  * Usage: runMain graft.dev.ProbeQ53 <sfDir>
  */
object ProbeQ53 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.Scratchspace.sparkLocalDir)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String): DataFrame =
      spark.read.parquet(s"$dir/$name.parquet")
    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(tag: String)(df: => DataFrame): Unit = {
      // warm once, then min of 3
      force(df)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); force(df); (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $tag%-28s ${ts.min}%.3f s (${ts.mkString(", ")})")
    }

    val sample = t("orders").select(col("o_orderkey").as("sample_id"),
      concat(lit("S"), col("o_orderkey")).as("identifier"))
    val pa = t("lineitem").select(col("l_orderkey").as("sample_id"),
      (col("l_partkey") % 20).as("target_id"),
      (col("l_quantity") > 25).as("present"),
      concat(lit("""{"device":"dev"""), col("l_suppkey") % 4,
        lit("\"}")).as("details"))
    val target = spark.range(0, 20).select(col("id").as("target_id"),
      concat(lit("T"), col("id")).as("identifier"),
      (col("id") < 3).as("control"), (col("id") % 10).as("organism_id"))
    val organism = spark.range(0, 10).select(col("id").as("organism_id"),
      concat(lit("virus."),
        when(col("id") % 2 === 0, "influenza").otherwise("rsv"),
        lit(".type"), col("id")).as("lineage"))

    timed("scan lineitem only")(t("lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity"))
    timed("pa projection")(pa)
    timed("scan orders only")(t("orders").select("o_orderkey"))
    timed("sample projection")(sample)
    timed("pa + orders join")(pa.join(sample, "sample_id"))
    timed("+ target bcast")(pa.join(sample, "sample_id")
      .join(broadcast(target.filter(!col("control"))
        .select(col("target_id"), col("identifier").as("target"),
          col("organism_id"))), "target_id"))
    timed("full view")(graft.shipping.Views.presenceAbsenceResultV2(
      sample, pa, target, organism))
    val noJson = pa.join(sample, "sample_id")
      .join(broadcast(target.filter(!col("control"))
        .select(col("target_id"), col("identifier").as("target"),
          col("organism_id"))), "target_id")
      .join(broadcast(organism.select(col("organism_id"), col("lineage"))),
        Seq("organism_id"), "left")
      .select("identifier", "target", "present", "lineage")
    timed("full minus get_json")(noJson)
    val base = pa.join(sample, "sample_id")
      .join(broadcast(target.filter(!col("control"))
        .select(col("target_id"), col("identifier").as("target"),
          col("organism_id"))), "target_id")
      .join(broadcast(organism.select(col("organism_id"), col("lineage"))),
        Seq("organism_id"), "left")
    timed("device via from_json")(base
      .withColumn("device",
        from_json(col("details"),
          org.apache.spark.sql.types.StructType.fromDDL("device STRING"))
          .getField("device"))
      .select("identifier", "target", "present", "lineage", "device"))
    timed("device via json_tuple")(base
      .select(col("identifier"), col("target"), col("present"),
        col("lineage"), json_tuple(col("details"), "device").as("device")))
    timed("device via variant_get")(base
      .withColumn("device",
        variant_get(parse_json(col("details")), "$.device", "string"))
      .select("identifier", "target", "present", "lineage", "device"))
    spark.stop()
  }
}
