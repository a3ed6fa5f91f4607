package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe: where does driver-side build time go for q60? */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", Scratchspace.sparkLocalDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $l%-28s ${(System.nanoTime() - t0) / 1e6}%8.1fms"); r
    }
    // locate the q60 feed parquet in the scratch cache
    val feedDir = new java.io.File(s"${Scratchspace.root}/graft_feeds")
      .listFiles().filter(_.getName.startsWith("q60_")).head
    println(s"feed: $feedDir")
    for (round <- 1 to 3) {
      println(s"--- round $round")
      val feed = time("read feed")(spark.read.parquet(feedDir.getPath))
      val o = time("orders o")(spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey").as("k")))
      val idents = time("idents")(o.select(concat(lit("EBC"), col("k")).as("barcode"),
        concat(lit("eu-"), col("k")).as("uuid"),
        when(col("k") % 8 === 0, "samples").otherwise("collections-kiosks")
          .as("set_name"))
        .filter(col("k") % 19 =!= 0))
      val delta = time("decompose")(graft.etl.Feeds.Enrollments.decompose(feed, idents))
      val joined = time("join chain")(delta.statuses
        .join(delta.encounters.select(col("id"), col("identifier"),
            date_format(col("encountered"), "yyyy-MM-dd HH:mm:ss").as("encountered"),
            col("individual_identifier"), col("sex"), col("site_identifier"),
            col("age"), col("language")),
          Seq("id"), "left")
        .join(delta.sampleUpdates.select(
            col("encounter_identifier").as("identifier"),
            col("collection_identifier")),
          Seq("identifier"), "left"))
      val sorted = time("checkpoint+sort")(
        joined.localCheckpoint(false).orderBy("id"))
      time("execute")(sorted.write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    spark.stop()
  }
}
