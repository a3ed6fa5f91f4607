package graft

import org.apache.spark.sql.SparkSession

/** Dev aid: print plan-reuse facts for ad-hoc audits (not a spec). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val qs = if (args.length > 1) args(1).split(",").toSeq
      else Seq("q97_tfidf_keywords", "q100_negative_pairs",
        "q91_cluster_rep", "q99_quantile_threshold")
    for (q <- qs) {
      val df = SparkEntry.queries(q)(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      println(s"PROBE $q reused=${p.contains("ReusedQueryStage") ||
          p.contains("ReusedExchange")} " +
        s"windows=${"windowspecdefinition".r.findAllIn(p).length} " +
        s"shuffles=${"ShuffleQueryStage".r.findAllIn(p).length}")
    }
    spark.stop()
  }
}
