package graft

import org.apache.spark.sql.SparkSession

/** Throwaway plan-audit / profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q11_filter", "q2_star_join", "q26_pa_v1", "q8_range_bin",
        "q22_minhash_pairs")) {
      val df = SparkEntry.queries(q)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      println(s"===== $q")
      println("  PushedFilters: " +
        plan.linesIterator.filter(_.contains("PushedFilters: [")).take(2)
          .map(_.trim.take(120)).mkString(" | "))
      println("  joins: " + Seq("BroadcastHashJoin", "SortMergeJoin",
        "BroadcastNestedLoopJoin", "ShuffledHashJoin")
        .map(j => s"$j=" + plan.linesIterator.count(_.contains(j))).mkString(" "))
      println("  codegen spans: " + plan.linesIterator.count(_.contains("WholeStageCodegen")))
    }
    spark.stop()
  }
}
