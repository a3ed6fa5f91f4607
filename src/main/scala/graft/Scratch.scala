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
    val dir = sys.env.getOrElse("SCRATCH_DIR", "/root/testdata/sf0.1")
    val qs = sys.env.getOrElse("SCRATCH_QS",
      "q19_hamming_pairs,q20_jaccard,q22_minhash_pairs,q23_simhash,q52_embed_survivors")
      .split(",")
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def scrub(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    for (q <- qs) { force(SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")); scrub() }
    for (pass <- 1 to 3; q <- qs) {
      val t0 = System.nanoTime()
      force(SparkEntry.queries(q)(spark, dir))
      scrub()
      println(f"===== pass$pass $q%-24s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }
    spark.stop()
  }
}
