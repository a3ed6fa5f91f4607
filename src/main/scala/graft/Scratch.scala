package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Throwaway profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .repartition(32)

    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }
    def time(name: String)(f: => Unit): Unit = {
      val g0 = gcMs; val t0 = System.nanoTime(); f
      val heap = java.lang.management.ManagementFactory.getMemoryMXBean
        .getHeapMemoryUsage.getUsed / (1 << 20)
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s  gc=${gcMs - g0}ms heap=${heap}MB")
    }

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm
    force(docs.select(col("doc_id")))
    println("warmup all at sf0.001...")
    SparkEntry.queries.foreach { case (_, fn) =>
      try force(fn(spark, "/root/testdata/sf0.001")) catch { case _: Throwable => () }
    }
    for (q <- Seq("q22_minhash_pairs", "q21_minhash_sig", "q22_minhash_pairs", "q21_minhash_sig")) {
      time(q) { force(SparkEntry.queries(q)(spark, "/root/testdata/sf0.1")) }
    }
    spark.stop()
  }
}
