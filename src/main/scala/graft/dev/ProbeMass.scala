package graft.dev

import org.apache.spark.sql.SparkSession

import graft.operators.{CandidateMassExceededException, Dedup}

/** Dev main: print the exact-containment probe-mass estimate (the q147
  * guard's own number) for a given sf dir — the measurement that sizes
  * a fail-fast budget honestly instead of guessing from runtimes.
  *
  * Usage: runMain graft.dev.ProbeMass <sfDir>
  */
object ProbeMass {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.Scratchspace.sparkLocalDir)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    try {
      Dedup.prefixFilterContainmentPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.5, maxCandidatePairs = Some(1L))
      println(s"""{"dir":"$dir","containment_probe_mass":0}""")
    } catch {
      case e: CandidateMassExceededException =>
        println(s"""{"dir":"$dir","containment_probe_mass":${e.estimated}}""")
    }
    spark.stop()
  }
}
