package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q34's mint shape at scale, with the MintStats the gate hides:
  * existing = md5-derived 8-hex codes from `customer` (1.5M at sf10 —
  * PAST the ~670k random-mint saturation estimate), mint n seeded.
  * Prints rounds / candidatesTried / conflict counts / wall — the data
  * for deciding whether slow sf10 minting is retry work (reference
  * semantics) or a plan defect.
  *
  * Usage: dev/run1.sh graft.dev.MintProbe <sfDir> [n=50]
  */
object MintProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val n = if (args.length > 1) args(1).toInt else 50
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.Scratchspace.sparkLocalDir)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.registerAll(spark)
    val existing = spark.read.parquet(s"$dir/customer.parquet")
      .select(substring(md5(col("c_custkey").cast("string")), 1, 8)
        .as("code"))
    val nExisting = existing.count()
    val t0 = System.nanoTime()
    val (minted, stats) = graft.operators.Barcodes.mintWithStats(
      spark, existing, n, seed = Some(42L))
    val got = minted.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"probe":"mint","n_existing":$nExisting,"requested":$n,""" +
      f""""minted":$got,"rounds":${stats.rounds},""" +
      f""""tried":${stats.candidatesTried},""" +
      f""""ext_conflicts":${stats.conflictsWithExisting},""" +
      f""""intra_rejects":${stats.intraBatchRejects},"sec":$sec%.1f}""")
    spark.stop()
  }
}
