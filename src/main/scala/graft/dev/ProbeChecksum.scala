package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev main: stage-attribution for the q172 table-checksum chain —
  * times scan+concat, +md5, +substring, +conv, and the full bit_xor
  * aggregate separately so the per-row cost lands on the right
  * expression. Usage: runMain graft.dev.ProbeChecksum <sfDir>
  */
object ProbeChecksum {
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
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_returnflag", "l_linestatus")
    def cat(salt: String) = concat_ws("|",
      (lit(salt) +: cols.map(c => col(c).cast("string"))): _*)
    def t(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[probe] $name pass$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    t("scan+concat")(li.select(length(cat("")).as("x")).agg(sum("x")))
    t("+md5")(li.select(md5(cat("")).as("x")).agg(count("x")))
    t("+substr")(li.select(substring(md5(cat("")), 1, 15).as("x")).agg(count("x")))
    t("+conv")(li.select(conv(substring(md5(cat("")), 1, 15), 16, 10).as("x")).agg(count("x")))
    t("+cast+xor")(li.agg(bit_xor(conv(substring(md5(cat("")), 1, 15), 16, 10).cast("long"))))
    t("full q172")(graft.operators.Profile.tableChecksum(li, cols))
    spark.stop()
  }
}
