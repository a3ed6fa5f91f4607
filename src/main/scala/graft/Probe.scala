package graft

import org.apache.spark.sql.SparkSession

/** Throwaway probe for the materializedFeed hash-stability + synthesis cost. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"===== $label%-40s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }

    val f1 = SparkEntry.fhirFeed55(spark, dir)
    val f2 = SparkEntry.fhirFeed55(spark, dir)
    val s1 = f1.queryExecution.logical.canonicalized.toString
    val s2 = f2.queryExecution.logical.canonicalized.toString
    println(s"hash1=${s1.hashCode.toHexString} hash2=${s2.hashCode.toHexString} equal=${s1 == s2}")
    if (s1 != s2) {
      val d = s1.zip(s2).indexWhere { case (a, b) => a != b }
      println(s"first diff at $d:")
      println("  s1: " + s1.slice(math.max(0, d - 60), d + 60).replace('\n', ' '))
      println("  s2: " + s2.slice(math.max(0, d - 60), d + 60).replace('\n', ' '))
    }

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("synth noop (no repartition)")(noop(f1))
    time("synth noop again")(noop(f2))
    time("synth repartition(32) noop")(
      noop(f1.repartition(spark.sparkContext.defaultParallelism)))
    time("synth write parquet repart32")(
      f1.repartition(32).write.mode("overwrite").parquet("/tmp/probe_q55"))
    time("synth write parquet plain")(
      f1.write.mode("overwrite").parquet("/tmp/probe_q55b"))
    spark.stop()
  }
}
