package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev main: stage attribution for q276's winsorized stats at sf0.1
  * (the §12 discipline — which stage owns the wall clock).
  */
object Probe276 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.Scratchspace.sparkLocalDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(
      args.headOption.getOrElse("/root/testdata/sf0.1") + "/lineitem.parquet")
    def t(name: String)(df: => org.apache.spark.sql.DataFrame): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[probe] $name pass$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    val base = li.select(col("l_returnflag").as("_g"),
      (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("_v"))
    t("scan+cast")(base)
    val c = base.filter(col("_v").isNotNull)
      .groupBy("_g", "_v").agg(count(lit(1)).as("_n"))
    t("hist-groupBy")(c)
    val cb = c.withColumn("_b", shiftright(col("_v"), 12))
    val localW = Window.partitionBy("_g", "_b").orderBy("_v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t("hist+localcum")(cb.withColumn("_cl", sum(col("_n")).over(localW)))
    val offs = cb.groupBy("_g", "_b").agg(sum(col("_n")).as("_sb"))
      .withColumn("_off", coalesce(sum(col("_sb")).over(
        Window.partitionBy("_g").orderBy("_b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_tot", sum(col("_sb")).over(Window.partitionBy("_g")))
      .select("_g", "_b", "_off", "_tot")
    t("offsets")(offs)
    val cum = cb.withColumn("_cl", sum(col("_n")).over(localW))
      .join(broadcast(offs), Seq("_g", "_b"))
      .withColumn("_cum", col("_cl") + col("_off"))
    t("cum-joined")(cum)
    t("full")(graft.operators.Profile.winsorizedStats(
      li.select(col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
          .as("price_cents")),
      "l_returnflag", "price_cents", 5))
    spark.stop()
  }
}
