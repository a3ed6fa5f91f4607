package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{barcodeSlices, hammingDistance, hammingDistanceLte, barcodeFromUuid}

/** CualID barcode machinery (SURVEY.md §2 J9/C4/C6/M9).
  *
  * The reference enforces pairwise hamming distance ≥ 3 between all
  * barcodes via a trigger (warehouse/identifier/triggers/
  * barcode-distance-check.sql:33-46) and avoids the O(N) pairwise scan
  * with a 2-char slice-array overlap prefilter
  * (dev/doc/01-barcode-slices.md): two 8-char codes within distance < 3
  * must share at least one positioned 2-gram slice (pigeonhole over the 7
  * overlapping slices — ≤2 substitutions can touch at most 4 of them).
  *
  * That prefilter is *exactly* a Spark-friendly similarity-join plan:
  * explode slices → equi-join (shuffle on slice) → hamming only on
  * survivors. At 100 TB of codes this is the difference between a
  * quadratic nested loop and a well-partitioned hash join whose fan-out is
  * bounded by slice selectivity.
  */
object Barcodes {

  /** All pairs (idA < idB) within hamming distance <= maxDist, via the
    * slice-prefilter plan. Sound for 8-char codes with maxDist <= 2.
    */
  def similarityJoin(
      codes: DataFrame, // columns: id (long), code (string)
      maxDist: Int = 2): DataFrame = {
    val sliced = codes.select(
      col("id"), col("code"),
      explode(barcodeSlices(col("code"))).as("slice"))
    val a = sliced.as("a")
    val b = sliced.as("b")
    a.join(b, col("a.slice") === col("b.slice") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("a.code").as("code_a"),
        col("b.id").as("id_b"), col("b.code").as("code_b"))
      .distinct() // a pair can share several slices
      .filter(hammingDistanceLte(col("code_a"), col("code_b"), lit(maxDist)))
      .withColumn("dist", hammingDistance(col("code_a"), col("code_b")))
  }

  /** M9 — mint n new identifiers for a set (reference
    * functions/mint_identifiers.sql:5-60 loops insert-with-retry under an
    * exclusive table lock; the trigger rejects any candidate within
    * distance < 3 of an existing barcode).
    *
    * Spark shape: generate a candidate batch, drop candidates conflicting
    * with the existing set (slice similarity join), then resolve
    * *intra-batch* conflicts: only the conflict edges (rare) are collected
    * to the driver and resolved sequentially in candidate order — exactly
    * the order-dependent accept/reject the reference's serialized inserts
    * produce, without serializing the 99.9% of candidates that never
    * conflict.
    *
    * Candidates derive from UUIDs exactly like the reference
    * (barcode = uuid suffix, barcode-default-from-uuid.sql:7-16).
    */
  def mint(
      spark: SparkSession,
      existing: DataFrame, // column: code
      n: Int,
      maxDist: Int = 2,
      batchFactor: Int = 2,
      maxRounds: Int = 8): DataFrame = {
    var accepted = existing.select(col("code")).cache()
    var out: Option[DataFrame] = None
    var round = 0
    var need = n
    while (need > 0 && round < maxRounds) {
      val batch = spark.range(need.toLong * batchFactor)
        .select(col("id").as("seq"), expr("uuid()").as("uuid"))
        .withColumn("code", barcodeFromUuid(col("uuid")))
        .cache()
      // (1) reject vs existing/accepted — slice-prefiltered anti-join
      val candSlices = batch.select(col("seq"), col("code"),
        explode(barcodeSlices(col("code"))).as("slice"))
      val accSlices = accepted.select(col("code").as("acc_code"),
        explode(barcodeSlices(col("code"))).as("slice"))
      val conflictsExisting = candSlices.join(accSlices, "slice")
        .filter(hammingDistanceLte(col("code"), col("acc_code"), lit(maxDist)))
        .select("seq").distinct()
      val clean = batch.join(conflictsExisting, Seq("seq"), "left_anti")
      // (2) intra-batch conflict edges, resolved in seq order on the driver
      val pairs = similarityJoin(
        clean.select(col("seq").as("id"), col("code")), maxDist)
        .select(col("id_a"), col("id_b"))
        .collect() // conflict edges only — tiny by construction
      val rejected = scala.collection.mutable.Set[Long]()
      pairs.sortBy(r => (r.getLong(0), r.getLong(1))).foreach { r =>
        val (aId, bId) = (r.getLong(0), r.getLong(1))
        if (!rejected.contains(aId)) rejected += bId // later candidate loses
      }
      val survivors =
        if (rejected.isEmpty) clean
        else clean.filter(!col("seq").isin(rejected.toSeq: _*))
      val take = survivors.orderBy("seq").limit(need)
        .select(col("uuid"), col("code"))
      out = Some(out.map(_.unionByName(take)).getOrElse(take))
      val got = take.count().toInt
      need -= got
      accepted = accepted.unionByName(take.select("code")).cache()
      round += 1
    }
    out.getOrElse(spark.emptyDataFrame)
  }
}
