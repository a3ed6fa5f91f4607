package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    // shuffle_hash: both sides are the same sliced frame — identical
    // exchanges are reused, so the slice explode runs once (a broadcast
    // build side would recompute it and is unstable for self-joins)
    a.hint("shuffle_hash").join(b,
        col("a.slice") === col("b.slice") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("a.code").as("code_a"),
        col("b.id").as("id_b"), col("b.code").as("code_b"))
      .distinct() // a pair can share several slices
      .filter(hammingDistanceLte(col("code_a"), col("code_b"), lit(maxDist)))
      .withColumn("dist", hammingDistance(col("code_a"), col("code_b")))
  }

  /** Per-run mint instrumentation, mirroring the reference's only
    * self-reported performance stats (functions/mint_identifiers.sql:40-49
    * raises a notice with count, exec time and retry distribution).
    */
  final case class MintStats(
      requested: Int,
      minted: Int,
      rounds: Int,
      candidatesTried: Long,
      conflictsWithExisting: Long,
      intraBatchRejects: Long,
      execMillis: Long)

  /** M9 — mint n new identifiers for a set (reference
    * functions/mint_identifiers.sql:5-60 loops insert-with-retry under an
    * exclusive table lock; the trigger rejects any candidate within
    * distance < 3 of an existing barcode).
    *
    * Spark shape: generate a candidate batch, drop candidates conflicting
    * with the existing set (slice similarity join), then resolve
    * *intra-batch* conflicts with one distributed anti-join: every
    * conflict edge's higher-seq candidate is rejected (order-free, no
    * driver-side loop). Where the reference's serialized inserts would
    * keep the later member of a conflict CHAIN, this rejects it and the
    * next round re-mints — a bounded amount of extra work on an event
    * that is vanishingly rare among fresh uuids.
    *
    * Candidates derive from UUIDs exactly like the reference
    * (barcode = uuid suffix, barcode-default-from-uuid.sql:7-16). With
    * `seed = Some(s)` candidate uuids are md5-derived from (seed, round,
    * seq) instead of random — bit-for-bit reproducible across engines, so
    * results are oracle-checkable; `None` keeps production `uuid()`.
    *
    * The result stays distributed: an eager localCheckpoint pins the
    * accepted rows on the executors (lineage severed — uuid() candidates
    * must not replay), intermediate caches are dropped before return, and
    * only the MintStats counters ever reach the driver.
    */
  def mint(
      spark: SparkSession,
      existing: DataFrame, // column: code
      n: Int,
      maxDist: Int = 2,
      batchFactor: Int = 2,
      maxRounds: Int = 8,
      seed: Option[Long] = None): DataFrame =
    mintWithStats(spark, existing, n, maxDist, batchFactor, maxRounds, seed)._1

  def mintWithStats(
      spark: SparkSession,
      existing: DataFrame,
      n: Int,
      maxDist: Int = 2,
      batchFactor: Int = 2,
      maxRounds: Int = 8,
      seed: Option[Long] = None): (DataFrame, MintStats) = {
    val t0 = System.currentTimeMillis()
    val cached = scala.collection.mutable.ArrayBuffer[DataFrame]()
    def keep(df: DataFrame): DataFrame = { cached += df.cache(); df }

    def candidateUuid(round: Int): Column = seed match {
      case Some(s) =>
        // uuid-shaped hex from a deterministic digest: 8-4-4-4-12.
        val h = md5(concat_ws("|", lit("mint"), lit(s), lit(round), col("seq")))
        concat_ws("-", substring(h, 1, 8), substring(h, 9, 4),
          substring(h, 13, 4), substring(h, 17, 4), substring(h, 21, 12))
      case None => expr("uuid()")
    }

    var accepted = keep(existing.select(col("code")))
    var out: Option[DataFrame] = None
    var round = 0
    var need = n
    var tried = 0L
    var extConflicts = 0L
    var intraRejects = 0L
    while (need > 0 && round < maxRounds) {
      val batch = keep(spark.range(need.toLong * batchFactor)
        .select(col("id").as("seq"))
        .withColumn("uuid", candidateUuid(round))
        .withColumn("code", barcodeFromUuid(col("uuid"))))
      tried += need.toLong * batchFactor
      // (1) reject vs existing/accepted — slice-prefiltered anti-join
      val candSlices = batch.select(col("seq"), col("code"),
        explode(barcodeSlices(col("code"))).as("slice"))
      val accSlices = accepted.select(col("code").as("acc_code"),
        explode(barcodeSlices(col("code"))).as("slice"))
      val conflictsExisting = candSlices.join(accSlices, "slice")
        .filter(hammingDistanceLte(col("code"), col("acc_code"), lit(maxDist)))
        .select("seq").distinct()
      val clean = batch.join(conflictsExisting, Seq("seq"), "left_anti")
      // (2) intra-batch conflicts, resolved DISTRIBUTIVELY with the
      // order-free conservative rule: a candidate loses when ANY lower-seq
      // candidate conflicts with it (every edge's max side is rejected —
      // one anti-join, no driver-side materialization). This rejects at
      // most one extra candidate vs the reference's sequential greedy when
      // conflicts chain (a<b<c with edges (a,b),(b,c): greedy keeps c);
      // the loop's next round re-mints the difference, and conflict chains
      // among a fresh uuid batch are vanishingly rare. Same rule as the
      // q34 oracle's `intra` CTE.
      val intraRejected = keep(similarityJoin(
          clean.select(col("seq").as("id"), col("code")), maxDist)
        .select(col("id_b").as("seq")).distinct())
      intraRejects += intraRejected.count() // cached: the anti-join below reuses it
      val survivors = clean.join(intraRejected, Seq("seq"), "left_anti")
      val take = keep(survivors.orderBy("seq").limit(need)
        .select(col("uuid"), col("code")))
      out = Some(out.map(_.unionByName(take)).getOrElse(take))
      val got = take.count().toInt
      extConflicts += need.toLong * batchFactor - got // approx: batch minus accepted
      need -= got
      accepted = keep(accepted.unionByName(take.select("code")))
      round += 1
    }
    // Return the result DISTRIBUTED: an eager localCheckpoint materializes
    // the accepted (uuid, code) rows as executor blocks and severs lineage
    // (mandatory — with seed=None the uuid() candidates are
    // non-deterministic, so a lineage replay would re-mint different
    // codes), after which every intermediate cache can be dropped. Only
    // MintStats live on the driver; a 100M-identifier mint never leaves
    // the cluster.
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("uuid", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("code", org.apache.spark.sql.types.StringType)))
    val result = out.map(_.localCheckpoint(true)).getOrElse(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
    cached.foreach(_.unpersist(blocking = false))
    (result, MintStats(n, n - need, round, tried, extConflicts, intraRejects,
      System.currentTimeMillis() - t0))
  }
}
