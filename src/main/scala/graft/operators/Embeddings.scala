package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column operators for training-data pipelines: quantized
  * pooling and clustering whose arithmetic is EXACT (integer sums,
  * IEEE-correctly-rounded single divisions), so results are bit-identical
  * across engines, partitionings and retries — float accumulation order
  * is the classic source of non-reproducible corpus builds (a sum over a
  * reshuffled partition changes the last ulp, which flips an argmin, which
  * moves a document to another cluster on the next run).
  *
  * Everything is relational (posexplode → groupBy on (key, dim)) rather
  * than array-HOF math: per-dim rows get map-side partial aggregation and
  * whole-stage codegen, and nothing ever collects a vector to the driver.
  */
object Embeddings {

  /** Quantize a float vector onto an integer grid: floor(x · scale).
    * float→double widening is exact and floor/multiply are correctly
    * rounded, so any engine produces the same longs.
    */
  def quantize(vec: Column, scale: Int): Column =
    transform(vec, x => floor(x.cast("double") * scale).cast("long"))

  /** Per-group mean-pooled vector, exact: integer sums per dimension, one
    * correctly-rounded division at the end. Output is row-per-dimension
    * (`group, dim, mean`) — the shape that aggregates map-side and never
    * builds a giant array in the agg buffer.
    */
  def meanPool(
      df: DataFrame, groupCol: String, vecCol: String,
      scale: Int = 1000000): DataFrame =
    df.select(col(groupCol),
        posexplode(quantize(col(vecCol), scale)).as(Seq("dim", "q")))
      .groupBy(groupCol, "dim")
      .agg(sum("q").as("_s"), count(lit(1)).as("_n"))
      .select(col(groupCol), col("dim"),
        (col("_s").cast("double") / col("_n") / scale).as("mean"))

  /** K-means cell assignment over quantized vectors — the IVF training
    * step ([[SimilaritySearch.ivfTopK]] consumes the resulting cells).
    * Lloyd's algorithm with deterministic seeding (the k smallest ids)
    * and EXACT integer distance comparisons: centroids are kept as
    * (sum-vector s, member count n) and the squared distance to the mean
    * s/n is compared via the integer form Σ(n·x − s)² / n² — numerator
    * and n² are exact longs well under 2^53, so the one double division
    * is correctly rounded and the argmin is engine- and
    * partitioning-independent. Ties break on the lower cell id.
    *
    * Plan shape per iteration: broadcast the (cell, dim, s, n) centroid
    * table (k·D rows), join the (id, dim, x) fact on dim, one
    * map-side-combining groupBy (id, cell) for scores, one groupBy (id)
    * argmin, one groupBy (cell, dim) for the update — the standard N·D·k
    * k-means cost as three shuffles of narrow integer rows; vectors never
    * move after the initial explode.
    *
    * @param scale quantization grid; with |x| ≤ ~30 and corpora to ~10^6
    *              rows per cell the integer score stays < 2^53
    */
  def kmeansAssignQuantized(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, scale: Int = 100): DataFrame = {
    // Assignment is a broadcast scan of the k centroid ARRAYS per row —
    // N·k codegen int-dot evaluations — never the (dim-join → N·k·d
    // rows → re-aggregate) form, which is d× more exchange rows and
    // measured 10-min-timeout vs seconds at the 100× run once k
    // sqrt-scales. Distances stay exact integers via the expansion
    //   Σ_d (n·x_d − s_d)² = n²·(x·x) − 2n·(x·s) + (s·s)
    // (centroids ride as rational component sums s/n), and the score
    // double num/n² is the SAME division as before, so assignments are
    // bit-identical to the historical form and the DuckDB oracle.
    val rows = df
      .select(col(idCol).as("id"), quantize(col(vecCol), scale).as("_q"))
      .withColumn("_xx", graft.functions.int8Dot(col("_q"), col("_q")))
      .localCheckpoint(false) // consumed once per iteration
    var cents = rows.filter(col("id") < k)
      .select(col("id").as("cell"), col("_q").as("_s"), lit(1L).as("_n"))
    var assign: DataFrame = null
    for (_ <- 1 to iters) {
      // the shared broadcast-scan argmin kernel
      // (SimilaritySearch.assignNearest), scored with the exact-integer
      // distance expansion — arithmetic verbatim from the historical
      // form, so assignments stay bit-identical to the DuckDB oracle
      val num = col("_n") * col("_n") * col("_xx") -
        lit(2L) * col("_n") * graft.functions.int8Dot(col("_q"), col("_s")) +
        col("_ss")
      assign = SimilaritySearch.assignNearest(rows,
        cents.withColumn("_ss",
          graft.functions.int8Dot(col("_s"), col("_s"))),
        "id", "cell",
        num.cast("double") / (col("_n") * col("_n")),
        minimize = true, carry = Seq.empty)
        .select(col("id"), col("cell"))
      // centroid update: one narrow posexplode + k·d-sized partial agg,
      // component sums rebuilt into arrays in dimension order
      cents = rows.join(assign, Seq("id"))
        .select(col("cell"), posexplode(col("_q")).as(Seq("_dim", "_x")))
        .groupBy("cell", "_dim")
        .agg(sum(col("_x")).as("_sd"), count(lit(1)).as("_nd"))
        .groupBy("cell")
        .agg(transform(
            array_sort(collect_list(struct(col("_dim"), col("_sd")))),
            e => e.getField("_sd")).as("_s"),
          max(col("_nd")).as("_n"))
        .localCheckpoint(false) // truncate the per-iteration lineage
    }
    assign
  }

  /** Sparse random projection (Achlioptas 2003, JL-lemma database-
    * friendly variant with dense ±1 signs): project a `dims`-wide
    * embedding onto `k` deterministic ±1 hyperplanes — the cheap
    * dimensionality reduction applied before clustering / ANN when the
    * source embedding is wider than the index wants. The signs are the
    * SAME md5-derived hyperplane family as
    * [[SimilaritySearch.hyperplaneSignature]] (this is its un-quantized
    * form), so projections are reproducible across engines and runs.
    *
    * The per-component sum is a left-fold chain of correctly-rounded
    * IEEE adds in fixed dim order — written identically in the oracle
    * SQL, so even the double outputs hash-match. Pure per-row codegen
    * arithmetic (no HOF, no shuffle); the plan inherits the input
    * partitioning untouched.
    *
    * Output: id + p0..p{k-1} projection columns (rounded to 6 dp).
    */
  def randomProject(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, dims: Int = 64): DataFrame = {
    require(k >= 1 && dims >= 1, s"k $k / dims $dims must be >= 1")
    val outs = (0 until k).map { j =>
      round((0 until dims).map { i =>
        element_at(col(vecCol), i + 1).cast("double") *
          lit(SimilaritySearch.planeComponent(j, i))
      }.reduce(_ + _), 6).as(s"p$j")
    }
    df.select(col(idCol) +: outs: _*)
  }

  /** Product-quantization code assignment — the PQ compression stored by
    * ANN indexes (IVF-PQ) at corpus scale: the vector splits into
    * contiguous `D / subDim` subspaces and each subvector is
    * k-means-coded independently, so a vector compresses to m small
    * codes (a k^m composite codebook) instead of one k-entry cell id.
    * Same EXACT integer arithmetic, deterministic seeding (the k
    * smallest ids' subvectors) and lower-cell tie-break as
    * [[kmeansAssignQuantized]], with the subspace id carried through
    * every key — training all m codebooks is ONE set of joins and
    * aggregations over the flattened (id, sub, dim, x) rows, not m
    * separate jobs; the plan per iteration is identical to the plain
    * k-means one (broadcast centroids ⋈ facts, three narrow shuffles).
    *
    * Output: id, sub (subspace index), cell (that subspace's code).
    */
  def pqAssignQuantized(
      df: DataFrame, idCol: String, vecCol: String,
      subDim: Int, k: Int, iters: Int, scale: Int = 100): DataFrame = {
    val flat = df
      .select(col(idCol).as("id"),
        posexplode(quantize(col(vecCol), scale)).as(Seq("dim", "x")))
      .withColumn("sub", floor(col("dim") / subDim).cast("long"))
      .localCheckpoint(false) // consumed once per iteration
    var centroids = flat.filter(col("id") < k)
      .select(col("sub"), col("id").as("cell"), col("dim"),
        col("x").as("s"), lit(1L).as("n"))
    var assign: DataFrame = null
    for (_ <- 1 to iters) {
      val d = col("n") * col("x") - col("s") // exact long arithmetic
      val scores = flat
        .join(broadcast(centroids), Seq("dim", "sub"))
        .groupBy("id", "sub", "cell", "n")
        .agg(sum(d * d).as("_num"))
        .select(col("id"), col("sub"), col("cell"),
          (col("_num").cast("double") / (col("n") * col("n"))).as("score"))
      assign = scores.groupBy("id", "sub")
        .agg(min(struct(col("score"), col("cell"))).as("_m"))
        .select(col("id"), col("sub"), col("_m.cell").as("cell"))
      centroids = flat.join(assign, Seq("id", "sub"))
        .groupBy("sub", "cell", "dim")
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .localCheckpoint(false) // truncate the per-iteration lineage
    }
    assign
  }

  /** Symmetric int8 quantization — the vector-index compression step
    * (4× smaller than float32, what IVF/HNSW stores at scale): per
    * vector, `scale = max|x|` and `q_i = floor(x_i · 127 / scale + 0.5)`
    * ∈ [-127, 127]. Both the multiply and divide are single
    * correctly-rounded IEEE ops over identical inputs, so the quantized
    * codes are bit-identical on every engine — no round() tie-mode
    * differences (floor(+0.5) pins half-up everywhere). Zero vectors
    * quantize to the empty code with scale 0. Pure per-row map: one
    * projection, nothing shuffles.
    *
    * Output: idCol, scale (double), q (comma-joined int codes — the
    * string form hashes identically across engines, as q35/q21 do).
    */
  def quantizeInt8(
      df: DataFrame, idCol: String, vecCol: String): DataFrame =
    quantizeInt8Codes(df, idCol, vecCol)
      .select(col(idCol), col("scale"),
        array_join(transform(col("codes"), _.cast("string")), ",").as("q"))

  /** Array form of [[quantizeInt8]] for composition (e.g. the coarse
    * integer-dot stage of a quantized search): idCol, scale, codes
    * (array<long>; empty for zero vectors).
    */
  def quantizeInt8Codes(
      df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val scaled = df.select(col(idCol),
      array_max(transform(col(vecCol), x => abs(x.cast("double"))))
        .as("_scale"),
      col(vecCol).as("_v"))
    scaled.select(col(idCol), col("_scale").as("scale"),
      when(col("_scale") === 0d, array().cast("array<bigint>"))
        .otherwise(transform(col("_v"), x =>
          floor(x.cast("double") * 127d / col("_scale") + lit(0.5d))
            .cast("long")))
        .as("codes"))
  }

  /** Embedding-space outlier scores: each row's squared Euclidean
    * distance to its GROUP's mean-pooled centroid — the curation signal
    * for mislabeled / off-distribution documents inside a source or
    * cluster. Same exactness discipline as [[kmeansAssignQuantized]]:
    * the centroid is kept as (integer sum s, count n) per dimension and
    * the distance to s/n is the integer form Σ(n·q − s)² / (n·scale)²
    * — the numerator accumulates in decimal(38,0) (exact; per-dim
    * square ≤ (2·n·scale)², far past long at corpus counts) and the one
    * double division is correctly rounded, so scores are bit-identical
    * on any engine and partitioning. Plan: posexplode → (group, dim)
    * partial agg → broadcast the (groups·dims)-row centroid table back
    * onto the fact → one map-side-combining groupBy (id). Vectors never
    * shuffle; the only corpus-sized exchange is the narrow (id, group)
    * score aggregation.
    *
    * Output: (grp, id, dist2 double) — every row scored; compose with a
    * per-group top-k for the review queue.
    */
  def outlierScores(
      df: DataFrame, idCol: String, groupCol: String, vecCol: String,
      scale: Int = 1000000): DataFrame = {
    val fact = df.select(col(idCol).as("id"), col(groupCol).as("grp"),
      posexplode(quantize(col(vecCol), scale)).as(Seq("dim", "q")))
    val cent = fact.groupBy("grp", "dim")
      .agg(sum("q").as("_s"), count(lit(1)).as("_n"))
    val diff = col("_n").cast("decimal(38,0)") * col("q") - col("_s")
    fact.join(broadcast(cent), Seq("grp", "dim"))
      .withColumn("_d2", (diff * diff).cast("decimal(38,0)"))
      .groupBy("id", "grp")
      .agg(sum(col("_d2")).as("_ss"), max(col("_n")).as("_n"))
      .withColumn("_den",
        (col("_n") * scale).cast("double") * (col("_n") * scale).cast("double"))
      .select(col("grp"), col("id"),
        (col("_ss").cast("double") / col("_den")).as("dist2"))
  }

  /** k-center greedy coreset selection (Gonzalez's 2-approximation) —
    * the diversity-sampling complement to [[Dedup.semanticDedup]]:
    * where SemDeDup removes near-duplicates, k-center PICKS the k most
    * mutually-distant exemplars (curation seed sets, eval-set
    * stratification, labeling-budget allocation).
    *
    * Exactness: vectors ride as [[quantizeInt8Codes]] int8 grids and
    * distances are the integer d² = |a|² + |b|² − 2⟨a,b⟩ (native
    * [[graft.functions.Int8Dot]] codegen kernel), so every argmax is an
    * integer comparison with a vec-id tiebreak — the selected set is
    * bit-identical on any engine or partitioning.
    *
    * Shape: the seed is the minimum id; each of the k−1 rounds updates
    * a running min-distance column against ONE new broadcast-literal
    * center (O(n·dims) narrow map, no shuffle) and takes the argmax via
    * orderBy+limit(1) (TakeOrdered — per-partition heaps). The k
    * per-round scalar collects are centroid-sized, the same pattern as
    * [[SimilaritySearch.ivfTopK]]'s centroid table; rows and vectors
    * never leave the executors otherwise. Lineage grows one map per
    * round, so the frame is checkpointed every 8 rounds for large k.
    *
    * Output: (sel_order 1..k, vec_id, d2 — the selected point's
    * distance to the previously-chosen set; NULL for the seed).
    */
  def kcenterCoreset(
      df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val codes = quantizeInt8Codes(df, idCol, vecCol)
      .select(col(idCol).cast("long").as("id"), col("codes"))
      .withColumn("_self2",
        graft.functions.int8Dot(col("codes"), col("codes")))
      .localCheckpoint(false) // consumed k times (once per round)
    def centerOf(row: org.apache.spark.sql.Row): (Long, Seq[Long], Long) =
      (row.getLong(0), row.getSeq[Long](1), row.getLong(2))
    val seed = centerOf(codes.orderBy("id").limit(1).collect()(0))
    val picked = collection.mutable.ListBuffer(
      (1L, seed._1, Option.empty[Long]))
    def d2To(c: (Long, Seq[Long], Long)): Column =
      col("_self2") + lit(c._3) -
        lit(2L) * graft.functions.int8Dot(col("codes"), typedLit(c._2))
    var frame = codes.filter(col("id") =!= seed._1)
      .withColumn("_md", d2To(seed))
    for (round <- 2 to k) {
      val top = frame.orderBy(col("_md").desc, col("id")).limit(1)
        .select(col("id"), col("codes"), col("_self2"), col("_md"))
        .collect()
      if (top.nonEmpty) {
        val t = top(0)
        val c = (t.getLong(0), t.getSeq[Long](1), t.getLong(2))
        picked += ((round.toLong, c._1, Some(t.getLong(3))))
        frame = frame.filter(col("id") =!= c._1)
          .withColumn("_md", least(col("_md"), d2To(c)))
        if (round % 8 == 0) frame = frame.localCheckpoint(false)
      }
    }
    picked.toSeq.toDF("sel_order", "vec_id", "d2")
  }

  /** Per-group Gram matrix over int8-quantized codes — the Σ x·xᵀ pass
    * that feeds PCA / whitening / linear-probe covariance on an
    * embedding corpus. Quantizing first ([[quantizeInt8Codes]]) makes
    * every accumulation an exact integer sum (products bounded by 127²,
    * sums far under long range at any corpus count), so the matrix is
    * bit-identical on any engine and partitioning — the same discipline
    * as [[kmeansAssignQuantized]].
    *
    * Plan shape: two chained posexplodes fan each vector to its
    * d(d+1)/2 upper-triangle index pairs (codegen'd generators, no
    * interpreted HOF), and ONE map-side-combining groupBy collapses the
    * stream to groups·d² rows — the classic distributed Gram: the
    * matrix, not the corpus, crosses the wire. O(n·d²) work is the
    * Gram lower bound; no pairwise row joins anywhere.
    *
    * Output: (groupCol, i, j, g) for i ≤ j, g = Σ codes[i]·codes[j].
    */
  def gramMatrixInt8(
      df: DataFrame, groupCol: String, vecCol: String): DataFrame = {
    // the id pass-through slot of quantizeInt8Codes carries the group
    // key, so no per-row rejoin is needed to recover it
    val codes = quantizeInt8Codes(
      df.select(col(groupCol), col(vecCol)), groupCol, vecCol)
      .select(col(groupCol), col("codes"))
    // The accumulation runs INSIDE each partition (the one justified
    // mapPartitions shape: a per-partition dense outer-product
    // accumulator): the naive nested posexplode materializes N·D²/2
    // rows through the interpreted generator and hash-aggregates them
    // all (820M rows at the 100× corpus), where the partial-sum rows
    // here number partitions × groups × D²/2 — corpus-size-independent.
    // Arithmetic is unchanged (integer adds, any order), so results are
    // bit-identical to the relational form.
    val gType = codes.schema(groupCol).dataType
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(groupCol, gType),
      org.apache.spark.sql.types.StructField("i", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("j", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("g", org.apache.spark.sql.types.LongType, nullable = false)))
    val partials = codes.mapPartitions { it =>
      // key (group, dim): rows of differing dims (zero-scale vectors
      // are empty) accumulate separately and merge in the final groupBy
      val acc = scala.collection.mutable.HashMap[(Any, Int), Array[Long]]()
      it.foreach { r =>
        val cs = r.getSeq[Long](1)
        val d = cs.length
        if (d > 0) {
          val arr = acc.getOrElseUpdate((r.get(0), d),
            new Array[Long](d * (d + 1) / 2))
          val v = cs.toArray
          var i = 0; var k = 0
          while (i < d) {
            val vi = v(i)
            var j = i
            while (j < d) { arr(k) += vi * v(j); j += 1; k += 1 }
            i += 1
          }
        }
      }
      acc.iterator.flatMap { case ((g, d), arr) =>
        var i = 0; var k = 0
        val out = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
        while (i < d) {
          var j = i
          while (j < d) {
            out += org.apache.spark.sql.Row(g, i.toLong, j.toLong, arr(k))
            j += 1; k += 1
          }
          i += 1
        }
        out.iterator
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    partials.groupBy(col(groupCol), col("i"), col("j"))
      .agg(sum(col("g")).as("g"))
  }
}
