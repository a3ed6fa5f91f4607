package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-itemset / association-rule mining (the Apriori family) —
  * the market-basket operator class: which items co-occur in the same
  * basket more often than a support floor, and with what confidence and
  * lift. Corpus-curation reads the same shape as co-occurring tags,
  * domains per crawl session, or tokens per document.
  */
object Itemsets {

  /** Frequent pairs with association-rule stats, Apriori-pruned.
    *
    * Plan: (1) distinct (basket, item) — one shuffle; (2) singleton
    * support counts; (3) the Apriori prune: only items that are
    * frequent ALONE can appear in a frequent pair, so infrequent items
    * leave the pipeline before any pair is formed (a semi-join — at
    * corpus scale this is what keeps the within-basket self-join from
    * exploding on long-tail items); (4) within-basket pair generation
    * as a self-equi-join on the basket key (shuffle on basket; fan-out
    * bounded by the pruned basket size, never a cross join); (5) pair
    * support counts, floor-filtered. Rule stats are integer-exact
    * inputs to single correctly-rounded divisions: confidence(a→b) =
    * pairs/supp(a), lift = pairs·N / (supp(a)·supp(b)) with N = total
    * baskets.
    *
    * Output: (item_a < item_b, pair_cnt, cnt_a, cnt_b, conf_ab, lift).
    */
  def frequentPairs(
      df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): DataFrame = {
    // lazy checkpoint: the deduped basket-item frame feeds THREE
    // consumers (singleton counts, the pruned self-join side, the
    // basket total) — unpinned, the corpus-sized distinct shuffle runs
    // once per consumer (measured 3x on q181's 6M-row lineitem input)
    val items = df.select(col(basketCol).as("_bk"), col(itemCol).as("_it"))
      .distinct()
      .localCheckpoint(false)
    val sing = items.groupBy("_it").agg(count(lit(1)).as("_cnt"))
    val freq = sing.filter(col("_cnt") >= minSupport)
    val pruned = items.join(freq.select("_it"), Seq("_it"), "left_semi")
    val pairs = pruned.as("a").hint("shuffle_hash").join(pruned.as("b"),
        col("a._bk") === col("b._bk") && col("a._it") < col("b._it"))
      .groupBy(col("a._it").as("item_a"), col("b._it").as("item_b"))
      .agg(count(lit(1)).as("pair_cnt"))
      .filter(col("pair_cnt") >= minSupport)
    val nBaskets = items.select(countDistinct(col("_bk")).as("_n"))
    pairs
      .join(freq.select(col("_it").as("item_a"), col("_cnt").as("cnt_a")),
        Seq("item_a"))
      .join(freq.select(col("_it").as("item_b"), col("_cnt").as("cnt_b")),
        Seq("item_b"))
      .crossJoin(broadcast(nBaskets)) // 1-row total
      .select(col("item_a"), col("item_b"), col("pair_cnt"),
        col("cnt_a"), col("cnt_b"),
        (col("pair_cnt").cast("double") / col("cnt_a")).as("conf_ab"),
        ((col("pair_cnt") * col("_n")).cast("double") /
          (col("cnt_a") * col("cnt_b"))).as("lift"))
  }
}
