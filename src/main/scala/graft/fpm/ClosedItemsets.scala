package graft.fpm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Closed / maximal flags over a frequent-itemset table — the standard
 * post-mining compression (Pasquier et al.'s closed sets; maximal sets as
 * the frontier): an itemset is CLOSED when no proper superset has the
 * same frequency (dropping non-closed sets loses nothing — their support
 * is implied), and MAXIMAL when no proper superset is frequent at all
 * (the smallest summary that still bounds the frequent family). Both are
 * judged WITHIN the given table, so with an arity-capped mining run the
 * flags are relative to that declared universe (the q03 oracle-exactness
 * cap; the reference's PFP — `reference pfp/ParallelFPGrowth.java` — emits
 * the raw frequent family with no closed/maximal compression at all).
 *
 * Scale shape: no pairwise containment join (quadratic in itemset count
 * and a BNL). Instead each itemset ENUMERATES its proper non-empty
 * subsets (bitmask explode — bounded by 2^arity, and mining arities are
 * small by definition) and the superset test becomes one EQUI-join on
 * the subset's canonical comma-key, partial-aggregated to one flag pair
 * per itemset. Mining output is the small side of every stage; the plan
 * stays shuffle-shaped at any output size.
 */
object ClosedItemsets {

  /** Hard arity cap, part of the API contract (not caller prose): the
    * subset enumeration is 2^arity rows per itemset AND the bitmask
    * lives in a 32-bit shiftleft, so arity 31+ would overflow and
    * arity ~25 already explodes to tens of millions of mask rows per
    * itemset. 20 keeps the worst case at ~1M rows per itemset while
    * covering every realistic mining arity (the q03 run caps at 3). */
  val MaxArity = 20

  /**
   * Input: `(itemsCol: array<string>, freqCol: long)` rows, every
   * itemset of arity <= [[MaxArity]] (raise_error beyond — silently
   * flagging garbage would be worse than failing). Output:
   * `(itemset, freq, closed, maximal)` with the canonical sorted
   * comma-joined itemset key.
   */
  def flag(itemsets: DataFrame, itemsCol: String, freqCol: String): DataFrame = {
    val guarded = when(size(col(itemsCol)) > MaxArity,
        raise_error(concat(
          lit(s"ClosedItemsets.flag: itemset arity "),
          size(col(itemsCol)).cast("string"),
          lit(s" exceeds the hard cap $MaxArity (2^arity subset" +
            " enumeration; 32-bit masks)"))))
      .otherwise(array_sort(col(itemsCol)))
    val base = itemsets.select(
      guarded.as("items"), col(freqCol).as("freq"))
    val keyed = base.select(
      array_join(col("items"), ",").as("itemset"), col("items"), col("freq"))
    // every PROPER non-empty subset of every itemset, keyed canonically:
    // masks 1 .. 2^n - 2 (2^n - 1 is the full set); bit i keeps items(i)
    val bit: (Column, Column) => Column = (mask, i) =>
      pmod(call_function("shiftright", mask, i.cast("int")), lit(2)) === 1
    val subs = keyed
      .where(size(col("items")) > 1)
      .select(col("freq").as("sup_freq"), col("items"),
        explode(sequence(lit(1),
          call_function("shiftleft", lit(1), size(col("items"))) - 2))
          .as("mask"))
      .select(col("sup_freq"),
        array_join(filter(col("items"), (x, i) => bit(col("mask"), i)), ",")
          .as("itemset"))
    keyed
      .join(subs, Seq("itemset"), "left_outer")
      .groupBy(col("itemset"), col("freq"))
      .agg(
        sum(when(col("sup_freq").isNotNull, 1L).otherwise(0L))
          .as("__n_sup"),
        sum(when(col("sup_freq") === col("freq"), 1L).otherwise(0L))
          .as("__n_eq"))
      .select(col("itemset"), col("freq"),
        (col("__n_eq") === 0L).as("closed"),
        (col("__n_sup") === 0L).as("maximal"))
  }
}
