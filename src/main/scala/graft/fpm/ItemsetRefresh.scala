package graft.fpm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Incremental frequent-itemset refresh — the save→load→merge lifecycle
 * the engine's other artifacts follow (HLL/CMS/qsketch registers, dup
 * clusters, boilerplate counts), applied to the flagship FP-growth
 * output, which the reference re-mines from scratch on every run
 * (`reference pfp/FPGrowthCore.scala:49-65` has no refresh path).
 *
 * Design: FUP-style candidate refresh (Cheung et al. 1996, "Maintenance
 * of Discovered Association Rules in Large Databases"), NOT group
 * re-mining — support counts are ADDITIVE (`count_union = count_old +
 * count_delta`), so an artifact mined from the old snapshot at the
 * REDUCED absolute threshold
 *
 *   `minCount_probe = max(1, minCount_union - |delta|)`
 *
 * provably contains every itemset that can be union-frequent: an
 * itemset absent from it has `count_old < minCount_union - |delta|`,
 * and the delta can add at most `|delta|` occurrences. The refresh then
 * (1) counts each artifact candidate's EXACT support in the delta alone
 * (one bounded subset enumeration over the added transactions — no
 * re-mining, no old-corpus rescan) and (2) sums and re-thresholds.
 * The result is bit-equal to a full re-mine at `minCount_union` —
 * which is exactly what the q170 oracle states by mining the union
 * corpus directly (same statement as q03).
 *
 * FULL-RE-MINE TRIGGER, part of the contract (require, not prose): the
 * delta path is sound only while `|delta| < minCount_union`. A delta
 * that large is not an increment — itemsets frequent in the delta alone
 * could enter the frequent family without ever appearing in the
 * artifact. Callers hitting the require re-mine from scratch (and
 * SHOULD also re-mine, efficiency-wise, well before that point: the
 * probe threshold — and with it the artifact size — degrades as the
 * delta grows; re-snapshot when `|delta|` reaches a fixed fraction of
 * `minCount_union`).
 *
 * Arity is capped at 3 throughout — the family's oracle-exactness cap
 * (q03/q04/q168); the subset enumeration below is hard-wired to it.
 *
 * Scale shape: the artifact build is one FP-growth run over the OLD
 * snapshot (paid once per snapshot, amortized across refreshes); each
 * refresh touches only `|delta|` transactions — the enumeration
 * explodes at most `m + C(m,2) + C(m,3)` subset rows per added
 * transaction over the candidate item universe `m = |F-list at
 * minCount_probe|` (candidate-filtered BEFORE enumeration), partial-
 * aggregated into delta counts, then one equi-join against the
 * artifact. No stage scales with the old corpus.
 */
object ItemsetRefresh {

  /**
   * Exact support counts, in `added` alone, of every itemset of arity
   * <= 3 over `candidateItems` — `(itemset, freq_delta)` with the
   * canonical sorted comma-joined key (transactions arrive as SORTED
   * DISTINCT item arrays, the basket contract, so in-order enumeration
   * with strict `>` item comparisons emits each subset exactly once,
   * already canonical).
   */
  def deltaCounts(
      added: DataFrame, itemsCol: String,
      candidateItems: Seq[String]): DataFrame = {
    val f = added.select(
      filter(col(itemsCol), x => x.isInCollection(candidateItems)).as("fi"))
    val singles = f.select(explode(col("fi")).as("itemset"))
    val pairBase = f.select(explode(col("fi")).as("i1"), col("fi"))
      .select(col("i1"),
        explode(filter(col("fi"), x => x > col("i1"))).as("i2"), col("fi"))
    val pairs = pairBase.select(concat_ws(",", col("i1"), col("i2")).as("itemset"))
    val triples = pairBase
      .select(col("i1"), col("i2"),
        explode(filter(col("fi"), x => x > col("i2"))).as("i3"))
      .select(concat_ws(",", col("i1"), col("i2"), col("i3")).as("itemset"))
    singles.unionByName(pairs).unionByName(triples)
      .groupBy(col("itemset")).agg(count(lit(1)).as("freq_delta"))
  }

  /**
   * Fold a delta's exact candidate counts into a PROBE-threshold
   * artifact `(itemset, freq)` WITHOUT re-thresholding — the streaming
   * building block: because counts are additive and the candidate set
   * (the artifact's arity-1 rows) is left intact, the fold is
   * associative over delta batches — `fold(fold(A, d1), d2) ==
   * fold(A, d1 ++ d2)` row for row — so a q135-style read-merge-swap
   * stream maintains the artifact batch by batch and thresholds ONCE
   * at read time. Re-thresholding mid-stream would be UNSOUND: it
   * drops probe-only candidates that later batches still need.
   *
   * `nAddedCumulative` is the TOTAL delta transaction count folded so
   * far including this batch — the soundness require (see the object
   * scaladoc: the candidate bound holds only while the whole folded
   * delta stays under `minCount_union`) lives here so no per-batch
   * caller can skip it.
   */
  def fold(
      stored: DataFrame, added: DataFrame, itemsCol: String,
      minCountUnion: Long, nAddedCumulative: Long): DataFrame = {
    // a 0-transaction delta adds nothing and is sound at ANY threshold
    require(nAddedCumulative == 0 || nAddedCumulative < minCountUnion,
      s"cumulative delta of $nAddedCumulative transactions >= " +
        s"minCount_union $minCountUnion: the candidate bound no longer " +
        "holds — re-mine from scratch (see ItemsetRefresh scaladoc)")
    val candidateItems = stored
      .where(!col("itemset").contains(","))
      .select(col("itemset")).collect().map(_.getString(0)).toSeq
    stored.join(deltaCounts(added, itemsCol, candidateItems),
        Seq("itemset"), "left")
      .select(col("itemset"),
        (col("freq") + coalesce(col("freq_delta"), lit(0L))).as("freq"))
  }

  /**
   * Fold a delta into a loaded probe artifact `(itemset, freq)` and
   * re-threshold at the union's minCount. `nAdded` is the delta
   * transaction count — the soundness require lives in [[fold]] so no
   * caller can skip it.
   */
  def refresh(
      stored: DataFrame, added: DataFrame, itemsCol: String,
      minCountUnion: Long, nAdded: Long): DataFrame =
    fold(stored, added, itemsCol, minCountUnion, nAdded)
      .where(col("freq") >= minCountUnion)

  /**
   * SIGNED fold — additions AND deletions in one pass (the FUP2
   * extension, Cheung et al. 1997, "A General Incremental Technique
   * for Maintaining Discovered Association Rules": transactions leave
   * the corpus as well as enter it). Support stays additive with
   * sign: `count_new = count_old + count_added − count_removed`, so
   * the fold is still associative over CDC batches and the streaming
   * read-merge-swap lifecycle carries over unchanged.
   *
   * THE BOUND IS ASYMMETRIC — deletions are free. A union(new)-
   * frequent itemset has `count_new >= minCount_new`, and since
   * `count_removed(p) >= 0`,
   *
   *   `count_old = count_new − count_added(p) + count_removed(p)
   *              >= minCount_new − |added|`
   *
   * — the probe threshold `minCount_new − |addedCumulative|` from the
   * add-only [[fold]] still catches every candidate, with NO term for
   * `|removed|`: removing transactions can only have INFLATED the old
   * count, never hidden a future-frequent itemset from the old-
   * snapshot mine. The require therefore guards the cumulative ADDED
   * count alone; a deletions-only maintenance pass is sound at any
   * threshold. (Note `minCount_new` is the absolute threshold over
   * the NEW corpus size — with net deletions it shrinks, which the
   * caller prices into the probe.)
   *
   * CALLER'S CONTRACT: `removed` is a sub-multiset of the corpus
   * state the artifact currently reflects (you can only delete rows
   * that exist); under it no stored count goes negative. Work per
   * fold: both correction terms are delta-sized candidate-filtered
   * subset enumerations + one artifact-sized equi-join each — no
   * old-corpus rescan, exactly [[fold]]'s shape twice.
   */
  def foldSigned(
      stored: DataFrame, added: DataFrame, removed: DataFrame,
      itemsCol: String, minCountUnion: Long,
      nAddedCumulative: Long): DataFrame = {
    require(nAddedCumulative == 0 || nAddedCumulative < minCountUnion,
      s"cumulative ADDED delta of $nAddedCumulative transactions >= " +
        s"minCount_union $minCountUnion: the candidate bound no longer " +
        "holds — re-mine from scratch (see foldSigned scaladoc; " +
        "deletions carry no bound term)")
    val candidateItems = stored
      .where(!col("itemset").contains(","))
      .select(col("itemset")).collect().map(_.getString(0)).toSeq
    stored
      .join(deltaCounts(added, itemsCol, candidateItems)
        .select(col("itemset"), col("freq_delta").as("__add")),
        Seq("itemset"), "left")
      .join(deltaCounts(removed, itemsCol, candidateItems)
        .select(col("itemset"), col("freq_delta").as("__del")),
        Seq("itemset"), "left")
      .select(col("itemset"),
        (col("freq") + coalesce(col("__add"), lit(0L)) -
          coalesce(col("__del"), lit(0L))).as("freq"))
  }

  /**
   * [[foldSigned]] + re-threshold at the NEW corpus's minCount —
   * the deletion-aware one-shot refresh. Bit-equal to a full re-mine
   * of the new corpus (old − removed + added) at `minCountNew`.
   */
  def refreshCdc(
      stored: DataFrame, added: DataFrame, removed: DataFrame,
      itemsCol: String, minCountNew: Long, nAdded: Long): DataFrame =
    foldSigned(stored, added, removed, itemsCol, minCountNew, nAdded)
      .where(col("freq") >= minCountNew)
}
