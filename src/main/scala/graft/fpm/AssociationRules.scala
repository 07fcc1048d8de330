package graft.fpm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Association-rule generation from frequent itemsets — single-item
 * consequents, like the reference
 * (`/root/reference/src/main/java/fdu/cst/bigdata/pfp/AssociationRules.scala:60-82`).
 *
 * Where the reference drops to an RDD flatMap + shuffled RDD join keyed by
 * `Seq[Item]`, this is pure DataFrame algebra, so Catalyst plans it:
 *  - candidate generation = `explode(items)` as the consequent +
 *    `array_remove` as the antecedent (no custom generator needed);
 *  - the antecedent-frequency lookup = an equi-join back onto the itemset
 *    table on an `array_sort`-canonicalized array key (SURVEY.md J1: array
 *    join keys must be canonicalized; itemsets arrive in rank order but the
 *    sorted key makes the join order-insensitive by construction);
 *  - the consequent-support lookup for lift = a broadcast join against the
 *    (tiny, minSupport-bounded) L1 item-support table.
 *
 * Output schema matches `pfp/FPGrowth.scala:212-219`:
 * `antecedent array, consequent array, confidence double, lift double,
 * support double`.
 */
object AssociationRules {

  def fromFreqItemsets(
      freqItemsets: DataFrame,
      itemSupport: Map[String, Double],
      numTransactions: Long,
      minConfidence: Double): DataFrame = {
    val spark = freqItemsets.sparkSession
    import spark.implicits._

    val supportDF = broadcast(
      itemSupport.toSeq.toDF("c_item", "c_support"))

    val antecedentFreq = freqItemsets
      .select(array_sort(col("items")).as("ant_key"), col("freq").as("freq_antecedent"))

    freqItemsets
      .where(size(col("items")) > 1)
      .select(col("freq").as("freq_union"), explode(col("items")).as("cons_item"), col("items"))
      .select(
        array_remove(col("items"), col("cons_item")).as("antecedent"),
        col("cons_item"),
        col("freq_union"))
      .join(antecedentFreq, array_sort(col("antecedent")) === col("ant_key"))
      .join(supportDF, col("cons_item") === col("c_item"))
      .select(
        col("antecedent"),
        array(col("cons_item")).as("consequent"),
        (col("freq_union").cast("double") / col("freq_antecedent")).as("confidence"),
        ((col("freq_union").cast("double") / col("freq_antecedent")) / col("c_support"))
          .as("lift"),
        (col("freq_union").cast("double") / lit(numTransactions.toDouble)).as("support"))
      .where(col("confidence") >= minConfidence)
  }

  /**
   * Rule interestingness BEYOND confidence/lift — the measures real
   * rule consumers filter on and the reference stops short of
   * (`reference pfp/AssociationRules.scala:109-114` ends at lift):
   *
   *  - `leverage = support(X∪Y) - support(X)·support(Y)` — the additive
   *    independence gap (Piatetsky-Shapiro), 0 under independence;
   *  - `conviction = (1 - support(Y)) / (1 - confidence)` — the
   *    implication-strength ratio (Brin et al. 1997), NULL for exact
   *    rules (confidence = 1, where the ratio diverges) rather than a
   *    sentinel infinity no oracle can replay.
   *
   * Arithmetic discipline: every numerator/denominator is an EXACT
   * decimal product of support counts (never a pre-rounded fraction),
   * finished by a pinned-order IEEE step — so a DuckDB oracle computing
   * the same expressions hash-matches bit for bit. Counts enter as
   * decimal(18,0) so every product (<= 36 digits) and difference
   * (<= 38) stays inside BOTH engines' 38-digit decimal cap — exact
   * while N < 10^18, i.e. always:
   *   leverage   = double(fu·N - fa·fc) / (double(N) * double(N))
   *   conviction = double((N - fc)·fa) / double(N·(fa - fu))
   *
   * Derivation is pure count algebra on the frequent-itemset table
   * itself: consequent counts come from its arity-1 rows (present for
   * every frequent item by anti-monotonicity), broadcast-joined. The
   * confidence/lift/support columns replicate [[fromFreqItemsets]]'s
   * exact double formulas, so the shared columns agree with q04
   * bit for bit (q04's schema itself is untouched).
   *
   * Output: `antecedent array, consequent array, confidence, lift,
   * support, leverage, conviction`.
   */
  def interestingness(
      freqItemsets: DataFrame,
      numTransactions: Long,
      minConfidence: Double): DataFrame = {
    val n = numTransactions
    val dec = "decimal(18,0)"
    val consFreq = broadcast(freqItemsets
      .where(size(col("items")) === 1)
      .select(col("items").getItem(0).as("c_item"), col("freq").as("freq_cons")))
    val antecedentFreq = freqItemsets
      .select(array_sort(col("items")).as("ant_key"),
        col("freq").as("freq_antecedent"))
    val fu = col("freq_union").cast(dec)
    val fa = col("freq_antecedent").cast(dec)
    val fc = col("freq_cons").cast(dec)
    freqItemsets
      .where(size(col("items")) > 1)
      .select(col("freq").as("freq_union"),
        explode(col("items")).as("cons_item"), col("items"))
      .select(
        array_remove(col("items"), col("cons_item")).as("antecedent"),
        col("cons_item"), col("freq_union"))
      .join(antecedentFreq, array_sort(col("antecedent")) === col("ant_key"))
      .join(consFreq, col("cons_item") === col("c_item"))
      .select(
        col("antecedent"),
        array(col("cons_item")).as("consequent"),
        (col("freq_union").cast("double") / col("freq_antecedent"))
          .as("confidence"),
        ((col("freq_union").cast("double") / col("freq_antecedent")) /
          (col("freq_cons").cast("double") / lit(n.toDouble))).as("lift"),
        (col("freq_union").cast("double") / lit(n.toDouble)).as("support"),
        ((fu * lit(n).cast(dec) - fa * fc).cast("double") /
          (lit(n.toDouble) * lit(n.toDouble))).as("leverage"),
        when(col("freq_antecedent") === col("freq_union"),
          lit(null).cast("double"))
          .otherwise(
            ((lit(n).cast(dec) - fc) * fa).cast("double") /
              (lit(n).cast(dec) * (fa - fu)).cast("double"))
          .as("conviction"))
      .where(col("confidence") >= minConfidence)
  }
}
