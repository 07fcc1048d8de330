package graft.fpm

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD

import scala.collection.mutable
import scala.reflect.ClassTag

/** `items, freq` — mirrors `pfp/FPGrowthCore.scala:153-154`. */
case class FreqItemset[Item](items: Array[Item], freq: Long)

/**
 * X => y rule with the reference's fields
 * (`pfp/AssociationRules.scala:98-126`).
 */
case class Rule[Item](
    antecedent: Array[Item],
    consequent: Array[Item],
    freqUnion: Double,
    freqAntecedent: Double,
    freqConsequent: Option[Double]) {
  require(antecedent.toSet.intersect(consequent.toSet).isEmpty,
    "antecedent and consequent must be disjoint")
  def confidence: Double = freqUnion / freqAntecedent
  def lift: Option[Double] = freqConsequent.map(confidence / _)
}

/**
 * Generic-Item RDD compatibility layer mirroring the reference core API
 * (`pfp/FPGrowthCore.scala:24-63`:
 * `FPGrowthCore().setMinSupport(..).setNumPartitions(..).run(RDD[Array[Item]])`).
 *
 * The DataFrame path ([[FPGrowth]]) is the engine; this shim exists so a
 * user of the reference's programmatic core can switch without rewriting
 * call sites, including non-String item types. Same mining machinery
 * ([[FPTree]], [[ItemGroups]]), same exactly-once ownership rule.
 */
class FPGrowthCore[Item: ClassTag] private (
    private var minSupport: Double,
    private var numPartitions: Int,
    private var balanced: Boolean) extends Serializable {

  def this() = this(0.3, -1, true)

  def setMinSupport(v: Double): this.type = {
    require(v >= 0.0 && v <= 1.0); minSupport = v; this
  }
  def setNumPartitions(v: Int): this.type = { numPartitions = v; this }
  def setBalanced(v: Boolean): this.type = { balanced = v; this }

  /** (frequent itemsets, item -> support fraction, #transactions). */
  def run(data: RDD[Array[Item]]): (RDD[FreqItemset[Item]], Map[Item, Double], Long) = {
    val sc = data.sparkContext
    val count = data.count()
    val minCount = math.max(1L, math.ceil(minSupport * count).toLong)
    val numParts = if (numPartitions > 0) numPartitions else data.partitions.length

    val freqItems: Array[(Item, Long)] = data
      .flatMap { t =>
        val uniq = t.distinct
        if (uniq.length != t.length) {
          throw new IllegalArgumentException(
            s"Items in a transaction must be unique but got ${t.mkString("[", ",", "]")}")
        }
        uniq.iterator.map(i => (i, 1L))
      }
      .reduceByKey(new HashPartitioner(numParts), _ + _)
      .filter(_._2 >= minCount)
      .collect()
      .sortBy(-_._2)

    val itemSupport = freqItems.iterator
      .map { case (i, c) => i -> c.toDouble / count }.toMap
    val rankOf: Map[Item, Int] = freqItems.iterator.map(_._1).zipWithIndex.toMap
    val groupOf =
      if (balanced) ItemGroups.balanced(numParts, freqItems.length)
      else ItemGroups.hashed(numParts, freqItems.length)
    val bcRank = sc.broadcast(rankOf)
    val bcGroup = sc.broadcast(groupOf)
    val bcItems = sc.broadcast(freqItems.map(_._1))

    val itemsets = data
      .flatMap { txn =>
        val rank = bcRank.value
        val ranks = txn.iterator.flatMap(rank.get).toArray
        java.util.Arrays.sort(ranks)
        val group = bcGroup.value
        val seen = mutable.BitSet.empty
        val out = mutable.ArrayBuffer.empty[(Int, Array[Int])]
        var j = ranks.length - 1
        while (j >= 0) {
          val g = group(ranks(j))
          if (!seen.contains(g)) {
            seen += g
            out += ((g, java.util.Arrays.copyOfRange(ranks, 0, j + 1)))
          }
          j -= 1
        }
        out
      }
      .groupByKey(new HashPartitioner(numParts))
      .flatMap { case (gid, txns) =>
        val tree = new FPTree
        txns.foreach(tree.add(_))
        val group = bcGroup.value
        val dict = bcItems.value
        tree.extract(minCount, r => group(r) == gid).map { case (ranks, f) =>
          FreqItemset(ranks.map(dict), f)
        }
      }
    (itemsets, itemSupport, count)
  }
}

/**
 * Rule runner mirroring `PMAssociationRules().setMinConfidence
 * .run(freqItemsets, itemSupport)` (`pfp/AssociationRules.scala:21-82`):
 * explode each itemset into (antecedent, single consequent) candidates and
 * join back on the antecedent (as a canonical Seq key) for its frequency.
 */
class PMAssociationRules private (private var minConfidence: Double)
    extends Serializable {

  def this() = this(0.8)

  def setMinConfidence(v: Double): this.type = {
    require(v >= 0.0 && v <= 1.0); minConfidence = v; this
  }

  def run[Item: ClassTag](
      freqItemsets: RDD[FreqItemset[Item]],
      itemSupport: Map[Item, Double]): RDD[Rule[Item]] = {
    val sc = freqItemsets.sparkContext
    val bcSupport = sc.broadcast(itemSupport)
    val candidates = freqItemsets.flatMap { fi =>
      fi.items.iterator.map { cons =>
        val ant = fi.items.filterNot(_ == cons)
        (ant.toSeq, (cons, fi.freq))
      }.filter(_._1.nonEmpty)
    }
    val keyed = freqItemsets.map(fi => (fi.items.toSeq, fi.freq))
    val mc = minConfidence
    candidates
      .join(keyed)
      .map { case (ant, ((cons, freqUnion), freqAnt)) =>
        Rule(ant.toArray, Array(cons), freqUnion.toDouble, freqAnt.toDouble,
          bcSupport.value.get(cons))
      }
      .filter(_.confidence >= mc)
  }
}
