package graft.apps

import graft.fpm.{Apriori, FPGrowth}
import graft.sources.TextTransactions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Runnable entry points mirroring the reference mains
 * (`epfp/EPFP.scala:11-39`, `pfp/PFP.scala:11-42`, `fp/FP.scala:13-36`,
 * `apriori/Apriori.scala:20-48`): read whitespace-tokenized transaction
 * text, fit at (numPartitions, support, confidence), print the fit
 * wall-time, the rules, and the per-transaction predictions.
 *
 * Usage: <trainPath> <testPath> [numPartitions] [support] [confidence]
 */
object Apps {

  case class Result(fitMillis: Long, rules: Seq[String], predictions: Seq[String])

  private[apps] def session(name: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(name)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
  }

  /** Fit + rule/prediction formatting shared by every variant. */
  def run(
      train: DataFrame, test: DataFrame,
      numPartitions: Int, support: Double, confidence: Double,
      balanced: Boolean): Result = {
    val spark = train.sparkSession
    import spark.implicits._
    val t0 = System.currentTimeMillis()
    val model = new FPGrowth()
      .setMinSupport(support).setMinConfidence(confidence)
      .setNumPartitions(numPartitions).setBalanced(balanced)
      .fit(train)
    val fitMillis = System.currentTimeMillis() - t0

    val rules = model.associationRules
      .select($"antecedent", $"consequent", $"confidence", $"lift", $"support")
      .as[(Seq[String], Seq[String], Double, Double, Double)]
      .collect()
      .sortBy { case (a, c, conf, _, _) => (-conf, a.mkString(","), c.mkString(",")) }
      .map { case (a, c, conf, lift, sup) =>
        f"${a.mkString("[", ",", "]")} => ${c.mkString("[", ",", "]")}: " +
          f"confidence=$conf%.4f, lift=$lift%.4f, support=$sup%.4f"
      }.toSeq

    val predictions = model.transform(test)
      .select($"items", $"prediction")
      .as[(Seq[String], String)]
      .collect()
      .sortBy(_._1.mkString(","))
      .map { case (items, pred) => s"${items.mkString("[", ",", "]")} -> [$pred]" }
      .toSeq
    Result(fitMillis, rules, predictions)
  }

  private[apps] def mainImpl(
      name: String, args: Array[String],
      numPartitionsDefault: Int, balanced: Boolean): Unit = {
    require(args.length >= 2, s"usage: $name <train> <test> [parts] [support] [confidence]")
    val spark = session(name)
    spark.sparkContext.setLogLevel("WARN")
    val parts = if (args.length > 2) args(2).toInt else numPartitionsDefault
    val support = if (args.length > 3) args(3).toDouble else 0.3
    val confidence = if (args.length > 4) args(4).toDouble else 0.8
    val r = run(
      TextTransactions.fromText(spark, args(0)),
      TextTransactions.fromText(spark, args(1)),
      parts, support, confidence, balanced)
    println(s"[$name] fit took ${r.fitMillis} ms")
    r.rules.foreach(println)
    r.predictions.foreach(println)
    spark.stop()
  }
}

/** Balanced-group parallel FP-Growth (the reference's flagship variant). */
object EPFP {
  def main(args: Array[String]): Unit = Apps.mainImpl("EPFP", args, -1, balanced = true)
}

/** Hash-grouped parallel FP-Growth. */
object PFP {
  def main(args: Array[String]): Unit = Apps.mainImpl("PFP", args, -1, balanced = false)
}

/** Single-group FP-Growth baseline (reference: PFP with numPartitions=1). */
object FP {
  def main(args: Array[String]): Unit = Apps.mainImpl("FP", args, 1, balanced = false)
}

/** Level-wise Apriori (distributed rewrite; same print surface). */
object AprioriApp {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: AprioriApp <train> [support] [confidence]")
    val spark = Apps.session("Apriori")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val support = if (args.length > 1) args(1).toDouble else 0.3
    val confidence = if (args.length > 2) args(2).toDouble else 0.8
    val t0 = System.currentTimeMillis()
    val rules = new Apriori().setMinSupport(support).setMinConfidence(confidence)
      .rules(TextTransactions.fromText(spark, args(0)))
      .select($"antecedent", $"consequent", $"confidence", $"lift", $"support")
      .as[(String, String, Double, Double, Double)]
      .collect()
      .sortBy { case (a, c, conf, _, _) => (-conf, a, c) }
    println(s"[Apriori] mining took ${System.currentTimeMillis() - t0} ms")
    rules.foreach { case (a, c, conf, lift, sup) =>
      println(f"[$a] => [$c]: confidence=$conf%.4f, lift=$lift%.4f, support=$sup%.4f")
    }
    spark.stop()
  }
}
