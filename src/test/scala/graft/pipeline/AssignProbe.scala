package graft.pipeline

/**
 * Driver-side microbench of the IVF corpus-side cell assignment: the
 * boxed functional formulation the operator used to run per row
 * (zip/map/sum over every cell, then a full sort) vs the tight-loop
 * [[Similarity.nearestCosine]] argmax / [[Similarity.topCells]] partial
 * select that replaced it. The corpus-side assign IS the scan at 100x
 * corpus growth, so the per-row constant is the scale-relevant number —
 * sf0.1's 6k embedding rows cannot show it end-to-end (q34 is
 * join-dominated there), which is why this probe measures the per-row
 * kernel directly at representative volume.
 *
 *   sbt "Test/runMain graft.pipeline.AssignProbe 200000"
 */
object AssignProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val dim = 64; val cells = 16; val nProbe = 12
    val rng = new scala.util.Random(42)
    val cents = Array.fill(cells)(Array.fill(dim)(rng.nextGaussian()))
    val vecs = Array.fill(n)(Array.fill(dim)(rng.nextGaussian()))

    // the formulation removed from ivfTopKWithCentroids.cellsUdf
    def boxed(u: Array[Double], take: Int): Seq[Int] =
      cents.indices
        .map(c => (cents(c).zip(u).map { case (a, b) => a * b }.sum, c))
        .sortBy { case (d, c) => (-d, c) }.take(take).map(_._2)

    def time[A](label: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[assign-probe] $label%-28s $sec%7.3f s  (${n / sec / 1e6}%6.2f M rows/s)")
      (r, sec)
    }

    // warm-up both kernels (JIT) before the timed passes
    vecs.take(20000).foreach { v => boxed(v, 1); Similarity.topCells(cents, v, 1) }

    var acc = 0L
    val (_, tBoxed) = time("boxed argmax (old)") {
      vecs.foreach(v => acc += boxed(v, 1).head)
    }
    val (_, tTight) = time("nearestCosine (new)") {
      vecs.foreach(v => acc += Similarity.topCells(cents, v, 1)(0))
    }
    val (_, tBoxedN) = time(s"boxed top-$nProbe (old)") {
      vecs.foreach(v => acc += boxed(v, nProbe).length)
    }
    val (_, tTightN) = time(s"topCells top-$nProbe (new)") {
      vecs.foreach(v => acc += Similarity.topCells(cents, v, nProbe).length)
    }
    // bit-identical selection, sampled
    vecs.take(5000).foreach { v =>
      require(boxed(v, nProbe) == Similarity.topCells(cents, v, nProbe).toSeq,
        "kernels must select identical cells")
    }
    println(f"[assign-probe] speedup argmax ${tBoxed / tTight}%4.1fx, " +
      f"top-$nProbe ${tBoxedN / tTightN}%4.1fx (sink=$acc)")
  }
}
