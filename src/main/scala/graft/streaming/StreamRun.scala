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
    // SPARK_GRAFT_STATE_PARTITIONS: A/B knob matching the provider's —
    // overrides every declared row's pinned count for one measured run
    val n = sys.env.get("SPARK_GRAFT_STATE_PARTITIONS")
      .map(_.toInt).getOrElse(statePartitions)
    val keys = Map(
      "spark.sql.shuffle.partitions" -> n.toString,
      "spark.sql.streaming.stateStore.providerClass" -> stateStoreProvider)
    val prev = keys.keys.map(k => k -> spark.conf.getOption(k)).toMap
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** State-store provider for the declared streaming rows, overridable
    * for A/B runs via `SPARK_GRAFT_STATE_PROVIDER` (`hdfs` | `rocksdb` |
    * a fully-qualified class). Default: RocksDB — three-way A/B-measured
    * on the executed rows at sf0.1 (BENCH_NOTES round 10): it beat the
    * HDFS-backed in-memory provider on EVERY stateful row (six-row
    * family 14.2 s → 12.2 s; q95 stream-stream join 4.3 → 4.1, q96
    * dedup 1.5 → 1.2), and unlike that provider it does not hold state
    * on-heap, so the same configuration survives multi-GB per-partition
    * state (deep join/dedup horizons) instead of OOMing — the scale
    * answer AND the measured local winner. Per-partition store lifecycle
    * still dominates at bounded state volume under BOTH providers
    * (rocksdb at 8/16/32 partitions: 7.0/9.0/13.7 s on the 3-row
    * subset), so the withStatePartitions sizing stays. Results are
    * provider-invariant — same oracle hashes both ways, A/B-verified. */
  private[graft] def stateStoreProvider: String =
    sys.env.getOrElse("SPARK_GRAFT_STATE_PROVIDER", "rocksdb") match {
      case "hdfs" =>
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
      case "rocksdb" =>
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
      case fqcn => fqcn
    }
}
