package graft.pipeline

import graft.functions.RollingHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Mergeable cardinality sketch — a deterministic HyperLogLog (Flajolet
 * et al. 2007) over the engine's cross-engine 64-bit rolling hash.
 * Completes the mergeable-sketch family next to the heavy-hitter
 * (`functions/HeavyHitters`) and grouped-quantile (q52) aggregates: the
 * register table is the sketch ARTIFACT — `max`-mergeable across
 * partitions, corpora, and time, so distinct counts over any union of
 * already-sketched shards combine without touching the raw data again.
 *
 * == Why not `approx_count_distinct` ==
 *
 * Spark's built-in HLL++ is the right call in application code, but its
 * register hashing (xxHash64 of Catalyst's internal binary layout) is
 * not replayable outside the JVM, so a declared row could never be
 * oracle-checked value-for-value. This sketch derives every register
 * from `rolling_hash` — the same Karp-Rabin fold the fingerprint family
 * (q20) already replays in DuckDB — and does all register/harmonic
 * arithmetic in exact integers (DECIMAL sums), leaving exactly three
 * IEEE double operations in a pinned evaluation order for the final
 * estimate. The result is bit-identical at any parallelism and
 * hash-matched cross-engine.
 *
 * == Layout ==
 *
 * m = 256 registers (p = 8 top bits select the bucket); the remaining
 * 56 bits w give the register value `rho = 57 - bitlength(w)` (w = 0,
 * probability 2^-56, degenerates to 56 — both engines state the same
 * rule, see the oracle). Standard error ~ 1.04 / sqrt(256) = 6.5%.
 *
 * == Scale shape ==
 *
 * One corpus scan generating tokens in-scan, then ONE partial-aggregated
 * shuffle down to at most `groups x 256` register rows — max() combines
 * map-side, so the shuffle volume is the register table, not the token
 * stream, and no distinct/dedup shuffle of the raw values ever happens
 * (the entire point of the sketch at 100 TB). The estimate is a second
 * aggregation over the register table itself (sketch-sized, not
 * data-sized).
 */
object Sketches {

  /** Registers per sketch (p = 8 index bits). */
  val NumRegisters = 256

  private val WMask = (1L << 56) - 1
  private val TwoPow57 = java.math.BigDecimal.valueOf(1L << 57)
  /** m^2 * 2^57 = 2^73, exactly representable as a double. */
  private val ScaledM2 = 9444732965739290427392.0

  /**
   * HLL register table for the values of `valueCol` within each group:
   * one row per (group, bucket) with the register value
   * `maxrho` — the sketch itself, `max`-mergeable on (group, bucket).
   * Null values are excluded before hashing — cardinality counts
   * distinct VALUES, and hashing null would mint a phantom register
   * (the null row's bucket/rho) that inflates the nonzero-register
   * mass of every group containing a null.
   */
  def hllRegisters(
      df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    val h = RollingHash.rolling_hash(col(valueCol))
    val nonNull = df.where(col(valueCol).isNotNull)
    val w = h.bitwiseAND(lit(WMask))
    val rho = when(w === 0L, lit(57))
      .otherwise(lit(57) - length(bin(w)))
    nonNull.select(groupCols.map(col) :+
        shiftrightunsigned(h, 56).as("bucket") :+ rho.as("rho"): _*)
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("rho")).as("maxrho"))
  }

  /**
   * Cardinality estimate per group from a [[hllRegisters]] table: the
   * raw HLL estimator `alpha_256 * m^2 / sum(2^-M_j)`, with the
   * harmonic sum carried exactly (every term `2^(57-M)` is an integer,
   * summed as DECIMAL with the `(256 - nonempty) * 2^57` empty-register
   * mass added back) and cast to double once. Emits
   * `(group..., nonzero_registers, harmonic_scaled_d, estimate)`.
   */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String]): DataFrame = {
    val term = expr("cast(shiftleft(cast(1 as bigint), 57 - maxrho) as decimal(38,0))")
    registers.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("nonzero_registers"),
        sum(term).as("present_mass"))
      .select(groupCols.map(col) :+ col("nonzero_registers") :+
        (col("present_mass") +
          (lit(NumRegisters) - col("nonzero_registers")) *
            lit(TwoPow57)).cast("double").as("harmonic_scaled_d"): _*)
      .withColumn("estimate",
        lit(0.7213 / (1.0 + 1.079 / 256.0)) *
          (lit(ScaledM2) / col("harmonic_scaled_d")))
  }

  /** Convenience: registers + estimate in one call. */
  def hllCardinality(
      df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    hllEstimate(hllRegisters(df, groupCols, valueCol), groupCols)

  /** Word n-gram stream per group, generated in-scan (slice+zip, no
    * shuffle): the element universe the dedup family already indexes —
    * the right sketch target, both because its cardinality is the
    * number that sizes a dedup run's inverted index and because
    * multi-word grams are long enough that the Karp-Rabin hash's top
    * (bucket-selecting) bits are thoroughly mixed. Very SHORT elements
    * (1-2 chars) barely wrap the 64-bit fold and pile into low buckets
    * — sketch grams or other long keys, not raw characters. */
  def ngramStream(
      docs: DataFrame, textCol: String, groupCols: Seq[String],
      n: Int = 5): DataFrame = {
    val ws = filter(split(lower(col(textCol)), " "), w => w =!= "")
    docs.select(groupCols.map(col) :+ ws.as("ws"): _*)
      .select(groupCols.map(col) :+
        explode(Signals.sliceNgrams(col("ws"), n)).as("bg"): _*)
      .select(groupCols.map(col) :+
        concat_ws(" ", (0 until n).map(k => col(s"bg.$k")): _*).as("gram"): _*)
  }

  /** Sketch-then-estimate: distinct word-5-gram cardinality per group —
    * the corpus-datasheet entry that sizes shingle inverted indexes. */
  def shingleCardinality(
      docs: DataFrame, textCol: String, groupCols: Seq[String]): DataFrame =
    hllCardinality(ngramStream(docs, textCol, groupCols), groupCols, "gram")

  // ------------------------------------------- register artifact lifecycle

  /** Persist a [[hllRegisters]] table — the sketch ARTIFACT (tiny:
    * <= groups x 256 rows). A recurring ingest stores this next to the
    * snapshot manifest and never rescans history to count distincts. */
  def saveRegisters(registers: DataFrame, path: String): Unit =
    registers.coalesce(1).write.mode("overwrite").parquet(path)

  def loadRegisters(
      spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Merge register tables by register-wise max — EXACTLY the sketch of
    * the union of the sketched multisets (max is associative and
    * commutative), so an incremental refresh (stored registers + a
    * delta shard's registers) equals the full recompute bit for bit.
    * Insert-only, like any HLL: deletions need a rebuild. */
  def mergeRegisters(
      a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("maxrho")).as("maxrho"))

  // ------------------------------------------------------- count-min sketch

  /** Count-min geometry: depth 4 hash rows x width 256 counters.
    * Error: overestimate only, by ~N/256 per row, min-of-4 in practice
    * far less.
    *
    * The four rows are the four low BYTE-FIELDS of one salted rolling
    * hash, not four salted hashes: Karp-Rabin is linear
    * (`h(s||t) = h(s)*B^|t| + h(t)`), so any per-row salt string yields
    * hashes that are AFFINE shifts of each other per length class —
    * two same-length values colliding in one row would collide in
    * every row, and the min degenerates (measured: overshoot the size
    * of a full colliding word's count). Distinct byte-fields of one
    * well-mixed 64-bit hash make a cross-row collision a 32-bit event;
    * the salt prefix guarantees even 1-char values wrap the modulus so
    * all four bytes mix. */
  val CmsDepth = 4
  val CmsWidth = 256

  private def cmsBucket(valueCol: Column, row: Int): Column =
    shiftrightunsigned(
      RollingHash.rolling_hash(concat_ws(":", lit("cms"), valueCol)),
      8 * row).bitwiseAND(lit((CmsWidth - 1).toLong))

  /**
   * Count-min counter table for the VALUES (with multiplicity) of
   * `valueCol`: one row per (hash row, bucket) with the summed counter
   * — the frequency-sketch artifact, `+`-mergeable on (row, bucket)
   * across shards and time (the additive complement of
   * [[hllRegisters]]'s max-merge).
   *
   * Scale shape: the scan emits `CmsDepth` (row, bucket) keys per value
   * occurrence, but the partial aggregation collapses them map-side
   * onto at most `CmsDepth x CmsWidth` = 1024 distinct keys — the
   * shuffle carries the COUNTER TABLE, not the token stream, no matter
   * the corpus size.
   */
  def cmsCounters(df: DataFrame, valueCol: String): DataFrame =
    df.select(explode(array((0 until CmsDepth).map(r =>
        struct(lit(r).as("r"), cmsBucket(col(valueCol), r).as("bucket"))): _*))
        .as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("counter"))

  /**
   * JOIN-CARDINALITY estimate from two [[cmsCounters]] tables over the
   * join key: per hash row, the counter inner product
   * `sum_b cA[r][b] * cB[r][b]` bounds the true equi-join size
   * `sum_k fA(k) * fB(k)` from ABOVE (collisions only add nonnegative
   * cross terms), so `min` over the depth rows is a never-under
   * estimate — the sketch-based join-size oracle a planner consults
   * without touching either table (AMS/CMS inner-product estimation,
   * Alon-Matias-Szegedy / Cormode-Muthukrishnan).
   *
   * One row per hash row plus the min: all exact integer arithmetic
   * over two 1024-entry sketches — the estimate costs nothing at any
   * table size once the sketches exist.
   */
  def cmsJoinSizeEstimate(a: DataFrame, b: DataFrame): DataFrame = {
    // DECIMAL products: counters are table-sized, so ca*cb overflows a
    // long beyond ~3e9 rows — the sketch must survive the tables it
    // summarizes
    val perRow = a.select(col("r"), col("bucket"),
        col("counter").cast("decimal(19,0)").as("ca"))
      .join(b.select(col("r"), col("bucket"),
        col("counter").cast("decimal(19,0)").as("cb")),
        Seq("r", "bucket"))
      .groupBy(col("r"))
      .agg(sum(col("ca") * col("cb")).as("row_estimate"))
    perRow.agg(min(col("row_estimate")).as("est_join_size"))
      .where(col("est_join_size").isNotNull)
  }

  /**
   * Probe a [[cmsCounters]] table: the estimate for each probe value is
   * the MINIMUM of its `CmsDepth` counters — never an underestimate
   * (every counter includes all of the value's own occurrences). The
   * counter table is sketch-sized, so it broadcasts; probing is one
   * broadcast equi-join per hash row over the probe set.
   */
  def cmsEstimate(
      counters: DataFrame, probes: DataFrame, valueCol: String): DataFrame = {
    val withBuckets = (0 until CmsDepth).foldLeft(probes) { (df, r) =>
      df.withColumn(s"__b$r", cmsBucket(col(valueCol), r))
    }
    val joined = (0 until CmsDepth).foldLeft(withBuckets) { (df, r) =>
      df.join(broadcast(counters.where(col("r") === r)
          .select(col("bucket").as(s"__b$r"), col("counter").as(s"__c$r"))),
        Seq(s"__b$r"), "left")
    }
    joined.select(probes.columns.map(col) :+
      least((0 until CmsDepth).map(r => coalesce(col(s"__c$r"), lit(0L))): _*)
        .as("est_count"): _*)
  }
}
