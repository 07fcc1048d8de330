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

  /** Merge count-min counter tables by cell-wise SUM — EXACTLY the
    * counters of the concatenated multisets (the additive complement of
    * [[mergeRegisters]]' max and [[qsketchMerge]]'s count-sum), so the
    * persisted artifact refreshes from a delta shard bit-for-bit equal
    * to full recompute. Insert-only; deletions need a rebuild (or a
    * paired negative-count sketch). */
  def mergeCounters(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("r"), col("bucket"))
      .agg(sum(col("counter")).as("counter"))

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

  // ------------------------------------------- log-bucketed quantile sketch

  /**
   * Sub-bucket bits `s` of the quantile sketch: each power of two splits
   * into `2^(s-1)` buckets, so a quantile estimate's relative error is
   * bounded by `2^-(s-1)` (1/64 at the default s = 7) and the sketch
   * holds at most `2^s + (63 - s) * 2^(s-1)` ≈ 1.9k buckets over the
   * full non-negative Long domain — in practice a few hundred.
   */
  val QSketchSubBits = 7

  /**
   * Log-bucketed quantile-sketch table — the mergeable complement of the
   * exact grouped-quantile histogram ([[Curation.groupedQuantiles]]),
   * whose (group, value) cell shuffle grows with the measure's value
   * DOMAIN. One row per (group, qbucket) with the bucket's occupancy
   * count; bucket boundaries follow the HDR-histogram indexing (Tene,
   * HdrHistogram; the same geometric-bucket idea as DDSketch, Masson et
   * al., VLDB 2019): values below `2^s` map to themselves (exact
   * region), larger values keep their top `s` mantissa bits —
   * `idx = (v >> (bitlen - s)) + (bitlen - s) * 2^(s-1)` — so bucket
   * width is relative, giving the `2^-(s-1)` relative-error bound at a
   * size independent of both row count and value domain.
   *
   * == Why this and not KLL/GK ==
   *
   * KLL's compactors sample, so merge order is visible in the register
   * state (merge(A, B) need not equal sketch(A ∪ B) bit for bit) and a
   * compaction schedule cannot be replayed in ANSI SQL. The log
   * histogram is strictly deterministic: the bucket of a value is a
   * pure integer function of the value (bit length + shifts — no libm
   * log, which the engine's cross-engine contract forbids), counts are
   * exact integers, and the merge is a cell-wise SUM — associative and
   * commutative, so sketch(A ∪ B) EQUALS the merged sketch exactly and
   * incremental refresh is provably identical to full recompute. The
   * price is a relative-error (not rank-error) guarantee — the right
   * trade for the pipeline's measures (lengths, token counts,
   * latencies: non-negative integers spanning decades).
   *
   * Scale shape: one in-scan projection computes the bucket, then one
   * partial-aggregated groupBy — the shuffle carries at most
   * groups × ~1.9k cells no matter the corpus. Values must be
   * non-negative (raise_error otherwise — silently clamping would
   * corrupt the sketch); nulls are excluded like every sketch here.
   */
  def qsketchBuckets(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      subBits: Int = QSketchSubBits): DataFrame = {
    require(subBits >= 2 && subBits <= 30, s"subBits out of range: $subBits")
    val m = 1L << subBits
    val half = 1L << (subBits - 1)
    val guarded = when(col(valueCol).cast("long") < 0L,
        raise_error(concat(lit("qsketch: negative value "),
          col(valueCol).cast("string"))))
      .otherwise(col(valueCol).cast("long"))
    val base = df.where(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ guarded.as("__qv"): _*)
    base.select(groupCols.map(col) :+
        qsketchIndexExpr("__qv", subBits).as("qbucket"): _*)
      .groupBy(groupCols.map(col) :+ col("qbucket"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** The bucket index of a non-negative LONG column (by name) — shared
    * by the batch constructor and the streaming windowed aggregation
    * (q159), which puts this expression directly into a watermarked
    * groupBy key. Pure integer bit algebra; codegen'd builtins only. */
  def qsketchIndexExpr(colName: String, subBits: Int = QSketchSubBits): Column = {
    val m = 1L << subBits
    val half = 1L << (subBits - 1)
    when(col(colName) < m, col(colName)).otherwise(
      expr(s"($colName div shiftleft(cast(1 as bigint), length(bin($colName)) - $subBits))" +
        s" + (length(bin($colName)) - $subBits) * cast($half as bigint)"))
  }

  /**
   * Merge quantile-sketch tables by cell-wise count SUM — EXACTLY the
   * sketch of the concatenation of the sketched multisets (sum is
   * associative and commutative), so stored-artifact + delta-shard
   * merge equals the full recompute bit for bit. Insert-only, like the
   * HLL registers: deletions need a rebuild (or a paired negative-count
   * sketch, which this engine does not maintain).
   */
  def qsketchMerge(
      a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(groupCols.map(col) :+ col("qbucket"): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /**
   * Quantile estimates from a [[qsketchBuckets]] table: for each
   * requested `p`, the smallest bucket whose cumulative count reaches
   * the EXACT rank threshold `ceil(p * n)` (decimal, never IEEE — the
   * [[Curation.groupedQuantiles]] lesson), reported as that bucket's
   * UPPER bound. The bucket mapping is monotone, so the true order
   * statistic lies inside the selected bucket and the estimate is
   * one-sided: `exact <= est` and `(est - exact) * 2^(s-1) <= exact` —
   * an all-integer tolerance contract a cross-engine oracle can pin
   * without a single floating-point operation.
   *
   * Emits one row per group: `(group..., sketch_buckets, <one long
   * column per quantile>)` — `sketch_buckets` declares the artifact's
   * boundedness as data. Cost: one window + one pivot aggregate over
   * the sketch-sized table; the raw data is never touched.
   */
  def qsketchQuantiles(
      sketch: DataFrame, groupCols: Seq[String],
      quantiles: Seq[(String, Double)],
      subBits: Int = QSketchSubBits): DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile")
    val m = 1L << subBits
    val half = 1L << (subBits - 1)
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(col("qbucket"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
    val cum = sketch.select(groupCols.map(col) :+ col("qbucket") :+
      sum(col("cnt")).over(wOrd).as("cc") :+
      sum(col("cnt")).over(wAll).as("n"): _*)
    val aggs = quantiles.map { case (name, p) =>
      val pDec = lit(new java.math.BigDecimal(p.toString))
      min(when(col("cc") >= ceil(col("n") * pDec).cast("long"),
        col("qbucket"))).as(s"__b_$name")
    } :+ count(lit(1)).as("sketch_buckets")
    val picked = cum.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    // bucket -> inclusive upper value bound: exact region returns the
    // value itself; above it, e = idx div 2^(s-1) - 1 recovers the shift
    // and u = idx - e * 2^(s-1) the mantissa, hi = (u << e) + (2^e - 1).
    // NOT `(u + 1) * 2^e - 1`: for the topmost bucket that product is
    // exactly 2^63, which wraps silently in Spark but raises a BIGINT
    // overflow in a DuckDB oracle replay — the split form never exceeds
    // 2^63 - 1 at any reachable bucket.
    val withVals = quantiles.foldLeft(picked) { case (acc, (name, _)) =>
      acc.withColumn(name,
        when(col(s"__b_$name") < m, col(s"__b_$name")).otherwise(
          expr(s"shiftleft(cast(__b_$name - (__b_$name div $half - 1)" +
            s" * $half as bigint), __b_$name div $half - 1)" +
            s" + shiftleft(cast(1 as bigint), __b_$name div $half - 1) - 1")))
        .drop(s"__b_$name")
    }
    withVals.select((groupCols.map(col) :+ col("sketch_buckets")) ++
      quantiles.map(q => col(q._1)): _*)
  }

  // ------------------------------------------------------------ KMV sketch

  /** Synopsis size for [[kmvSketch]]: k = 64 minimum hash values — the
    * union/distinct estimator's standard error is ~1/sqrt(k-2) = 12.7%,
    * and the Jaccard match fraction over the union k-mins has binomial
    * deviation sqrt(j(1-j)/k) <= 6.3%. */
  val KmvK = 64

  /**
   * KMV (k-minimum-values) synopsis of the distinct values of `valueCol`
   * per group — `(group..., kmv array<bigint>)`, the k smallest distinct
   * `rolling_hash` values in unsigned order ([[graft.functions.KmvAgg]]).
   *
   * The set-operation sketch: unlike the HLL register table (q120),
   * which only max-merges into UNION cardinalities, the KMV synopsis is
   * an order-preserving sample of the hashed universe, so two synopses
   * estimate their sets' INTERSECTION as well (Beyer et al., SIGMOD
   * 2007) — the train/eval-overlap, cross-source-contamination shape
   * where inclusion-exclusion over HLL estimates drowns in compounded
   * error.
   *
   * Scale shape: one scan generating the values in-scan, ONE
   * partial-aggregated shuffle whose payload is at most k longs per
   * group (the aggregate merges k-min sets map-side) — never a distinct
   * shuffle of the raw universe. Deterministic: the synopsis is a pure
   * function of the value SET, bit-identical at any parallelism.
   */
  def kmvSketch(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int = KmvK): DataFrame =
    df.where(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(graft.functions.Kmv.kmv_minhash(
        RollingHash.rolling_hash(col(valueCol)), k).as("kmv"))

  /**
   * Fold a DELTA of raw values into a stored [[kmvSketch]] synopsis
   * table — the sketch-family artifact lifecycle (the q129/q148/q157
   * convention): k-min is associative/commutative over value sets, so
   * `k-min(stored-synopsis hashes ∪ delta hashes)` EQUALS the synopsis
   * of the union corpus bit for bit (the k smallest of a union all
   * survive into one of the operand k-min sets). Insert-only, like
   * every synopsis here: deletions need a rebuild.
   *
   * Work: the stored side explodes k rows per group (synopsis-sized,
   * never corpus-sized); only the delta is hashed.
   */
  def kmvRefresh(
      stored: DataFrame, delta: DataFrame, groupCols: Seq[String],
      valueCol: String, k: Int = KmvK): DataFrame = {
    val storedH = stored.select(
      groupCols.map(col) :+ explode(col("kmv")).as("__h"): _*)
    val deltaH = delta.where(col(valueCol).isNotNull).select(
      groupCols.map(col) :+
        RollingHash.rolling_hash(col(valueCol)).as("__h"): _*)
    storedH.unionByName(deltaH)
      .groupBy(groupCols.map(col): _*)
      .agg(graft.functions.Kmv.kmv_minhash(col("__h"), k).as("kmv"))
  }

  /** Merge two [[kmvSketch]] synopsis TABLES group-wise — k-min over
    * the union of the stored k-min sets, which equals the synopsis of
    * the concatenated corpora exactly (associative + commutative, so
    * batch boundaries and arrival order cannot matter). Synopsis-sized
    * work: both sides explode at most k rows per group. */
  def kmvMergeTables(
      a: DataFrame, b: DataFrame, groupCols: Seq[String],
      k: Int = KmvK): DataFrame =
    a.unionByName(b)
      .select(groupCols.map(col) :+ explode(col("kmv")).as("__h"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(graft.functions.Kmv.kmv_minhash(col("__h"), k).as("kmv"))

  /** Signed-64 hash array -> unsigned decimal(20,0) array: the hash
    * domain is [0, 2^64); decimals order naturally and cast to double
    * CORRECTLY ROUNDED in both engines (Spark Decimal.toDouble and
    * DuckDB HUGEINT::DOUBLE), which a two-step long->double+2^64 bump
    * would not (double rounding). */
  private def unsignedDec(c: Column): Column =
    transform(c, x => when(x >= 0, x.cast("decimal(20,0)"))
      .otherwise((x.cast("decimal(20,0)") +
        lit(new java.math.BigDecimal("18446744073709551616")))
        .cast("decimal(20,0)")))

  /** 2^64 as an (exactly representable) double — the unsigned hash
    * domain size, denominator of the KMV estimator. */
  private val TwoPow64d = 1.8446744073709552e19

  /**
   * Set-operation estimates from a PAIR of [[kmvSketch]] synopses.
   * Input: one row per pair with `kmv_a`, `kmv_b` (array<bigint>).
   * Emits per pair:
   *
   *  - `n_mins`: size of the union synopsis (k, or the exact distinct
   *    union when both sets were smaller than k — then every estimate
   *    below is exact);
   *  - `kth_min`: largest kept hash, emitted as the signed
   *    two's-complement BIGINT reinterpretation of the unsigned value
   *    (the q20 `fingerprint_rk` convention — a decimal(20,0) output
   *    here would be bit-correct but exceeds 2^53, where float64 legs
   *    in downstream canonicalization become lossy; the unsigned
   *    decimal stays internal for ordering and the double chain);
   *  - `union_est`: `(k-1) * (2^64 / kth)` — the classic KMV distinct
   *    estimator applied to the union synopsis, which is computable
   *    from the two synopses alone (k-min of a union = k-min of the
   *    union of the k-min sets);
   *  - `jacc_est`: fraction of the union k-mins present in BOTH input
   *    synopses (each such hash is a uniform sample of the union that
   *    landed in the intersection);
   *  - `inter_est`: `jacc_est * union_est`.
   *
   * Every derived number is either an exact integer or a PINNED chain
   * of IEEE steps over exactly-converted integers, so a SQL oracle
   * ranking the same hashes reproduces each column bit for bit.
   */
  def kmvSetOps(pairs: DataFrame, k: Int = KmvK): DataFrame = {
    val withU = pairs
      .withColumn("__ua", unsignedDec(col("kmv_a")))
      .withColumn("__ub", unsignedDec(col("kmv_b")))
      .withColumn("__u",
        slice(array_sort(array_distinct(concat(col("__ua"), col("__ub")))), 1, k))
      .withColumn("n_mins", size(col("__u")).cast("long"))
      .withColumn("__kth", element_at(col("__u"), size(col("__u"))))
      .withColumn("kth_min",
        when(col("__kth") >=
            lit(new java.math.BigDecimal("9223372036854775808")),
          (col("__kth") -
            lit(new java.math.BigDecimal("18446744073709551616")))
            .cast("long"))
          .otherwise(col("__kth").cast("long")))
      .withColumn("__matches",
        size(filter(col("__u"), v =>
          array_contains(col("__ua"), v) && array_contains(col("__ub"), v)))
          .cast("long"))
    withU
      .withColumn("union_est",
        when(col("n_mins") < k, col("n_mins").cast("double"))
          .otherwise(lit((k - 1).toDouble) *
            (lit(TwoPow64d) / col("__kth").cast("double"))))
      .withColumn("jacc_est",
        col("__matches").cast("double") / col("n_mins").cast("double"))
      .withColumn("inter_est", col("jacc_est") * col("union_est"))
      .drop("__ua", "__ub", "__u", "__kth", "__matches")
  }
}
