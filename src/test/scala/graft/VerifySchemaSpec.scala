package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Driver-hash-safe output-schema contract over the WHOLE declared
 * surface: every `SparkEntry.queries` result may carry only types the
 * correctness gate's canonicalization round-trips exactly — strings,
 * booleans, signed integers, IEEE floating point, dates/timestamps,
 * and arrays/structs/maps thereof.
 *
 * The class this pins: round 13 shipped `kth_min decimal(20,0)` with
 * values ~1.3-1.6e18 (> 2^53) — bit-correct vs the oracle, yet
 * hash-red, because any float64 leg in a per-engine decimal
 * canonicalization is lossy there and lossy DIFFERENTLY per side.
 * DecimalType is therefore banned from declared outputs outright
 * (internal decimal math stays fine — the ban is on what's EMITTED);
 * unsigned-64 magnitudes must be re-emitted as the signed
 * two's-complement BIGINT (the q20 `fingerprint_rk` convention, now
 * also `kth_min` in the KMV family). That value-level convention
 * can't be checked statically; the type-level ban removes the only
 * schema that made it possible to get wrong silently.
 *
 * Cost note: building a frame is analysis-only for lazy builders, but
 * the artifact/streaming rows (q84, q9x gates, refresh families) run
 * their declared lifecycles at construction — so this spec runs them
 * at sf0.001, the smallest fixture.
 */
class VerifySchemaSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .appName("verify-schema-spec")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  /** Exact under the driver's canonicalization (parquet -> pandas /
    * DuckDB -> sorted-value hash): no silent precision change on
    * either engine's path. */
  private def hashSafe(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
        FloatType | DoubleType | StringType | DateType | TimestampType |
        TimestampNTZType | NullType => true
    case ArrayType(et, _)       => hashSafe(et)
    case MapType(kt, vt, _)     => hashSafe(kt) && hashSafe(vt)
    case StructType(fields)     => fields.forall(f => hashSafe(f.dataType))
    case _: DecimalType         => false // the q173 incident class
    case _                      => false // binary, interval, udt, ...
  }

  test("every declared query output carries only hash-round-trip-exact types") {
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val schema =
          try fn(spark, dir).schema
          catch { case e: Throwable =>
            fail(s"$name: frame construction failed: ${e.getMessage}")
          }
        schema.fields.collect {
          case f if !hashSafe(f.dataType) =>
            s"$name.${f.name}: ${f.dataType.sql}"
        }
    }
    assert(violations.isEmpty,
      "driver-hash-unsafe output columns (decimal/binary/...):\n  " +
        violations.mkString("\n  "))
  }
}
