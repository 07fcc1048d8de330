package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL registration + semantics of the native expressions. */
class FunctionsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .appName("functions-spec")
      .getOrCreate()
    GraftFunctions.register(s)
    s
  }

  test("rolling_hash callable from SQL") {
    import spark.implicits._
    val got = spark.sql("SELECT rolling_hash('hello world') AS h").as[Long].head()
    assert(got == RollingHash.hashString("hello world"))
  }

  test("array_dot and array_cosine callable from SQL, float arrays accepted") {
    import spark.implicits._
    val (d, c) = spark.sql(
      """SELECT array_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
        |       array_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c""".stripMargin)
      .as[(Double, Double)].head()
    assert(d == 11.0)
    assert(math.abs(c - 1.0) < 1e-15)
  }

  test("extensions class registers the same functions") {
    val s2 = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .appName("functions-ext-spec")
      .getOrCreate()
    // newSession shares the extension-injected registry
    assert(s2.sql("SELECT rolling_hash('x')").head().getLong(0) ==
      RollingHash.hashString("x"))
  }
}
