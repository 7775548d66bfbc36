package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Canary for the driver-generated testdata's PHYSICAL schema.
  *
  * Round 8 proved why this matters: the testdata writer changed between
  * rounds (TIMESTAMP(NANOS) → timestamp[us] for `events.ts`) and the
  * hard-coded loader killed 23 registry queries and 5 test suites at once.
  * This spec pins, in ONE named place, every physical-type assumption the
  * engine makes, so the next regeneration fails here first — a readable
  * diagnosis instead of a wall of analysis errors.
  */
class TestdataSchemaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("events loader yields TimestampType ts regardless of physical layout") {
    // Tables.events must adapt: nanos-as-long files get the micros
    // conversion, native timestamp[us] files pass through. Either way the
    // engine-facing type is TimestampType.
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType === TimestampType,
      s"events.ts resolved as ${ev.schema("ts").dataType}; Tables.events must normalize to TimestampType")
    // and the values are sane (2020s epoch range, not mis-scaled by 1000x)
    val r = ev.selectExpr("min(year(ts)) AS lo", "max(year(ts)) AS hi").head()
    assert(r.getInt(0) >= 2000 && r.getInt(1) <= 2100,
      s"events.ts year range [${r.getInt(0)}, ${r.getInt(1)}] implies a unit-scale bug in the loader")
  }

  test("raw events parquet physical types match engine assumptions") {
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val byName = raw.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(Set[DataType](LongType, TimestampType, TimestampNTZType).contains(byName("ts")),
      s"events.ts physical type ${byName("ts")} is none of the three layouts Tables.events handles")
    assert(byName("event_id") === LongType)
    assert(byName("user_id") === LongType)
    assert(byName("event_type") === StringType)
    assert(byName("value") === DoubleType)
    assert(byName("props") === StringType)
  }

  test("star-schema key and payload column types the engine hard-codes") {
    def types(name: String): Map[String, DataType] =
      spark.read.parquet(s"$sf/$name.parquet").schema.fields.map(f => f.name -> f.dataType).toMap

    val li = types("lineitem")
    assert(li("l_orderkey") === LongType)
    assert(li("l_partkey") === LongType)
    assert(li("l_quantity") === DoubleType)
    assert(li("l_extendedprice") === DoubleType)
    assert(Set[DataType](DateType, TimestampType, TimestampNTZType).contains(li("l_shipdate")),
      s"l_shipdate physical type ${li("l_shipdate")} outside the layouts the date queries handle")

    val o = types("orders")
    assert(o("o_orderkey") === LongType)
    assert(o("o_custkey") === LongType)
    assert(o("o_totalprice") === DoubleType)
    assert(Set[DataType](DateType, TimestampType, TimestampNTZType).contains(o("o_orderdate")),
      s"o_orderdate physical type ${o("o_orderdate")} outside the layouts the date queries handle")

    val d = types("documents")
    assert(d("doc_id") === LongType)
    assert(d("text") === StringType)
    assert(d("lang") === StringType)
    assert(d("source") === StringType)

    val e = types("embeddings")
    assert(e("vec_id") === LongType)
    e("embedding") match {
      case ArrayType(FloatType, _) => ()
      case other => fail(s"embeddings.embedding expected array<float>, got $other")
    }
  }
}
