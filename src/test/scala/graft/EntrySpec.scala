package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Test => SCTest}

/** Contract wiring + property-based invariants (SURVEY §5.4). */
class EntrySpec extends SparkSpec {
  lazy val s = spark
  import s.implicits._

  test("every spec name is unique and every oracle belongs to a query") {
    val names = SparkEntry.specs.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("every query analyzes against the testdata (schema resolves)") {
    SparkEntry.specs.foreach { q =>
      val df = q.fn(spark, sf)
      assert(df.schema.fields.nonEmpty, s"${q.name} has empty schema")
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).limit(5).count() > 0)
  }

  test("NO driver-facing output column is a decimal (the round-1 failure class)") {
    // The driver canonicalizes decimals scale-insensitively on one side of
    // its compare, so any decimal output with a trailing zero at its scale
    // hash-fails. Money goes out as BIGINT cents (Tables.cents/tenthCents).
    // Exceptions must be individually proven render-stable:
    //   median_by_nation: DECIMAL(18,1) whose values are exact halves
    //   (x.0 / x.5 from R-7 interpolation over integers) — both render
    //   identically under exact-scale and float-roundtrip rules, verified
    //   against the driver in round 1 and by oracle_check's hazard scan.
    val allowed = Map("median_by_nation" -> Set("median_cents"))
    SparkEntry.specs.foreach { q =>
      val decimals = q.fn(spark, sf).schema.fields.collect {
        case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType] => f.name
      }.toSet
      val illegal = decimals -- allowed.getOrElse(q.name, Set.empty)
      assert(illegal.isEmpty,
        s"${q.name} emits decimal column(s) ${illegal.mkString(", ")} — " +
          "emit integer cents instead (see Tables.scala)")
    }
  }

  test("property: lubridate week stays in [1, 53] and is monotone in yday") {
    val genDay = Gen.choose(1, 366)
    val prop = forAll(genDay) { yd =>
      val w = (yd - 1) / 7 + 1
      w >= 1 && w <= 53
    } && forAll(genDay, genDay) { (a, b) =>
      val (wa, wb) = ((a - 1) / 7 + 1, (b - 1) / 7 + 1)
      (a <= b) == (wa <= wb) || wa == wb || a > b
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }

  test("property: cents/tenthCents are lossless both ways, negatives included") {
    val gen = Gen.listOfN(100, Gen.choose(-100000000000L, 100000000000L))
    val prop = forAll(gen) { cs =>
      val df = cs.map(c => (BigDecimal(c, 2), BigDecimal(c, 4)))
        .toDF("v2", "v4")
      val back = df.select(Tables.cents($"v2").as("c2"),
          Tables.tenthCents($"v4").as("c4"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      back.map(_._1).toSeq == cs && back.map(_._2).toSeq == cs
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(3), prop).passed)
  }

  test("property: union+distinct is idempotent") {
    val gen = Gen.listOfN(50, Gen.choose(0L, 20L))
    val prop = forAll(gen) { xs =>
      val df = xs.toDF("x")
      val once = df.unionByName(df).distinct().orderBy("x")
        .collect().map(_.getLong(0)).toSeq
      once == xs.distinct.sorted
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(5), prop).passed)
  }

  test("property: fact build preserves qualifying-source cardinality") {
    // one output row per qualifying lineitem (SURVEY §5.4)
    val li = Tables.lineitem(spark, sf).filter($"l_quantity" > 0)
    val fact = etl.StarSchema.factSales(spark, sf)
    assert(fact.count() == li.count())
  }
}
