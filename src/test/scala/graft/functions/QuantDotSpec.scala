package graft.functions

import graft.SparkSpec
import graft.llm.Similarity
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.Prop.forAll
import org.scalacheck.{Test => SCTest}

/** The native codegen'd QuantDot must agree exactly with the
  * higher-order-function formulation (which is what the DuckDB oracle
  * mirrors), under codegen AND interpreted eval. */
class QuantDotSpec extends SparkSpec {
  lazy val s = spark
  import s.implicits._

  test("native == HOF on random vectors (property)") {
    val genVec = Gen.listOfN(16, Gen.choose(-2.0f, 2.0f))
    val prop = forAll(genVec, genVec) { (a, b) =>
      val df = Seq((a.toArray, b.toArray)).toDF("a", "b")
        .select(Similarity.quantDot("a", "b").as("native"),
                Similarity.quantDotHof("a", "b").as("hof"))
      val r = df.first()
      r.getLong(0) == r.getLong(1)
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop).passed)
  }

  test("known value, SQL registration, and null semantics") {
    GraftFunctions.register(spark)
    val df = Seq((Array(1.0f, 2.0f, -0.5f), Array(2.0f, 0.5f, 4.0f)))
      .toDF("a", "b")
    assert(df.select(expr("quant_dot(a, b)")).first().getLong(0) == 1000000L)
    // null vector → null
    val withNull = df.select(expr("quant_dot(a, CAST(NULL AS ARRAY<FLOAT>))"))
    assert(withNull.first().isNullAt(0))
    // type error surfaces at analysis
    intercept[Exception] {
      df.select(expr("quant_dot(a, 'oops')")).first()
    }
  }

  test("same result with whole-stage codegen off (interpreted path)") {
    val df = Seq((Array(0.31f, -0.7f), Array(1.5f, 2.25f))).toDF("a", "b")
    val expected = df.select(Similarity.quantDot("a", "b")).first().getLong(0)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = df.select(Similarity.quantDot("a", "b")).first().getLong(0)
      assert(interp == expected)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("ann_topk results unchanged by the native kernel") {
    val native = Similarity.annBruteForce.fn(spark, sf).collect().toSeq
    // rebuild with the HOF kernel inline
    val e = graft.Tables.embeddings(spark, sf)
    val q = e.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy($"dot".desc, $"vec_id")
    val hof = q.crossJoin(e).filter($"qid" =!= $"vec_id")
      .select($"qid", $"vec_id", Similarity.quantDotHof("qe", "embedding").as("dot"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 5).select("qid", "rank", "vec_id", "dot")
      .orderBy("qid", "rank").collect().toSeq
    assert(native == hof)
  }
}
