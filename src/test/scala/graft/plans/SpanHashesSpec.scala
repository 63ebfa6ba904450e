package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.spark.TestSpark

class SpanHashesSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  import spark.implicits._

  test("native span hashes are bit-identical to the HOF formulation") {
    val w = 4
    val docs = Seq(
      "a b c d e f g h i",          // 3 spans: 4 + 4 + 1
      "one two three four",         // exactly one full span
      "short",                      // single-token span
      "x y z x y z x y z x y z x"   // repeated content across spans
    ).toDF("text")
    val rows = docs
      .select(split(col("text"), " ").as("tk"))
      .select(
        GraftFunctions.spanHashes(col("tk"), w).as("native"),
        GraftFunctions.tokenHashes(col("tk")).as("th"))
      .withColumn("hof", expr(
        s"""transform(
           |  sequence(0, greatest(0, cast(ceil((size(th) - $w) / cast($w as double)) as int))),
           |  i -> aggregate(slice(th, i * $w + 1, $w), 0L, (h, x) -> (h * 31 + x) % 1000000007))""".stripMargin))
      .select("native", "hof")
      .as[(Seq[Long], Seq[Long])]
      .collect()
    rows.foreach { case (native, hof) => native shouldBe hof }
    rows.head._1.length shouldBe 3
  }

  test("property: compute matches a reference fold for arbitrary token arrays and widths") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genTokens = Gen.choose(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumStr.map(_.take(8))))
    val genCase = for { tk <- genTokens; w <- Gen.choose(1, 10) } yield (tk, w)
    def reference(tokens: List[String], w: Int): Seq[Long] =
      tokens.grouped(w).map { span =>
        span.foldLeft(0L)((h, t) =>
          (h * 31 + MinHashSignature.tokenHash(
            org.apache.spark.unsafe.types.UTF8String.fromString(t))) % MinHashSignature.Mod)
      }.toSeq
    (1 to 200).foreach { i =>
      genCase(Gen.Parameters.default, Seed(i.toLong)).foreach { case (tk, w) =>
        val ad = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          tk.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray)
        SpanHashes.compute(ad, w).toSeq shouldBe reference(tk, w)
      }
    }
  }

  test("interpreted eval matches the compute loop") {
    val tk = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array("alpha", "beta", "gamma").map(org.apache.spark.unsafe.types.UTF8String.fromString))
    SpanHashes.compute(tk, 2).toSeq shouldBe Seq(
      (MinHashSignature.tokenHash(org.apache.spark.unsafe.types.UTF8String.fromString("alpha")) * 31 +
        MinHashSignature.tokenHash(org.apache.spark.unsafe.types.UTF8String.fromString("beta"))) % MinHashSignature.Mod,
      MinHashSignature.tokenHash(org.apache.spark.unsafe.types.UTF8String.fromString("gamma")))
  }
}
