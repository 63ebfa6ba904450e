package graft.spark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class SkewSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  import spark.implicits._

  test("salted join returns exactly the rows of the plain join under heavy skew") {
    // 10k rows of hot key 1, a few of everything else
    val facts = (Seq.fill(10000)(1L) ++ (2L to 50L)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "payload")
    val dim = (1L to 50L).map(k => (k, s"dim$k")).toDF("k", "name")

    val plain = facts.join(dim, Seq("k")).select("k", "payload", "name")
    val salted = Skew.saltedEquiJoin(facts, dim, "k", saltBuckets = 8)
      .select("k", "payload", "name")

    salted.count() shouldBe plain.count()
    salted.exceptAll(plain).count() shouldBe 0
    plain.exceptAll(salted).count() shouldBe 0
  }

  test("salting spreads a hot key across buckets") {
    val facts = Seq.fill(1000)(1L).zipWithIndex.map { case (k, i) => (k, i.toLong) }
      .toDF("k", "payload")
    val salts = facts
      .withColumn("s", pmod(xxhash64(col("k"), col("payload")), lit(8L)))
      .select(countDistinct("s")).as[Long].head()
    salts shouldBe 8 // all 8 buckets hit
  }
}
