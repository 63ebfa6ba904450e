package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.spark.TestSpark

class MinHashSignatureSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  import spark.implicits._

  /** Reference model: the exact arithmetic the expression promises. */
  private def model(tokens: Seq[String], nHashes: Int = 16): Seq[Long] = {
    import MinHashSignature._
    val th = tokens.map(t =>
      tokenHash(org.apache.spark.unsafe.types.UTF8String.fromString(t)))
    val sigs = Array.fill(nHashes)(Long.MaxValue)
    for (j <- 0 until th.length - 2) {
      val h = ((th(j) * 31 + th(j + 1)) % Mod * 31 + th(j + 2)) % Mod
      for (p <- 0 until nHashes) {
        val v = (h * (PermA0 + PermAStep * p) + (PermB0 + PermBStep * p)) % Mod
        if (v < sigs(p)) sigs(p) = v
      }
    }
    sigs.toSeq
  }

  test("signature matches the scala reference model") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "one two three")).toDF("id", "text")
    val rows = docs
      .select(col("id"), GraftFunctions.minhashSignature(split(col("text"), " ")).as("sigs"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
      .toMap
    rows(1L) shouldBe model("the quick brown fox jumps over the lazy dog".split(" ").toSeq)
    rows(2L) shouldBe model(Seq("one", "two", "three"))
    // a 3-token doc has exactly one shingle: every permutation is realised
    rows(2L).forall(_ < MinHashSignature.Mod) shouldBe true
  }

  test("interpreted eval matches codegen over a real scan") {
    val docs = graft.queries.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .where(expr("size(split(text, ' ')) >= 3")) // qualified: `size` also names a Matchers keyword
      .limit(50)
    val viaPlan = docs
      .select(col("doc_id"), GraftFunctions.minhashSignature(split(col("text"), " ")).as("sigs"))
    // codegen'd projection over the scan
    viaPlan.queryExecution.executedPlan.toString should include("minhash_signature")
    val computed = viaPlan.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val expected = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> model(r.getString(1).split(" ").toSeq)).toMap
    computed shouldBe expected
  }

  test("minhash_signature and shingle_hashes are callable from SQL text") {
    GraftFunctions.register(spark)
    Seq((1L, "a b c d")).toDF("id", "text").createOrReplaceTempView("mh_docs")
    val r = spark.sql(
      """SELECT size(minhash_signature(split(text, ' '))) AS ns,
        |       size(shingle_hashes(split(text, ' '))) AS nh
        |FROM mh_docs""".stripMargin).collect().head
    r.getInt(0) shouldBe 16
    r.getInt(1) shouldBe 2 // "a b c", "b c d"
  }

  test("identical texts share every band; signatures differ across texts") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "zeta eta theta iota kappa")).toDF("id", "text")
    val sigs = docs
      .select(col("id"), GraftFunctions.minhashSignature(split(col("text"), " ")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    sigs(1L) shouldBe sigs(2L)
    sigs(1L) should not be sigs(3L)
  }
}
