package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.spark.TestSpark

class MultimodalSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  import spark.implicits._

  test("stubDecode derives deterministic metadata from header bytes") {
    val meta = Multimodal.stubDecode("abc".getBytes("UTF-8"))
    meta shouldBe Multimodal.MediaMeta(
      widthPx = 'a'.toInt + 16, heightPx = 'b'.toInt + 16, frames = 3 % 8 + 1)
    Multimodal.stubDecode(Array.emptyByteArray) shouldBe Multimodal.MediaMeta(16, 16, 1)
  }

  test("decodeMeta runs the batched decode over a binary payload column") {
    val df = Seq((1L, "hello"), (2L, "x")).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val out = Multimodal.decodeMeta(df).collect().sortBy(_.getLong(0))
    out.map(_.getLong(1)) shouldBe Array(5L, 1L) // payload_bytes
    out.head.getInt(3) shouldBe 'h'.toInt + 16 // width_px
    // sha256("hello")
    out.head.getString(2) shouldBe
      "2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824"
  }
}

class TextAnalysisSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  import spark.implicits._

  test("typeTokenRatio measures lexical diversity") {
    val df = Seq("a a a a", "a b c d").toDF("text")
      .select(round(TextAnalysis.typeTokenRatio(col("text")), 2).as("ttr"))
    df.collect().map(_.getDouble(0)).sorted shouldBe Array(0.25, 1.0)
  }

  test("stopwordRatio counts only listed stopwords") {
    val df = Seq("the cat sat on the mat").toDF("text")
      .select(round(TextAnalysis.stopwordRatio(col("text"), Seq("the", "on")), 2).as("r"))
    df.collect().head.getDouble(0) shouldBe 0.5
  }

  test("withLangGuess assigns a deterministic language per row") {
    val df = Seq("the theory is there", "schein schnell chein").toDF("text")
    val out = TextAnalysis.withLangGuess(df, col("text"))
      .select("lang_guess").as[String].collect()
    out should have size 2
    out.foreach(l => Set("en", "de", "es", "fr", "zh") should contain(l))
    // marker-heavy German text lands on de
    out(1) shouldBe "de"
  }

  test("regexTokens splits letter and digit runs") {
    val df = Seq("ab12cd x").toDF("text")
      .select(org.apache.spark.sql.functions.size(TextAnalysis.regexTokens(col("text"))).as("n"))
    df.collect().head.getInt(0) shouldBe 4
  }
}
