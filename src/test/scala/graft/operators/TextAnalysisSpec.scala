package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.TextFunctions

/** Unit semantics for the text-analysis builders (value parity with DuckDB
  * runs through the oracle gate; these pin the intended meanings).
  */
class TextAnalysisSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("text").select(c).head().get(0)

  test("token counters") {
    one("The quick, brown fox 42 jumps.", TextFunctions.wsTokenCount(col("text"))) shouldBe 6L
    // letters runs: The quick brown fox jumps ; digits: 42 ; punct runs: , .
    one("The quick, brown fox 42 jumps.", TextFunctions.bpeTokenCount(col("text"))) shouldBe 8L
    one("ab!cd", TextFunctions.letterCount(col("text"))) shouldBe 4L
    one("ab!cd.", TextFunctions.punctCount(col("text"))) shouldBe 2L
    one("aXbY", TextFunctions.upperCount(col("text"))) shouldBe 2L
  }

  test("word-set count is token-exact, not substring-based") {
    // "theory" must not count as "the"
    one("theory of the theocracy", TextFunctions.wordSetCount(col("text"), Seq("the"))) shouldBe 1L
  }

  test("quality score is in [0,1] and increases with stopword density") {
    val junk = one("@@@ ### $$$ %%%", TextFunctions.qualityScore(col("text")))
      .asInstanceOf[Double]
    val prose = one(
      "the cat sat on the mat and it is a good day for everyone involved",
      TextFunctions.qualityScore(col("text"))).asInstanceOf[Double]
    junk should be >= 0.0
    prose should be <= 1.0
    prose should be > junk
  }

  test("langId picks marker-dominant language with fixed tie precedence") {
    one("the cat and the dog is here", TextFunctions.langId(col("text"))) shouldBe "en"
    one("der hund und die katze und das haus", TextFunctions.langId(col("text"))) shouldBe "de"
    one("le chat et les chiens des villes", TextFunctions.langId(col("text"))) shouldBe "fr"
    one("el perro y los gatos y las casas", TextFunctions.langId(col("text"))) shouldBe "es"
    one("xyz qrs", TextFunctions.langId(col("text"))) shouldBe "und"
    one("中文文本", TextFunctions.langId(col("text"))) shouldBe "zh"
  }

  test("normalized fingerprint is permutation- and duplication-invariant") {
    val a = one("alpha beta gamma", TextFunctions.normFingerprint(col("text")))
    val b = one("gamma alpha beta beta ALPHA", TextFunctions.normFingerprint(col("text")))
    val c = one("gamma alpha delta", TextFunctions.normFingerprint(col("text")))
    a shouldBe b
    a should not be c
  }
}
