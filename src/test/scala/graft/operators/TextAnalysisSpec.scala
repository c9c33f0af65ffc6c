package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq((1L, text)).toDF("doc_id", "text")

  private def eval(c: org.apache.spark.sql.Column, text: String): Any =
    one(text).select(c.as("v")).head().get(0)

  test("tokenCount: whitespace words") {
    assert(eval(TextAnalysis.tokenCount(col("text")), "a  b\tc\nd") == 4)
    assert(eval(TextAnalysis.tokenCount(col("text")), "   ") == 0)
    assert(eval(TextAnalysis.tokenCount(col("text")), "single") == 1)
  }

  test("subwordCount: alnum runs + symbols") {
    assert(eval(TextAnalysis.subwordCount(col("text")), "ab, cd!") == 4) // ab , cd !
    assert(eval(TextAnalysis.subwordCount(col("text")), "x1y2") == 1)
    assert(eval(TextAnalysis.subwordCount(col("text")), "a-b") == 3)
  }

  test("normalized + fingerprint: case/whitespace insensitive, stable") {
    assert(eval(TextAnalysis.normalized(col("text")), "  Hello   World ") == "hello world")
    val f1 = eval(TextAnalysis.fingerprint(col("text")), "Hello  World")
    val f2 = eval(TextAnalysis.fingerprint(col("text")), "hello world")
    assert(f1 == f2)
    assert(f1.toString.length == 32)
  }

  test("punctRatio") {
    assert(eval(TextAnalysis.punctRatio(col("text")), "ab..") == 0.5)
    assert(eval(TextAnalysis.punctRatio(col("text")), "abcd") == 0.0)
  }

  test("langId picks the language with most stopword hits") {
    assert(eval(TextAnalysis.langId(col("text")),
      "the cat sat on the mat and the dog is in the house") == "en")
    assert(eval(TextAnalysis.langId(col("text")),
      "le chat est dans la maison et les oiseaux dans le jardin") == "fr")
    assert(eval(TextAnalysis.langId(col("text")),
      "el gato es para los perros y una casa en madrid") == "es")
    assert(eval(TextAnalysis.langId(col("text")),
      "der hund und die katze ist ein tier mit fell von berlin") == "de")
    assert(eval(TextAnalysis.langId(col("text")), "xyzzy qwerty plugh") == "und")
  }

  test("qualityScore in [0,1]; long clean English text scores high") {
    val good = "the quick brown fox jumps over the lazy dog and runs to the forest " * 3
    val q = eval(TextAnalysis.qualityScore(col("text")), good).asInstanceOf[Double]
    assert(q >= 0.75 && q <= 1.0)
    val bad = "x! y? z."
    val qb = eval(TextAnalysis.qualityScore(col("text")), bad).asInstanceOf[Double]
    assert(qb < 0.5)
  }

  test("profile produces one row per doc with all features") {
    val df = Seq((1L, "the quick brown fox"), (2L, "le chat est la")).toDF("doc_id", "text")
    val p = TextAnalysis.profile(df, "doc_id", "text").collect()
    assert(p.length == 2)
    assert(p.head.schema.fieldNames.toSeq == Seq(
      "doc_id", "n_chars", "n_tokens", "n_subwords", "fingerprint", "lang_pred", "quality"))
  }
}
