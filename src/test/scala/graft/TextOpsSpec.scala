package graft

import org.apache.spark.sql.functions._

import graft.ops.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("text").select(c.as("v")).head().get(0)

  test("tokenCount handles empties, runs of whitespace, padding") {
    assert(one("a b  c", TextOps.tokenCount($"text")) == 3L)
    assert(one("", TextOps.tokenCount($"text")) == 0L)
    assert(one("   ", TextOps.tokenCount($"text")) == 0L)
    assert(one(" word ", TextOps.tokenCount($"text")) == 1L)
  }

  test("fingerprint is whitespace/case-insensitive, content-sensitive") {
    val f1 = one("Hello  World", TextOps.fingerprint($"text"))
    val f2 = one("  hello world ", TextOps.fingerprint($"text"))
    val f3 = one("hello worlds", TextOps.fingerprint($"text"))
    assert(f1 == f2 && f1 != f3)
  }

  test("langId identifies real-language samples by marker words") {
    val samples = Seq(
      ("the cat sat on the mat and the dog is in the house", "en"),
      ("el gato es negro y la casa es grande que bonita", "es"),
      ("der Hund ist nicht klein und die Katze ist eine gute", "de"),
      ("le chat est dans la maison pour vous et les enfants", "fr"),
      ("这是一个中文句子 with some latin", "zh"),
      ("xyzzy plugh quux", "unknown"))
    samples.foreach { case (text, expected) =>
      assert(one(text, TextOps.langId($"text")) == expected,
        s"for '$text'")
    }
  }

  test("shingles produce distinct k-grams; short docs fall back to whole text") {
    val sh = one("a b c d", TextOps.shingles($"text", 3))
      .asInstanceOf[scala.collection.Seq[String]]
    assert(sh.toSet == Set("a b c", "b c d"))
    val short = one("a b", TextOps.shingles($"text", 3))
      .asInstanceOf[scala.collection.Seq[String]]
    assert(short == Seq("a b"))
  }

  test("quality score rewards prose, penalizes punctuation soup") {
    val good = one("the quick brown fox jumps over the lazy dog and runs to the house " * 3,
      TextOps.qualityScore($"text")).asInstanceOf[Double]
    val bad = one("!!! ### $$$ %%% ^^^ &&& *** ((( )))",
      TextOps.qualityScore($"text")).asInstanceOf[Double]
    assert(good > 0.8 && bad < 0.4 && good > bad)
  }
}
