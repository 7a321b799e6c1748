package graft

import org.apache.spark.sql.functions._

import graft.ops.QualityClassifier

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  /** Two separable synthetic dialects: "prose" docs draw from a stopword-
    * heavy vocabulary, "spam" docs from a promo vocabulary. Seeded — the
    * same corpus every run. */
  private lazy val corpus = {
    val rnd = new scala.util.Random(11)
    val prose = Seq("the", "a", "of", "and", "to", "in", "is", "was",
      "house", "river", "story", "quiet", "morning", "light")
    val spam = Seq("buy", "now", "free", "click", "winner", "offer",
      "cash", "prize", "limited", "deal", "subscribe", "bonus")
    def doc(words: Seq[String]) =
      (0 until 30).map(_ => words(rnd.nextInt(words.size))).mkString(" ")
    val rows = (0 until 200).map(i => (i.toLong, doc(prose), 1)) ++
      (200 until 400).map(i => (i.toLong, doc(spam), 0))
    rows.toDF("doc_id", "text", "label")
  }

  test("classifier separates held-out prose from spam") {
    val train = corpus.where($"doc_id" % 5 =!= 0)
    val test = corpus.where($"doc_id" % 5 === 0)
    val m = QualityClassifier.train(train, "text", "label",
      numFeatures = 1 << 12, maxIter = 20)
    val scored = QualityClassifier.score(m, test, "text")
    val acc = scored
      .select((($"quality_prob" >= 0.5).cast("int") === $"label").cast("long").as("ok"))
      .agg(avg($"ok")).head().getDouble(0)
    assert(acc >= 0.95, s"held-out accuracy $acc")
    // score keeps every input row and the original columns
    assert(scored.columns.toSet == Set("doc_id", "text", "label", "quality_prob"))
    assert(scored.count() == test.count())
  }

  test("filterByQuality keeps the quality side at the default cutoff") {
    val m = QualityClassifier.train(corpus, "text", "label",
      numFeatures = 1 << 12, maxIter = 20)
    val kept = QualityClassifier.filterByQuality(m, corpus, "text")
    val labels = kept.groupBy($"label").count()
      .as[(Int, Long)].collect().toMap
    // overwhelmingly label-1 docs survive; spam is filtered
    assert(labels.getOrElse(1, 0L) >= 190L)
    assert(labels.getOrElse(0, 0L) <= 10L)
  }
}
