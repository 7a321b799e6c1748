package graft

import org.apache.spark.sql.functions._

import graft.ops.BpeOps

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** The classic Sennrich corpus: {low×5, lower×2, newest×6, widest×3}. */
  lazy val corpus = (
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
    Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
  ).map(Tuple1(_)).toDF("text")

  test("training learns the hand-computed merge sequence") {
    // pair counts round 1: (e,s)=9 (s,t)=9 (w,e)=8 (l,o)=7 (o,w)=7 ...
    // tie (e,s)/(s,t) breaks on l asc -> (e,s); then (es,t)=9; then the
    // (l,o)/(o,w)=7 tie breaks to (l,o); then (lo,w)=7.
    val (merges, table) = BpeOps.train(corpus, "text", numMerges = 4)
    assert(merges === Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    val words = table.select(regexp_replace($"symstr", BpeOps.Sep, "|").as("w"))
      .collect().map(_.getString(0)).toSet
    assert(words === Set("low", "low|e|r", "n|e|w|est", "w|i|d|est"))
  }

  test("encode reproduces the trainer's segmentation on training words") {
    val (merges, table) = BpeOps.train(corpus, "text", numMerges = 6)
    val trained = table
      .select(split($"symstr", BpeOps.Sep).as("syms"))
      .withColumn("word", concat_ws("", $"syms"))
    val mism = trained
      .withColumn("enc", BpeOps.encodeWord($"word", merges))
      .filter(not($"enc" <=> $"syms"))
    assert(mism.count() === 0L)
  }

  test("encode segments unseen words and concatenates back losslessly") {
    val (merges, _) = BpeOps.train(corpus, "text", numMerges = 8)
    val rows = Seq("lowest", "newer", "wide", "slowest", "x")
      .map(Tuple1(_)).toDF("word")
      .select($"word", BpeOps.encodeWord($"word", merges).as("syms"))
      .withColumn("back", concat_ws("", $"syms"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(2) === r.getString(0), "lossless concat")
      assert(r.getSeq[String](1).nonEmpty)
    }
    // "lowest": merges (e,s)(es,t)(l,o)(lo,w) apply -> lo+w ... w? low|est
    val lowest = rows.find(_.getString(0) == "lowest").get.getSeq[String](1)
    assert(lowest === Seq("low", "est"))
  }

  test("batched training equals sequential training merge-for-merge") {
    // the hand corpus forces batch degeneration (top pairs chain-share
    // symbols); the documents corpus exercises real multi-merge batches
    val docs = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
    for (c <- Seq(corpus, docs.select($"text"))) {
      val seq = BpeOps.trainDetailed(c, "text", numMerges = 48,
        maxMergesPerRound = 1)
      val bat = BpeOps.trainDetailed(c, "text", numMerges = 48,
        maxMergesPerRound = 64)
      assert(bat.merges === seq.merges,
        "batched merge list must equal the sequential algorithm's")
    }
  }

  test("batching amortizes driver round-trips on the bench corpus") {
    val docs = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "documents").select($"text")
    val bat = BpeOps.trainDetailed(docs, "text", numMerges = 64,
      maxMergesPerRound = 16)
    assert(bat.merges.size === 64)
    val perRound = bat.merges.size.toDouble / bat.rounds
    assert(perRound >= 8.0,
      s"expected >=8 merges/round, got $perRound (${bat.rounds} rounds)")
  }

  test("document-level encode is one flat projection over tokens") {
    val (merges, _) = BpeOps.train(corpus, "text", numMerges = 4)
    val out = Seq("the newest lower").map(Tuple1(_)).toDF("text")
      .select(BpeOps.encodeText($"text", merges).as("syms"))
      .collect()(0).getSeq[String](0)
    assert(out.startsWith(Seq("t", "h", "e")))
    assert(out.containsSlice(Seq("n", "e", "w", "est")))
    assert(out.containsSlice(Seq("low", "e", "r")))
  }
}
