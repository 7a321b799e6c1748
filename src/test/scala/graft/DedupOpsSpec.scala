package graft

import org.apache.spark.sql.functions._

import graft.ops.{DedupOps, TextOps}

class DedupOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Corpus with planted duplicates: 100 distinct base docs; docs 1000+i
    * are near-dup copies of doc i (one word changed) for i < 10; docs
    * 2000+i are EXACT copies (whitespace/case variants) for i < 5. */
  lazy val corpus = {
    val rnd = new scala.util.Random(7)
    // wide vocab so DISTINCT docs are distinct in unigram space too
    // (simhash is a bag-of-words signature; a tiny vocab makes all docs
    // legitimately similar and the negative assertions meaningless)
    val vocab = (0 until 60).map(i => s"word$i")
    val base = (0 until 100).map { i =>
      (i.toLong, (0 until 40).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val nearDups = base.take(10).map { case (i, t) =>
      val words = t.split(" "); words(20) = "CHANGED"
      (1000L + i, words.mkString(" "))
    }
    val exactDups = base.take(5).map { case (i, t) =>
      (2000L + i, "  " + t.toUpperCase + "  ") // normalize() must equate
    }
    (base ++ nearDups ++ exactDups).toDF("doc_id", "text")
  }

  test("exact dedup: case/whitespace variants collapse to canonical id") {
    val d = DedupOps.exactDedup(corpus, "text", "doc_id")
    assert(d.count() == 110) // 115 - 5 exact dups
    val dupGroups = d.filter($"dup_count" > 1)
    assert(dupGroups.count() == 5)
    // canonical = lowest id: base ids 0..4 survive, 2000-series dropped
    assert(dupGroups.filter($"doc_id" >= 2000).count() == 0)
  }

  test("incremental dedup admits only novel docs across batches") {
    val store = new graft.sinks.AppendOnlyStore(spark, tmpDir("incdedup") + "/fp")
    val b1 = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"),
      (3L, "ALPHA  beta gamma")) // in-batch dup of 1
      .toDF("doc_id", "text")
    val a1 = graft.ops.DedupOps.incrementalExactDedup(b1, "text", "doc_id", store)
    assert(a1.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    val b2 = Seq((4L, "delta epsilon zeta"), // dup of admitted 2
      (5L, "brand new content"))
      .toDF("doc_id", "text")
    val a2 = graft.ops.DedupOps.incrementalExactDedup(b2, "text", "doc_id", store)
    assert(a2.select("doc_id").collect().map(_.getLong(0)).toSet == Set(5L))
    assert(store.read().count() == 3) // fingerprints: docs 1, 2, 5
  }

  test("incremental dedup is append-only: prior store files never rewritten") {
    val store = new graft.sinks.AppendOnlyStore(spark, tmpDir("incappend") + "/fp")
    val b1 = (0 until 50).map(i => (i.toLong, s"document body number $i"))
      .toDF("doc_id", "text")
    graft.ops.DedupOps.incrementalExactDedup(b1, "text", "doc_id", store)
    val filesAfterB1 = store.dataFiles().toSet
    assert(filesAfterB1.nonEmpty)
    val b2 = (50 until 80).map(i => (i.toLong, s"document body number $i"))
      .toDF("doc_id", "text")
    graft.ops.DedupOps.incrementalExactDedup(b2, "text", "doc_id", store)
    val filesAfterB2 = store.dataFiles().toSet
    // batch 2 ADDED files; every batch-1 file survives untouched — the
    // per-batch write is O(batch), not O(accumulated store)
    assert(filesAfterB1.subsetOf(filesAfterB2),
      "a prior batch's files were rewritten — store is not append-only")
    assert(filesAfterB2.size > filesAfterB1.size)
    assert(store.read().count() == 80)
    // compaction bounds small-file growth and preserves content
    store.compact()
    assert(store.read().count() == 80)
    assert(store.dataFiles().size <= filesAfterB2.size)
  }

  test("a reader pinned before compaction survives one generation swap") {
    val store = new graft.sinks.AppendOnlyStore(spark,
      tmpDir("gen") + "/store")
    (1 to 3).foreach { b =>
      store.append((1 to 50).map(i =>
          (f"${b * 1000 + i}%032x", (b * 1000 + i).toLong))
        .toDF("fingerprint", "doc_id"))
    }
    val pinned = store.read() // file listing captured now
    store.compact()           // new generation published
    // the pinned plan still streams the superseded generation's files
    assert(pinned.count() == 150)
    assert(store.read().count() == 150)
    // a second compaction retires that generation
    store.compact()
    assert(store.read().count() == 150)
  }

  test("minhash LSH finds all planted near-dups with no false negatives") {
    val pairs = DedupOps.minhashNearDups(corpus, "text", "doc_id",
      threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 10).foreach { i =>
      assert(pairs.contains((i.toLong, 1000L + i)),
        s"missed planted near-dup pair ($i, ${1000 + i}); got $pairs")
    }
    // distinct random docs must not pair at 0.5 jaccard
    assert(pairs.forall { case (a, b) => b - a == 1000 || b - a == 2000 })
  }

  test("minhash signature is stable under whitespace noise") {
    val a = DedupOps.minhashSignatures(
      Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text"),
      "text", "doc_id").head().getSeq[Long](1)
    val b = DedupOps.minhashSignatures(
      Seq((1L, "  THE   quick brown fox JUMPS over the lazy dog ")).toDF("doc_id", "text"),
      "text", "doc_id").head().getSeq[Long](1)
    assert(a == b)
  }

  test("simhash: hamming distance small for near-dups, large for distinct") {
    val sims = DedupOps.simhash(corpus, "text", "doc_id")
    val byId = sims.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    (0 until 10).foreach { i =>
      assert(ham(byId(i.toLong), byId(1000L + i)) <= 12,
        s"near-dup $i hamming too large")
    }
    val distinctPairs = for (i <- 20 until 30; j <- 40 until 45)
      yield ham(byId(i.toLong), byId(j.toLong))
    assert(distinctPairs.count(_ <= 6) == 0, "distinct docs too close")
  }

  test("simhash banded near-dup join finds close pairs only") {
    val sims = DedupOps.simhash(corpus, "text", "doc_id")
    val found = DedupOps.simhashNearDups(sims, "doc_id", maxDist = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every found pair must genuinely be within 12 bits (verified in-op);
    // planted exact dups (identical simhash) must appear
    (0 until 5).foreach { i =>
      assert(found.contains((i.toLong, 2000L + i)))
    }
  }

  test("ngram jaccard inverted index agrees with direct set computation") {
    val pairs = DedupOps.ngramJaccardPairs(corpus, "text", "doc_id",
      shingleLen = 3, threshold = 0.5, maxDf = 1000)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    (0 until 10).foreach { i =>
      val j = pairs.get((i.toLong, 1000L + i))
      assert(j.isDefined && j.get > 0.5 && j.get < 1.0)
    }
    // sanity: direct jaccard of one planted pair matches the op's value
    val sets = corpus.filter($"doc_id".isin(0L, 1000L))
      .select(TextOps.shingles($"text", 3).as("sh"))
      .collect().map(_.getSeq[String](0).toSet)
    val expected = sets(0).intersect(sets(1)).size.toDouble /
      sets(0).union(sets(1)).size
    assert(math.abs(pairs((0L, 1000L)) - expected) < 1e-3)
  }

  test("repeated spans merge adjacent cross-doc windows, ignore unique text") {
    val docs = Seq(
      (1L, "a b c d e x y z"),   // shares "a b c d e" with doc 2
      (2L, "q w a b c d e k"),
      (3L, "m n o p q r s t")    // fully unique
    ).toDF("doc_id", "text")
    val spans = DedupOps.repeatedSpans(docs, "text", "doc_id", n = 3, minDocs = 2)
      .orderBy($"doc_id", $"span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // windows "a b c","b c d","c d e" repeat: doc1 @0-2 -> [0,5), doc2 @2-4 -> [2,7)
    assert(spans.toSeq === Seq((1L, 0L, 5L, 3L), (2L, 2L, 7L, 3L)))
  }

  test("whole short docs repeat as single-window spans") {
    val docs = Seq((1L, "tiny"), (2L, "tiny"), (3L, "other")).toDF("doc_id", "text")
    val spans = DedupOps.repeatedSpans(docs, "text", "doc_id", n = 3, minDocs = 2)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(spans.toSeq === Seq((1L, 0L, 1L), (2L, 0L, 1L)))
  }

  test("crossSourceDupMatrix counts distinct shared fingerprints per pair") {
    val docs = Seq(
      (1L, "A", "hello world"),
      (2L, "B", "hello  WORLD"),   // same fingerprint as 1 (normalize)
      (3L, "C", "hello world"),    // shared by A,B,C -> 3 pairs
      (4L, "A", "unique to a"),
      (5L, "B", "only in b"),
      (6L, "A", "twin text"), (7L, "A", "twin text"),  // dup WITHIN A: no pair
      (8L, "B", "twin text")       // A-B share "twin text" once, not twice
    ).toDF("id", "src", "text")
    val got = DedupOps.crossSourceDupMatrix(docs, "text", "src")
      .orderBy($"src_a", $"src_b")
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("A", "B", 2L), ("A", "C", 1L), ("B", "C", 1L)))
  }

  test("crossSourceDupMatrix prefix mode catches shared intros only") {
    val docs = Seq(
      (1L, "A", "breaking news today something happened"),
      (2L, "B", "breaking news today entirely different tail"),
      (3L, "C", "no shared prefix here")
    ).toDF("id", "src", "text")
    val full = DedupOps.crossSourceDupMatrix(docs, "text", "src").count()
    val pre = DedupOps.crossSourceDupMatrix(docs, "text", "src",
      prefixTokens = 3).as[(String, String, Long)].collect().toSeq
    assert(full == 0L, "full-text hashes share nothing")
    assert(pre == Seq(("A", "B", 1L)))
  }
}
