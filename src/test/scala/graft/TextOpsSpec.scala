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

  test("chunking covers all tokens with the configured overlap") {
    val text = (1 to 100).map(i => s"t$i").mkString(" ")
    val chunks = one(text, TextOps.chunk($"text", 32, 8))
      .asInstanceOf[scala.collection.Seq[String]]
    assert(chunks.length == 4) // ceil((100-32)/24)+1
    assert(chunks.head.split(" ").length == 32)
    assert(chunks.head.endsWith(" t32") && chunks(1).startsWith("t25 "))
    assert(chunks.last.split(" ").last == "t100") // full coverage
    val short = one("a b c", TextOps.chunk($"text", 32, 8))
      .asInstanceOf[scala.collection.Seq[String]]
    assert(short == Seq("a b c"))
  }

  test("PII redaction replaces emails, urls, ips, phones; keeps prose") {
    val dirty = "mail a.b+c@x-corp.io visit https://x.io/p?q=1 " +
      "host 192.168.0.254 call 555-123-4567 or 867-5309 done"
    val clean = one(dirty, TextOps.redactPii($"text")).asInstanceOf[String]
    assert(clean == "mail [EMAIL] visit [URL] host [IP] call [PHONE] or [PHONE] done")
  }

  test("quality score rewards prose, penalizes punctuation soup") {
    val good = one("the quick brown fox jumps over the lazy dog and runs to the house " * 3,
      TextOps.qualityScore($"text")).asInstanceOf[Double]
    val bad = one("!!! ### $$$ %%% ^^^ &&& *** ((( )))",
      TextOps.qualityScore($"text")).asInstanceOf[Double]
    assert(good > 0.8 && bad < 0.4 && good > bad)
  }

  test("vocabOverlap computes exact pairwise Jaccard on token sets") {
    val docs = Seq(
      ("s1", "a b c"), ("s1", "c d"),     // s1 vocab {a,b,c,d}
      ("s2", "c d e"),                    // s2 vocab {c,d,e}
      ("s3", "x y")                       // s3 vocab {x,y} — disjoint from s1/s2
    ).toDF("source", "text")
    val got = TextOps.vocabOverlap(docs, "source", "text")
      .orderBy($"g1", $"g2")
      .select($"g1", $"g2", $"n1", $"n2", $"overlap", $"union_n", $"jaccard_e6")
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSeq
    // disjoint pairs never appear (no shared token joins them) — the
    // inverted-index shape, not an all-pairs matrix with zero rows
    assert(got == Seq(("s1", "s2", 4L, 3L, 2L, 5L, 400000L)))
  }

  test("gopherQualityFlags: each rule fires on its designed failure") {
    val good = (Seq("the", "of", "and") ++ (1 to 60).map(i => s"word$i"))
      .mkString(" ") // 63 words, stopwords present, alphabetic, no symbols
    val docs = Seq(
      (1L, good),
      (2L, "the of " + (1 to 10).map(i => s"w$i").mkString(" ")), // 12 words < 50
      (3L, ("the of " + (1 to 60).map(_ => "xy").mkString(" "))), // mean len 62*2+2*2.5... ~2 < 3
      (4L, (Seq("the", "of") ++ (1 to 60).map(_ => "###word")).mkString(" ")), // symbols
      (5L, (Seq("the", "of") ++ (1 to 60).map(_ => "12345")).mkString(" ")), // non-alpha
      (6L, (1 to 60).map(i => s"word$i").mkString(" "))) // no stopwords
      .toDF("doc_id", "text")
    val got = TextOps.gopherQualityFlags(docs, "text")
      .select($"doc_id", $"r_word_count", $"r_mean_word_len",
        $"r_symbol_ratio", $"r_alpha_ratio", $"r_stopwords", $"gopher_pass")
      .orderBy($"doc_id")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().toSeq
    assert(got(0) == ((1L, true, true, true, true, true, true)))
    assert(!got(1)._2 && !got(1)._7, "short doc fails word count")
    assert(!got(2)._3 && !got(2)._7, "tiny words fail mean length")
    assert(!got(3)._4 && !got(3)._7, "symbol soup fails symbol ratio")
    assert(!got(4)._5 && !got(4)._7, "numeric words fail alpha ratio")
    assert(!got(5)._6 && !got(5)._7, "stopword-free doc fails stopwords")
  }

  test("gopherQualityFlags: stopword rule needs two DISTINCT stop words") {
    val docs = Seq(
      (1L, ("the the the " + (1 to 60).map(i => s"w$i").mkString(" "))),
      (2L, ("the of " + (1 to 60).map(i => s"w$i").mkString(" "))))
      .toDF("doc_id", "text")
    val got = TextOps.gopherQualityFlags(docs, "text")
      .select($"doc_id", $"r_stopwords").orderBy($"doc_id")
      .as[(Long, Boolean)].collect().toSeq
    assert(got == Seq((1L, false), (2L, true)))
  }

  test("dedupFrequentLines drops boilerplate, keeps order, counts both ways") {
    val docs = Seq(
      (1L, "intro one\nCOOKIE BANNER\nbody a\nFOOTER"),
      (2L, "COOKIE BANNER\nbody b\nFOOTER"),
      (3L, "body c\nFOOTER\nCOOKIE BANNER\ntail c"),
      (4L, "unique only"),
      (5L, "COOKIE BANNER\nFOOTER") // all-boilerplate doc -> empty text
    ).toDF("doc_id", "text")
    val got = TextOps.dedupFrequentLines(docs, "text", "doc_id",
        minDocFreq = 3).orderBy($"doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "intro one\nbody a", 2L, 2L),
      (2L, "body b", 1L, 2L),
      (3L, "body c\ntail c", 2L, 2L),
      (4L, "unique only", 1L, 0L),
      (5L, "", 0L, 2L)))
  }

  test("dedupFrequentLines: duplicate lines WITHIN one doc count once for df") {
    // 'x' appears 3 times in doc 1 but only 2 DISTINCT docs carry it —
    // below minDocFreq=3, so it must survive everywhere
    val docs = Seq(
      (1L, "x\nx\nx"), (2L, "x\ny"), (3L, "z")).toDF("doc_id", "text")
    val got = TextOps.dedupFrequentLines(docs, "text", "doc_id",
        minDocFreq = 3).orderBy($"doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq((1L, "x\nx\nx", 3L, 0L), (2L, "x\ny", 2L, 0L),
      (3L, "z", 1L, 0L)))
  }

  test("dedupFrequentLines: null text and custom delimiter") {
    val docs = Seq((1L, "a|BP|b"), (2L, "BP|c"), (3L, null), (4L, "BP"))
      .toDF("doc_id", "text")
    val got = TextOps.dedupFrequentLines(docs, "text", "doc_id",
        minDocFreq = 3, delim = "|").orderBy($"doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq((1L, "a|b", 2L, 1L), (2L, "c", 1L, 1L),
      (3L, "", 1L, 0L), (4L, "", 0L, 1L)))
  }

  test("nfc composes decomposed sequences; ASCII is an allocation-free no-op") {
    val docs = Seq(
      (1L, "cafe\u0301"),          // decomposed e + combining acute
      (2L, "caf\u00e9"),           // already composed
      (3L, "plain ascii"),
      (4L, null.asInstanceOf[String])).toDF("id", "text")
    val got = docs.select($"id", TextOps.nfc($"text").as("t"),
        length(TextOps.nfc($"text")).as("n"))
      .orderBy($"id").as[(Long, String, Option[Long])].collect().toSeq
    assert(got(0) == ((1L, "caf\u00e9", Some(4L))), "composed to U+00E9")
    assert(got(0)._2 == got(1)._2, "canonically equivalent forms converge")
    assert(got(2) == ((3L, "plain ascii", Some(11L))))
    assert(got(3) == ((4L, null, None)), "null passthrough")
    // equivalence now survives fingerprinting
    val fp = docs.where($"text".isNotNull && $"id" <= 2)
      .select(TextOps.fingerprint(TextOps.nfc($"text")).as("f"))
      .distinct().count()
    assert(fp == 1L, "NFC-equal docs share one fingerprint")
  }

  test("cleanText strips C0/C1 controls but keeps tab/LF/CR; mojibake counted") {
    val s = "a\u0000b\u0007c\td\ne\rf\u009fg"
    val got = Seq(Tuple1(s)).toDF("text")
      .select(TextOps.cleanText($"text").as("t")).as[String].head()
    assert(got == "abc\td\ne\rfg")
    val moji = Seq(Tuple1("caf\u00c3\u00a9 \u00e2\u20ac\u201c x \ufffd"))
      .toDF("text").select(TextOps.mojibakeCount($"text")).as[Long].head()
    assert(moji == 3L, "\u00c3, \u00e2\u20ac, and U+FFFD each count once")
  }

  test("stripHtml: blocks, tags, entities, decode order, whitespace") {
    val html = "<html><p clAss=\"x\">Hello <b>world</b></p>" +
      "<script>var t = \"<p>fake</p>\";</script>" +
      "<style>p{color:red}</style>" +
      "A&nbsp;B &amp;lt;still-escaped&gt; &quot;q&quot; &#39;s&#39; " +
      "&lt;tag&gt; x &amp; y</html>"
    val got = Seq(Tuple1(html)).toDF("text")
      .select(TextOps.stripHtml($"text")).as[String].head()
    // script/style bodies vanish (including the fake tags inside),
    // &amp;lt; double-escape decodes to literal "&lt;", and &lt;tag&gt;
    // survives as literal <tag> because entities decode AFTER tag-strip
    assert(got == "Hello world A B &lt;still-escaped> \"q\" 's' <tag> x & y")
  }

  test("canonicalizeUrl collapses page-identical variants, keeps real differences") {
    val urls = Seq(
      (1L, "HTTP://WWW.Example.COM:80/a/b/?utm_source=f&b=2&a=1#frag"),
      (2L, "http://example.com/a/b?a=1&b=2"),          // same page as 1
      (3L, "https://example.com/a/b?a=1&b=2"),          // scheme differs: distinct
      (4L, "https://example.com:8443/a/b?a=1&b=2"),     // non-default port kept
      (5L, "HTTPS://Sub.Example.CO.UK:443/"),           // bare root
      (6L, "http://example.com/A/B"),                   // path case preserved
      (7L, "http://example.com/x?utm_a=1&gclid=g&ref=r&fbclid=f") // all tracking
    ).toDF("id", "url")
    val got = urls.select($"id", TextOps.canonicalizeUrl($"url").as("c"))
      .orderBy($"id").as[(Long, String)].collect().map(_._2)
    assert(got(0) == "http://example.com/a/b?a=1&b=2")
    assert(got(1) == got(0))
    assert(got(2) == "https://example.com/a/b?a=1&b=2")
    assert(got(3) == "https://example.com:8443/a/b?a=1&b=2")
    assert(got(4) == "https://sub.example.co.uk/")
    assert(got(5) == "http://example.com/A/B")
    assert(got(6) == "http://example.com/x")
  }

  test("registeredDomain applies the shared-second-level heuristic") {
    val hosts = Seq("example.com", "cdn.news.example.co.uk", "a.b.site.org",
      "localhost", "deep.sub.example.com").toDF("h")
    val got = hosts.select(TextOps.registeredDomain($"h")).as[String]
      .collect().toSeq
    assert(got == Seq("example.com", "example.co.uk", "site.org",
      "localhost", "example.com"))
  }

  test("collocations ranks pairs by lift with exact integer keys") {
    // "new york" always adjacent (lift high); "the cat"/"the dog" dilute "the"
    val docs = Seq.tabulate(10)(i =>
      (i.toLong, "new york " + ("the cat sat " * (i % 3 + 1)) + "the dog ran new york"))
      .toDF("id", "text")
    val got = TextOps.collocations(docs, "text", minCount = 5L, topK = 5)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    // brute-force twin
    val toks = docs.collect().map(_.getString(1).toLowerCase.trim
      .split("\\s+").toSeq)
    val uni = toks.flatten.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val bi = toks.flatMap(t => t.zip(t.tail)).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }.filter(_._2 >= 5L)
    val want = bi.toSeq.map { case ((a, b), c12) =>
      (a, b, c12, uni(a), uni(b), c12 * 1000000L / (uni(a) * uni(b))) }
      .sortBy { case (a, b, c12, _, _, l) => (-l, -c12, a, b) }.take(5)
    assert(got == want)
    assert(got.exists(r => r._1 == "new" && r._2 == "york"))
  }

  test("blocklistCount equals the brute-force all-positions count") {
    val pats = Seq("ab", "abc", "bc", "c", "xyz", "aba")
    val texts = Seq("abcabc", "ababa", "", "zzz", "abc abc c",
      "aabbcc", "xyzxyzx", "cccc")
    def brute(t: String): Long = pats.map { p =>
      (0 to t.length - p.length).count(i => t.startsWith(p, i)).toLong
    }.sum
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    val got = df.select($"id", TextOps.blocklistCount($"t", pats).as("n"))
      .orderBy($"id").as[(Long, Long)].collect().toSeq
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i)._2 == brute(t), s"text '$t'")
    }
    // overlapping matches are counted ("aba" twice in "ababa")
    assert(got(1)._2 ==
      pats.map(p => (0 to "ababa".length - p.length)
        .count(i => "ababa".startsWith(p, i)).toLong).sum)
    // null passthrough + hit predicate
    val withNull = Seq((1L, "has ab here"), (2L, "clean"),
      (3L, null.asInstanceOf[String])).toDF("id", "t")
    val hits = withNull.select($"id",
      TextOps.blocklistHit($"t", Seq("ab")).as("h"))
      .orderBy($"id").as[(Long, Option[Boolean])].collect().toSeq
    assert(hits == Seq((1L, Some(true)), (2L, Some(false)), (3L, None)))
  }

  test("blocklistCount scales to a large blocklist in one pass") {
    // 5k patterns; only a handful present — count must stay exact
    val pats = (0 until 5000).map(i => s"zz_phrase_$i") ++
      Seq("spark merge", "batch table")
    val t = "the spark merge ran then a batch table and spark merge again"
    val got = Seq(t).toDF("t")
      .select(TextOps.blocklistCount($"t", pats)).as[Long].head()
    assert(got == 3L)
  }

  test("compressionRatio orders repetitive below prose below noise") {
    val rep = "spam spam spam spam " * 50
    val prose = "the quick brown fox jumps over the lazy dog and then " +
      "wanders into a meadow full of unexpected vocabulary items " * 5
    val noise = (1 to 400).map(i => (i * 2654435761L % 1000003).toString)
      .mkString(" ")
    val df = Seq((1L, rep), (2L, prose), (3L, noise), (4L, ""),
      (5L, null.asInstanceOf[String])).toDF("id", "text")
    val got = df.select($"id", TextOps.compressionRatio($"text").as("r"))
      .orderBy($"id").as[(Long, Option[Double])].collect().toSeq
    val r = got.map(_._2)
    assert(r(0).get < r(1).get, "repetition compresses best")
    assert(r(1).get < r(2).get, "prose compresses better than noise")
    assert(r(3).contains(1.0), "empty text convention")
    assert(r(4).isEmpty, "null passthrough")
    // deterministic across evaluations
    val again = df.select(TextOps.compressionRatio($"text")).collect()
    assert(df.select(TextOps.compressionRatio($"text")).collect()
      .zip(again).forall { case (a, b) => a == b })
  }

  test("tfidfTopTerms scores and ranks by hand-checked tf·ln(N/df)") {
    // N=3: "cat" in all docs (ln(1)=0, never characteristic), "fish"
    // only in doc 1 (ln 3), "dog" in docs 2+3 (ln 1.5)
    val df = Seq(
      (1L, "cat fish fish"),
      (2L, "cat dog"),
      (3L, "cat dog dog dog")).toDF("id", "text")
    val got = TextOps.tfidfTopTerms(df, "text", "id", topK = 2)
      .orderBy($"id", $"rank")
      .as[(Long, Long, String, Double)].collect().toSeq
    def s(tf: Int, ratio: Double) =
      math.rint(tf * math.log(ratio) * 10000) / 10000
    assert(got == Seq(
      (1L, 1L, "fish", s(2, 3.0)),   // 2·ln(3/1)
      (1L, 2L, "cat", 0.0),          // 1·ln(3/3)
      (2L, 1L, "dog", s(1, 1.5)),    // 1·ln(3/2)
      (2L, 2L, "cat", 0.0),
      (3L, 1L, "dog", s(3, 1.5)),    // 3·ln(3/2)
      (3L, 2L, "cat", 0.0)))
    // empty and null docs contribute nothing and emit nothing
    val e = TextOps.tfidfTopTerms(
      Seq((1L, "a b"), (2L, ""), (3L, null.asInstanceOf[String]))
        .toDF("id", "text"), "text", "id")
    assert(e.select($"id").distinct().collect().map(_.getLong(0)).toSet == Set(1L))
  }
}
