package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BPE merge learning + application: the learn loop against the
  * classic hand-checkable corpus, the Column replace-chain against the
  * Scala executable spec, and the documented two-pass semantics on
  * degenerate runs. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learn: classic corpus learns (e,s)->(es,t)->(est) style merges, " +
    "count-weighted with deterministic tie-breaks") {
    // the Sennrich walkthrough shape: 'est' dominates via newest/widest
    val hist = Array[(String, Long)](
      ("newest", 6L), ("widest", 3L), ("low", 5L), ("lower", 2L))
    val merges = Bpe.learn(hist, numMerges = 3)
    // (e,s) appears 9x (newest+widest) — the top pair; then (es,t) 9x
    assert(merges.take(2) === Seq(Bpe.Merge("e", "s"), Bpe.Merge("es", "t")))
    // third round: 'lo' appears in low+lower = 7, beats remaining pairs
    assert(merges(2) === Bpe.Merge("l", "o"))
  }

  test("learn: stops early when no pair repeats; single-char words learn nothing") {
    assert(Bpe.learn(Array(("ab", 1L), ("cd", 1L)), 5) === Seq.empty)
    assert(Bpe.learn(Array(("a", 100L), ("b", 50L)), 5) === Seq.empty)
  }

  test("applyMerges (Column) ≡ applyOne (Scala) on random strings — the " +
    "SQL replace chain and the executable spec can never disagree") {
    val merges = Seq(Bpe.Merge("a", "b"), Bpe.Merge("ab", "c"), Bpe.Merge("d", "d"))
    val rnd = new scala.util.Random(7)
    val texts = (0 until 80).map(_ =>
      (0 until rnd.nextInt(20)).map(_ => "abcd".charAt(rnd.nextInt(4))).mkString) :+
      "" :+ "abcabc" :+ "dddddd" :+ "ababab"
    val fromCol = texts.toDF("t")
      .select(Bpe.applyMerges(Bpe.symbolize(col("t")), merges).as("s"))
      .as[String].collect()
    val fromScala = texts.map { t =>
      val sym = if (t.isEmpty) "|" else "|" + t.toCharArray.mkString("|") + "|"
      merges.foldLeft(sym)(Bpe.applyOne)
    }
    assert(fromCol.toSeq === fromScala)
  }

  test("two-pass semantics: '|a|b|a|b|' fully merges (pass 2 catches the " +
    "boundary-shared pair); runs of a repeated symbol pair maximally") {
    val m = Bpe.Merge("a", "b")
    assert(Bpe.applyOne("|a|b|a|b|", m) === "|ab|ab|")
    // degenerate run: maximal but not leftmost-first (documented)
    val r = Bpe.applyOne("|a|a|a|a|a|", Bpe.Merge("a", "a"))
    assert(r === "|aa|a|aa|")
    // no mergeable adjacent pair remains — the pairing is maximal
    assert(!r.contains("|a|a|"))
    // a merge never fires inside a longer symbol (delimiter anchoring)
    assert(Bpe.applyOne("|a|bc|", m) === "|a|bc|")
  }

  test("tokenCount counts symbols; symbolize delimits every character") {
    val out = Seq("the", "a", "").toDF("t")
      .select(Bpe.symbolize(col("t")).as("s"), Bpe.tokenCount(Bpe.symbolize(col("t"))).as("n"))
      .as[(String, Int)].collect()
    assert(out(0) === (("|t|h|e|", 3)))
    assert(out(1) === (("|a|", 1)))
    assert(out(2) === (("|", 0)))
  }

  test("wordHistogram: top-K by (count desc, word asc), separator-bearing " +
    "tokens excluded") {
    val docs = Seq("b b b a a c", "a |x| a").toDF("text")
    val h = Bpe.wordHistogram(docs, "text", topK = 2)
    assert(h.toSeq === Seq(("a", 4L), ("b", 3L)))
  }

  test("stripSep removes the delimiter AND the Java-only line terminators " +
    "(the (.) class divergence vs RE2), leaving \\n alone") {
    val dirty = "a|b\rc\u0085d\u2028e\u2029f\ng"
    val out = Seq(dirty).toDF("t")
      .select(Bpe.stripSep(col("t"))).as[String].head()
    assert(out === "abcdef\ng")
    // the SQL mirror names the same code points
    val sql = Bpe.sanitizeSqlExpr("t")
    for (cp <- Seq(124, 13, 133, 8232, 8233)) assert(sql.contains(s"chr($cp)"), sql)
  }

  test("learning is deterministic: same histogram, same merge sequence") {
    val hist = Array(("seed", 5L), ("seen", 4L), ("tree", 3L), ("free", 2L))
    val a = Bpe.learn(hist, 6)
    val b = Bpe.learn(hist.reverse, 6) // input order must not matter
    assert(a === b && a.nonEmpty)
  }

  /** The chain reference the fast kernel is pinned against: symbolize
    * then sequential two-pass [[Bpe.applyOne]] per merge. Mirrors
    * [[Bpe.symbolize]]'s `(.)` regex EXACTLY — `.` skips \n in both Java
    * and RE2, so a \n gets no delimiter appended and glues to whatever
    * follows (r8 ADVICE: the old per-code-point reference here replicated
    * the kernel's bug instead of the chain's semantics). */
  private def chainRef(t: String, merges: Seq[Bpe.Merge]): String = {
    val sym = new java.lang.StringBuilder("|")
    var i = 0
    while (i < t.length) {
      val cc = Character.charCount(t.codePointAt(i))
      sym.append(t, i, i + cc)
      if (t.charAt(i) != '\n') sym.append('|')
      i += cc
    }
    merges.foldLeft(sym.toString)(Bpe.applyOne)
  }

  test("chainRef matches Bpe.symbolize through Spark (the spec's own " +
    "reference is the production Column), incl. newline-bearing text") {
    val texts = Seq("", "\n", "a\nb", "\n\nb", "ab\n", "a\n\n", "x\ny\nz",
      "hello world", "a\nb\nc ab\n")
    val got = texts.toDF("t").select(Bpe.symbolize(col("t"))).as[String].collect()
    texts.zip(got).foreach { case (t, sparkSym) =>
      assert(chainRef(t, Nil) === sparkSym, s"text <${t.replace("\n", "\\n")}>")
    }
  }

  test("BpeKernel ≡ replace chain: crafted degenerate runs, overlapping " +
    "and nested merges, multi-char symbols") {
    val merges = Seq(
      Bpe.Merge("a", "b"), Bpe.Merge("ab", "ab"), Bpe.Merge("a", "a"),
      Bpe.Merge("c", "ab"), Bpe.Merge("aa", "a"), Bpe.Merge("abab", "c"))
    val vocab = new BpeVocab(merges)
    val texts = Seq("", "a", "ab", "abab", "ababab", "abababab",
      "aaaaa", "aaaaaaaaa", "cabcab", "cababc", "aacaab", "abcabab",
      "aaabab aab caa", "babababa", "xyzzy", "a b ab ba",
      // newline-bearing: \n glues to the next code point in symbolize's
      // segmentation ("a\nb" → "|a|\nb|"), so "\na" is NOT the symbol "a"
      // and must block the (a,b) merge across it; trailing \n-runs sit
      // undelimited after the final separator
      "\n", "\n\n", "a\n", "a\n\n", "\na", "a\nb", "ab\nab", "a\nbab",
      "abab\n", "\n\nabab", "a\n\nb\nab")
    for (t <- texts)
      assert(BpeKernel.tokenizeString(t, vocab) === chainRef(t, merges), s"text <$t>")
  }

  test("BpeKernel ≡ replace chain: 300 random strings under a LEARNED " +
    "merge list (the only list shape the kernel accepts)") {
    val rnd = new scala.util.Random(41)
    val words = (0 until 60).map(_ =>
      (1 to 1 + rnd.nextInt(7)).map(_ => "aabbcde".charAt(rnd.nextInt(7))).mkString)
    val hist = words.groupBy(identity).map { case (w, g) => (w, g.size.toLong * 3) }.toArray
    val merges = Bpe.learn(hist, 40)
    assert(merges.size >= 10, s"fixture too thin: ${merges.size} merges")
    val vocab = new BpeVocab(merges)
    val texts = (0 until 300).map(_ =>
      (0 until rnd.nextInt(40)).map(_ => "aabbcde \n".charAt(rnd.nextInt(9))).mkString)
    for (t <- texts)
      assert(BpeKernel.tokenizeString(t, vocab) === chainRef(t, merges),
        s"text <${t.replace("\n", "\\n")}>")
  }

  test("BpeKernel: surrogate pairs stay whole code points, like both " +
    "engines' (.) regex") {
    val t = "a😀b😀😀c"
    val vocab = new BpeVocab(Seq(Bpe.Merge("😀", "😀")))
    assert(BpeKernel.tokenizeString(t, vocab) ===
      chainRef(t, vocab.merges.toSeq))
    assert(BpeKernel.tokenizeString(t, new BpeVocab(Nil)) === chainRef(t, Nil))
  }

  test("BpeTokenize expression ≡ applyMerges Column under codegen, " +
    "NULL passthrough included") {
    val merges = Seq(Bpe.Merge("a", "b"), Bpe.Merge("ab", "c"), Bpe.Merge("d", "d"))
    val rnd = new scala.util.Random(7)
    val texts = (0 until 80).map(_ =>
      (0 until rnd.nextInt(20)).map(_ => "abcd ".charAt(rnd.nextInt(5))).mkString) :+
      "" :+ "abcabc" :+ "dddddd" :+ "ababab"
    val df = texts.toDF("t")
    val chain = df.select(Bpe.applyMerges(Bpe.symbolize(col("t")), merges).as("s"))
      .as[String].collect()
    val fast = df.select(graft.functions.BpeTokenize.tokenize(col("t"), merges).as("s"))
      .as[String].collect()
    assert(fast.toSeq === chain.toSeq)
    val withNull = Seq(Some("ab"), None).toDF("t")
      .select(graft.functions.BpeTokenize.tokenize(col("t"), merges))
      .as[Option[String]].collect()
    assert(withNull.toSeq === Seq(Some("|ab|"), None))
  }

  test("BpeKernel ≡ replace chain at PRODUCTION vocabulary depth: a " +
    "~1500-merge ladder learned on hex pseudo-words (the byte-level-BPE " +
    "regime the tx_bpe_vocab scale leg runs), byte-identical on fresh docs") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(x: String): String =
      md.digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val hist = (0 until 3000).map(i => (hex("w" + i).substring(0, 9), 1L)).toArray
    val merges = Bpe.learn(hist, 1500)
    assert(merges.size >= 1200, s"ladder too shallow: ${merges.size}")
    val vocab = new BpeVocab(merges)
    // fresh documents (disjoint hashes): deep merges genuinely apply
    val docs = (0 until 12).map(d =>
      (0 until 30).map(i => hex(s"doc${d}_$i").substring(0, 9)).mkString(" "))
    for (t <- docs) {
      val fast = BpeKernel.tokenizeString(t, vocab)
      assert(fast === chainRef(t, merges), s"doc <${t.take(30)}...>")
      // sanity: the deep vocabulary actually merged something
      assert(fast.count(_ == '|') < t.length + 1)
    }
  }

  test("BpeVocab rejects non-well-formed merge lists (a symbol no earlier " +
    "merge produces) and delimiter-bearing symbols") {
    intercept[IllegalArgumentException] {
      new BpeVocab(Seq(Bpe.Merge("ab", "c"))) // 'ab' never produced
    }
    intercept[IllegalArgumentException] {
      new BpeVocab(Seq(Bpe.Merge("a", "b"), Bpe.Merge("ab", "cd")))
    }
    intercept[IllegalArgumentException] {
      new BpeVocab(Seq(Bpe.Merge("|", "a")))
    }
    new BpeVocab(Seq(Bpe.Merge("a", "b"), Bpe.Merge("ab", "c"))) // well-formed
  }
}
