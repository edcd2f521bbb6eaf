package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts of the batched decode stage (the mapInPandas analog):
  * batch boundaries must not change results, the codec must be called
  * once per batch (not per row), and ragged final batches must work. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, "x" * (i % 97 + 1))).toDF("doc_id", "text")
      .withColumn("payload", Multimodal.payload($"text"))

  test("decodeBatched: results independent of batch size (incl. ragged last batch)") {
    val df = docs(131).repartition(3)
    val bySize = Seq(1, 7, 64, 1000).map { bs =>
      Multimodal.decodeBatched(df, "doc_id", "payload", batchSize = bs)
        .collect().sortBy(_.doc_id).toSeq
    }
    bySize.tail.foreach(r => assert(r === bySize.head))
    // and the stub meta matches its spec
    val m = bySize.head(100) // doc 100 → 100 % 97 + 1 = 4 bytes
    assert(m === DecodedMeta(100L, m.format, 4 % 1920 + 64, 4 % 1080 + 64, 4))
    assert(m.format === (4 % 3 match { case 0 => "png"; case 1 => "jpeg"; case _ => "webp" }))
  }

  test("decodeBatched: one codec invocation per batch, not per row") {
    val calls = spark.sparkContext.longAccumulator("codec_calls")
    val rows = spark.sparkContext.longAccumulator("codec_rows")
    val df = docs(100).coalesce(1) // one partition → ceil(100/8)=13 calls
    val out = Multimodal.decodeBatched(df, "doc_id", "payload", batchSize = 8,
      decodeBatch = { batch =>
        calls.add(1); rows.add(batch.length)
        Multimodal.stubDecodeBatch(batch)
      }).count()
    assert(out === 100)
    assert(calls.value === 13, s"codec calls: ${calls.value}")
    assert(rows.value === 100)
  }

  test("decodeBatched: null ids/payloads are skipped, not NPE'd") {
    val df = Seq(
      (Some(1L), Some("abc")),
      (Some(2L), None),          // null payload
      (None, Some("def")),       // null id
      (Some(4L), Some("ghij"))
    ).toDF("doc_id", "text")
      .withColumn("payload", Multimodal.payload($"text"))
    val out = Multimodal.decodeBatched(df, "doc_id", "payload")
      .collect().map(_.doc_id).sorted.toSeq
    assert(out === Seq(1L, 4L))
  }

  test("decodeBatched with the REAL javax.imageio codec: true dimensions through the unchanged seam") {
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", out), "JDK must ship a PNG writer")
      out.toByteArray
    }
    val df = Seq(
      (1L, png(7, 5)),
      (2L, png(320, 200)),
      (3L, "definitely not an image".getBytes("UTF-8")), // no reader matches
      (4L, png(9, 9).take(20)) // PNG magic but truncated header: reader
                               // matches, then getWidth throws → dead-letter
    ).toDF("doc_id", "payload").repartition(2)
    val out = Multimodal.decodeBatched(df, "doc_id", "payload", batchSize = 2,
      decodeBatch = Multimodal.imageioDecodeBatch)
      .collect().map(m => m.doc_id -> ((m.format, m.width, m.height))).toMap
    assert(out(1L) === (("png", 7, 5)))
    assert(out(2L) === (("png", 320, 200)))
    assert(out(3L) === (("unknown", -1, -1)))
    assert(out(4L) === (("unknown", -1, -1)))
  }

  test("resizeBatched: real bilinear resize to target dims, round-trip decodable, dead-letters marked") {
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", out))
      out.toByteArray
    }
    val df = Seq(
      (1L, png(16, 12, 0xcc3344)),
      (2L, png(5, 9, 0x00ff00)),
      (3L, "not an image".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
    val out = Multimodal.resizeBatched(df, "doc_id", "payload", w = 4, h = 4)
      .collect().map(r => r.doc_id -> r).toMap
    for (id <- Seq(1L, 2L)) {
      assert(out(id).width === 4 && out(id).height === 4)
      // the emitted bytes are a real PNG of the target size
      val back = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(out(id).png))
      assert(back.getWidth === 4 && back.getHeight === 4)
      // solid-color input stays solid through bilinear resample
      assert((back.getRGB(2, 2) & 0xffffff) ===
        (if (id == 1L) 0xcc3344 else 0x00ff00))
    }
    assert(out(3L).width === -1 && out(3L).png.isEmpty)
  }

  test("featuresBatched: per-channel means exact on solid colors, dead-letters marked") {
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", out))
      out.toByteArray
    }
    val df = Seq(
      (1L, png(8, 6, 0x102030)),
      (2L, png(3, 3, 0xffffff)),
      (3L, Array[Byte](1, 2, 3))
    ).toDF("doc_id", "payload")
    val out = Multimodal.featuresBatched(df, "doc_id", "payload")
      .collect().map(r => r.doc_id -> r).toMap
    assert(out(1L).width === 8 && out(1L).height === 6)
    assert(out(1L).mean_r === 0x10.toDouble)
    assert(out(1L).mean_g === 0x20.toDouble)
    assert(out(1L).mean_b === 0x30.toDouble)
    assert(out(2L).mean_r === 255.0 && out(2L).mean_b === 255.0)
    assert(out(3L).width === -1 && out(3L).mean_r === -1.0)
  }

  test("checked-in PNG fixtures decode to their analytic channel means (the mm6 contract)") {
    // guards the committed fixture bytes themselves: if one is ever
    // re-encoded or corrupted, this fails before the driver oracle does
    val expected = Map(
      "checker.png" -> (4, 4, 127.5, 127.5, 127.5),
      "gradient.png" -> (256, 4, 127.5, 127.5, 77.0),
      "solid_rgb.png" -> (8, 6, 200.0, 30.0, 90.0))
    for ((name, (w, h, r, g, b)) <- expected) {
      val in = getClass.getResourceAsStream(s"/graft/fixtures/$name")
      assert(in != null, s"fixture $name missing from classpath")
      val bytes = try in.readAllBytes() finally in.close()
      val Seq(Some(got)) = Multimodal.imageioFeatureBatch(Seq(bytes))
      assert(got === ((w, h, r, g, b)), name)
    }
    // the truncated header: recognized magic, undecodable -> dead-letter
    val in = getClass.getResourceAsStream("/graft/fixtures/truncated.png")
    val bytes = try in.readAllBytes() finally in.close()
    assert(Multimodal.imageioFeatureBatch(Seq(bytes)) === Seq(None))
  }

  test("decodeBatched: codec returning a wrong-arity batch fails loudly") {
    val df = docs(5).coalesce(1)
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeBatched(df, "doc_id", "payload", batchSize = 5,
        decodeBatch = _ => Seq(("png", 64, 64))).count()
    }
    assert(ex.getMessage.contains("codec returned") ||
      Option(ex.getCause).exists(_.getMessage.contains("codec returned")))
  }

  test("audioFeaturesBatched with the REAL javax.sound codec: synthesized " +
    "WAVs round-trip to exact analytic RMS/duration; dead-letters marked; " +
    "results independent of batch size") {
    import spark.implicits._
    def square(n: Int, amp: Short): Array[Short] =
      Array.tabulate(n)(i => if (i % 2 == 0) amp else (-amp).toShort)
    // stereo: ch0 square at 2^13 (RMS 0.25 exactly), ch1 silent
    val stereo = {
      val ch0 = square(1000, 8192)
      Array.tabulate(2000)(i => if (i % 2 == 0) ch0(i / 2) else 0: Short)
    }
    val rows = Seq(
      (1L, Multimodal.pcm16Wav(8000, 1, square(4000, 16384))),
      (2L, Multimodal.pcm16Wav(44100, 2, stereo)),
      (3L, Multimodal.pcm16Wav(16000, 1, Array.empty[Short])), // zero frames
      (4L, Array[Byte](1, 2, 3))) // not audio -> dead-letter
    def run(batchSize: Int) = Multimodal.audioFeaturesBatched(
      rows.toDF("doc_id", "payload"), "doc_id", "payload", batchSize)
      .collect().map(a => a.doc_id -> a).toMap
    val out = run(64)
    assert(out(1L) === AudioFeatures(1L, 1, 8000, 4000L, 0.5, Seq(0.5)))
    assert(out(2L) === AudioFeatures(2L, 2, 44100, 1000L, 1000.0 / 44100,
      Seq(0.25, 0.0)))
    assert(out(3L) === AudioFeatures(3L, 1, 16000, 0L, 0.0, Seq(0.0)))
    assert(out(4L) === AudioFeatures(4L, -1, -1, -1L, -1.0, Seq.empty))
    // seam contract: batch boundaries never change a row's result
    for (bs <- Seq(1, 3)) assert(run(bs) === out, s"batchSize=$bs")
  }

  test("extractTextBatched: REAL RTF through javax.swing.text.rtf, HTML " +
    "edge cases (nested tags, entities, comments, case-insensitive " +
    "script), sniffing, dead-letters; batch-size invariant") {
    import spark.implicits._
    def b(s: String) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val rtf = b("""{\rtf1\ansi{\fonttbl\f0\fswiss Helvetica;}\f0\pard
        |Hello from RTF land.\par
        |}""".stripMargin)
    val rows = Seq(
      (1L, b("<html><body><p>plain &amp; simple</p></body></html>")),
      (2L, b("  \n <DIV><SCRIPT type='x'>var a = '<p>';</SCRIPT>" +
        "kept <b>bold</b> text<!-- gone --></DIV>")), // ws prefix + upper tags
      (3L, rtf),
      (4L, b("{\\rtf1 \\unclosed")), // RTF magic, broken body — RTFEditorKit is lenient OR dead-letters; pin below
      (5L, b("no markup prefix at all")),
      (6L, b("<p>&lt;tag&gt; &quot;q&quot; &#39;a&#39;&nbsp;end.</p>")))
    def run(batchSize: Int) = Multimodal.extractTextBatched(
      rows.toDF("doc_id", "payload"), "doc_id", "payload", batchSize)
      .collect().map(e => e.doc_id -> e).toMap
    val out = run(64)
    assert(out(1L) === ExtractedDoc(1L, "html", 14, 3, "plain & simple"))
    assert(out(2L) === ExtractedDoc(2L, "html", 14, 3, "kept bold text"))
    // RTF: the JDK parser yields the paragraph text; whitespace-collapsed
    assert(out(3L).format === "rtf")
    assert(out(3L).text === "Hello from RTF land.")
    assert(out(3L).n_words === 4 && out(3L).n_chars === 20)
    // broken RTF must not kill the task: either parsed leniently (rtf)
    // or dead-lettered (error) — pin the actual JDK behavior
    assert(Set("rtf", "error").contains(out(4L).format))
    assert(out(5L) === ExtractedDoc(5L, "error", -1, -1, null))
    assert(out(6L) === ExtractedDoc(6L, "html", 18, 4, "<tag> \"q\" 'a' end."))
    for (bs <- Seq(1, 2)) assert(run(bs) === out, s"batchSize=$bs")
  }

  test("mm9 dHash pipeline: PNG roundtrip is pixel-lossless, planted one-pixel " +
    "near-dups land at hamming <= 1 and exact copies at 0, both found by banding; " +
    "undecodable payloads dead-letter") {
    import spark.implicits._
    def v(src: Long, x: Int, y: Int): Int =
      ((3 * (src % 7 + 1) * x + 5 * (src % 11 + 1) * y + src) % 256).toInt
    // roundtrip: decode(grayPng(f)) == f on the full grid
    val png = Multimodal.grayPng(18, 16)((x, y) => v(7L, x, y))
    val Some((w, h, px)) = Multimodal.imageioGrayPixelsBatch(Seq(png)).head
    assert((w, h) == (18, 16))
    for (y <- 0 until 16; x <- 0 until 18)
      assert(px(y * 18 + x) == v(7L, x, y), s"pixel ($x,$y) not lossless")
    // planted pairs: near-dup (one pixel +1) and exact copy
    val rows = Seq(
      (1L, Multimodal.grayPng(18, 16)((x, y) => v(1L, x, y))),
      (2L, Multimodal.grayPng(18, 16)((x, y) =>
        if (x == 0 && y == 0) (v(1L, x, y) + 1) % 256 else v(1L, x, y))),
      (3L, Multimodal.grayPng(18, 16)((x, y) => v(1L, x, y))),
      (4L, Multimodal.grayPng(18, 16)((x, y) => v(23L, x, y))),
      (5L, Array[Byte](1, 2, 3)) // undecodable -> dead-letter
    ).toDF("doc_id", "payload")
    val decoded = Multimodal.grayPixelsBatched(rows, "doc_id", "payload").toDF()
    assert(decoded.filter(col("width") === -1).select("doc_id")
      .as[Long].collect().toSeq == Seq(5L), "truncated payload must dead-letter")
    val (lo, hi) = Multimodal.dhashHalves(col("pixels"))
    val hs = decoded.filter(col("width") === 18)
      .select(col("doc_id"), lo.as("h_lo"), hi.as("h_hi"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    assert(ham(hs(1L), hs(3L)) == 0, "exact copy must hash identically")
    assert(ham(hs(1L), hs(2L)) <= 1,
      s"one-pixel perturbation flips at most dHash bit (0,0): ${ham(hs(1L), hs(2L))}")
    // halves hold 32 bits each -> never negative, never above 2^32-1
    hs.values.foreach { case (l, hh) =>
      assert(l >= 0L && l < (1L << 32) && hh >= 0L && hh < (1L << 32)) }
    // banding guarantee: hamming <= 1 differs in at most one of the four
    // 16-bit bands, so the banded join CANNOT miss the planted pairs
    val found = graft.SparkEntry.queries("mm9_image_near_dup")(spark, "unused")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    (101L to 110L).foreach { id =>
      assert(found.contains((8 * (id - 100), id)), s"planted near-dup ($id) missed") }
    (121L to 125L).foreach { id =>
      assert(found.contains((id - 120, id)), s"planted exact copy ($id) missed") }
  }

  test("mm10 incremental image near-dup: the new batch against the persisted " +
    "dHash band index finds every planted new-vs-existing and new-vs-new " +
    "pair with the right side label (the dd11 replay pattern on images)") {
    import spark.implicits._
    val out = graft.SparkEntry
      .queries("mm10_image_near_dup_incremental")(spark, "unused")
      .select("new_doc", "matched_doc", "matched_side")
      .as[(Long, Long, String)].collect().toSet
    // 10 one-pixel perturbations of existing 8, 16, …, 80
    (201L to 210L).foreach { id =>
      assert(out.contains((id, 8 * (id - 200), "existing")),
        s"planted perturbed replay $id missed") }
    // 5 exact copies + 5 perturbed copies of existing 1, 3, 5, 7, 9
    (221L to 225L).foreach { id =>
      assert(out.contains((id, 2 * (id - 220) - 1, "existing")),
        s"planted exact copy $id missed") }
    (231L to 235L).foreach { id =>
      assert(out.contains((id, 2 * (id - 230) - 1, "existing")),
        s"planted perturbed copy $id missed") }
    // the new-vs-new arm: copy k pairs with its perturbed sibling
    (0 until 5).foreach { k =>
      assert(out.contains((221L + k, 231L + k, "new")),
        s"new-vs-new pair ${221 + k}/${231 + k} missed") }
  }

  test("mm11 audio fingerprint: PCM roundtrip is sample-lossless, planted " +
    "one-sample near-dups land at hamming <= 1 and exact copies at 0, both " +
    "found by banding; junk and stereo payloads dead-letter") {
    import spark.implicits._
    def v(src: Long, t: Int): Int =
      ((3 * (src % 7 + 1) * t + 5 * (src % 11 + 1) * (t / 32) + src * 11)
        % 401 - 200).toInt
    // roundtrip: decode(pcm16Wav(f)) == f over the full grid
    val wav = Multimodal.pcm16Wav(8000, 1,
      Array.tabulate(2080)(t => v(7L, t).toShort))
    val Some((ch, rate, smp)) =
      Multimodal.javaSoundMonoSamplesBatch(Seq(wav)).head
    assert(ch == 1 && rate == 8000 && smp.length == 2080)
    (0 until 2080).foreach(t =>
      assert(smp(t) == v(7L, t), s"sample $t not lossless"))
    // planted pairs through the full registered query
    val out = graft.SparkEntry.queries("mm11_audio_near_dup")(spark, "unused")
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Long)].collect()
    val pairs = out.map(r => (r._1, r._2)).toSet
    val dist = out.map(r => (r._1, r._2) -> r._3).toMap
    (101L to 110L).foreach { id =>
      assert(pairs.contains((6 * (id - 100), id)), s"planted near-dup $id missed")
      assert(dist((6 * (id - 100), id)) <= 1L,
        s"one-sample perturbation must flip at most fingerprint bit 0") }
    (121L to 125L).foreach { id =>
      assert(pairs.contains((id - 120, id)), s"planted exact copy $id missed")
      assert(dist((id - 120, id)) === 0L, "exact copy must hash identically") }
    // the junk (131) and stereo (132) payloads dead-letter at the gate
    assert(!out.exists(r => r._1 >= 131L || r._2 >= 131L),
      "dead-letter clips must never reach the banded join")
  }

  test("mm12 incremental audio near-dup: the new batch against the persisted " +
    "fingerprint band index finds every planted new-vs-existing and " +
    "new-vs-new pair with the right side label (the dd11/mm10 replay " +
    "pattern on audio; freshBatch's idempotent-replay contract is " +
    "pinned in BandedHammingSpec)") {
    import spark.implicits._
    val out = graft.SparkEntry
      .queries("mm12_audio_near_dup_incremental")(spark, "unused")
      .select("new_doc", "matched_doc", "matched_side")
      .as[(Long, Long, String)].collect().toSet
    // 10 one-sample perturbations of existing clips 6, 12, …, 60
    (301L to 310L).foreach { id =>
      assert(out.contains((id, 6 * (id - 300), "existing")),
        s"planted perturbed replay $id missed") }
    // 5 exact copies + 5 perturbed copies of existing clips 1, 3, 5, 7, 9
    (321L to 325L).foreach { id =>
      assert(out.contains((id, 2 * (id - 320) - 1, "existing")),
        s"planted exact copy $id missed") }
    (331L to 335L).foreach { id =>
      assert(out.contains((id, 2 * (id - 330) - 1, "existing")),
        s"planted perturbed copy $id missed") }
    // the new-vs-new arm: copy k pairs with its perturbed sibling
    (0 until 5).foreach { k =>
      assert(out.contains((321L + k, 331L + k, "new")),
        s"new-vs-new pair ${321 + k}/${331 + k} missed") }
  }
}
