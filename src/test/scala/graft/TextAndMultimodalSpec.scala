package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis
import graft.multimodal.Multimodal

class TextAndMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("token counts: whitespace vs BPE-ish") {
    val df = Seq((1L, "Hello, world! 42 times")).toDF("id", "text")
    val r = df.select(
      TextAnalysis.wsTokenCount(col("text")).as("ws"),
      TextAnalysis.bpeishTokenCount(col("text")).as("bpe")).head
    assert(r.getAs[Int]("ws") === 4)
    // Hello , world ! 4 2 times -> 7
    assert(r.getAs[Int]("bpe") === 7)
  }

  test("langId picks the language with most stopword hits; und when none") {
    val df = Seq(
      (1L, "the cat and the dog of a house"),
      (2L, "le chat et la maison des gens"),
      (3L, "xyzzy qwerty")).toDF("id", "text")
    val out = df.select(col("id"), TextAnalysis.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "en")
    assert(out(2L) === "fr")
    assert(out(3L) === "und")
  }

  test("quality features compute exact ratios") {
    val df = Seq((1L, "the cat sat.")).toDF("id", "text")
    val feats = TextAnalysis.qualityFeatures(col("text"))
    val r = df.select(feats.map { case (n, c) => c.as(n) }: _*).head
    assert(r.getAs[Double]("n_chars") === 12.0)
    assert(r.getAs[Double]("n_words") === 3.0)
    assert(r.getAs[Double]("punct_ratio") === 1.0 / 12.0)
    assert(r.getAs[Double]("stopword_ratio") === 1.0 / 3.0)
  }

  test("tfidfTopTerms ranks each doc's salient terms by tf x N/df, exact scores") {
    // 'cat' appears in all 3 docs (df=3); 'moon' only in doc 3 (df=1)
    val df = Seq(
      (1L, "cat cat dog"),
      (2L, "cat dog dog dog"),
      (3L, "cat moon")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(df, "doc_id", "text", topK = 2)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank")) ->
        (r.getAs[String]("term"), r.getAs[Double]("score"))).toMap
    // doc 1: cat tf=2 df=3 -> 2*3/3=2.0; dog tf=1 df=2 -> 1.5
    assert(out((1L, 1L)) === ("cat", 2.0))
    assert(out((1L, 2L)) === ("dog", 1.5))
    // doc 2: dog tf=3 df=2 -> 4.5; cat 1.0
    assert(out((2L, 1L)) === ("dog", 4.5))
    assert(out((2L, 2L)) === ("cat", 1.0))
    // doc 3: moon tf=1 df=1 -> 3.0 beats cat 1.0
    assert(out((3L, 1L)) === ("moon", 3.0))
    assert(out((3L, 2L)) === ("cat", 1.0))
    // null text contributes no rows and doesn't shift N
    val withNull = df.union(Seq((4L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val out2 = TextAnalysis.tfidfTopTerms(withNull, "doc_id", "text", topK = 1)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(out2 === Set(1L, 2L, 3L))
  }

  test("c4QualityFilter: line rule (token floor + blocklist) then doc gate, with accounting") {
    val df = Seq(
      // 3 clean 3-token lines, floor 2 -> kept
      (1L, "a b c\nd e f\ng h i"),
      // badword line + a 2-token line cut, leaving 2 -> doc rejected
      (2L, "a b c\nbad x y\nd e f\ng h"),
      // short lines cut by the token floor
      (3L, "a\nb\nc d e\nf g h\ni j k")).toDF("doc_id", "text")
    val out = TextAnalysis.c4QualityFilter(df, "doc_id", "text",
        badWords = Seq("bad"), minLineTokens = 3, minLinesKept = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("kept"), r.getAs[String]("clean_text"),
          r.getAs[Long]("n_lines_kept"), r.getAs[Long]("n_lines_cut")))).toMap
    assert(out(1L) === ((true, "a b c\nd e f\ng h i", 3L, 0L)))
    // badword line and the 2-token tail line both cut -> 2 kept < 3
    assert(out(2L) === ((false, "", 2L, 2L)))
    // two 1-token lines cut, 3 kept -> passes the doc gate
    assert(out(3L) === ((true, "c d e\nf g h\ni j k", 3L, 2L)))
  }

  test("bm25TopK: rarer term dominates, length-normalization demotes long docs") {
    val df = Seq(
      (1L, "x y moon"),          // rare term once, short doc
      (2L, "x y z w q r s t u v a b c d e f g h i j k l m n o p moon"), // rare term, long doc
      (3L, "x cat y cat"),       // common term twice
      (4L, "x y z"),             // no query term
      (5L, "cat z")).toDF("doc_id", "text") // common term once
    val out = TextAnalysis.bm25TopK(df, "doc_id", "text",
      queryTerms = Seq("moon", "cat"), topK = 4).collect()
    val ranked = out.map(_.getAs[Long]("doc_id")).toSeq
    val scores = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    // doc3: tf=2 of a query term beats every single-hit doc
    assert(ranked.head === 3L)
    // same tf of moon but doc2 is ~9x longer -> strictly lower score,
    // lowest of the docs with any hit
    assert(scores(2L) < scores(1L))
    assert(ranked.last === 2L)
    // doc4 has no query term (score 0): pushed out of the top-4
    // entirely by the four docs with hits
    assert(ranked.toSet === Set(1L, 2L, 3L, 5L))
    // every score is on the r6 grid (selection ran on the grid)
    out.foreach { r =>
      val s = r.getAs[Double]("score")
      assert(s === math.floor(s * 1e6 + 0.5001) / 1e6)
    }
  }

  test("fingerprint is deterministic and order-sensitive beyond the shingle window") {
    val df = Seq(
      (1L, (1 to 20).map("w" + _).mkString(" ")),
      (2L, (1 to 20).map("w" + _).mkString(" ")),
      (3L, (20 to 1 by -1).map("w" + _).mkString(" "))).toDF("id", "text")
    val fp = df.select(col("id"),
        array_min(TextAnalysis.fingerprintShingles(col("text"))).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) !== fp(3L))
  }

  test("normalizeWs lowercases, collapses whitespace runs, trims") {
    val out = Seq("  Hello\t\tWorld \n and  MORE  ")
      .toDF("text").select(TextAnalysis.normalizeWs($"text").as("n"))
      .head.getString(0)
    assert(out === "hello world and more")
  }

  test("redactPii masks emails, phones, and long digit runs; leaves prose alone") {
    val fixtures = Seq(
      ("mail me at jane.doe+x@example.co.uk today",
        "mail me at <EMAIL> today"),
      ("call +1 (555) 123-4567 or 555.123.4567",
        "call <PHONE> or <PHONE>"),
      ("card 4111111111111111 leaked", "card <NUM> leaked"),
      ("version 3 of chapter 12 in 2024", "version 3 of chapter 12 in 2024"))
    val out = fixtures.map(_._1).toDF("text")
      .select(TextAnalysis.redactPii($"text").as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(out === fixtures.map(_._2))
  }

  test("piiReport counts exactly the substitutions redactPii makes, per source") {
    val docs = Seq(
      (1L, "mail me at jane.doe+x@example.co.uk today", "s1"),
      (2L, "card 4111111111111111 leaked", "s1"),
      (3L, "no pii in this doc at all", "s1"),
      (4L, "call +1 (555) 123-4567 or 555.123.4567", "s2"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.piiReport(docs, "source", "text")
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_email"),
          r.getAs[Long]("n_num"), r.getAs[Long]("n_phone"),
          r.getAs[Long]("n_flagged")))).toMap
    assert(got("s1") === ((3L, 1L, 1L, 0L, 2L)))
    assert(got("s2") === ((1L, 0L, 0L, 2L, 1L)))
  }

  test("multimodal: audio windowing emits hop-spaced windows with exact PCM byte ranges") {
    val docs = Seq((7L, "0123456789abcdef", 3L)).toDF("doc_id", "text", "n_chars")
    // n_chars=3 -> sample_rate 16000, n_samples 3*317%480000+16000 = 16951
    val audio = Multimodal.withAudioSchema(docs, "doc_id", "text", "n_chars")
    val meta = audio.select(col("meta.sample_rate"), col("meta.n_samples")).head
    assert(meta.getInt(0) === 16000 && meta.getLong(1) === 16951L)
    // 1s window, 0.5s hop -> starts 0, 8000, 16000; last clips at 16951
    val w = Multimodal.sampleAudioWindows(audio, windowMs = 1000, hopMs = 500)
      .orderBy("start_sample").collect()
      .map(r => (r.getAs[Long]("start_sample"), r.getAs[Long]("end_sample"),
        r.getAs[Long]("byte_offset"), r.getAs[Long]("byte_len")))
    assert(w.toSeq === Seq(
      (0L, 16000L, 0L, 32000L),
      (8000L, 16951L, 16000L, 17902L),
      (16000L, 16951L, 32000L, 1902L)))
  }

  test("repetitionSignals computes Gopher-style dup-line and dup-2gram fractions") {
    val docs = Seq(
      // "a b" occurs twice among 3 grams -> 2/3; line "x" twice among
      // lines (x:1ch x2 dup, y:1ch) -> 2/3 of line chars
      (1L, "x\ny\nx"),
      (2L, "a b a b"), // grams: "a b","b a","a b" -> 2 dup of 3
      (3L, "solo"),    // one word: no grams -> null; one line -> 0.0
      (4L, "p q r"))   // all unique -> 0.0, 0.0
    val out = TextAnalysis.repetitionSignals(
        docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Double]),
          Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(out(1L)._1.get === 2.0 / 3)
    assert(out(2L)._2.get === 2.0 / 3)
    assert(out(3L) === (Some(0.0), None))
    assert(out(4L) === (Some(0.0), Some(0.0)))
  }

  test("charEntropy: known distributions, empty/null text, repetition floor") {
    import org.apache.spark.sql.graft.TextExpressions.charEntropy
    val df = Seq(
      (1L, "aaaa"),           // one symbol -> 0 bits
      (2L, "abab"),           // two equiprobable -> 1 bit
      (3L, "abcd"),           // four equiprobable -> 2 bits
      (4L, ""),               // empty -> 0 by contract
      (5L, null.asInstanceOf[String]),
      (6L, "aab"))            // 2/3,1/3 -> log2(3) - 2/3
      .toDF("id", "t")
    val out = df.select($"id", charEntropy($"t").as("e")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap
    assert(out(1L) === 0.0)
    assert(math.abs(out(2L).asInstanceOf[Double] - 1.0) < 1e-12)
    assert(math.abs(out(3L).asInstanceOf[Double] - 2.0) < 1e-12)
    assert(out(4L) === 0.0)
    assert(out(5L) === null)
    val h3 = math.log(3.0) / math.log(2.0) - 2.0 / 3.0
    assert(math.abs(out(6L).asInstanceOf[Double] - h3) < 1e-12)
    // ordering property the quality filter relies on: repetition
    // scores strictly below varied prose of the same length
    assert(out(1L).asInstanceOf[Double] < out(2L).asInstanceOf[Double])
  }

  test("multimodal: media schema carries binary payload + typed metadata") {
    val docs = Seq((7L, "abc", 3L)).toDF("doc_id", "text", "n_chars")
    val m = Multimodal.withMediaSchema(docs, "doc_id", "text", "n_chars").head
    assert(m.getAs[Array[Byte]]("payload") === "abc".getBytes("UTF-8"))
    assert(m.getAs[org.apache.spark.sql.Row]("meta").getAs[Int]("width") === 4)
  }

  test("multimodal: feature extraction batches inside partitions and normalizes") {
    val docs = (1L to 150L).map(i => (i, "x" * i.toInt, i)).toDF("doc_id", "text", "n_chars")
    val media = Multimodal.withMediaSchema(docs, "doc_id", "text", "n_chars")
      .repartition(1)
    val out = Multimodal.extractFeatures(spark, media, batchSize = 64).collect()
    assert(out.length === 150)
    assert(out.map(_.batch_size).max === 64) // full batches capped at batchSize
    assert(out.forall(f => math.abs(f.features.sum - 1.0f) < 1e-5))
  }

  test("multimodal: phash bits follow the floor-mapped luminance threshold; ties and corrupt payloads handled") {
    // 2x1 black|white: grid cells tx<4 sample pixel 0 (lum 0), tx>=4
    // sample pixel 1 (lum 255000) -> every row reads "00001111"
    val bw = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    bw.setRGB(0, 0, 0x000000); bw.setRGB(1, 0, 0xFFFFFF)
    // constant image: every lum equals the mean -> tie -> all bits 0
    val const = new java.awt.image.BufferedImage(
      3, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 3) const.setRGB(x, y, 0x123456)
    def png(i: java.awt.image.BufferedImage): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(i, "png", b); b.toByteArray
    }
    val media = Seq(
      (1L, png(bw), 2, 1, "png"),
      (2L, png(const), 3, 2, "png"),
      (3L, "not an image".getBytes("UTF-8"), 9, 9, "png"))
      .toDF("doc_id", "payload", "width", "height", "format")
      .select(col("doc_id"), col("payload"),
        struct(col("width"), col("height"), col("format")).as("meta"))
    val out = Multimodal.phashFeatures(spark, media, batchSize = 8)
      .collect().map(r => r.doc_id -> r).toMap
    assert(out(1L).decoded)
    assert(out(1L).phash_bits === "00001111" * 8)
    assert(out(1L).n_set === 32L)
    assert(out(2L).decoded)
    assert(out(2L).phash_bits === "0" * 64 && out(2L).n_set === 0L)
    assert(!out(3L).decoded && out(3L).phash_bits === "")
  }

  test("multimodal: real PNG decode recovers known pixel values; corrupt payloads fall back") {
    // hand-built 2x1 image with known pixels: (255,0,0) and (0,128,255)
    val img = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000)
    img.setRGB(1, 0, 0x0080FF)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val media = Seq(
      (1L, baos.toByteArray, 2, 1, "png"),
      (2L, "definitely not an image".getBytes("UTF-8"), 9, 9, "png"))
      .toDF("doc_id", "payload", "width", "height", "format")
      .select(col("doc_id"), col("payload"),
        struct(col("width"), col("height"), col("format")).as("meta"))
    val out = Multimodal.extractFeatures(spark, media, batchSize = 8)
      .collect().map(f => f.doc_id -> f).toMap
    val ok = out(1L)
    assert(ok.decoded && ok.img_width === 2 && ok.img_height === 1 &&
      ok.channels === 3)
    assert(math.abs(ok.features(0) - (255.0 + 0) / 2 / 255.0) < 1e-12) // mean R
    assert(math.abs(ok.features(1) - (0.0 + 128) / 2 / 255.0) < 1e-12) // mean G
    assert(math.abs(ok.features(2) - (0.0 + 255) / 2 / 255.0) < 1e-12) // mean B
    val bad = out(2L)
    assert(!bad.decoded && bad.channels === 0)
    assert(math.abs(bad.features.sum - 1.0) < 1e-9) // histogram fallback
  }

  test("multimodal: palette (indexed) PNG decodes to real channel means, not colormap indices") {
    // 2-entry palette: index 0 = pure red, index 1 = pure blue
    val cm = new java.awt.image.IndexColorModel(1, 2,
      Array[Byte](255.toByte, 0), Array[Byte](0, 0), Array[Byte](0, 255.toByte))
    val img = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_BYTE_BINARY, cm)
    img.setRGB(0, 0, 0xFF0000) // red -> palette index 0
    img.setRGB(1, 0, 0x0000FF) // blue -> palette index 1
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val media = Seq((1L, baos.toByteArray, 2, 1, "png"))
      .toDF("doc_id", "payload", "width", "height", "format")
      .select(col("doc_id"), col("payload"),
        struct(col("width"), col("height"), col("format")).as("meta"))
    val f = Multimodal.extractFeatures(spark, media, batchSize = 8).head()
    assert(f.decoded && f.channels === 3)
    // raster samples would be indices {0, 1}; real means are half-red,
    // zero green, half-blue
    assert(math.abs(f.features(0) - 0.5) < 1e-12)
    assert(f.features(1) === 0.0)
    assert(math.abs(f.features(2) - 0.5) < 1e-12)
  }

  test("multimodal: synthesized PNG payloads decode back to the analytic channel means") {
    val docs = Seq((3L, "x", 1L), (10L, "y", 2L), (17L, "z", 3L))
      .toDF("doc_id", "text", "n_chars")
    val media = Multimodal.withPngPayloads(docs, "doc_id")
    val out = Multimodal.extractFeatures(spark, media, batchSize = 8)
      .collect().map(f => f.doc_id -> f).toMap
    Seq(3L, 10L, 17L).foreach { id =>
      val w = (id % 6 + 2).toInt; val h = (id % 4 + 3).toInt
      val f = out(id)
      assert(f.decoded && f.img_width === w && f.img_height === h &&
        f.channels === 3, s"id $id")
      val n = w * h
      def mean(m: Long, a: Long): Double =
        (0 until n).map(k => (m * id + a * k) % 256).sum.toDouble / n / 255.0
      assert(math.abs(f.features(0) - mean(1, 3)) < 1e-12, s"id $id R")
      assert(math.abs(f.features(1) - mean(5, 7)) < 1e-12, s"id $id G")
      assert(math.abs(f.features(2) - mean(11, 13)) < 1e-12, s"id $id B")
    }
  }

  test("multimodal: synthesized WAV payloads decode back to the analytic window means") {
    val docs = Seq((5L, "x", 1L), (42L, "y", 2L), (119L, "z", 3L))
      .toDF("doc_id", "text", "n_chars")
    val audio = Multimodal.withWavPayloads(docs, "doc_id")
    val out = Multimodal
      .decodeAudioWindows(spark, audio, windowSamples = 32, hopSamples = 16)
      .collect().groupBy(_.doc_id)
    Seq(5L, 42L, 119L).foreach { id =>
      val n = (id % 120 + 40).toInt
      val rows = out(id).sortBy(_.start_sample)
      // decoder-reported container facts, not ridden-along metadata
      assert(rows.forall(r => r.decoded && r.sample_rate === 8000 &&
        r.n_samples === n.toLong), s"id $id")
      // hop-16 window starts strictly below n
      assert(rows.map(_.start_sample).toSeq ===
        (0 until n by 16).map(_.toLong), s"id $id starts")
      rows.foreach { r =>
        val e = math.min(r.start_sample + 32, n.toLong)
        assert(r.end_sample === e)
        val exp = (r.start_sample until e)
          .map(k => ((31 * id + 17 * k) % 65536 - 32768).toDouble)
        assert(math.abs(r.mean_amp - exp.sum / exp.size) < 1e-12,
          s"id $id window ${r.start_sample}")
      }
    }
  }

  test("multimodal: corrupt or non-s16le-mono audio degrades to one decoded=false row") {
    import spark.implicits._
    val bad = Seq(
      Multimodal.AudioRecord(1L, "not a wav at all".getBytes("UTF-8")),
      Multimodal.AudioRecord(2L, Array.empty[Byte]))
      .toDF("doc_id", "payload")
    val out = Multimodal
      .decodeAudioWindows(spark, bad, windowSamples = 32, hopSamples = 16)
      .collect()
    assert(out.length === 2 && out.forall(r => !r.decoded))
  }

  test("multimodal: nearest-neighbor resize samples the floor-mapped pixels exactly") {
    // 2x2 image, four distinct pixels
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000); img.setRGB(1, 0, 0x00FF00)
    img.setRGB(0, 1, 0x0000FF); img.setRGB(1, 1, 0xFFFFFF)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val media = Seq(
      (1L, baos.toByteArray, 2, 2, "png"),
      (2L, "not an image".getBytes("UTF-8"), 9, 9, "png"))
      .toDF("doc_id", "payload", "width", "height", "format")
      .select(col("doc_id"), col("payload"),
        struct(col("width"), col("height"), col("format")).as("meta"))
    // downsample to 1x1: floor mapping names source pixel (0,0) only
    val down = Multimodal.resizeFeatures(spark, media, outW = 1, outH = 1)
      .collect().map(f => f.doc_id -> f).toMap
    assert(down(1L).decoded && down(1L).src_width === 2)
    assert(down(1L).means.toSeq === Seq(1.0, 0.0, 0.0)) // pure red
    assert(!down(2L).decoded && down(2L).means.isEmpty)  // corrupt fallback
    // upsample to 4x4: each source pixel replicated 2x2 -> means are
    // the full-image means (each pixel sampled equally often)
    val up = Multimodal.resizeFeatures(spark, media, outW = 4, outH = 4)
      .collect().map(f => f.doc_id -> f).toMap
    val m = up(1L).means
    assert(math.abs(m(0) - (255.0 + 0 + 0 + 255) / 4 / 255.0) < 1e-12)
    assert(math.abs(m(1) - (0.0 + 255 + 0 + 255) / 4 / 255.0) < 1e-12)
    assert(math.abs(m(2) - (0.0 + 0 + 255 + 255) / 4 / 255.0) < 1e-12)
  }

  test("multimodal: bilinear resize blends the integer corner stencil exactly") {
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000); img.setRGB(1, 0, 0x00FF00)
    img.setRGB(0, 1, 0x0000FF); img.setRGB(1, 1, 0xFFFFFF)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val media = Seq(
      (1L, baos.toByteArray, 2, 2, "png"),
      (2L, "not an image".getBytes("UTF-8"), 9, 9, "png"))
      .toDF("doc_id", "payload", "width", "height", "format")
      .select(col("doc_id"), col("payload"),
        struct(col("width"), col("height"), col("format")).as("meta"))
    // 1x1: target (0,0) has rx=ry=0 -> all weight on source (0,0)
    val down = Multimodal.resizeBilinearFeatures(spark, media, outW = 1, outH = 1)
      .collect().map(f => f.doc_id -> f).toMap
    assert(down(1L).decoded && down(1L).means.toSeq === Seq(1.0, 0.0, 0.0))
    assert(!down(2L).decoded && down(2L).means.isEmpty)
    // 4x4: driver-side reference of the same integer stencil over the
    // four known pixels (red/green/blue/white), summed per channel
    val px = Map((0, 0) -> 0xFF0000, (1, 0) -> 0x00FF00,
      (0, 1) -> 0x0000FF, (1, 1) -> 0xFFFFFF)
    val sums = new Array[Long](3)
    for (ty <- 0 until 4; tx <- 0 until 4) {
      val xn = tx * 2; val x0 = xn / 4; val rx = xn % 4
      val x1 = math.min(x0 + 1, 1)
      val yn = ty * 2; val y0 = yn / 4; val ry = yn % 4
      val y1 = math.min(y0 + 1, 1)
      val ws = Seq(((x0, y0), (4 - rx).toLong * (4 - ry)),
        ((x1, y0), rx.toLong * (4 - ry)),
        ((x0, y1), (4 - rx).toLong * ry), ((x1, y1), rx.toLong * ry))
      for (c <- 0 until 3; s = 16 - 8 * c)
        sums(c) += ws.map { case (p, w) => ((px(p) >> s) & 0xff) * w }.sum
    }
    val expected = sums.map(_.toDouble / 16 / 16 / 255.0).toSeq
    val up = Multimodal.resizeBilinearFeatures(spark, media, outW = 4, outH = 4)
      .collect().map(f => f.doc_id -> f).toMap
    assert(up(1L).means.toSeq === expected)
    // and blending really happened: interior pixels mix channels, so
    // the bilinear green mean exceeds nearest's (green bleeds into
    // more target pixels than the floor mapping samples)
    val nn = Multimodal.resizeFeatures(spark, media, outW = 4, outH = 4)
      .collect().map(f => f.doc_id -> f).toMap
    assert(up(1L).means.toSeq !== nn(1L).means.toSeq)
  }

  test("multimodal: resize of synthesized PNGs matches the analytic floor-mapped means") {
    val docs = Seq((3L, "x", 1L), (10L, "y", 2L), (17L, "z", 3L))
      .toDF("doc_id", "text", "n_chars")
    val media = Multimodal.withPngPayloads(docs, "doc_id")
    val out = Multimodal.resizeFeatures(spark, media, outW = 4, outH = 3)
      .collect().map(f => f.doc_id -> f).toMap
    Seq(3L, 10L, 17L).foreach { id =>
      val w = (id % 6 + 2).toInt; val h = (id % 4 + 3).toInt
      val f = out(id)
      assert(f.decoded && f.src_width === w && f.src_height === h, s"id $id")
      val ks = for (ty <- 0 until 3; tx <- 0 until 4)
        yield (ty * h / 3).toLong * w + (tx * w / 4)
      def mean(m: Long, a: Long): Double =
        ks.map(k => (m * id + a * k) % 256).sum.toDouble / 12 / 255.0
      assert(math.abs(f.means(0) - mean(1, 3)) < 1e-12, s"id $id R")
      assert(math.abs(f.means(1) - mean(5, 7)) < 1e-12, s"id $id G")
      assert(math.abs(f.means(2) - mean(11, 13)) < 1e-12, s"id $id B")
    }
  }

  test("multimodal: frame sampling emits one row per interval with decoder seek indices") {
    // duration 2200 ms at 25 fps -> samples at 0/500/1000/1500/2000 ms
    val docs = Seq((1L, "0123456789abcdef0123456789abcdef0123456789", 1200L))
      .toDF("doc_id", "text", "n_chars")
    val video = Multimodal.withVideoSchema(docs, "doc_id", "text", "n_chars")
    val meta = video.select(col("meta.duration_ms"), col("meta.fps")).head
    assert(meta.getInt(0) === 2200 && meta.getDouble(1) === 20.0) // 1200%3=0 -> 20fps
    val frames = Multimodal.sampleFrames(video, everyMs = 500)
      .orderBy("frame_ts_ms").collect()
    assert(frames.map(_.getAs[Int]("frame_ts_ms")).toSeq ===
      Seq(0, 500, 1000, 1500, 2000))
    // frame_idx = floor(ts * fps / 1000)
    assert(frames.map(_.getAs[Long]("frame_idx")).toSeq === Seq(0L, 10L, 20L, 30L, 40L))
    // stub slice: 16 bytes from (ts % 32) + 1, clamped at payload end
    assert(frames(0).getAs[Array[Byte]]("frame_bytes").length === 16)
    assert(frames(1).getAs[Array[Byte]]("frame_bytes") ===
      "0123456789abcdef0123456789abcdef0123456789".substring(20, 36).getBytes("UTF-8"))
  }
}
