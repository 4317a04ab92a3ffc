package graft.pipeline

import graft.SparkSpec
import graft.core.Samples
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  private lazy val docs = Samples.table(spark, sfDir, "documents").cache()

  test("text fingerprint is deterministic and order-sensitive") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox"),
      (2L, "quick the brown fox"), // same tokens, different order
      (3L, "the quick brown fox")
    ).toDF("doc_id", "text")
    val fps = df
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(fps(1L) === fps(3L), "identical text must hash identically")
    assert(fps(1L) !== fps(2L), "token order must change the fingerprint")
  }

  test("langid detects marker-bearing text and falls back to 'und'") {
    // the parquet `lang` column is random metadata (its text is synthetic
    // jargon), so assert on crafted sentences instead
    import spark.implicits._
    val df = Seq(
      (1L, "the cat and the dog are in the house", "en"),
      (2L, "le chat et le chien sont dans la maison et les oiseaux", "fr"),
      (3L, "el gato y el perro en la casa con los pájaros", "es"),
      (4L, "der Hund und die Katze sind nicht im Haus", "de"),
      (5L, "qqqq zzzz xxxx", "und")
    ).toDF("doc_id", "text", "expected")
    val out = TextAnalysis
      .detectLang(df)
      .select(col("doc_id"), col("detected_lang"), col("expected"))
      .collect()
    out.foreach(r =>
      assert(
        r.getString(1) === r.getString(2),
        s"doc ${r.getLong(0)}: got ${r.getString(1)}"))
  }

  test("contamination: overlap counted against the benchmark set only") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),   // shares 3-grams with bench
      (2L, "zeta eta theta iota kappa"),        // disjoint
      (3L, "alpha beta gamma completely new")   // one shared 3-gram
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta unseen")).toDF("doc_id", "text")
    val out = TextAnalysis.contamination(corpus, bench, n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // doc1 grams: [abg, bgd, gde]; bench: [abg, bgd, gdu] → 2 shared
    assert(out(1L)._1 == 2L && math.abs(out(1L)._2 - 2.0 / 3) < 1e-9)
    assert(out(2L)._1 == 0L && out(2L)._2 == 0.0)
    assert(out(3L)._1 == 1L)
  }

  test("stratified sample: deterministic, per-stratum rates, drops unmapped strata") {
    val fr = Map("en" -> 0.3, "de" -> 0.8, "zh" -> 0.5)
    val s1 = TextAnalysis.stratifiedSample(docs, "lang", fr)
    val s2 = TextAnalysis.stratifiedSample(docs, "lang", fr)
    assert(s1.collect().map(_.getLong(0)).toSeq ==
      s2.collect().map(_.getLong(0)).toSeq) // no RNG: identical runs
    val byLang = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byLang.contains("fr") && !byLang.contains("es"))
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    fr.foreach { case (lang, f) =>
      val rate = byLang.getOrElse(lang, 0L).toDouble / totals(lang)
      assert(math.abs(rate - f) < 0.25, s"$lang rate $rate vs $f")
    }
  }

  test("gopher quality: line stats and the composite flag") {
    import spark.implicits._
    val good = ("w " * 60).trim // 60 short words, no symbols
    val bullets = (1 to 10).map(i => s"- item $i word word word word").mkString("\n")
    val dups = (Seq.fill(8)("same line of text") :+ "unique").mkString("\n")
    val df = Seq(
      (1L, good), (2L, bullets), (3L, dups),
      (4L, "#### ### ## # " + ("word " * 60).trim) // symbol-heavy: 10/64 > 0.1
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherQuality(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!out(1L).getAs[Boolean]("gopher_pass")) // mean_word_len 1 < 3
    val b = out(2L)
    assert(b.getAs[Double]("frac_bullet_lines") == 1.0 &&
      !b.getAs[Boolean]("gopher_pass")) // all lines bullets ≥ 0.9
    val d = out(3L)
    assert(math.abs(d.getAs[Double]("frac_duplicate_lines") - 7.0 / 9) < 1e-9 &&
      !d.getAs[Boolean]("gopher_pass"))
    assert(out(4L).getAs[Double]("symbol_ratio") > 0.09 &&
      !out(4L).getAs[Boolean]("gopher_pass"))
  }

  test("sequence packing: deterministic per-block next-fit") {
    import spark.implicits._
    // block 0: ids 0-3; capacity 10
    val df = Seq(
      (0L, "a b c d e f"),       // 6 tokens → bin 0 fill 6
      (1L, "a b c d e"),         // 5 → overflow → bin 1 fill 5
      (2L, "a b c"),             // 3 → bin 1 fill 8
      (3L, ("x " * 15).trim),    // 15 > capacity → own bin 2, fill 15
      (256L, "a b")              // new block → bin 0
    ).toDF("doc_id", "text")
    val out = TextAnalysis.packSequences(df, capacity = 10).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getInt(3), r.getInt(4))).toMap
    assert(out(0L) == ((0L, 0, 6)))
    assert(out(1L) == ((0L, 1, 5)))
    assert(out(2L) == ((0L, 1, 8)))
    assert(out(3L) == ((0L, 2, 15)))
    assert(out(256L) == ((1L, 0, 2)))
    // repartitioned input packs identically (order from sort, not layout)
    val out2 = TextAnalysis.packSequences(df.repartition(7), capacity = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getInt(3), r.getInt(4))).toMap
    assert(out2 == out)
  }

  test("pii redaction replaces and counts emails, IPs, phone numbers") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail bob.smith+x@example.co.uk and carol@test.org here"),
      (2L, "server at 192.168.0.1 port 80, call 555-123-4567"),
      (3L, "nothing sensitive here")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.piiRedact(df).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(2), r.getInt(3), r.getInt(4), r.getString(5))).toMap
    assert(out(1L)._1 == 2 && out(1L)._4 == "mail [EMAIL] and [EMAIL] here")
    assert(out(2L)._2 == 1 && out(2L)._3 == 1 &&
      out(2L)._4 == "server at [IP] port 80, call [PHONE]")
    assert(out(3L) == ((0, 0, 0, "nothing sensitive here")))
  }

  test("image decode is real: known PNG dims, gray luma, resize round trip") {
    import spark.implicits._
    // hand-made 20x10 PNG, solid gray 80
    val img = new java.awt.image.BufferedImage(20, 10,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 10; x <- 0 until 20) img.setRGB(x, y, (80 << 16) | (80 << 8) | 80)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val media = Seq(Multimodal.MediaRow(1L, "image", out.toByteArray, Map())).toDS()
    val f = Multimodal.imageFeatures(media).collect().head
    assert(f.width == 20 && f.height == 10 && f.channels == 3)
    assert(math.abs(f.mean_luma - 80.0) < 1e-6)
    // solid image: aHash has no pixel above the mean -> 0
    assert(f.phash == 0L)
    // resize re-encodes a real 8x8 PNG
    val resized = Multimodal.resize(media, 8, 8).collect().head
    val back = Multimodal.decodeImage(resized.bytes).get
    assert(back.getWidth == 8 && back.getHeight == 8)
    // non-image payloads fall back to the stub, not an error
    val text = Seq(Multimodal.MediaRow(2L, "image",
      "not an image".getBytes, Map())).toDS()
    val stub = Multimodal.imageFeatures(text).collect().head
    assert(stub.width >= 64 && stub.channels == 3)
  }

  test("audio decode is real: WAV roundtrip features match the square wave") {
    val s = spark
    import s.implicits._
    // a 100-frame Nyquist square wave at amplitude 4000 → rms=peak=4000/32768
    val frames = 100
    val a = 4000
    val pcm = new Array[Byte](frames * 2)
    (0 until frames).foreach { i =>
      val v = if (i % 2 == 0) a else -a
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val media = Seq(Multimodal.MediaRow(1L, "audio", out.toByteArray, Map())).toDS()
    val f = Multimodal.audioFeatures(media).collect().head
    assert(f.sample_rate == 8000 && f.channels == 1 && f.frames == frames)
    assert(math.abs(f.duration_ms - 12.5) < 1e-9)
    assert(f.rms == a / 32768.0 && f.peak == a / 32768.0)
    assert(f.zero_crossing_rate == 1.0)
    // undecodable payloads take the stub path with zeroed decode fields
    val text = Seq(Multimodal.MediaRow(2L, "audio",
      "not a wav".getBytes("UTF-8"), Map())).toDS()
    val stub = Multimodal.audioFeatures(text).collect().head
    assert(stub.sample_rate == 0 && stub.channels == 0 && stub.rms > 0)
  }

  test("multimodal image features: deterministic, one row per media row") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir).cache()
    val f1 = Multimodal.imageFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.imageFeatures(media).collect().sortBy(_.media_id)
    assert(f1.length === media.count())
    assert(f1.map(_.phash).toSeq === f2.map(_.phash).toSeq)
    assert(f1.forall(f => f.width >= 64 && f.width < 128 && f.channels == 3))
  }

  test("frame sampling emits every nth chunk, partition-local") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val one = media.filter(col("media_id") === media.select(min("media_id")).first().getLong(0))
    val row = one.collect().head
    val expected = row.bytes.grouped(64).zipWithIndex.count(_._2 % 4 == 0)
    val frames = Multimodal.sampleFrames(one, 64, 4).collect()
    assert(frames.length === expected)
    assert(frames.forall(_.bytes.length <= 64))
  }

  test("LSH multiprobe recall dominates single-probe recall vs brute force") {
    val embs = Samples.table(spark, sfDir, "embeddings").cache()
    val queries = embs.filter(col("vec_id") < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Similarity.bruteForceTopK(embs, queries, 3))
    val single = pairs(Similarity.lshTopK(embs, queries, 3, nBits = 4))
    val multi = pairs(Similarity.lshTopK(embs, queries, 3, nBits = 4, probes = 1))
    val rSingle = truth.count(single.contains).toDouble / truth.size
    val rMulti = truth.count(multi.contains).toDouble / truth.size
    assert(rMulti >= rSingle, s"multiprobe recall $rMulti < single $rSingle")
    assert(rMulti >= 0.4, s"multiprobe recall too low: $rMulti")
  }

  test("int8 quantized top-k: recall >= 0.9 vs float, cosine error < 0.02") {
    val embs = Samples.table(spark, sfDir, "embeddings").cache()
    val queries = embs.filter(col("vec_id") < 20)
    val truthRows = Similarity.bruteForceTopK(embs, queries, 5)
      .select("q_id", "c_id", "cosine").collect()
    val truth = truthRows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = truthRows.map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val q8 = Similarity.bruteForceTopKInt8(embs, queries, 5)
      .select("q_id", "c_id", "approx_cosine").collect()
    val got = q8.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.count(got.contains).toDouble / truth.size
    assert(recall >= 0.9, s"int8 recall too low: $recall")
    // where the sets agree, the rescaled score tracks the float cosine
    q8.foreach { r =>
      exact.get((r.getLong(0), r.getLong(1))).foreach { c =>
        assert(math.abs(c - r.getDouble(2)) < 0.02,
          s"int8 cosine drift: $c vs ${r.getDouble(2)}")
      }
    }
    // codes are 1/8th the bytes of the double vectors they replace
    val dim = embs.select(size(col("embedding"))).head().getInt(0)
    val codeLen = Similarity.quantizeInt8(embs)
      .select(length(col("code"))).head().getInt(0)
    assert(codeLen == dim)
  }

  test("PQ top-k: codes are m bytes, recall beats chance, self-neighbors survive") {
    val embs = Samples.table(spark, sfDir, "embeddings").cache()
    val queries = embs.filter(col("vec_id") < 20)
    val books = Similarity.pqTrain(embs, m = 16, k = 16, iters = 3)
    assert(books.length == 16 && books.forall(_.length == 16) &&
      books.forall(_.forall(_.length == 4)))
    val codes = Similarity.pqEncode(embs, books)
    assert(codes.select(length(col("code"))).head().getInt(0) == 16)
    val truth = Similarity.bruteForceTopK(embs, queries, 10)
      .select("q_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // PQ is a CANDIDATE GENERATOR: the contract is that a top-40
    // candidate sweep captures most exact top-10 neighbors before the
    // exact re-rank stage (bruteForceTopK over the survivors)
    val cands = Similarity.pqTopK(embs, queries, books, 40)
      .select("q_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val candRecall = truth.count(cands.contains).toDouble / truth.size
    assert(candRecall >= 0.6, s"PQ candidate recall too low: $candRecall")
    val direct = Similarity.pqTopK(embs, queries, books, 10)
      .select("q_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.count(direct.contains).toDouble / truth.size
    assert(recall >= 0.2, s"PQ direct recall far below signal: $recall")
    // deterministic: retraining yields identical codebooks
    val books2 = Similarity.pqTrain(embs, m = 16, k = 16, iters = 3)
    assert(books.flatten.flatten.toSeq == books2.flatten.flatten.toSeq)
  }

  test("IVF nprobe recall vs brute force; wider probing dominates") {
    val embs = Samples.table(spark, sfDir, "embeddings").cache()
    val queries = embs.filter(col("vec_id") < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Similarity.bruteForceTopK(embs, queries, 3))
    val narrow = pairs(Similarity.ivfTopK(embs, queries, 3, nLists = 8, nprobe = 1, iters = 3))
    val wide = pairs(Similarity.ivfTopK(embs, queries, 3, nLists = 8, nprobe = 4, iters = 3))
    val rNarrow = truth.count(narrow.contains).toDouble / truth.size
    val rWide = truth.count(wide.contains).toDouble / truth.size
    assert(rWide >= rNarrow, s"nprobe=4 recall $rWide < nprobe=1 $rNarrow")
    assert(rWide >= 0.5, s"IVF nprobe=4 recall too low: $rWide")
    // probing ALL lists is exhaustive — must equal brute force exactly
    val all = pairs(Similarity.ivfTopK(embs, queries, 3, nLists = 8, nprobe = 8, iters = 3))
    assert(truth.count(all.contains).toDouble / truth.size >= 0.99,
      "nprobe == nLists must recover the exact top-k")
  }

  test("embedding cosine top-k ranks the self-similar vector first on a toy set") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity
      .bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0L), 1)
      .collect()
    assert(top.length === 1)
    assert(top.head.getAs[Long]("c_id") === 1L, "nearest neighbour of e_x must be the 0.9/0.1 vector")
  }
}
