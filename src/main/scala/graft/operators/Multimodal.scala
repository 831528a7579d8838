package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One decoded record per multimodal payload. */
case class DecodedMedia(doc_id: Long, n_bytes: Long, width: Long,
                        height: Long, channels: Long, checksum: String)

/** Multimodal-column plumbing: opaque `binary` payloads + typed
  * metadata, with the decode step isolated behind a per-partition
  * batch function — exactly where a real image/audio decoder would
  * sit (`mapPartitions` is the Scala analog of `mapInPandas`: one
  * iterator per partition, so a decoder can amortize native-library
  * init across the batch).
  *
  * The decode is REAL: payloads are genuine PNG files (encoded
  * per-row by the JDK's `javax.imageio`, no external media libs) and
  * [[decodePartition]] decodes them back with `ImageIO.read`,
  * reporting raster dimensions, band count, and an md5 over the
  * decoded pixel bytes. Because the fixture images are generated
  * deterministically from each document (dims from byte length,
  * fill color from doc_id + length), the DuckDB oracle can predict
  * every decoded field — including the raster checksum — so a
  * pixel-exact encode→decode round-trip is what the oracle verifies.
  */
object Multimodal {

  /** Binary payload column: utf-8 bytes of the text stand in for an
    * opaque media blob (byte-level feature/sample plumbing,
    * checkable against the oracle). A NULL text is an EMPTY payload —
    * a media pipeline receives a zero-byte blob, not a crash (r12
    * fuzz: the planted NULL doc NPE'd the encoder).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      coalesce(col("text"), lit("")).cast("binary").as("payload"))

  /** The CHAR-mirror domain: the audio/video/entropy stand-ins read
    * the text column as PCM bytes, and their DuckDB oracles mirror
    * them CHAR-wise — equivalent exactly when every char is one byte.
    * Restrict those operators to single-byte (ASCII) non-empty docs
    * on BOTH sides: a real pipeline feeds opaque binary payloads, the
    * text stand-in just needs a domain where byte and char semantics
    * coincide (r12 fuzz: planted multi-byte docs made the two
    * readings diverge). NULL and empty docs drop with the same
    * null-safe predicate.
    */
  private def asciiDocs(docs: DataFrame): DataFrame =
    docs.where(expr("octet_length(text) = length(text)") &&
      length(col("text")) > 0)

  /** Deterministic fixture dims/fill, shared by encoder and oracle:
    * width 8..20 and height 8..14 from the text's byte length, one
    * flat RGB fill from (doc_id, byte length) — bytes kept in the
    * printable range so the oracle can rebuild the raster with
    * repeat(chr(...)). Small images on purpose: the plumbing under
    * test is schema/partitioning/batch shape, not codec throughput.
    */
  private def fixtureDims(id: Long, nBytes: Int): (Int, Int, Int, Int, Int) =
    (8 + nBytes % 13, 8 + nBytes % 7,
      32 + (id % 64).toInt, 32 + nBytes % 64, 65)

  /** Encode a REAL PNG per document (per-partition batch — encoder
    * state amortizes exactly like a decoder's).
    */
  def withImagePayload(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    docs.select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        // ImageIO defaults to a DISK-backed stream cache — one temp
        // file created and deleted per image; in-memory streams for
        // KB-sized fixtures make the codec CPU-bound (per-partition
        // setting, same JVM-global flag both codec seams set)
        javax.imageio.ImageIO.setUseCache(false)
        val baos = new java.io.ByteArrayOutputStream()
        rows.map { case (id, text) =>
          val n = text.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
          val (w, h, r, g, b) = fixtureDims(id, n)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val rgb = (r << 16) | (g << 8) | b
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          baos.reset()
          javax.imageio.ImageIO.write(img, "png", baos)
          (id, baos.toByteArray)
        }
      }.toDF("doc_id", "payload")
  }

  /** The real decoder: `ImageIO.read` per payload, raster metadata +
    * md5 over the decoded (r,g,b) pixel bytes in row-major order.
    * A payload ImageIO cannot parse yields the documented sentinel
    * (-1 dims, md5 of the raw bytes) instead of poisoning the batch
    * — per-row codec failure is data, not an operator crash.
    */
  private def decodePartition(rows: Iterator[(Long, Array[Byte])]): Iterator[DecodedMedia] = {
    // decoder-side state inits ONCE per partition, before the batch loop
    javax.imageio.ImageIO.setUseCache(false) // in-memory streams (see encoder)
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.map { case (id, bytes) =>
      val img = try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes)) catch {
        case _: java.io.IOException => null
      }
      if (img == null) {
        DecodedMedia(id, bytes.length.toLong, -1L, -1L, -1L,
          md.digest(bytes).map("%02x".format(_)).mkString)
      } else {
        val w = img.getWidth
        val h = img.getHeight
        val bands = img.getRaster.getNumBands
        val raster = new Array[Byte](w * h * 3)
        var i = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            raster(i) = ((p >> 16) & 0xff).toByte
            raster(i + 1) = ((p >> 8) & 0xff).toByte
            raster(i + 2) = (p & 0xff).toByte
            i += 3
            x += 1
          }
          y += 1
        }
        DecodedMedia(id, raster.length.toLong, w.toLong, h.toLong,
          bands.toLong,
          md.digest(raster).map("%02x".format(_)).mkString)
      }
    }
  }

  /** Decode payloads partition-batched; returns a typed Dataset whose
    * schema is the decoded-metadata contract.
    */
  def decode(s: SparkSession, payloads: DataFrame): Dataset[DecodedMedia] = {
    import s.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(decodePartition)
  }

  def decodeQuery(s: SparkSession, dir: String): DataFrame =
    decode(s, withImagePayload(s, Tables.documents(s, dir)))
      .toDF()
      .orderBy("doc_id")

  /** Feature extraction over the opaque payload: byte-level stats
    * (count, distinct alphabet, mean byte value) — the deterministic
    * stand-in for an embedding/feature model, with the same
    * plumbing: narrow projection over the binary column, all
    * codegen'd, no driver round-trip. The mean runs through the
    * native [[graft.functions.ByteSum]] kernel (the previous
    * aggregate/transform lambdas evaluated interpreted per BYTE —
    * the hot path at multimodal scale); the alphabet count keeps
    * `array_distinct`, which is a native function, not a lambda.
    */
  def featuresQuery(s: SparkSession, dir: String): DataFrame =
    withPayload(asciiDocs(Tables.documents(s, dir)))
      .select(col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        expr("size(array_distinct(split(decode(payload, 'UTF-8'), '')))")
          .cast("long").as("n_distinct_chars"),
        round(graft.functions.ByteSum(col("payload")).cast("double")
          / length(col("payload")), 4).as("mean_byte"))
      .orderBy("doc_id")

  // ------------------------------------------------- perceptual hash

  /** Patterned 16×16 grayscale fixture for the perceptual-hash ops:
    * pixel v(x,y) = (seed·7 + x·13 + y·31) mod 256 with
    * seed = doc_id mod 50 — a real gradient (a flat fill hashes to
    * all-zero bits), fully predictable by the oracle from doc_id
    * alone, and COLLIDING on purpose: docs sharing a seed are
    * pixel-identical images arriving as independent PNG encodes,
    * which is exactly the duplicate class image dedup exists for.
    */
  private[graft] val PhashSide = 16

  private[graft] def patternPixel(id: Long, x: Int, y: Int): Int =
    (((id % 50) * 7 + x * 13 + y * 31) % 256).toInt

  /** Encode the patterned fixture as a REAL PNG per document. */
  def withPatternImagePayload(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // in-memory streams
      val baos = new java.io.ByteArrayOutputStream()
      rows.map { id =>
        val img = new java.awt.image.BufferedImage(
          PhashSide, PhashSide, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < PhashSide) {
          var x = 0
          while (x < PhashSide) {
            val v = patternPixel(id, x, y)
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        baos.reset()
        javax.imageio.ImageIO.write(img, "png", baos)
        (id, baos.toByteArray)
      }
    }.toDF("doc_id", "payload")
  }

  /** RGB twin of the pattern fixture: per-channel offsets off the
    * same gradient (r = v, g = (v+85) mod 256, b = (v+170) mod 256)
    * so the three channels carry DIFFERENT distributions — a flat or
    * grayscale fill would make channel statistics degenerate.
    */
  private[graft] def rgbPatternPixel(id: Long, x: Int, y: Int): Int = {
    val v = patternPixel(id, x, y)
    (v << 16) | (((v + 85) % 256) << 8) | ((v + 170) % 256)
  }

  /** Encode the RGB-patterned fixture as a REAL PNG per document. */
  def withRgbPatternImagePayload(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // in-memory streams
      val baos = new java.io.ByteArrayOutputStream()
      rows.map { id =>
        val img = new java.awt.image.BufferedImage(
          PhashSide, PhashSide, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < PhashSide) {
          var x = 0
          while (x < PhashSide) {
            img.setRGB(x, y, rgbPatternPixel(id, x, y))
            x += 1
          }
          y += 1
        }
        baos.reset()
        javax.imageio.ImageIO.write(img, "png", baos)
        (id, baos.toByteArray)
      }
    }.toDF("doc_id", "payload")
  }

  /** PER-CHANNEL PIXEL STATISTICS off the real decode — the
    * channel-mean/brightness audit an image-curation pipeline runs
    * before training (dead channels, clipped exposures, tint drift):
    * exact integer channel sums over the decoded raster, one 4dp
    * division per channel. The oracle REBUILDS the gradient from the
    * pattern formula over a generate_series grid and aggregates the
    * same sums — a match proves the pixels round-tripped the codec
    * exactly, per channel. Same mapPartitions codec seam as decode;
    * everything downstream is columnar.
    */
  private def channelStatsPartition(rows: Iterator[(Long, Array[Byte])])
      : Iterator[(Long, Long, Long, Long)] = {
    javax.imageio.ImageIO.setUseCache(false)
    rows.map { case (id, bytes) =>
      val img = try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes)) catch {
        case _: java.io.IOException => null
      }
      if (img == null) (id, -1L, -1L, -1L)
      else {
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        (id, sr, sg, sb)
      }
    }
  }

  def channelStatsQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n = (PhashSide * PhashSide).toDouble
    withRgbPatternImagePayload(s, Tables.documents(s, dir))
      .as[(Long, Array[Byte])]
      .mapPartitions(channelStatsPartition)
      .toDF("doc_id", "sum_r", "sum_g", "sum_b")
      .select(col("doc_id"), col("sum_r"), col("sum_g"), col("sum_b"),
        round(col("sum_r").cast("double") / n, 4).as("mean_r"),
        round(col("sum_g").cast("double") / n, 4).as("mean_g"),
        round(col("sum_b").cast("double") / n, 4).as("mean_b"))
      .orderBy("doc_id")
  }

  /** Decode → 64-bit average-pool perceptual hash: 2×2 block sums
    * over the decoded 16×16 raster, bit b set iff its block mean
    * exceeds the image mean — compared as blockSum·64 > totalSum so
    * every decision is exact integer arithmetic (no division to
    * disagree on). Emitted as a 64-char '0'/'1' string in row-major
    * block order (idx = by·8+bx): both engines build it trivially
    * and it groups/joins like any key. Undecodable payload → the
    * documented all-'x' sentinel row, not a crash.
    */
  private def phashPartition(rows: Iterator[(Long, Array[Byte])])
      : Iterator[(Long, String)] = {
    javax.imageio.ImageIO.setUseCache(false)
    rows.map { case (id, bytes) =>
      val img = try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes)) catch {
        case _: java.io.IOException => null
      }
      if (img == null || img.getWidth != PhashSide ||
          img.getHeight != PhashSide) {
        (id, "x" * 64)
      } else {
        val block = new Array[Long](64)
        var total = 0L
        var y = 0
        while (y < PhashSide) {
          var x = 0
          while (x < PhashSide) {
            val v = (img.getRGB(x, y) >> 16) & 0xff // gray: r==g==b
            block((y / 2) * 8 + (x / 2)) += v
            total += v
            x += 1
          }
          y += 1
        }
        val sb = new java.lang.StringBuilder(64)
        var i = 0
        while (i < 64) {
          sb.append(if (block(i) * 64 > total) '1' else '0')
          i += 1
        }
        (id, sb.toString)
      }
    }
  }

  /** Per-doc perceptual hash over the REAL encode→decode round trip
    * — the oracle predicts every bit from the pattern formula without
    * touching a codec, so a hash match proves the decode reproduced
    * the formula's pixels exactly.
    */
  def phashQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    withPatternImagePayload(s, Tables.documents(s, dir))
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(phashPartition)
      .toDF("doc_id", "phash")
      .select(col("doc_id"), col("phash"),
        length(regexp_replace(col("phash"), "0", "")).cast("long")
          .as("n_set_bits"))
      .orderBy("doc_id")
  }

  /** IMAGE DEDUP over the hash: identical-content groups regardless
    * of the independent per-row PNG encodes — group on the 64-bit
    * key (one shuffle on a corpus-cardinality key, the exact-dedup
    * shape), keep groups >1 with the lowest doc_id as canonical.
    */
  def phashDupQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    withPatternImagePayload(s, Tables.documents(s, dir))
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(phashPartition)
      .toDF("doc_id", "phash")
      .groupBy("phash")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("canonical_id"))
      .where(col("n_docs") > 1)
      .orderBy("canonical_id")
  }

  /** RESIZE through the real codec — the remaining member of the
    * decode / feature-extract / resize / frame-sample quartet:
    * decode the 16×16 pattern PNG, NEAREST-NEIGHBOR downsample to
    * 8×8 (dst (x,y) ← src (2x, 2y) — the exact algorithm, not an
    * AWT scaler whose filtering is implementation-defined), and
    * report the resized raster as two exact integer checksums (pixel
    * sum + position-weighted sum Σ v·(idx+1), which detects any
    * pixel permutation). The oracle predicts BOTH from the pattern
    * formula without a codec, so a match proves decode AND resize
    * are pixel-exact. Undecodable/mis-sized payloads yield the −1
    * sentinel row (per-row failure is data).
    */
  private def resizePartition(rows: Iterator[(Long, Array[Byte])])
      : Iterator[(Long, Long, Long, Long, Long)] = {
    javax.imageio.ImageIO.setUseCache(false)
    val side = PhashSide / 2
    rows.map { case (id, bytes) =>
      val img = try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes)) catch {
        case _: java.io.IOException => null
      }
      if (img == null || img.getWidth != PhashSide ||
          img.getHeight != PhashSide) {
        (id, -1L, -1L, -1L, -1L)
      } else {
        var sum = 0L
        var wsum = 0L
        var y = 0
        while (y < side) {
          var x = 0
          while (x < side) {
            val v = (img.getRGB(2 * x, 2 * y) >> 16) & 0xff
            sum += v
            wsum += v.toLong * (y * side + x + 1)
            x += 1
          }
          y += 1
        }
        (id, side.toLong, side.toLong, sum, wsum)
      }
    }
  }

  def resizeQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    withPatternImagePayload(s, Tables.documents(s, dir))
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(resizePartition)
      .toDF("doc_id", "out_w", "out_h", "px_sum", "px_wsum")
      .orderBy("doc_id")
  }

  /** NEAR-DUPLICATE IMAGES — Hamming-≤3 pairs over the perceptual
    * hash, the image analog of dedup_simhash_pairs: exact-dup groups
    * ([[phashDupQuery]]) catch pixel-identical re-encodes, this
    * catches SMALL EDITS (a crop/brightness tweak flips a few
    * blocks). Blocking is the simhash pigeonhole: 4 disjoint 16-bit
    * bands of the 64-bit hash — two hashes within Hamming 3 agree
    * exactly on ≥1 band — so candidates come from band-key buckets
    * (cardinality grows with the image corpus), never all pairs;
    * verify counts differing bits over the candidate set only.
    * The '0'/'1'-string hash makes both steps engine-portable
    * (substring bands, per-position compare).
    */
  def phashHammingQuery(s: SparkSession, dir: String,
                        maxHamming: Int = 3): DataFrame = {
    import s.implicits._
    // hash words as INTEGERS once per image (two 32-bit halves +
    // four 16-bit band values parsed from the bit-string): the pair
    // stage then runs codegen xor+bit_count per candidate — the
    // simhash kernel — instead of an interpreted 64-char compare,
    // and exact duplicates (phashDupQuery's class) drop inside the
    // join condition before the distinct
    val hashes = withPatternImagePayload(s, Tables.documents(s, dir))
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(phashPartition)
      .toDF("doc_id", "phash")
      .where(!col("phash").startsWith("x"))
      .select(col("doc_id"), col("phash"),
        expr("CAST(conv(substring(phash, 1, 32), 2, 10) AS BIGINT)")
          .as("h1"),
        expr("CAST(conv(substring(phash, 33, 32), 2, 10) AS BIGINT)")
          .as("h2"))
      .localCheckpoint(true)
    val banded = hashes.select(col("doc_id"), col("h1"), col("h2"),
      posexplode(expr("transform(sequence(0, 3), b -> " +
        "CAST(conv(substring(phash, b * 16 + 1, 16), 2, 10) AS BIGINT))")))
      .select(col("doc_id"), col("h1"), col("h2"),
        col("pos").as("band"), col("col").as("bv"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id") &&
          (col("a.h1") =!= col("b.h1") || col("a.h2") =!= col("b.h2")))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.h1").as("h1a"), col("a.h2").as("h2a"),
        col("b.h1").as("h1b"), col("b.h2").as("h2b"))
      .distinct()
    cand.withColumn("hamming",
        expr("CAST(bit_count(h1a ^ h1b) + bit_count(h2a ^ h2b) AS BIGINT)"))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .orderBy("id_a", "id_b")
  }

  /** Frame sampling: take every `stride`-th byte of the payload (the
    * shape of every-k-th-video-frame extraction), emit the sample
    * count and an md5 over the sampled "frames". Runs through the
    * native [[graft.functions.ByteSample]] kernel — the
    * transform-over-sequence lambda it replaces built one
    * single-char string per frame, interpreted.
    */
  def frameSampleQuery(s: SparkSession, dir: String,
                       stride: Int = 16): DataFrame =
    withPayload(asciiDocs(Tables.documents(s, dir)))
      .select(col("doc_id"),
        graft.functions.ByteSample(col("payload"), stride).as("sample"))
      .select(col("doc_id"),
        length(col("sample")).cast("long").as("n_frames"),
        md5(col("sample")).as("sample_md5"))
      .orderBy("doc_id")

  /** AUDIO-STYLE WINDOWED ENERGY — the audio leg of the multimodal
    * quartet's feature extraction: the payload interpreted as 8-bit
    * PCM centered at 96 (a-z → +1..+26, space → −64 — the fixture's
    * byte alphabet), framed into 64-sample windows, per document:
    * sample/full-window counts, PEAK window RMS, mean window energy,
    * and zero-crossing rate — the three features every audio
    * triage/VAD pipeline starts from. Deliberately COLUMNAR (ascii +
    * integer squares + windows — no mapPartitions): the DSP is
    * integer-exact until the final sqrt/divisions, so the oracle
    * rebuilds every window from the identical bytes. Scale shape:
    * one posexplode keyed by doc_id (the loaders' spread key), one
    * (doc, window) aggregate, one per-doc fold — sample rows never
    * shuffle twice.
    */
  /** SILENCE SEGMENTATION over the PCM payload — the trim-silence /
    * voice-activity pass an audio-curation pipeline runs before
    * featurization: windows whose energy sits under a threshold are
    * silent, and MAXIMAL RUNS of consecutive silent windows become
    * segments via the gaps-and-islands trick (window index minus its
    * rank among the doc's silent windows is constant within a run —
    * pure integer arithmetic, no iteration). Emits per doc the
    * silent-window count, segment count, and longest run. Same
    * fully-columnar sample plumbing as [[audioEnergyQuery]]; the
    * threshold is a fixture constant (mean square ≤ 100/sample).
    */
  def audioSilenceQuery(s: SparkSession, dir: String, win: Int = 64,
                        thresholdSS: Long = 6400L): DataFrame = {
    val sm = asciiDocs(Tables.documents(s, dir))
      .select(col("doc_id"),
        posexplode(split(col("text"), "")).as(Seq("pos", "ch")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        (ascii(col("ch")) - lit(96)).cast("long").as("x"))
    val wnd = sm
      .select(col("doc_id"), (col("pos") / win).cast("long").as("w"),
        col("x"))
      .groupBy("doc_id", "w")
      .agg(count(lit(1)).as("wn"), sum(col("x") * col("x")).as("ss"))
      .where(col("wn") === win)
      .localCheckpoint(true)
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("w")
    val runs = wnd.where(col("ss") <= thresholdSS)
      .withColumn("grp", col("w") - row_number().over(wOrd))
      .groupBy("doc_id", "grp").agg(count(lit(1)).as("len"))
    val perDoc = runs.groupBy("doc_id")
      .agg(sum("len").as("n_silent"), count(lit(1)).as("n_segments"),
        max("len").as("longest_run"))
    wnd.groupBy("doc_id").agg(count(lit(1)).as("n_windows"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"),
        coalesce(col("n_silent"), lit(0L)).as("n_silent"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("longest_run"), lit(0L)).as("longest_run"))
      .orderBy("doc_id")
  }

  /** FORMAT SNIFFING by MAGIC BYTES — the first triage every binary
    * ingest pipeline runs (route by container before any codec):
    * classify each payload by its leading bytes (PNG \x89PNG\r\n,
    * JPEG \xFF\xD8\xFF, GIF87a/89a, %PDF, RIFF, else raw). The
    * fixture interleaves REAL PNG encodes (even doc ids, the
    * [[withImagePayload]] codec round trip) with raw utf-8 text
    * payloads (odd ids), so the oracle predicts the answer from id
    * parity alone — a match proves the sniffer read genuine magic
    * bytes off a genuine codec output, not a label column. Pure
    * columnar: one hex-prefix projection, no mapPartitions (the
    * codec seam stays at encode).
    */
  /** The classifier itself, over any (doc_id, payload) frame. */
  def sniffFormat(payloads: DataFrame): DataFrame =
    payloads
      .select(col("doc_id"),
        upper(hex(substring(col("payload"), 1, 4))).as("magic"))
      .select(col("doc_id"),
        when(col("magic").startsWith("89504E47"), "png")
          .when(col("magic").startsWith("FFD8FF"), "jpeg")
          .when(col("magic").startsWith("47494638"), "gif")
          .when(col("magic").startsWith("25504446"), "pdf")
          .when(col("magic").startsWith("52494646"), "riff")
          .otherwise("raw").as("format"))

  def formatSniffQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val png = withImagePayload(s, docs.where(col("doc_id") % 2 === 0))
    val raw = withPayload(docs.where(col("doc_id") % 2 =!= 0))
    sniffFormat(png.unionByName(raw)).orderBy("doc_id")
  }

  /** BYTE-ENTROPY TRIAGE — floor-log₂ entropy of each payload's
    * byte histogram: the compressibility proxy a binary-asset
    * pipeline uses to route content before any codec runs (near-8
    * bits/byte ⇒ already compressed/encrypted, don't re-encode;
    * low entropy ⇒ flat/synthetic content, cheap to store). Same
    * integer discipline as the text entropy ops: per-byte bits =
    * floor(log₂(n/count)) via `length(bin(n div c)) − 1` — the
    * libm-free path both engines share — integer weighted sum, one
    * final 4dp division. One posexplode keyed by doc_id, one
    * (doc, byte) aggregate, one per-doc rollup.
    */
  def byteEntropyQuery(s: SparkSession, dir: String): DataFrame = {
    val bf = asciiDocs(Tables.documents(s, dir))
      .select(col("doc_id"),
        explode(split(col("text"), "")).as("ch"))
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    bf.withColumn("n", sum("c").over(w))
      .withColumn("bits", length(bin(expr("n div c"))) - 1)
      .groupBy("doc_id")
      .agg(max("n").as("n_bytes"),
        count(lit(1)).as("n_distinct_bytes"),
        sum(col("c") * col("bits")).as("total_bits"))
      .select(col("doc_id"), col("n_bytes"), col("n_distinct_bytes"),
        round(col("total_bits").cast("double") / col("n_bytes"), 4)
          .as("bits_per_byte"))
      .orderBy("doc_id")
  }

  /** SHOT-BOUNDARY DETECTION — the video twin of
    * [[audioSilenceQuery]]: the payload framed into fixed 64-byte
    * FRAMES (full frames only, the audio window convention), each
    * frame reduced to an integer signature (Σ sample values — the
    * luminance-sum proxy real shot detectors threshold frame
    * differences of), a CUT declared where |Δ signature| between
    * consecutive frames exceeds the threshold, and shots formed as
    * the runs between cuts via a running cut-count (the
    * gaps-and-islands family — pure integer arithmetic, no
    * iteration). Emits per doc: frame count, shot count, longest
    * shot, mean shot length (the one division, 4dp). Fully columnar
    * — no mapPartitions; the codec seam stays at decode. Scale: one
    * posexplode keyed by doc_id (the loader's spread key), one
    * (doc, frame) aggregate, two windows over FRAME-sized rows
    * (payload/64 — never the sample rows), one per-doc rollup.
    */
  def shotDetectQuery(s: SparkSession, dir: String, frame: Int = 64,
                      threshold: Long = 150L): DataFrame = {
    val sm = asciiDocs(Tables.documents(s, dir))
      .select(col("doc_id"),
        posexplode(split(col("text"), "")).as(Seq("pos", "ch")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        (ascii(col("ch")) - lit(96)).cast("long").as("x"))
    val fr = sm
      .select(col("doc_id"), (col("pos") / frame).cast("long").as("f"),
        col("x"))
      .groupBy("doc_id", "f")
      .agg(count(lit(1)).as("fn"), sum("x").as("fsum"))
      .where(col("fn") === frame)
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("f")
    val cuts = fr
      .withColumn("d", abs(col("fsum") - lag("fsum", 1).over(wOrd)))
      .withColumn("cut",
        when(col("d").isNotNull && col("d") > threshold, 1L)
          .otherwise(0L))
      .withColumn("shot", sum("cut").over(wOrd
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)))
    val shots = cuts.groupBy("doc_id", "shot")
      .agg(count(lit(1)).as("len"))
    shots.groupBy("doc_id")
      .agg(sum("len").as("n_frames"), count(lit(1)).as("n_shots"),
        max("len").as("longest_shot"),
        round(sum("len").cast("double") / count(lit(1)), 4)
          .as("mean_shot_len"))
      .orderBy("doc_id")
  }

  def audioEnergyQuery(s: SparkSession, dir: String,
                       win: Int = 64): DataFrame = {
    val sm = asciiDocs(Tables.documents(s, dir))
      .select(col("doc_id"),
        posexplode(split(col("text"), "")).as(Seq("pos", "ch")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        (ascii(col("ch")) - lit(96)).cast("long").as("x"))
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val zc = sm
      .withColumn("px", lag("x", 1).over(wOrd))
      .select(col("doc_id"),
        when(col("px").isNotNull && col("x") * col("px") < 0, lit(1L))
          .otherwise(lit(0L)).as("z"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_samples"), sum("z").as("crossings"))
    val wnd = sm
      .select(col("doc_id"), (col("pos") / win).cast("long").as("w"),
        col("x"))
      .groupBy("doc_id", "w")
      .agg(count(lit(1)).as("wn"), sum(col("x") * col("x")).as("ss"))
      .where(col("wn") === win)
    val perDoc = wnd.groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"), max("ss").as("peak_ss"),
        sum("ss").as("sum_ss"))
    zc.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_samples"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        round(sqrt(coalesce(col("peak_ss"), lit(0L)).cast("double")
          / win), 4).as("peak_rms"),
        round(coalesce(col("sum_ss"), lit(0L)).cast("double")
          / (coalesce(col("n_windows"), lit(1L)) * win), 4)
          .as("mean_energy"),
        // single-sample doc: 0 crossings over 0 gaps is no signal,
        // not a 0/0 — NULL on both engines (r12 fuzz)
        when(col("n_samples") > 1,
          round(col("crossings").cast("double")
            / (col("n_samples") - 1), 4)).as("zcr"))
      .orderBy("doc_id")
  }
}
