package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/
  * video payloads ride as opaque `binary` columns with typed metadata, and
  * per-asset compute happens in *batch-shaped* per-partition functions —
  * the Scala analog of Python's `mapInPandas` (an iterator of rows in,
  * an iterator of rows out, one partition at a time, no driver collect).
  *
  * The actual codec work is STUBBED deterministically (this container has
  * no image/audio libraries — the builder contract says make the
  * schema / partitioning / batch shape real and fake the decode): a real
  * deployment swaps [[decodePartition]]'s body for JNI/codec calls; every
  * signature, schema and plan stays identical.
  */
object Multimodal {

  val metaType: StructType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_frames", IntegerType)))

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType),
    StructField("bytes", BinaryType),
    StructField("meta", metaType)))

  /** Deterministic synthetic assets (stand-in for a binary-file scan):
    * payload bytes derive from the asset id, metadata from the synthetic
    * "header". Distributed via `spark.range` — no driver-side data.
    */
  def synthesize(spark: SparkSession, n: Long,
                 payloadBytes: Int = 4096): DataFrame = {
    val mods = Seq("image", "audio", "video")
    val enc = org.apache.spark.sql.Encoders.row(assetSchema)
    spark.range(n).select(col("id")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = new Array[Byte](payloadBytes)
        var x = id * 6364136223846793005L + 1442695040888963407L
        var i = 0
        while (i < payloadBytes) {
          x = x * 6364136223846793005L + 1442695040888963407L
          bytes(i) = (x >>> 56).toByte
          i += 1
        }
        val m = mods((id % 3).toInt)
        Row(id, m, bytes,
          Row(64 + (id % 64).toInt, 64 + (id % 48).toInt,
              if (m == "audio") 16000 else 0,
              if (m == "video") 16 + (id % 16).toInt else 1))
      }
    }(enc)
  }

  private val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType),
    StructField("n_bytes", LongType),
    StructField("byte_entropy", DoubleType),
    StructField("entropy_fp", LongType, nullable = false),
    StructField("histogram", ArrayType(LongType))))

  /** Q40 fixed-point binary logarithm of a positive integer, computed by
    * the classic square-and-shift algorithm entirely in integer
    * arithmetic: integer part = bit position of the top bit; 40 fraction
    * bits from "square the Q60 mantissa, emit 1 and halve when it
    * crosses 2". Truncating (not rounded) at every step — which is the
    * point: the result is a pure function of the integer input with no
    * libm anywhere, so DuckDB replays it bit-for-bit with HUGEINT
    * (the 122-bit intermediate square fits int128), making
    * entropy oracle-checkable where Shannon-entropy doubles are not.
    */
  private[graft] def log2Fp(v: Long): Long = {
    require(v >= 1, s"log2Fp domain error: $v")
    // One shared kernel with the column form ([[graft.functions.Log2Fp]])
    // so the scalar, interpreted, and codegen paths cannot drift.
    graft.functions.Log2Fp.compute(v)
  }

  /** Fixed-point Shannon entropy (Q40 bits, truncated) of a histogram
    * over `n` total observations: Σ h·(log2fp(n) − log2fp(h)) / n with
    * integer division — deterministic across engines, unlike the double
    * form (see [[log2Fp]]).
    */
  private[graft] def entropyFp(hist: Array[Long], n: Long): Long = {
    if (n <= 0) return 0L
    val ln = log2Fp(n)
    var s = 0L
    var i = 0
    while (i < hist.length) {
      if (hist(i) > 0) s += hist(i) * (ln - log2Fp(hist(i)))
      i += 1
    }
    s / n
  }

  /** Batch-shaped "decode + feature extract" over the binary payload: a
    * 16-bin byte histogram and entropy per asset, computed per partition.
    * In production the histogram/entropy block is replaced by the real
    * decoder (pixel stats, mel energies, …) — same signature and schema.
    */
  def extractFeatures(assets: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    assets.select("asset_id", "modality", "bytes").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val mod = r.getString(1)
        val bytes = r.getAs[Array[Byte]](2)
        val hist = new Array[Long](16)
        var i = 0
        while (i < bytes.length) {
          hist((bytes(i) & 0xF0) >>> 4) += 1
          i += 1
        }
        val n = bytes.length.toDouble
        var ent = 0.0
        hist.foreach { h =>
          if (h > 0) { val p = h / n; ent -= p * math.log(p) / math.log(2) }
        }
        Row(id, mod, bytes.length.toLong, ent,
          entropyFp(hist, bytes.length.toLong), hist.toSeq)
      }
    }(enc)
  }

  /** Frame sampling for video assets — pure Catalyst (posexplode over a
    * stride sequence + binary substring), no per-row closures: the frame
    * *selection* is relational work even when decode is not.
    *
    * Frames whose byte range extends past the stored payload (metadata
    * `n_frames` can exceed what the payload holds — a truncated upload)
    * are SKIPPED, not returned as short/empty buffers: every emitted
    * `frame_bytes` is exactly `frameBytes` long, so a real decoder
    * swapped into this slot never sees a partial frame.
    */
  def sampleFrames(assets: DataFrame, stride: Int = 4,
                   frameBytes: Int = 256): DataFrame =
    assets
      .where(col("modality") === "video")
      .select(col("asset_id"), col("meta.n_frames").as("n_frames"),
        posexplode(sequence(lit(0), col("meta.n_frames") - 1,
          lit(stride))).as(Seq("pos", "frame_no")),
        col("bytes"))
      .where((col("frame_no") + 1) * frameBytes <= length(col("bytes")))
      .select(col("asset_id"), col("frame_no"),
        // 1-based binary substring; frames laid out contiguously
        expr(s"substring(bytes, frame_no * $frameBytes + 1, $frameBytes)")
          .as("frame_bytes"))

  /** Deterministic "corrupted re-upload" copies: every `every`-th asset
    * re-appears under `asset_id + idOffset` with ONE payload byte flipped
    * (bit 7 of byte `flipPos`) — the near-duplicate-image population a
    * perceptual-hash dedup pass exists to catch (same picture, different
    * file bytes). Codec-slot `mapPartitions` like [[resizeStub]]; the
    * LCG + single-xor derivation stays exactly replayable in SQL.
    */
  def corruptCopies(assets: DataFrame, idOffset: Long, every: Int = 5,
                    flipPos: Int = 7): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType))))
    assets.where(col("asset_id") % every === 0)
      .select("asset_id", "bytes").mapPartitions { it =>
        it.map { r =>
          val b = r.getAs[Array[Byte]](1).clone()
          b(flipPos) = (b(flipPos) ^ 0x80).toByte
          Row(r.getLong(0) + idOffset, b)
        }
      }(enc)
  }

  /** Average-hash (aHash) perceptual fingerprint: the first 64 payload
    * bytes stand in for an 8×8 grayscale thumbnail (the decode+resize
    * that produces such a thumbnail is this container's stubbed codec
    * step); bit i is set iff pixel i exceeds the integer mean. Packed as
    * TWO non-negative 32-bit halves (`hash_hi` = pixels 0–31,
    * `hash_lo` = 32–63, MSB-first) rather than one 64-bit word: bit 63
    * would land in a BIGINT's sign bit, and signed-shift semantics are
    * the kind of cross-engine edge the oracle rules ban. Per-partition
    * batch shape, like [[extractFeatures]].
    */
  def perceptualHash(assets: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("hash_hi", LongType, nullable = false),
      StructField("hash_lo", LongType, nullable = false))))
    assets.select("asset_id", "bytes").mapPartitions { it =>
      it.map { r =>
        val b = r.getAs[Array[Byte]](1)
        var sum = 0L
        var i = 0
        while (i < 64) { sum += (b(i) & 0xFF); i += 1 }
        val mean = sum / 64
        var hi = 0L
        var lo = 0L
        i = 0
        while (i < 64) {
          if ((b(i) & 0xFF) > mean) {
            if (i < 32) hi |= 1L << (31 - i) else lo |= 1L << (63 - i)
          }
          i += 1
        }
        Row(r.getLong(0), hi, lo)
      }
    }(enc)
  }

  /** Near-duplicate asset pairs by banded perceptual hash: the 64 aHash
    * bits split into four 16-bit band keys; only assets agreeing on ≥ 1
    * full band meet in an EQUI-join (the SimHash-LSH shape — candidate
    * count is bucket-bounded, never all-pairs), then the exact Hamming
    * distance filters. Standard LSH recall semantics: a pair with > 3
    * bits spread over all four bands can be missed; the oracle replays
    * the same banding, so the contract is exact.
    */
  def phashPairs(hashes: DataFrame, maxHamming: Int = 8): DataFrame = {
    val banded = hashes.select(col("asset_id"), col("hash_hi"),
        col("hash_lo"),
        posexplode(array(
          expr("hash_hi DIV 65536"), expr("hash_hi % 65536"),
          expr("hash_lo DIV 65536"), expr("hash_lo % 65536")))
          .as(Seq("band", "bkey")))
    val a = banded.select(col("band").as("_band_a"),
      col("bkey").as("_bkey_a"), col("asset_id").as("asset_a"),
      col("hash_hi").as("_hi_a"), col("hash_lo").as("_lo_a"))
    val b = banded.select(col("band").as("_band_b"),
      col("bkey").as("_bkey_b"), col("asset_id").as("asset_b"),
      col("hash_hi").as("_hi_b"), col("hash_lo").as("_lo_b"))
    a.join(b, col("_band_a") === col("_band_b") &&
        col("_bkey_a") === col("_bkey_b") &&
        col("asset_a") < col("asset_b"))
      .select(col("asset_a"), col("asset_b"),
        (expr("bit_count(_hi_a ^ _hi_b)") +
         expr("bit_count(_lo_a ^ _lo_b)")).cast("long").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** "Resize" stub: deterministic downsample of the payload (every k-th
    * byte) — stands in for a real resample/resize kernel; keeps the
    * binary-in/binary-out plumbing honest.
    */
  def resizeStub(assets: DataFrame, factor: Int = 4): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    assets.select("asset_id", "bytes").mapPartitions { it =>
      it.map { r =>
        val b = r.getAs[Array[Byte]](1)
        Row(r.getLong(0), b.indices.collect {
          case i if i % factor == 0 => b(i) }.toArray)
      }
    }(enc)
  }
}
