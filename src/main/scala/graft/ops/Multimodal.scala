package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Tables._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns with
  * typed metadata, decoded via per-partition batch functions.
  *
  * External codec libraries are not available in this environment, so the
  * generic media decode step is a clearly-marked deterministic STUB;
  * everything around it — binary schema, partition-batched invocation,
  * metadata struct shape, and the expression-only fast path — is real Spark
  * plumbing, tested and oracled. For IMAGES specifically the JDK's own
  * `javax.imageio` codecs make a real pixel path possible with no external
  * dependency: [[decodedGrids]]/[[imageSignaturesDecoded]] decode actual
  * JPEG/PNG bytes into the same grayscale grid the stub emits, so the
  * dHash near-dup family runs end-to-end on real images (spec-proven on
  * crafted PNGs/JPEGs) while the stub grid remains the oracled fixture.
  */
object Multimodal {

  /** Decoded-media metadata. In production this comes from the codec. */
  final case class MediaMeta(width: Int, height: Int, nFrames: Int, kind: String)

  /** STUB decode: deterministic fake metadata derived from the payload bytes.
    * Replace with a real decoder (e.g. javax.imageio / ffmpeg bindings); the
    * signature — bytes in, typed meta out, called once per row inside a
    * partition batch — is the production shape. */
  def decodeStub(payload: Array[Byte]): MediaMeta = {
    val n = payload.length
    MediaMeta(
      width = n % 640,
      height = (n * 31) % 480,
      nFrames = n % 30,
      kind = (n % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" })
  }

  private val mediaSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("kind", StringType)))

  /** Partition-batched decode over a binary payload column: the executor-side
    * loop a real codec would run (one JNI/library context per partition, not
    * per row). `mapPartitions` is justified here — a codec is per-partition
    * imperative logic no built-in expression can express. */
  def withDecodedMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast(LongType), col(payloadCol).cast(BinaryType))
      .rdd.mapPartitions { rows =>
        // per-partition: a real implementation would open the codec once here
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val m = decodeStub(bytes)
          Row(id, bytes.length, m.width, m.height, m.nFrames, m.kind)
        }
      }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Catalog query: treat each document's utf8 bytes as a fake media payload
    * and extract stub metadata. Uses the expression-only path (codegen'd,
    * no RDD) — bit-identical to [[withDecodedMeta]], proven by a test. */
  def multimodalMeta(s: SparkSession, d: String): DataFrame = {
    val nBytes = expr("octet_length(text)")
    documents(s, d)
      .filter(col("doc_id") < 300)
      .select(
        col("doc_id"),
        nBytes.as("n_bytes"),
        (nBytes % 640).as("width"),
        ((nBytes * 31) % 480).as("height"),
        (nBytes % 30).as("n_frames"),
        when(nBytes % 3 === 0, "image").when(nBytes % 3 === 1, "audio").otherwise("video").as("kind"))
  }

  // ---- Real byte-level media ops (no codec required) -----------------------

  /** PNG signature check on a raw binary column: the 8 magic bytes, compared
    * via hex() — pure codegen'd expressions, works on actual PNG files. */
  def isPng(bin: Column): Column = hex(substring(bin, 1, 8)) === "89504E470D0A1A0A"

  /** PNG IHDR dimensions parsed from raw bytes with column expressions only:
    * big-endian u32 at byte offsets 17 (width) and 21 (height) — after the
    * 8-byte signature, 4-byte chunk length and the 'IHDR' tag. hex()+conv()
    * is the codegen-friendly big-endian integer read; a real pipeline runs
    * THIS over billions of thumbnails and saves the codec invocation for
    * rows that pass the size filter. */
  def pngWidth(bin: Column): Column = conv(hex(substring(bin, 17, 4)), 16, 10).cast("int")
  def pngHeight(bin: Column): Column = conv(hex(substring(bin, 21, 4)), 16, 10).cast("int")

  /** WAV (RIFF/PCM) header checks and fields — the audio twin of the PNG
    * parse, again pure byte expressions on a binary column. WAV is
    * little-endian, so multi-byte fields are read per byte and recombined
    * arithmetically (hex()+conv() only reads big-endian). Offsets are the
    * canonical 44-byte PCM header: 'RIFF' @1, 'WAVE' @9, 'fmt ' @13;
    * channels u16 @23, sample rate u32 @25, bits/sample u16 @35, data-chunk
    * size u32 @41. A real pipeline runs THIS over billions of clips to
    * filter/bucket by rate and duration before any codec touches bytes.
    *
    * The gate requires the 'data' tag at its canonical offset 37, not just
    * the RIFF/WAVE/'fmt ' magics: a valid-but-non-canonical WAV (extended
    * fmt chunk, or a LIST/fact chunk before 'data') would pass the magic
    * checks while the fixed-offset field readers below returned plausible
    * garbage. Such files FAIL the gate — correct for a filter (they fall
    * through to the codec path) where mis-parsing would be silent poison. */
  def isWav(bin: Column): Column =
    hex(substring(bin, 1, 4)) === "52494646" && // 'RIFF'
      hex(substring(bin, 9, 4)) === "57415645" && // 'WAVE'
      hex(substring(bin, 13, 4)) === "666D7420" && // 'fmt '
      hex(substring(bin, 37, 4)) === "64617461" // 'data' at the PCM-44 offset

  private def leUInt(bin: Column, offset: Int, nBytes: Int): Column =
    (0 until nBytes).map { i =>
      conv(hex(substring(bin, offset + i, 1)), 16, 10).cast("long") * (1L << (8 * i))
    }.reduce(_ + _)

  def wavChannels(bin: Column): Column = leUInt(bin, 23, 2).cast("int")
  def wavSampleRate(bin: Column): Column = leUInt(bin, 25, 4).cast("int")
  def wavBitsPerSample(bin: Column): Column = leUInt(bin, 35, 2).cast("int")
  def wavDataBytes(bin: Column): Column = leUInt(bin, 41, 4)

  /** Clip duration in whole milliseconds from header fields alone:
    * floor(bytes * 8000 / (rate * channels * bits)) — numerator and
    * denominator are exact longs, so the double division (Spark's `/` on
    * longs) is exact well past any real clip length, and floor makes the
    * result integral. */
  def wavDurationMs(bin: Column): Column =
    floor((wavDataBytes(bin) * 8000L) /
      (wavSampleRate(bin).cast("long") * wavChannels(bin) * wavBitsPerSample(bin))).cast("long")

  // ---- JPEG (JFIF segment stream) ------------------------------------------
  //
  // Unlike PNG's fixed-offset IHDR, JPEG dimensions live in an SOF segment
  // at a VARIABLE offset: the header is a marker-length segment chain
  // (FF <marker> <len_be16> <payload>) that must be walked. The walk is a
  // bounded fold over column expressions — `aggregate` carries an
  // (offset, w, h) state across up to JPEG_MAX_SEGS segments, reading one
  // marker per step. Canonical header streams (SOI, APPn/COM/DQT/DHT…,
  // then SOF) resolve well inside the bound; streams that hit SOS/EOI
  // first, break the FF framing, truncate, or exceed the bound parse as
  // not-found — correct for a pre-codec filter (those rows fall through
  // to the codec path instead of being silently mis-sized).

  private val JPEG_MAX_SEGS = 16

  def isJpeg(bin: Column): Column = hex(substring(bin, 1, 2)) === "FFD8"

  /** Big-endian u8/u16 at a DYNAMIC 1-based offset (hex+conv like the PNG
    * readers, but `substr` takes column offsets); -1 on reads past the end
    * OR truncated mid-read so every malformed stream fails the framing
    * checks instead of null-poisoning the fold. The u16 reader needs the
    * explicit length guard: with exactly one byte remaining `substr`
    * returns that single byte and `conv` would report its 0-255 value as
    * a bogus "u16" — a stream cut inside an SOF payload must parse as
    * not-found, not as a wrong small dimension. */
  private def dynU8(bin: Column, off: Column): Column =
    coalesce(conv(hex(substr(bin, off, lit(1))), 16, 10).cast("int"), lit(-1))
  private def dynU16(bin: Column, off: Column): Column =
    when(length(bin) >= off + 1,
      coalesce(conv(hex(substr(bin, off, lit(2))), 16, 10).cast("int"), lit(-1)))
      .otherwise(lit(-1))

  /** The marker walk: (w, h) struct, fields -1 when no SOF was found.
    * Accepts baseline (C0), extended-sequential (C1) and progressive (C2)
    * frames — the three frame types web images actually use. */
  def jpegDims(bin: Column): Column = {
    val dead = struct(lit(-1).as("off"), lit(-1).as("w"), lit(-1).as("h"))
    aggregate(
      sequence(lit(1), lit(JPEG_MAX_SEGS)),
      struct(lit(3).as("off"), lit(-1).as("w"), lit(-1).as("h")),
      (st, _) => {
        val off = st.getField("off")
        val ff = dynU8(bin, off)
        val marker = dynU8(bin, off + 1)
        val segLen = dynU16(bin, off + 2)
        val isSof = marker.isin(0xC0, 0xC1, 0xC2)
        when(st.getField("w") >= 0 || off < 0, st) // resolved: hold state
          .otherwise(when(
            ff =!= 0xFF || marker === 0xD9 || marker === 0xDA || segLen < 2,
            dead) // broken framing, EOI, or entropy data before any SOF
          .otherwise(when(isSof,
            struct(off.as("off"),
              dynU16(bin, off + 7).as("w"), dynU16(bin, off + 5).as("h")))
          .otherwise(
            struct((off + segLen + 2).as("off"), lit(-1).as("w"), lit(-1).as("h")))))
      },
      // All-or-nothing emission, INSIDE the fold's finish lambda: a stream
      // truncated BETWEEN the height and width fields yields one good read
      // and one -1 — reporting the surviving dimension would half-size a
      // rejected frame, so both reads must succeed or neither is reported.
      // Finish matters for COST, not just style: `aggregate` is a lambda
      // HOF, so it is interpreted and excluded from codegen subexpression
      // elimination — every reference to the fold in an OUTER expression
      // re-runs the whole marker walk. Here `st` is a bound lambda
      // variable, so the walk runs exactly once however many times the
      // emission reads its fields (the outer-reference form measured 3×
      // the walk cost per extracted field).
      st => {
        val fw = st.getField("w")
        val fh = st.getField("h")
        val ok = fw >= 0 && fh >= 0
        struct(when(ok, fw).otherwise(lit(-1)).as("w"),
          when(ok, fh).otherwise(lit(-1)).as("h"))
      })
  }

  def jpegWidth(bin: Column): Column = {
    val w = jpegDims(bin).getField("w")
    when(isJpeg(bin) && w >= 0, w)
  }
  def jpegHeight(bin: Column): Column = {
    val h = jpegDims(bin).getField("h")
    when(isJpeg(bin) && h >= 0, h)
  }

  /** Catalog query `x_multimodal_jpeg`: synthesize a JFIF stream per doc —
    * SOI, a COM segment whose LENGTH VARIES with doc_id (so the SOF offset
    * is different row to row and the walk is genuinely exercised), then an
    * SOF0 carrying planted dimensions — and parse it back with the column
    * walker; every 10th doc gets a corrupt payload (no SOI) that must
    * reject. The DuckDB oracle states the PLANTED ground truth directly,
    * so the gate checks the parser against independent truth rather than
    * a mirrored reimplementation. */
  /** The synthesized JFIF fixture payload (shared by the parse entry and
    * the multimodal pipeline): planted dims 16+doc_id%624 × 16+doc_id%464,
    * COM length varies with doc_id so the SOF offset differs row to row,
    * and every 10th doc is corrupted (no SOI). */
  private def jpegFixturePayload: Column = {
    val width = (lit(16) + col("doc_id") % 624).cast("int")
    val height = (lit(16) + col("doc_id") % 464).cast("int")
    val comLen = (col("doc_id") % 7 + 4).cast("int") // includes its own 2 bytes
    val good = concat(
      lit("FFD8"),
      lit("FFFE"), lpad(hex(comLen), 4, "0"), repeat(lit("20"), comLen - 2),
      lit("FFC0"), lit("0011"), lit("08"),
      lpad(hex(height), 4, "0"), lpad(hex(width), 4, "0"),
      lit("03")) // walk stops at SOF; the remaining component bytes are moot
    unhex(when(col("doc_id") % 10 === 0, concat(lit("00"), good)).otherwise(good))
  }

  def multimodalJpeg(s: SparkSession, d: String): DataFrame = {
    val payload = jpegFixturePayload
    // Two-stage projection so the marker walk runs ONCE per row: the dims
    // struct materializes in its own Project, and CollapseProject leaves
    // it there because the fold is not a cheap expression to duplicate
    // (inlining it would re-run the walk per extracted field — see the
    // finish-lambda note on jpegDims).
    documents(s, d)
      .filter(col("doc_id") < 300)
      .select(col("doc_id"),
        isJpeg(payload).as("is_jpeg"),
        jpegDims(payload).as("_dims"))
      .select(col("doc_id"), col("is_jpeg"),
        when(col("is_jpeg") && col("_dims.w") >= 0, col("_dims.w")).as("width"),
        when(col("is_jpeg") && col("_dims.h") >= 0, col("_dims.h")).as("height"))
  }

  /** The multimodal corpus-assembly composition (catalog
    * `x_pipeline_multimodal`) — the image twin of the text pipeline's
    * `x_pipeline_full`, each stage feeding the next:
    *
    *   1. header gate     — parse the JPEG stream ([[jpegDims]] marker
    *                        walk over the synthesized fixture payloads);
    *                        keep docs whose parse succeeds
    *   2. image near-dup  — dHash banding over the GATED corpus, greedy
    *                        keep-first drop (a doc is dropped iff it pairs
    *                        with any lower-id doc — doc_b of the kernel's
    *                        ordered pairs)
    *   3. resize plan     — aspect-preserving fit into the 224×224 model
    *                        input box on the survivors
    *   4. pixel sharding  — balanced shards by fit-pixel mass (the vision
    *                        loader's batch budget), 4M-pixel budget via
    *                        the shared distributed prefix sum
    *
    * Output: the shard manifest (shard_id, n_images, n_pixels). The
    * DuckDB oracle gates on the synthesis GROUND TRUTH (doc_id % 10) and
    * states planted dims directly, so any parser deviation inside the
    * pipeline changes fit/shard arithmetic and fails the hash — parse
    * correctness is checked against independent truth, not a mirrored
    * walker (x_multimodal_jpeg pins the walker row-by-row separately).
    *
    * Scale shape: stages 1 and 3 are per-row expressions at scan speed;
    * stage 2 is the banded kernel (the only shuffle of corpus-order data);
    * stage 4's windows run per range partition with control-plane offsets.
    * The chain is linear — no stage consumed twice. */
  def pipelineMultimodal(s: SparkSession, d: String): DataFrame = {
    val payload = jpegFixturePayload
    // Same two-stage projection as multimodalJpeg: one marker walk per row.
    val parsed = documents(s, d)
      .select(col("doc_id"), col("text"),
        isJpeg(payload).as("_isj"), jpegDims(payload).as("_dims"))
      .select(col("doc_id"), col("text"),
        when(col("_isj") && col("_dims.w") >= 0, col("_dims.w")).as("w"),
        when(col("_isj") && col("_dims.h") >= 0, col("_dims.h")).as("h"))
      .filter(col("w").isNotNull && col("h").isNotNull)
    val sigs = parsed.select(col("doc_id"), dhashCol(gridCol(col("text"))).as("w0"))
    val dropped = Dedup.simhashBandedPairs(sigs,
        words = 1, bandBits = IMG_BAND_BITS, maxHamming = IMG_MAX_HAMMING)
      .select(col("doc_b").as("doc_id")).distinct()
    val fit = fitWithin(col("w"), col("h"), 224, 224)
    val planned = parsed.join(dropped, Seq("doc_id"), "left_anti")
      .withColumn("fit", fit)
      .select(col("doc_id"),
        (col("fit.w").cast("long") * col("fit.h")).as("n_tokens"))
    TextAnalysis.shardBalancedOver(s, planned, budget = 1L << 22)
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_images"), sum(col("n_tokens")).as("n_pixels"))
  }

  /** Aspect-preserving fit of (w, h) into a (maxW, maxH) box — the resize
    * TARGET computation (the actual pixel resample is the codec's job; the
    * planning math is exact integer/double column arithmetic). Each axis
    * clamps to >= 1: extreme aspect ratios (e.g. 542×2 into 224×224)
    * would otherwise floor the short axis to a 0-pixel target, which is
    * as corrupt for a resampler as the 0-dim inputs callers filter. */
  def fitWithin(w: Column, h: Column, maxW: Int, maxH: Int): Column = {
    val scale = least(lit(maxW).cast("double") / w, lit(maxH).cast("double") / h, lit(1.0))
    struct(
      greatest(floor(w * scale), lit(1)).cast("int").as("w"),
      greatest(floor(h * scale), lit(1)).cast("int").as("h"))
  }

  /** Evenly-strided frame-sample indices: k frames from an n-frame clip,
    * `floor(i*n/k)` for i in [0, k) — exact integer math, the standard
    * keyframe-sampling shape for video training data. */
  def frameSampleIndices(nFrames: Column, k: Int): Column =
    when(nFrames <= 0, array().cast("array<int>"))
      .otherwise(transform(sequence(lit(0), lit(k - 1)),
        i => floor(i * nFrames / k).cast("int"))) // ints are double-exact here

  /** Catalog query: frame-sampling plan over the stub metadata — for each
    * video doc, which 4 frame indices a sampler would decode. */
  def frameSample(s: SparkSession, d: String): DataFrame = {
    val nBytes = expr("octet_length(text)")
    documents(s, d)
      .filter(col("doc_id") < 300)
      .select(col("doc_id"), (nBytes % 30).as("n_frames"))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("n_frames"),
        posexplode(frameSampleIndices(col("n_frames"), 4)).as(Seq("sample_idx", "frame_idx")))
  }

  /** Catalog query: the resize PLAN over the stub metadata — for each
    * image/video doc, the aspect-preserving target the pixel resampler
    * would be asked for (224×224 box, the standard vision-model input).
    * Zero-area rows are filtered, not fitted: a 0-dim "image" is
    * corrupt input for a resizer, and the division in the scale would
    * poison the plan with infinities. */
  def resizePlan(s: SparkSession, d: String): DataFrame =
    multimodalMeta(s, d)
      .filter(col("kind") =!= "audio" && col("width") > 0 && col("height") > 0)
      .withColumn("fit", fitWithin(col("width"), col("height"), 224, 224))
      .select(col("doc_id"), col("kind"), col("width"), col("height"),
        col("fit.w").as("fit_w"), col("fit.h").as("fit_h"))

  // ---- Image near-duplicate family (dHash over the stub-decode grid) -------
  //
  // Perceptual dedup for an image corpus: decode → downscale to a tiny
  // grayscale grid → dHash (each bit compares two adjacent grid cells) →
  // band the hash exactly like every other LSH family in ops/Dedup. The
  // CODEC is this environment's stub (no image libraries): the "decoded
  // grid" is a deterministic 6×11 byte grid derived from the payload via
  // md5 — swap gridCol for a real decode+resize and everything downstream
  // (hashing, banding, verification, the DuckDB twin discipline) is the
  // production pipeline unchanged. Near-duplicates are PLANTED at grid
  // level (every 5th doc gets a clone with 0–3 pixels bumped by +16 —
  // exactly what a re-encode/gamma-shift does to a real thumbnail grid),
  // which gives the family an exact ground truth for its precision audit.
  //
  // Scale shape: the grid+hash is one codegen'd scan-speed pass (66 md5 per
  // payload, no shuffle); pairs ride the shared banded kernel
  // (Dedup.simhashBandedPairs) at 4 bands × 15 bits — 32768 buckets/band,
  // chosen by the kernel's sizing rule because md5 grids are
  // UNIFORM-random (the adversarial case for banding: real image hashes
  // cluster, these don't), so candidate volume is 4·n²/2¹⁵ — ~4M pairs at
  // 250k images, linear-ish through the measured range.

  private val IMG_ROWS = 6
  private val IMG_COLS = 11 // 10 comparisons per row → 60 dHash bits
  private val IMG_CLONE_OFFSET = 10000000L
  private val IMG_CLONE_MOD = 5 // every 5th doc gets a planted clone
  private val IMG_PERT_DELTA = 16 // grid-level bump per perturbed pixel
  private val IMG_BAND_BITS = 15
  private val IMG_MAX_HAMMING = 3 // bands-1: pigeonhole-complete

  /** The stub "decoded thumbnail": pixel i = first md5 byte of
    * (payload, '#g', i) — 66 uniform bytes standing in for the real
    * decode+downscale output. */
  private def gridPix(payload: Column, i: Column): Column =
    conv(substring(md5(concat(payload, lit("#g"), i.cast("string"))), 1, 2), 16, 10)
      .cast("long")

  private def gridCol(payload: Column): Column =
    transform(sequence(lit(0), lit(IMG_ROWS * IMG_COLS - 1)), i => gridPix(payload, i))

  /** Clone grid: n_pert = (doc_id/5) % 4 pixels bumped by +16, at positions
    * (i·7 + doc_id) % 66 < n_pert — 7 is coprime to 66, so exactly n_pert
    * distinct pixels move. A +16 bump flips a dHash bit only where the
    * neighboring cells were within 16 grey levels — small, local signature
    * damage, the perceptual-hash robustness model. Derived FROM the
    * already-computed grid (index-aware transform), so the md5 work is not
    * repeated. */
  private def cloneGridCol(grid: Column, origId: Column): Column = {
    // origId is always a multiple of IMG_CLONE_MOD, so the double division
    // Spark's `/` performs is exact; the cast back to long is the floor-div
    // the DuckDB twin writes as doc_id // 5.
    val nPert = (origId / IMG_CLONE_MOD).cast("long") % 4
    transform(grid, (p, i) =>
      p + when((i * 7 + origId) % (IMG_ROWS * IMG_COLS) < nPert, IMG_PERT_DELTA)
        .otherwise(0L))
  }

  /** 60-bit dHash of a 66-cell grid: bit (r·10+c) = 1 iff cell (r, c+1) >
    * cell (r, c) — gradient direction, the classic difference hash. */
  private def dhashCol(grid: Column): Column =
    (for { r <- 0 until IMG_ROWS; c <- 0 until IMG_COLS - 1 } yield
      when(element_at(grid, r * IMG_COLS + c + 2) > element_at(grid, r * IMG_COLS + c + 1),
        lit(1L << (r * (IMG_COLS - 1) + c))).otherwise(0L))
      .reduce(_ + _)

  /** Signature relation (doc_id, w0) over corpus ∪ planted clones — the
    * input shape Dedup.simhashBandedPairs takes. Clones live at
    * doc_id + 10⁷ (disjoint from any fixture id range). */
  private[ops] def imageSignatures(s: SparkSession, d: String): DataFrame = {
    // One scan, no Union: each doc explodes into its own (id, grid) struct
    // plus — for every 5th doc — the planted clone's. (A Union of the two
    // projections trips Catalyst's union-constraint rewrite: the alias
    // constraints still reference the pruned `text` attribute.)
    val grid = gridCol(col("text"))
    val self = struct(col("doc_id").as("doc_id"), grid.as("g"))
    val clone = struct((col("doc_id") + IMG_CLONE_OFFSET).as("doc_id"),
      cloneGridCol(grid, col("doc_id")).as("g"))
    documents(s, d)
      .select(explode(
        when(col("doc_id") % IMG_CLONE_MOD === 0, array(self, clone))
          .otherwise(array(self))).as("r"))
      .select(col("r.doc_id").as("doc_id"), dhashCol(col("r.g")).as("w0"))
  }

  /** REAL-codec grid source for the dHash family: decode via
    * `javax.imageio` (the JDK's own JPEG/PNG/BMP/GIF codecs — no external
    * dependency), then area-average down to the same IMG_ROWS×IMG_COLS
    * grayscale grid the stub emits. Runs in the identical per-partition
    * batch shape as [[withDecodedMeta]] (a stateful codec initializes once
    * per partition; ImageIO's plugin registry scan amortizes the same
    * way). Undecodable payloads are DROPPED, not nulled — in a production
    * pipeline they fall through to a quarantine path, and a null grid
    * would poison the hash.
    *
    * Grayscale is integer BT.601 ((299R+587G+114B)/1000) and the
    * downscale is an integer box average over the pixel rectangle each
    * grid cell covers — no float resampling, so the grid (and every hash
    * bit derived from it) is bit-deterministic across JVMs and platforms.
    */
  def decodedGrids(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("g", ArrayType(LongType, containsNull = false), nullable = false)))
    val rdd = df.select(col(idCol).cast(LongType), col(payloadCol).cast(BinaryType))
      .rdd.mapPartitions { rows =>
        rows.flatMap { r =>
          val bytes = r.getAs[Array[Byte]](1)
          // MemoryCache, not ImageIO.read(InputStream): the latter wraps
          // the bytes in the default FILE-cache stream — a temp file (and
          // its fsyncs) per payload, pure overhead for in-memory inputs.
          val img =
            try {
              val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
                new java.io.ByteArrayInputStream(bytes))
              val readers = javax.imageio.ImageIO.getImageReaders(iis)
              if (!readers.hasNext) { iis.close(); None }
              else {
                val reader = readers.next()
                try { reader.setInput(iis); Option(reader.read(0)) }
                finally { reader.dispose(); iis.close() }
              }
            } catch { case _: java.io.IOException => None }
          img.filter(i => i.getWidth > 0 && i.getHeight > 0)
            .map(i => Row(r.getLong(0), grayGrid(i)))
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** The integer box-average grayscale grid of a decoded image (see
    * [[decodedGrids]]); cells whose rectangle falls outside a tiny image
    * read as 0. */
  private def grayGrid(img: java.awt.image.BufferedImage): Array[Long] = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Long](IMG_ROWS * IMG_COLS)
    var r = 0
    while (r < IMG_ROWS) {
      var c = 0
      while (c < IMG_COLS) {
        val x0 = c * w / IMG_COLS
        val x1 = math.min(math.max((c + 1) * w / IMG_COLS, x0 + 1), w)
        val y0 = r * h / IMG_ROWS
        val y1 = math.min(math.max((r + 1) * h / IMG_ROWS, y0 + 1), h)
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += (299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) +
              114L * (rgb & 0xFF)) / 1000L
            x += 1
          }
          y += 1
        }
        out(r * IMG_COLS + c) =
          if (x1 <= x0 || y1 <= y0) 0L
          else sum / ((x1 - x0).toLong * (y1 - y0))
        c += 1
      }
      r += 1
    }
    out
  }

  /** (doc_id, w0) signatures from REAL image bytes — the production twin
    * of [[imageSignatures]]: the SAME [[dhashCol]] expression over the
    * decoded grid, feeding the SAME banded kernel. This is the one-seam
    * codec swap the family was designed around; the stub path stays as
    * the oracled fixture. */
  def imageSignaturesDecoded(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    decodedGrids(df, idCol, payloadCol)
      .select(col("doc_id"), dhashCol(col("g")).as("w0"))

  /** [[dedupImage]] over real image bytes: decode → grid → dHash → the
    * shared banded kernel at the family's band parameters. */
  def dedupImageDecoded(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    Dedup.simhashBandedPairs(imageSignaturesDecoded(df, idCol, payloadCol),
      words = 1, bandBits = IMG_BAND_BITS, maxHamming = IMG_MAX_HAMMING)

  /** Image near-dup pairs (catalog `x_dedup_image`): banded dHash
    * candidates, hamming-verified — the shared kernel at 4×15-bit bands
    * (see the sizing note above; uniform grids need the wide band space
    * the 10-bit default would quadratically flood). */
  private def imageSigsShared(s: SparkSession, d: String): DataFrame =
    fpShared(s, d, "imgSigs")(imageSignatures(s, d))

  private def imagePairsShared(s: SparkSession, d: String): DataFrame = {
    // Resolve the signature dependency OUTSIDE the cache lambda (the
    // RelCache recursive-update rule, same as [[audioPairsShared]]).
    val sigs = imageSigsShared(s, d)
    fpShared(s, d, "imgPairs")(
      Dedup.simhashBandedPairs(sigs,
        words = 1, bandBits = IMG_BAND_BITS, maxHamming = IMG_MAX_HAMMING))
  }

  def dedupImage(s: SparkSession, d: String): DataFrame =
    imagePairsShared(s, d).orderBy(col("doc_a"), col("doc_b"))

  /** Incremental probe (catalog `x_dedup_image_incremental`) — completes
    * the per-family incremental contract: every dedup family (lexical,
    * semantic, audio, video, and now image) has a delta-vs-index entry.
    * Today's ARRIVING images (the fixture casts the planted clones as the
    * delta — re-encoded copies of corpus images, the realistic arrival)
    * probe the persisted dHash signature index of the existing corpus via
    * [[Dedup.simhashBandedCrossPairs]]. O(|delta| · bucket occupancy),
    * never a corpus self-join; the index side is scanned once and never
    * shuffled against itself. */
  def dedupImageIncremental(s: SparkSession, d: String): DataFrame = {
    val sigs = imageSigsShared(s, d)
    val delta = sigs.filter(col("doc_id") >= IMG_CLONE_OFFSET)
    val index = sigs.filter(col("doc_id") < IMG_CLONE_OFFSET)
    Dedup.simhashBandedCrossPairs(delta, index,
      words = 1, bandBits = IMG_BAND_BITS, maxHamming = IMG_MAX_HAMMING)
      .orderBy(col("doc_id"), col("match_id"))
  }

  /** Precision audit vs the planted ground truth (catalog
    * `x_dedup_image_precision`): found pairs vs the (doc, clone) pairs the
    * fixture planted. Exact counts — n_both/n_planted is recall of the
    * planted clones (perturbed clones whose bit damage exceeds hamming 3
    * are the honest misses), n_both/n_candidates is precision against
    * random-grid collisions. */
  def dedupImagePrecision(s: SparkSession, d: String): DataFrame = {
    val cand = imagePairsShared(s, d)
      .select(col("doc_a"), col("doc_b"), lit(1).as("is_cand"))
    val planted = documents(s, d)
      .filter(col("doc_id") % IMG_CLONE_MOD === 0)
      .select(col("doc_id").as("doc_a"),
        (col("doc_id") + IMG_CLONE_OFFSET).as("doc_b"), lit(1).as("is_planted"))
    cand.join(planted, Seq("doc_a", "doc_b"), "full_outer")
      .agg(
        sum(col("is_cand")).as("n_candidates"),
        sum(col("is_planted")).as("n_planted"),
        sum(col("is_cand") * col("is_planted")).as("n_both"))
  }

  // ---- Image near-dup over REAL PNG bytes (the audio family's bar) -------
  //
  // The stub family above plants its "decoded grid" directly; this family
  // materializes REAL PNG bytes and makes the query path EARN the grid back
  // through an actual codec: fixture build (codegen'd
  // [[org.apache.spark.sql.graftbridge.PngFixtureImage]]) → PNG bytes →
  // `javax.imageio` decode + integer box-average ([[decodedGrids]], the
  // partition-batched production path) → the SAME dHash + banded kernel.
  // The DuckDB oracle recomputes the planted cell grays arithmetically
  // from the generator formula (the audio family's trick,
  // [[wavPayloadCol]]): PNG is lossless, BT.601 of (v,v,v) is exactly v,
  // and the box average of a uniform cell block is the cell value — so
  // the decoded grid must match the formula byte-for-byte, and any
  // deviation in encode, decode, or downscale fails the value hash.
  //
  // Scale shape: fixture+decode is one scan-speed per-row pass (no
  // shuffle); pairs ride the shared banded kernel at the stub family's
  // band parameters. Clone ids reuse IMG_CLONE_OFFSET — the two families
  // never union their relations.

  private val IMG_REAL_CELL_PX = 4 // 44×24 px: each grid cell a uniform 4×4 block
  private val IMG_REAL_SEED = "#q" // distinct from the stub grid's '#g'

  /** REAL-PNG fixture corpus (doc_id, png): every document rendered as a
    * cell-aligned grayscale PNG; every IMG_CLONE_MOD-th doc additionally
    * yields a perturbed clone at doc_id + IMG_CLONE_OFFSET (same
    * one-scan explode shape as [[imageSignatures]]). */
  def pngFixtureCorpus(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.pngFixtureImage
    def png(asClone: Boolean) =
      pngFixtureImage(col("text"), col("doc_id"), IMG_ROWS, IMG_COLS,
        IMG_REAL_CELL_PX, IMG_REAL_SEED, asClone, IMG_CLONE_MOD, IMG_PERT_DELTA)
    val self = struct(col("doc_id").as("doc_id"), png(asClone = false).as("png"))
    val clone = struct((col("doc_id") + IMG_CLONE_OFFSET).as("doc_id"),
      png(asClone = true).as("png"))
    // The codec work is ~ms/row, 1000x the usual expression cost — a
    // small-file local corpus arrives as ONE split and would serialize
    // the whole encode behind a single task (measured: 10x the expected
    // wall). Rebalance the cheap (id, text) rows BEFORE the encode; at
    // production scale the scan already has enough splits and this
    // shuffle is noise next to the codec stage it feeds.
    documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .select(explode(
        when(col("doc_id") % IMG_CLONE_MOD === 0, array(self, clone))
          .otherwise(array(self))).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.png").as("png"))
  }

  /** Codec round-trip audit (catalog `x_image_real_roundtrip`): per-image
    * grid aggregates over the DECODED pixels, oracled against the planted
    * formula — the per-document proof that encode → PNG → decode →
    * box-average is exact, independent of which pairs survive banding
    * (the audio family's `x_audio_envelope` analogue). */
  def imageRealRoundtrip(s: SparkSession, d: String): DataFrame =
    imageRealGridsShared(s, d)
      .select(col("doc_id"),
        aggregate(col("g"), lit(0L), (acc, x) => acc + x).as("g_sum"),
        array_min(col("g")).as("g_min"),
        array_max(col("g")).as("g_max"))
      .orderBy(col("doc_id"))

  /** Decoded grids, persisted ONCE for the whole family: the roundtrip
    * audit, the pair self-join (both sides), and the precision entry all
    * read this relation — the codec pass is the family's dominant cost at
    * scale (measured 24.9x of the sf0.1 point at sf5), and the RDD seam
    * breaks Spark's exchange reuse, so without the persist every consumer
    * would re-run encode+decode over the corpus. */
  private def imageRealGridsShared(s: SparkSession, d: String): DataFrame =
    fpShared(s, d, "imgRealGrids")(
      decodedGrids(pngFixtureCorpus(s, d), "doc_id", "png"))

  private def imageRealPairsShared(s: SparkSession, d: String): DataFrame = {
    // Resolve the grid dependency OUTSIDE the cache lambda (the RelCache
    // recursive-update rule, same as [[imagePairsShared]]); the dHash
    // over cached grids is a scan-speed projection, not worth a second
    // persisted copy.
    val sigs = imageRealGridsShared(s, d)
      .select(col("doc_id"), dhashCol(col("g")).as("w0"))
    fpShared(s, d, "imgRealPairs")(
      Dedup.simhashBandedPairs(sigs,
        words = 1, bandBits = IMG_BAND_BITS, maxHamming = IMG_MAX_HAMMING))
  }

  /** Image near-dup pairs over REAL PNG bytes (catalog
    * `x_dedup_image_real`): the stub entry's exact pipeline with the stub
    * grid replaced by a genuine decode — the one-seam codec swap,
    * exercised end-to-end under the oracle. */
  def dedupImageReal(s: SparkSession, d: String): DataFrame =
    imageRealPairsShared(s, d).orderBy(col("doc_a"), col("doc_b"))

  /** Incremental probe over REAL PNG bytes (catalog
    * `x_dedup_image_real_incremental`) — the real-codec family reaches the
    * stub family's delta-vs-index bar: today's ARRIVING images (the planted
    * clones, whose grids are EARNED through the PNG encode + `javax.imageio`
    * decode like everything else in this family) probe the persisted dHash
    * signature index of the existing corpus via
    * [[Dedup.simhashBandedCrossPairs]]. O(|delta| · bucket occupancy), never
    * a corpus self-join; the decoded grids come from the family's one
    * persisted codec pass ([[imageRealGridsShared]]), so the probe adds a
    * scan-speed dHash projection, not a second decode of the corpus. */
  def dedupImageRealIncremental(s: SparkSession, d: String): DataFrame = {
    val sigs = imageRealGridsShared(s, d)
      .select(col("doc_id"), dhashCol(col("g")).as("w0"))
    val delta = sigs.filter(col("doc_id") >= IMG_CLONE_OFFSET)
    val index = sigs.filter(col("doc_id") < IMG_CLONE_OFFSET)
    Dedup.simhashBandedCrossPairs(delta, index,
      words = 1, bandBits = IMG_BAND_BITS, maxHamming = IMG_MAX_HAMMING)
      .orderBy(col("doc_id"), col("match_id"))
  }

  /** Precision audit of the real-codec pairs vs the planted clones
    * (catalog `x_dedup_image_real_precision`). */
  def dedupImageRealPrecision(s: SparkSession, d: String): DataFrame = {
    val cand = imageRealPairsShared(s, d)
      .select(col("doc_a"), col("doc_b"), lit(1).as("is_cand"))
    val planted = documents(s, d)
      .filter(col("doc_id") % IMG_CLONE_MOD === 0)
      .select(col("doc_id").as("doc_a"),
        (col("doc_id") + IMG_CLONE_OFFSET).as("doc_b"), lit(1).as("is_planted"))
    cand.join(planted, Seq("doc_a", "doc_b"), "full_outer")
      .agg(
        sum(col("is_cand")).as("n_candidates"),
        sum(col("is_planted")).as("n_planted"),
        sum(col("is_cand") * col("is_planted")).as("n_both"))
  }

  // ---- Audio: real-WAV fixture build, envelope extraction, fingerprint dedup

  private val AUD_FRAMES = 61 // 60 envelope-gradient fingerprint bits
  private val AUD_SPF = 8 // samples per frame: one md5 = 16 bytes = 8 i16le samples
  private val AUD_RATE = 8000
  private val AUD_DATA_BYTES = AUD_FRAMES * AUD_SPF * 2 // 976
  private val AUD_CLONE_OFFSET = 20000000L // disjoint from doc ids AND image clones
  private val AUD_CLONE_MOD = 7 // every 7th doc gets a planted near-dup clip
  private val AUD_PERT_DELTA = 16 // low-byte bump on a perturbed frame's first sample
  private val AUD_BAND_BITS = 15
  private val AUD_MAX_HAMMING = 3 // bands-1: pigeonhole-complete

  /** Canonical 44-byte PCM WAV header for the fixture clips: mono, 8 kHz,
    * 16-bit, data chunk at the PCM-44 offset — exactly the layout
    * [[isWav]] gates on and the `wav*` field readers parse. Built once on
    * the driver and shipped as a binary literal. */
  private lazy val wavHeaderBytes: Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + AUD_DATA_BYTES)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1).putShort(1).putInt(AUD_RATE).putInt(AUD_RATE * 2)
    b.putShort(2).putShort(16)
    b.put("data".getBytes("US-ASCII")).putInt(AUD_DATA_BYTES)
    b.array()
  }

  /** The stub "recorded clip": frame f's 16 PCM bytes = md5(text, '#p', f)
    * — the audio analogue of [[gridPix]]'s stub decode. Unlike the image
    * grid, the fixture is materialized as REAL BYTES behind a REAL header:
    * the query path must parse them back (header fields via the `wav*`
    * readers, samples via the codegen'd [[graftbridge.PcmFrameEnergies]]),
    * so the oracle — which recomputes the energies arithmetically from the
    * generator formula — verifies the whole build+parse round-trip. */
  private def frameHex(text: Column, f: Int): Column =
    md5(concat(text, lit("#p"), lit(f.toString)))

  private def frameBin(text: Column, f: Int): Column = unhex(frameHex(text, f))

  /** Perturbed frame: first sample's LOW byte bumped by +16 mod 256 (no
    * carry into the high byte, mirroring the image family's +16 grey
    * bump). |energy delta| <= 240 (the mod-wrap worst case) of a ~131k
    * expected frame energy, so a gradient bit flips only where adjacent
    * frame energies nearly tie — dither-level signature damage, the
    * perceptual-hash robustness model. */
  private def framePerturbedBin(text: Column, f: Int): Column = {
    val h = frameHex(text, f)
    val b0 = conv(substring(h, 1, 2), 16, 10).cast("long")
    unhex(concat(lpad(hex((b0 + AUD_PERT_DELTA) % 256), 2, "0"), substring(h, 3, 30)))
  }

  private def frameMaybePerturbed(text: Column, f: Int, origId: Column, asClone: Boolean): Column =
    if (!asClone) frameBin(text, f)
    else {
      // origId is always a multiple of AUD_CLONE_MOD, so the double
      // division is exact; cast back to long = the oracle's doc_id // 7.
      val nPert = (origId / AUD_CLONE_MOD).cast("long") % 4
      when((lit(f) * 5 + origId) % AUD_FRAMES < nPert, framePerturbedBin(text, f))
        .otherwise(frameBin(text, f))
    }

  /** Whole fixture clip as one binary column — the COLUMN FORMULATION,
    * header ++ 61 × `unhex(md5(...))` frames: the readable statement of
    * the fixture contract, spec-pinned bit-equal to the native builder.
    * Clones perturb n_pert = (doc_id/7) % 4 frames at positions (f·5 +
    * doc_id) % 61 < n_pert (5 is coprime to 61, so exactly n_pert
    * distinct frames).
    *
    * NOT the catalog path: 61 inlined md5→unhex chains inside a single
    * concat overflow Janino's 64 KB method limit — a single expression
    * tree can't be split, so the whole projection stage fell back to
    * interpreted mode (`Code grows beyond 64 KB`, ~2× on the signature
    * relation). The catalog rides [[wavClipCol]]. */
  private[ops] def wavPayloadCol(text: Column, origId: Column, asClone: Boolean): Column =
    concat(lit(wavHeaderBytes) +:
      (0 until AUD_FRAMES).map(f => frameMaybePerturbed(text, f, origId, asClone)): _*)

  /** The catalog path: same bytes from the codegen'd native builder. */
  private[ops] def wavClipCol(text: Column, origId: Column, asClone: Boolean): Column =
    org.apache.spark.sql.graftbridge.wavFixtureClip(text, origId,
      wavHeaderBytes, AUD_FRAMES, "#p", asClone, AUD_CLONE_MOD, AUD_PERT_DELTA)

  private[ops] def audioEnvCol(payload: Column): Column =
    org.apache.spark.sql.graftbridge.pcmFrameEnergies(payload, 44, AUD_SPF)

  /** 60-bit envelope fingerprint: bit f = 1 iff energy[f+1] > energy[f] —
    * gradient direction over the envelope, the 1-D analogue of dHash
    * (Chromaprint-style fingerprints binarize exactly this kind of
    * frame-to-frame feature delta). */
  private[ops] def audioSigCol(env: Column): Column =
    (0 until AUD_FRAMES - 1).map(f =>
      when(element_at(env, f + 2) > element_at(env, f + 1), lit(1L << f)).otherwise(0L))
      .reduce(_ + _)

  /** Signature relation (doc_id, w0) over corpus ∪ planted clone clips —
    * the same input shape [[Dedup.simhashBandedPairs]] takes (and the
    * image family feeds). One scan, no Union; envelope materialized in its
    * own projection so the byte parse runs once per row. */
  private[ops] def audioSignatures(s: SparkSession, d: String): DataFrame = {
    val self = struct(col("doc_id").as("doc_id"),
      wavClipCol(col("text"), col("doc_id"), asClone = false).as("p"))
    val clone = struct((col("doc_id") + AUD_CLONE_OFFSET).as("doc_id"),
      wavClipCol(col("text"), col("doc_id"), asClone = true).as("p"))
    documents(s, d)
      .select(explode(
        when(col("doc_id") % AUD_CLONE_MOD === 0, array(self, clone))
          .otherwise(array(self))).as("r"))
      .select(col("r.doc_id").as("doc_id"), audioEnvCol(col("r.p")).as("env"))
      .select(col("doc_id"), audioSigCol(col("env")).as("w0"))
  }

  /** Cache for the fingerprint families' shared artifacts — the shared
    * [[RelCache]] discipline (stopped sessions swept, live sessions
    * bounded to [[RelCache.MaxDirsPerSession]] scale dirs LRU, so a
    * two-scale verify pass interleaving dirs no longer thrashes). Tags
    * live under the `mm/` namespace so [[clearFingerprintCache]] stays
    * family-scoped.
    *
    * Build lambdas must NOT call back into [[fpShared]] (ConcurrentHashMap
    * recursive-update hazard) — evaluate any cached dependency BEFORE
    * entering the cache (see [[audioPairsShared]]). */
  private def fpShared(s: SparkSession, d: String, tag: String)(
      build: => DataFrame): DataFrame =
    RelCache.shared(s, d, "mm/" + tag)(build)

  /** Drop and unpersist every cached fingerprint artifact for a session —
    * the explicit lifecycle hook for long-lived sessions (tests and batch
    * drivers that outlive one dedup pass). */
  def clearFingerprintCache(s: SparkSession): Unit =
    RelCache.clear(s, "mm/")

  private def audioSigsShared(s: SparkSession, d: String): DataFrame =
    fpShared(s, d, "audSigs")(audioSignatures(s, d))

  private def audioPairsShared(s: SparkSession, d: String): DataFrame = {
    // Resolve the signature dependency OUTSIDE the cache lambda — a nested
    // fpShared call inside computeIfAbsent is a recursive same-map update.
    val sigs = audioSigsShared(s, d)
    fpShared(s, d, "audPairs")(
      Dedup.simhashBandedPairs(sigs,
        words = 1, bandBits = AUD_BAND_BITS, maxHamming = AUD_MAX_HAMMING))
  }

  /** Audio near-dup pairs (catalog `x_dedup_audio`): banded fingerprint
    * join at 4×15-bit bands, recall-complete for hamming <= 3 — the SHARED
    * kernel the text SimHash and image dHash families ride, fed by a third
    * modality. At 100 TB the same sizing rule applies (widen the envelope
    * / narrow the bands as the clip count grows). */
  def dedupAudio(s: SparkSession, d: String): DataFrame =
    audioPairsShared(s, d).orderBy(col("doc_a"), col("doc_b"))

  /** Incremental probe (catalog `x_dedup_audio_incremental`) — the day-2
    * face of the fingerprint families: today's ARRIVING clips (the fixture
    * casts the planted clone clips as the delta — re-encoded copies of
    * corpus audio, the realistic arrival) probe the persisted signature
    * index of the existing corpus via [[Dedup.simhashBandedCrossPairs]].
    * O(|delta| · bucket occupancy), never a corpus self-join — the same
    * contract as the lexical `dedupIncremental` and the semantic
    * `dedupSemanticIncremental`, in hamming space. */
  def dedupAudioIncremental(s: SparkSession, d: String): DataFrame = {
    val sigs = audioSigsShared(s, d)
    val delta = sigs.filter(col("doc_id") >= AUD_CLONE_OFFSET)
    val index = sigs.filter(col("doc_id") < AUD_CLONE_OFFSET)
    Dedup.simhashBandedCrossPairs(delta, index,
      words = 1, bandBits = AUD_BAND_BITS, maxHamming = AUD_MAX_HAMMING)
      .orderBy(col("doc_id"), col("match_id"))
  }

  /** Precision/recall audit vs the planted ground truth (catalog
    * `x_dedup_audio_precision`) — same contract as
    * [[dedupImagePrecision]]: perturbed clones whose bit damage exceeds
    * hamming 3 are the honest misses. */
  def dedupAudioPrecision(s: SparkSession, d: String): DataFrame = {
    val cand = audioPairsShared(s, d)
      .select(col("doc_a"), col("doc_b"), lit(1).as("is_cand"))
    val planted = documents(s, d)
      .filter(col("doc_id") % AUD_CLONE_MOD === 0)
      .select(col("doc_id").as("doc_a"),
        (col("doc_id") + AUD_CLONE_OFFSET).as("doc_b"), lit(1).as("is_planted"))
    cand.join(planted, Seq("doc_a", "doc_b"), "full_outer")
      .agg(
        sum(col("is_cand")).as("n_candidates"),
        sum(col("is_planted")).as("n_planted"),
        sum(col("is_cand") * col("is_planted")).as("n_both"))
  }

  /** Audio feature extraction (catalog `x_audio_envelope`): per-clip
    * header metadata AND envelope statistics, every field parsed FROM THE
    * BYTES — sample rate and duration via the `wav*` header readers,
    * energies via the codegen'd PCM walk. The oracle states the synthesis
    * ground truth (header constants, generator-formula energies), so any
    * parser deviation fails the hash. All outputs integral (§8.4 rule). */
  def audioEnvelope(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), wavClipCol(col("text"), col("doc_id"), asClone = false).as("p"))
      .filter(isWav(col("p")))
      .select(col("doc_id"),
        wavSampleRate(col("p")).as("sample_rate"),
        wavDurationMs(col("p")).as("duration_ms"),
        audioEnvCol(col("p")).as("env"))
      .select(col("doc_id"), col("sample_rate"), col("duration_ms"),
        size(col("env")).as("n_frames"),
        aggregate(col("env"), lit(0L), (a, e) => a + e).as("e_sum"),
        array_max(col("env")).as("e_max"),
        array_min(col("env")).as("e_min"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_multimodal_meta" -> (multimodalMeta _),
    "x_audio_envelope" -> (audioEnvelope _),
    "x_dedup_audio" -> (dedupAudio _),
    "x_dedup_audio_precision" -> (dedupAudioPrecision _),
    "x_dedup_audio_incremental" -> (dedupAudioIncremental _),
    "x_dedup_video" -> (dedupVideo _),
    "x_dedup_video_incremental" -> (dedupVideoIncremental _),
    "x_dedup_video_precision" -> (dedupVideoPrecision _),
    "x_video_real_roundtrip" -> (videoRealRoundtrip _),
    "x_dedup_video_real" -> (dedupVideoReal _),
    "x_dedup_video_real_incremental" -> (dedupVideoRealIncremental _),
    "x_dedup_video_real_precision" -> (dedupVideoRealPrecision _),
    "x_frame_sample" -> (frameSample _),
    "x_resize_plan" -> (resizePlan _),
    "x_dedup_image" -> (dedupImage _),
    "x_dedup_image_incremental" -> (dedupImageIncremental _),
    "x_dedup_image_precision" -> (dedupImagePrecision _),
    "x_image_real_roundtrip" -> (imageRealRoundtrip _),
    "x_dedup_image_real" -> (dedupImageReal _),
    "x_dedup_image_real_incremental" -> (dedupImageRealIncremental _),
    "x_dedup_image_real_precision" -> (dedupImageRealPrecision _),
    "x_multimodal_jpeg" -> (multimodalJpeg _),
    "x_pipeline_multimodal" -> (pipelineMultimodal _)
  )

  /** The 60 dHash comparison terms, unrolled (same generation discipline as
    * Similarity's bucketArmsSql): g is the 1-based 66-cell grid list. */
  private def dhashTermsSql: String =
    (for { r <- 0 until IMG_ROWS; c <- 0 until IMG_COLS - 1 } yield {
      val lo = r * IMG_COLS + c + 1
      s"CASE WHEN g[${lo + 1}] > g[$lo] THEN (1::BIGINT << ${r * (IMG_COLS - 1) + c}) ELSE 0 END"
    }).mkString("\n     + ")

  /** Grid → signature → band → verified-candidate CTE chain ending at
    * `icand(doc_a, doc_b, hamming)` — the DuckDB twin of [[dedupImage]]'s
    * whole pipeline including the planted clones. */
  private def imageCtes: String =
    s"""ig AS (
       |  SELECT doc_id,
       |         list_transform(range(0,${IMG_ROWS * IMG_COLS}),
       |           i -> CAST('0x' || substring(md5(text || '#g' || i),1,2) AS BIGINT)) AS g
       |  FROM documents
       |  UNION ALL
       |  SELECT doc_id + $IMG_CLONE_OFFSET,
       |         list_transform(range(0,${IMG_ROWS * IMG_COLS}),
       |           i -> CAST('0x' || substring(md5(text || '#g' || i),1,2) AS BIGINT)
       |                + CASE WHEN ((i*7 + doc_id) % ${IMG_ROWS * IMG_COLS}) < ((doc_id // $IMG_CLONE_MOD) % 4)
       |                       THEN $IMG_PERT_DELTA ELSE 0 END)
       |  FROM documents WHERE doc_id % $IMG_CLONE_MOD = 0),
       |isig AS (SELECT doc_id, CAST($dhashTermsSql AS BIGINT) AS w0 FROM ig),
       |iband AS (SELECT doc_id, w0, b.b AS band_idx,
       |                 (w0 >> CAST(b.b*$IMG_BAND_BITS AS INTEGER)) & ${(1 << IMG_BAND_BITS) - 1} AS band_val
       |          FROM isig, (SELECT unnest(range(0,${60 / IMG_BAND_BITS})) AS b) b),
       |icand AS (
       |  SELECT doc_a, doc_b, hamming FROM (
       |    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |           CAST(bit_count(xor(a.w0, b.w0)) AS INTEGER) AS hamming
       |    FROM iband a JOIN iband b
       |      ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.doc_id < b.doc_id)
       |  WHERE hamming <= $IMG_MAX_HAMMING)""".stripMargin

  /** The real-PNG family's twin of [[imageCtes]]: planted grays from the
    * '#q' generator formula, clone bump wrapped `% 256` (pixels must stay
    * 8-bit), ending at `ircand(doc_a, doc_b, hamming)`. The Spark side
    * earns these grids through a real PNG encode + `javax.imageio`
    * decode; the oracle states what that round-trip MUST return. */
  private def imageRealCtes: String =
    s"""irg AS (
       |  SELECT doc_id,
       |         list_transform(range(0,${IMG_ROWS * IMG_COLS}),
       |           i -> CAST('0x' || substring(md5(text || '$IMG_REAL_SEED' || i),1,2) AS BIGINT)) AS g
       |  FROM documents
       |  UNION ALL
       |  SELECT doc_id + $IMG_CLONE_OFFSET,
       |         list_transform(range(0,${IMG_ROWS * IMG_COLS}),
       |           i -> (CAST('0x' || substring(md5(text || '$IMG_REAL_SEED' || i),1,2) AS BIGINT)
       |                + CASE WHEN ((i*7 + doc_id) % ${IMG_ROWS * IMG_COLS}) < ((doc_id // $IMG_CLONE_MOD) % 4)
       |                       THEN $IMG_PERT_DELTA ELSE 0 END) % 256)
       |  FROM documents WHERE doc_id % $IMG_CLONE_MOD = 0),
       |irsig AS (SELECT doc_id, CAST($dhashTermsSql AS BIGINT) AS w0 FROM irg),
       |irband AS (SELECT doc_id, w0, b.b AS band_idx,
       |                  (w0 >> CAST(b.b*$IMG_BAND_BITS AS INTEGER)) & ${(1 << IMG_BAND_BITS) - 1} AS band_val
       |           FROM irsig, (SELECT unnest(range(0,${60 / IMG_BAND_BITS})) AS b) b),
       |ircand AS (
       |  SELECT doc_a, doc_b, hamming FROM (
       |    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |           CAST(bit_count(xor(a.w0, b.w0)) AS INTEGER) AS hamming
       |    FROM irband a JOIN irband b
       |      ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.doc_id < b.doc_id)
       |  WHERE hamming <= $IMG_MAX_HAMMING)""".stripMargin

  // ---- Video: frame-hash sequences, temporal shingles, trim-robust near-dup

  private val VID_FRAMES = 32
  private val VID_CLONE_OFFSET = 30000000L // disjoint from doc ids, image AND audio clones
  // private[ops]: shared with the specs (VideoRealIncrementalSpec) so a
  // drift here fails to COMPILE instead of failing as a confusing
  // planted-set mismatch (r16 ADVICE).
  private[ops] val VID_CLONE_MOD = 6 // every 6th doc gets a planted edited copy
  private val VID_TAU_PPM = 700000L // Jaccard gate, integral ppm

  /** Stub per-frame perceptual hash: frame f of a video = the low 60 bits
    * of md5(text, '#v', f) — standing in for a dHash/pHash of the decoded
    * frame (the image family's real machinery; swap it in per frame and
    * everything downstream is unchanged). */
  private def vidFrameHashes(text: Column): Column = {
    // one NATIVE digest pass over the 32 seed strings (NgramMd5 at n=1 is
    // per-element md5) — 32 separate md5 expressions inside a transform
    // lambda are evaluated interpreted and dominated the sf5 build
    val seeds = transform(sequence(lit(0), lit(VID_FRAMES - 1)), f =>
      concat(text, lit("#v"), f.cast("string")))
    transform(org.apache.spark.sql.graftbridge.ngramMd5(seeds, 1), h =>
      conv(substring(h, 1, 15), 16, 10).cast("long"))
  }

  /** Planted edited copy: drop the first k = (doc_id/6) % 4 frames (a
    * TRIM — intro cut / re-sync, the edit spatial banding cannot see) and
    * replace one surviving frame at offset r = (doc_id/6) % (32-k) with
    * fresh content (an AD/LOGO insertion — its hash comes from the '#r'
    * seed). Worst case: 28 surviving shingles, 2 broken by the replaced
    * frame → Jaccard 26/33 ≈ 0.788, above the 0.70 gate — planted recall
    * is EXACT, not probabilistic (no banding budget to exceed). */
  private def vidCloneHashes(text: Column, origId: Column): Column = {
    val k = (origId / VID_CLONE_MOD).cast("long") % 4
    val r = (origId / VID_CLONE_MOD).cast("long") % (lit(VID_FRAMES) - k)
    transform(
      slice(vidFrameHashes(text), (k + 1).cast("int"), (lit(VID_FRAMES) - k).cast("int")),
      (x, i) => when(i.cast("long") === r,
        conv(substring(md5(concat(text, lit("#r"), (k + i).cast("string"))), 1, 15), 16, 10)
          .cast("long"))
        .otherwise(x))
  }

  /** Temporal 2-gram shingles of a frame-hash sequence, re-hashed to a
    * 60-bit key (narrow shuffle key, the mhBands contract): shingle i =
    * md5(fh[i] || ',' || fh[i+1]). Consecutive-frame pairs survive a trim
    * wholesale, so near-dup becomes set containment — the temporal
    * analogue of the text family's shingling, over fingerprints instead
    * of tokens. */
  private def vidShingles(fh: Column): Column = {
    // NgramMd5 at n=2 digests each consecutive pair's space-joined decimal
    // rendering in one native pass (the shingle i = md5(fh[i] ' ' fh[i+1])
    // contract the oracle mirrors)
    val strs = transform(fh, x => x.cast("string"))
    transform(org.apache.spark.sql.graftbridge.ngramMd5(strs, 2), g =>
      conv(substring(g, 1, 15), 16, 10).cast("long"))
  }

  /** Shingle relation (doc_id, n_sh, sh) over corpus ∪ planted edited
    * copies. The set size rides ON the shingle rows: the pair join needs
    * |A| and |B| for the union, and carrying them here costs one long per
    * row while a separate sizes relation would cost a SECOND full
    * evaluation of the frame-hash build plus two extra joins (measured:
    * the three-scan shape re-ran the digest passes per consumer). */
  private[ops] def videoShingleRel(s: SparkSession, d: String): DataFrame = {
    val self = struct(col("doc_id").as("doc_id"), vidFrameHashes(col("text")).as("fh"))
    val clone = struct((col("doc_id") + VID_CLONE_OFFSET).as("doc_id"),
      vidCloneHashes(col("text"), col("doc_id")).as("fh"))
    documents(s, d)
      .select(explode(
        when(col("doc_id") % VID_CLONE_MOD === 0, array(self, clone))
          .otherwise(array(self))).as("r"))
      .select(col("r.doc_id").as("doc_id"), vidShingles(col("r.fh")).as("sha"))
      .select(col("doc_id"), size(col("sha")).as("n_sh"), explode(col("sha")).as("sh"))
  }

  /** The shingle relation is the video family's first persisted artifact
    * (the pair set is the second): the one-shot pair build AND the
    * incremental probe read the same rows, and the frame-hash digest
    * passes are the expensive part of both. */
  private def videoShinglesShared(s: SparkSession, d: String): DataFrame =
    fpShared(s, d, "vidShingles")(videoShingleRel(s, d))

  private def videoPairsShared(s: SparkSession, d: String): DataFrame = {
    // Resolved OUTSIDE the cache lambda (same-map recursive update rule).
    val sh = videoShinglesShared(s, d)
    fpShared(s, d, "vidPairs") {
      // Candidates from the inverted shingle index: every shared shingle is
      // a candidate vote, counted per pair. Frame-hash shingles are
      // HIGH-ENTROPY 60-bit keys (unlike text n-grams), so bucket skew is
      // structural, not linguistic: buckets ≈ true clone groups, candidate
      // volume ≈ the true pair set — the regime where an exact inverted
      // index beats probabilistic banding (which exists to SURVIVE
      // low-entropy buckets). Jaccard is then EXACT from the shared count
      // and the two set sizes — integral ppm, no estimation step.
      // kernel factored into [[shingleSelfJoinPairs]] (shared with the
      // real-GIF family); integer `div`, not floor-of-double-division:
      // the ppm must be bit-stable cross-engine (§8.4 rule; `//` in the
      // DuckDB twin)
      shingleSelfJoinPairs(sh, VID_TAU_PPM)
    }
  }

  /** Video near-dup pairs (catalog `x_dedup_video`): exact Jaccard over
    * temporal frame-hash shingles — robust to trims and single-frame
    * edits, the temporal face the image family's spatial banding can't
    * express. All outputs integral (counts + ppm). */
  def dedupVideo(s: SparkSession, d: String): DataFrame =
    videoPairsShared(s, d).orderBy(col("doc_a"), col("doc_b"))

  /** Incremental probe (catalog `x_dedup_video_incremental`) — the day-2
    * face of the video family, completing the contract every other dedup
    * family already has (lexical [[Dedup.dedupIncremental]], semantic,
    * audio): today's ARRIVING clips (the fixture casts the planted edited
    * copies as the delta — trimmed/re-cut uploads of existing videos, the
    * realistic arrival) probe the persisted shingle index of the existing
    * corpus. The probe is one join against the inverted index —
    * O(|delta shingles| · bucket occupancy) — never a corpus self-join,
    * and exact Jaccard needs no second pass because set sizes ride on the
    * shingle rows. Same gate, same integral ppm as the one-shot pass. */
  def dedupVideoIncremental(s: SparkSession, d: String): DataFrame = {
    val sh = videoShinglesShared(s, d)
    val delta = sh.filter(col("doc_id") >= VID_CLONE_OFFSET)
    val index = sh.filter(col("doc_id") < VID_CLONE_OFFSET)
    delta.as("a")
      .join(index.as("b"), col("a.sh") === col("b.sh"))
      .groupBy(col("a.doc_id").as("doc_id"), col("b.doc_id").as("match_id"))
      .agg(count(lit(1)).as("n_shared"),
        max(col("a.n_sh")).as("n_a"), max(col("b.n_sh")).as("n_b"))
      .select(col("doc_id"), col("match_id"), col("n_shared"),
        (col("n_a") + col("n_b") - col("n_shared")).as("n_union"))
      .withColumn("jaccard_ppm", expr("n_shared * 1000000 div n_union"))
      .filter(col("jaccard_ppm") >= VID_TAU_PPM)
      .orderBy(col("doc_id"), col("match_id"))
  }

  /** Precision/recall audit vs the planted edited copies (catalog
    * `x_dedup_video_precision`) — recall here is exact by construction
    * (worst-case planted Jaccard 0.788 > 0.70 gate), so n_both <
    * n_planted is a DEFECT, not a budget miss. */
  def dedupVideoPrecision(s: SparkSession, d: String): DataFrame = {
    val cand = videoPairsShared(s, d)
      .select(col("doc_a"), col("doc_b"), lit(1).as("is_cand"))
    val planted = documents(s, d)
      .filter(col("doc_id") % VID_CLONE_MOD === 0)
      .select(col("doc_id").as("doc_a"),
        (col("doc_id") + VID_CLONE_OFFSET).as("doc_b"), lit(1).as("is_planted"))
    cand.join(planted, Seq("doc_a", "doc_b"), "full_outer")
      .agg(
        sum(col("is_cand")).as("n_candidates"),
        sum(col("is_planted")).as("n_planted"),
        sum(col("is_cand") * col("is_planted")).as("n_both"))
  }

  // ---- Video near-dup over REAL animated-GIF bytes ------------------------
  //
  // The stub family above plants frame HASHES; this family materializes a
  // real multi-frame container — animated GIF, the one format the JDK
  // codecs both read and write — and makes the query path earn the hash
  // sequence back: fixture build (codegen'd
  // [[org.apache.spark.sql.graftbridge.GifFixtureVideo]]) → GIF bytes →
  // per-frame `javax.imageio.ImageReader` decode + the image family's
  // box-average grid ([[decodedFrameGrids]]) → per-frame dHash → the SAME
  // temporal-shingle + exact-Jaccard machinery as the stub. GIF frames
  // here are gray-valued (≤256 distinct colors), so the palette encode is
  // LOSSLESS and the oracle recomputes every planted pixel arithmetically
  // — the multi-frame codec round-trip is value-hashed per document.
  //
  // Clone model = the stub's edit semantics over real bytes: trim the
  // first k = (doc_id/6) % 3 frames, replace the surviving frame at
  // position r = (doc_id/6) % (16-k) with fresh content. Worst case
  // (k=2, mid-sequence replace): 11 shared shingles of a 15∪13 union →
  // Jaccard 647059 ppm, above the 600000 gate — planted recall is EXACT.

  private val VID_REAL_FRAMES = 16
  private[ops] val VID_REAL_CLONE_OFFSET = 40000000L // disjoint from every other family
  private val VID_REAL_TAU_PPM = 600000L // 16-frame clips carry proportionally bigger edits
  private val VID_REAL_SEED = "#w"
  private val VID_REAL_REPLACE_SEED = "#x"

  /** REAL-GIF fixture corpus (doc_id, gif): every document rendered as a
    * 16-frame animated GIF; every VID_CLONE_MOD-th doc additionally
    * yields a trimmed+re-cut clone at doc_id + VID_REAL_CLONE_OFFSET. */
  def gifFixtureCorpus(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.gifFixtureVideo
    def gif(asClone: Boolean) =
      gifFixtureVideo(col("text"), col("doc_id"), VID_REAL_FRAMES, IMG_ROWS, IMG_COLS,
        IMG_REAL_CELL_PX, VID_REAL_SEED, VID_REAL_REPLACE_SEED, asClone, VID_CLONE_MOD)
    val self = struct(col("doc_id").as("doc_id"), gif(asClone = false).as("gif"))
    val clone = struct((col("doc_id") + VID_REAL_CLONE_OFFSET).as("doc_id"),
      gif(asClone = true).as("gif"))
    // Pre-encode rebalance — same rationale as [[pngFixtureCorpus]], and
    // the 16-frame GIF build is another ~5 ms/row on top.
    documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .select(explode(
        when(col("doc_id") % VID_CLONE_MOD === 0, array(self, clone))
          .otherwise(array(self))).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.gif").as("gif"))
  }

  /** Decode EVERY frame of a multi-frame payload to the family grid:
    * (doc_id, fidx, g) — the multi-frame sibling of [[decodedGrids]],
    * same per-partition batch shape (one `ImageReader` walk per payload),
    * same integer box-average, undecodable payloads dropped. */
  def decodedFrameGrids(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("fidx", IntegerType, nullable = false),
      StructField("g", ArrayType(LongType, containsNull = false), nullable = false)))
    val rdd = df.select(col(idCol).cast(LongType), col(payloadCol).cast(BinaryType))
      .rdd.mapPartitions { rows =>
        rows.flatMap { r =>
          val bytes = r.getAs[Array[Byte]](1)
          try {
            // MemoryCache, not ImageIO.createImageInputStream: the default
            // file-cache stream creates (and fsyncs) a TEMP FILE per
            // payload — pure overhead for byte-array inputs.
            val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) { iis.close(); Vector.empty[Row] }
            else {
              val reader = readers.next()
              try {
                reader.setInput(iis)
                val n = reader.getNumImages(true)
                (0 until n).map(f => Row(r.getLong(0), f, grayGrid(reader.read(f)))).toVector
              } finally { reader.dispose(); iis.close() }
            }
          } catch { case _: java.io.IOException => Vector.empty[Row] }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Codec round-trip audit (catalog `x_video_real_roundtrip`): per-clip
    * frame count + dHash aggregates over the DECODED frames, oracled
    * against the planted formula — proves the multi-frame decode (frame
    * iteration order included) per document, independent of pairing. */
  def videoRealRoundtrip(s: SparkSession, d: String): DataFrame =
    videoRealHashesShared(s, d)
      .groupBy(col("doc_id"))
      // h is a 60-bit value: a raw sum of 16 frames can exceed int64
      // (16·2^60 > 2^63), so the checksum sums a prime residue — still
      // sensitive to any single bit-flip in any frame hash.
      .agg(count(lit(1)).as("n_frames"),
        sum(col("h") % lit(1000000007L)).as("h_sum"),
        min(col("h")).as("h_min"), max(col("h")).as("h_max"))
      .orderBy(col("doc_id"))

  /** Shared exact-Jaccard pair join over a shingle relation
    * (doc_id, n_sh, sh) — factored so the stub and real video families
    * run the IDENTICAL kernel (see [[videoPairsShared]] for why an exact
    * inverted index beats banding on high-entropy shingle keys). */
  private def shingleSelfJoinPairs(sh: DataFrame, tauPpm: Long): DataFrame =
    sh.as("a")
      .join(sh.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"),
        max(col("a.n_sh")).as("n_a"), max(col("b.n_sh")).as("n_b"))
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        (col("n_a") + col("n_b") - col("n_shared")).as("n_union"))
      .withColumn("jaccard_ppm", expr("n_shared * 1000000 div n_union"))
      .filter(col("jaccard_ppm") >= tauPpm)

  /** Decoded per-frame dHashes, persisted ONCE for the whole family: the
    * multi-frame codec walk is the dominant cost, and the roundtrip
    * audit, shingle build, and precision entry all read these rows. */
  private def videoRealHashesShared(s: SparkSession, d: String): DataFrame =
    fpShared(s, d, "vidRealHashes")(
      decodedFrameGrids(gifFixtureCorpus(s, d), "doc_id", "gif")
        .select(col("doc_id"), col("fidx"), dhashCol(col("g")).as("h")))

  private def videoRealShinglesShared(s: SparkSession, d: String): DataFrame = {
    // Resolved OUTSIDE the cache lambda (same-map recursive update rule).
    val hs = videoRealHashesShared(s, d)
    fpShared(s, d, "vidRealShingles") {
      val fh = hs.groupBy(col("doc_id"))
        .agg(transform(
          array_sort(collect_list(struct(col("fidx"), col("h")))),
          x => x.getField("h")).as("fh"))
      fh.select(col("doc_id"), vidShingles(col("fh")).as("sha"))
        .select(col("doc_id"), size(col("sha")).as("n_sh"), explode(col("sha")).as("sh"))
    }
  }

  private def videoRealPairsShared(s: SparkSession, d: String): DataFrame = {
    // Resolved OUTSIDE the cache lambda (same-map recursive update rule).
    val sh = videoRealShinglesShared(s, d)
    fpShared(s, d, "vidRealPairs")(shingleSelfJoinPairs(sh, VID_REAL_TAU_PPM))
  }

  /** Video near-dup pairs over REAL animated-GIF bytes (catalog
    * `x_dedup_video_real`): decode → per-frame dHash → temporal shingles
    * → exact Jaccard — the stub entry's pipeline with the planted hashes
    * replaced by a genuine multi-frame decode. */
  def dedupVideoReal(s: SparkSession, d: String): DataFrame =
    videoRealPairsShared(s, d).orderBy(col("doc_a"), col("doc_b"))

  /** Incremental probe over REAL animated-GIF bytes (catalog
    * `x_dedup_video_real_incremental`) — the last dedup family to reach the
    * delta-vs-index bar (r15 verdict #3): today's ARRIVING clips (the
    * trimmed/re-cut GIF clones, whose frame hashes are EARNED through the
    * GIF encode + per-frame `javax.imageio` decode like everything else in
    * this family) probe the persisted temporal-shingle index of the
    * existing corpus. One equi-join against the inverted shingle index —
    * O(|delta shingles| · bucket occupancy), never a corpus self-join —
    * and exact Jaccard needs no second pass because set sizes ride on the
    * shingle rows. The shingles come from the family's ONE persisted codec
    * pass ([[videoRealShinglesShared]]), so the probe adds join work only,
    * not a second decode of the corpus. Same gate, same integral ppm as
    * the one-shot pass. */
  def dedupVideoRealIncremental(s: SparkSession, d: String): DataFrame = {
    val sh = videoRealShinglesShared(s, d)
    val delta = sh.filter(col("doc_id") >= VID_REAL_CLONE_OFFSET)
    val index = sh.filter(col("doc_id") < VID_REAL_CLONE_OFFSET)
    delta.as("a")
      .join(index.as("b"), col("a.sh") === col("b.sh"))
      .groupBy(col("a.doc_id").as("doc_id"), col("b.doc_id").as("match_id"))
      .agg(count(lit(1)).as("n_shared"),
        max(col("a.n_sh")).as("n_a"), max(col("b.n_sh")).as("n_b"))
      .select(col("doc_id"), col("match_id"), col("n_shared"),
        (col("n_a") + col("n_b") - col("n_shared")).as("n_union"))
      .withColumn("jaccard_ppm", expr("n_shared * 1000000 div n_union"))
      .filter(col("jaccard_ppm") >= VID_REAL_TAU_PPM)
      .orderBy(col("doc_id"), col("match_id"))
  }

  /** Precision/recall audit vs the planted edited copies (catalog
    * `x_dedup_video_real_precision`) — recall is exact by construction
    * (worst-case planted Jaccard 647059 ppm > the 600000 gate), so
    * n_both < n_planted is a DEFECT, not a budget miss. */
  def dedupVideoRealPrecision(s: SparkSession, d: String): DataFrame = {
    val cand = videoRealPairsShared(s, d)
      .select(col("doc_a"), col("doc_b"), lit(1).as("is_cand"))
    val planted = documents(s, d)
      .filter(col("doc_id") % VID_CLONE_MOD === 0)
      .select(col("doc_id").as("doc_a"),
        (col("doc_id") + VID_REAL_CLONE_OFFSET).as("doc_b"), lit(1).as("is_planted"))
    cand.join(planted, Seq("doc_a", "doc_b"), "full_outer")
      .agg(
        sum(col("is_cand")).as("n_candidates"),
        sum(col("is_planted")).as("n_planted"),
        sum(col("is_cand") * col("is_planted")).as("n_both"))
  }

  /** Generator-formula envelope as a DuckDB expression: one md5 per frame
    * (materialized in a struct so the inner lambda reads it), samples
    * decoded i16le via arithmetic — `((v + 32768) % 65536) - 32768` is the
    * branch-free sign extension the JVM's `(short)` cast performs. The
    * clone variant applies the low-byte bump to sample 0 of the perturbed
    * frames, mirroring [[framePerturbedBin]] byte for byte. */
  private def audEnvSql(clone: Boolean): String = {
    val b0 = "CAST('0x' || substring(x.h, CAST(4*j+1 AS INTEGER), 2) AS BIGINT)"
    val b1 = "CAST('0x' || substring(x.h, CAST(4*j+3 AS INTEGER), 2) AS BIGINT)"
    val b0c =
      if (!clone) b0
      else s"CASE WHEN j = 0 AND (x.f*5 + doc_id) % $AUD_FRAMES < (doc_id // $AUD_CLONE_MOD) % 4" +
        s" THEN ($b0 + $AUD_PERT_DELTA) % 256 ELSE $b0 END"
    s"""list_transform(
       |    list_transform(range(0,$AUD_FRAMES), f -> {'f': f, 'h': md5(text || '#p' || f)}),
       |    x -> list_sum(list_transform(range(0,$AUD_SPF), j ->
       |      abs((($b0c + 256*$b1 + 32768) % 65536) - 32768))))""".stripMargin
  }

  /** The 60 envelope-gradient comparison terms, unrolled (same generation
    * discipline as [[dhashTermsSql]]); env is the 1-based 61-frame list. */
  private def audioTermsSql: String =
    (0 until AUD_FRAMES - 1).map(f =>
      s"CASE WHEN env[${f + 2}] > env[${f + 1}] THEN (1::BIGINT << $f) ELSE 0 END")
      .mkString("\n     + ")

  /** Envelope → signature → band → verified-candidate CTE chain ending at
    * `acand(doc_a, doc_b, hamming)` — the DuckDB twin of [[dedupAudio]]'s
    * whole pipeline including the planted clone clips. */
  private def audioCtes: String =
    s"""aud AS (
       |  SELECT doc_id, ${audEnvSql(clone = false)} AS env
       |  FROM documents
       |  UNION ALL
       |  SELECT doc_id + $AUD_CLONE_OFFSET, ${audEnvSql(clone = true)} AS env
       |  FROM documents WHERE doc_id % $AUD_CLONE_MOD = 0),
       |asig AS (SELECT doc_id, CAST($audioTermsSql AS BIGINT) AS w0 FROM aud),
       |aband AS (SELECT doc_id, w0, b.b AS band_idx,
       |                 (w0 >> CAST(b.b*$AUD_BAND_BITS AS INTEGER)) & ${(1 << AUD_BAND_BITS) - 1} AS band_val
       |          FROM asig, (SELECT unnest(range(0,${60 / AUD_BAND_BITS})) AS b) b),
       |acand AS (
       |  SELECT doc_a, doc_b, hamming FROM (
       |    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |           CAST(bit_count(xor(a.w0, b.w0)) AS INTEGER) AS hamming
       |    FROM aband a JOIN aband b
       |      ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.doc_id < b.doc_id)
       |  WHERE hamming <= $AUD_MAX_HAMMING)""".stripMargin

  /** Frame-hash → shingle → inverted-index-candidate CTE chain ending at
    * `vcand(doc_a, doc_b, n_shared, n_union, jaccard_ppm)` — the DuckDB
    * twin of [[dedupVideo]]'s whole pipeline including the planted edited
    * copies (trim + one replaced frame). */
  private def videoCtes: String = {
    val fhSelf =
      s"""list_transform(range(0,$VID_FRAMES),
         |      f -> CAST('0x' || substring(md5(text || '#v' || f),1,15) AS BIGINT))""".stripMargin
    s"""vfh AS (
       |  SELECT doc_id, $fhSelf AS fh FROM documents
       |  UNION ALL
       |  SELECT doc_id + $VID_CLONE_OFFSET,
       |         list_transform(range(k, $VID_FRAMES),
       |           f -> CASE WHEN f - k = r
       |                THEN CAST('0x' || substring(md5(text || '#r' || f),1,15) AS BIGINT)
       |                ELSE CAST('0x' || substring(md5(text || '#v' || f),1,15) AS BIGINT) END) AS fh
       |  FROM (SELECT doc_id, text,
       |          (doc_id // $VID_CLONE_MOD) % 4 AS k,
       |          (doc_id // $VID_CLONE_MOD) % ($VID_FRAMES - (doc_id // $VID_CLONE_MOD) % 4) AS r
       |        FROM documents WHERE doc_id % $VID_CLONE_MOD = 0)),
       |vsh AS (
       |  SELECT doc_id,
       |         unnest(list_transform(range(1, len(fh)),
       |           i -> CAST('0x' || substring(md5(CAST(fh[i] AS VARCHAR) || ' ' || CAST(fh[i+1] AS VARCHAR)),1,15) AS BIGINT))) AS sh
       |  FROM vfh),
       |vsz AS (SELECT doc_id, count(*) AS n_sh FROM vsh GROUP BY doc_id),
       |vcand AS (
       |  SELECT doc_a, doc_b, n_shared, n_union,
       |         (n_shared * 1000000) // n_union AS jaccard_ppm
       |  FROM (
       |    SELECT s.doc_a, s.doc_b, s.n_shared,
       |           za.n_sh + zb.n_sh - s.n_shared AS n_union
       |    FROM (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
       |          FROM vsh a JOIN vsh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2) s
       |    JOIN vsz za ON za.doc_id = s.doc_a
       |    JOIN vsz zb ON zb.doc_id = s.doc_b)
       |  WHERE (n_shared * 1000000) // n_union >= $VID_TAU_PPM)""".stripMargin
  }

  /** The real-GIF family's oracle: planted frame grids from the '#w'/'#x'
    * generator formula (trim+replace clone arithmetic restated row-wise),
    * per-frame dHash, then the stub family's shingle/Jaccard mechanics,
    * ending at `wcand(doc_a, doc_b, n_shared, n_union, jaccard_ppm)`.
    * The Spark side earns the grids through a real animated-GIF encode +
    * per-frame `javax.imageio` decode; this states what that round-trip
    * MUST return. */
  private def videoRealCtes: String = {
    val cells = IMG_ROWS * IMG_COLS
    def gridSql(textE: String, seed: String, frameE: String): String =
      s"""list_transform(range(0,$cells),
         |           j -> CAST('0x' || substring(md5($textE || '$seed' || (($frameE)*$cells+j)),1,2) AS BIGINT))""".stripMargin
    s"""wrf AS (
       |  SELECT doc_id, f.f AS fidx,
       |         ${gridSql("text", VID_REAL_SEED, "f.f")} AS g
       |  FROM documents, (SELECT unnest(range(0,$VID_REAL_FRAMES)) AS f) f
       |  UNION ALL
       |  SELECT c.doc_id + $VID_REAL_CLONE_OFFSET, f.f AS fidx,
       |         CASE WHEN f.f = c.r
       |              THEN ${gridSql("c.text", VID_REAL_REPLACE_SEED, "f.f")}
       |              ELSE ${gridSql("c.text", VID_REAL_SEED, "f.f + c.k")} END AS g
       |  FROM (SELECT doc_id, text,
       |          (doc_id // $VID_CLONE_MOD) % 3 AS k,
       |          (doc_id // $VID_CLONE_MOD) % ($VID_REAL_FRAMES - (doc_id // $VID_CLONE_MOD) % 3) AS r
       |        FROM documents WHERE doc_id % $VID_CLONE_MOD = 0) c,
       |       (SELECT unnest(range(0,$VID_REAL_FRAMES)) AS f) f
       |  WHERE f.f < $VID_REAL_FRAMES - c.k),
       |wfh0 AS (SELECT doc_id, fidx, CAST($dhashTermsSql AS BIGINT) AS h FROM wrf),
       |wfh AS (SELECT doc_id, list(h ORDER BY fidx) AS fh FROM wfh0 GROUP BY doc_id),
       |wsh AS (
       |  SELECT doc_id,
       |         unnest(list_transform(range(1, len(fh)),
       |           i -> CAST('0x' || substring(md5(CAST(fh[i] AS VARCHAR) || ' ' || CAST(fh[i+1] AS VARCHAR)),1,15) AS BIGINT))) AS sh
       |  FROM wfh),
       |wsz AS (SELECT doc_id, count(*) AS n_sh FROM wsh GROUP BY doc_id),
       |wcand AS (
       |  SELECT doc_a, doc_b, n_shared, n_union,
       |         (n_shared * 1000000) // n_union AS jaccard_ppm
       |  FROM (
       |    SELECT s.doc_a, s.doc_b, s.n_shared,
       |           za.n_sh + zb.n_sh - s.n_shared AS n_union
       |    FROM (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
       |          FROM wsh a JOIN wsh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2) s
       |    JOIN wsz za ON za.doc_id = s.doc_a
       |    JOIN wsz zb ON zb.doc_id = s.doc_b)
       |  WHERE (n_shared * 1000000) // n_union >= $VID_REAL_TAU_PPM)""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "x_video_real_roundtrip" ->
      s"""WITH $videoRealCtes
         |SELECT doc_id,
         |       CAST(count(*) AS BIGINT) AS n_frames,
         |       CAST(sum(h % 1000000007) AS BIGINT) AS h_sum,
         |       CAST(min(h) AS BIGINT) AS h_min,
         |       CAST(max(h) AS BIGINT) AS h_max
         |FROM wfh0 GROUP BY doc_id""".stripMargin,
    "x_dedup_video_real" ->
      s"""WITH $videoRealCtes
         |SELECT doc_a, doc_b, n_shared, n_union, jaccard_ppm FROM wcand""".stripMargin,
    "x_dedup_video_real_incremental" ->
      s"""WITH $videoRealCtes,
         |winc AS (
         |  SELECT s.doc_id, s.match_id, s.n_shared,
         |         za.n_sh + zb.n_sh - s.n_shared AS n_union
         |  FROM (SELECT a.doc_id AS doc_id, b.doc_id AS match_id, count(*) AS n_shared
         |        FROM wsh a JOIN wsh b ON a.sh = b.sh
         |        WHERE a.doc_id >= $VID_REAL_CLONE_OFFSET AND b.doc_id < $VID_REAL_CLONE_OFFSET
         |        GROUP BY 1, 2) s
         |  JOIN wsz za ON za.doc_id = s.doc_id
         |  JOIN wsz zb ON zb.doc_id = s.match_id)
         |SELECT doc_id, match_id, n_shared, n_union,
         |       (n_shared * 1000000) // n_union AS jaccard_ppm
         |FROM winc
         |WHERE (n_shared * 1000000) // n_union >= $VID_REAL_TAU_PPM""".stripMargin,
    "x_dedup_video_real_precision" ->
      s"""WITH $videoRealCtes,
         |wplanted AS (SELECT doc_id AS doc_a, doc_id + $VID_REAL_CLONE_OFFSET AS doc_b
         |             FROM documents WHERE doc_id % $VID_CLONE_MOD = 0)
         |SELECT CAST(count(c.doc_a) AS BIGINT) AS n_candidates,
         |       CAST(count(p.doc_a) AS BIGINT) AS n_planted,
         |       CAST(SUM(CASE WHEN c.doc_a IS NOT NULL AND p.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_both
         |FROM wcand c FULL OUTER JOIN wplanted p
         |  ON c.doc_a = p.doc_a AND c.doc_b = p.doc_b""".stripMargin,
    "x_dedup_video" ->
      s"""WITH $videoCtes
         |SELECT doc_a, doc_b, n_shared, n_union, jaccard_ppm FROM vcand""".stripMargin,
    "x_dedup_video_incremental" ->
      s"""WITH $videoCtes,
         |vinc AS (
         |  SELECT s.doc_id, s.match_id, s.n_shared,
         |         za.n_sh + zb.n_sh - s.n_shared AS n_union
         |  FROM (SELECT a.doc_id AS doc_id, b.doc_id AS match_id, count(*) AS n_shared
         |        FROM vsh a JOIN vsh b ON a.sh = b.sh
         |        WHERE a.doc_id >= $VID_CLONE_OFFSET AND b.doc_id < $VID_CLONE_OFFSET
         |        GROUP BY 1, 2) s
         |  JOIN vsz za ON za.doc_id = s.doc_id
         |  JOIN vsz zb ON zb.doc_id = s.match_id)
         |SELECT doc_id, match_id, n_shared, n_union,
         |       (n_shared * 1000000) // n_union AS jaccard_ppm
         |FROM vinc
         |WHERE (n_shared * 1000000) // n_union >= $VID_TAU_PPM""".stripMargin,
    "x_dedup_video_precision" ->
      s"""WITH $videoCtes,
         |vplanted AS (SELECT doc_id AS doc_a, doc_id + $VID_CLONE_OFFSET AS doc_b
         |             FROM documents WHERE doc_id % $VID_CLONE_MOD = 0)
         |SELECT CAST(count(c.doc_a) AS BIGINT) AS n_candidates,
         |       CAST(count(p.doc_a) AS BIGINT) AS n_planted,
         |       CAST(SUM(CASE WHEN c.doc_a IS NOT NULL AND p.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_both
         |FROM vcand c FULL OUTER JOIN vplanted p
         |  ON c.doc_a = p.doc_a AND c.doc_b = p.doc_b""".stripMargin,
    // Header fields are the synthesis GROUND TRUTH (every fixture clip is
    // mono 8 kHz 16-bit, 976 data bytes = 61 ms), energies the generator
    // formula — the Spark side must recover all of it from the bytes.
    "x_audio_envelope" ->
      s"""WITH aud AS (SELECT doc_id, ${audEnvSql(clone = false)} AS env FROM documents)
         |SELECT doc_id,
         |       CAST($AUD_RATE AS INTEGER) AS sample_rate,
         |       CAST(${AUD_DATA_BYTES * 8000L / (AUD_RATE * 16L)} AS BIGINT) AS duration_ms,
         |       CAST($AUD_FRAMES AS INTEGER) AS n_frames,
         |       CAST(list_sum(env) AS BIGINT) AS e_sum,
         |       CAST(list_max(env) AS BIGINT) AS e_max,
         |       CAST(list_min(env) AS BIGINT) AS e_min
         |FROM aud""".stripMargin,
    "x_dedup_audio" ->
      s"""WITH $audioCtes
         |SELECT doc_a, doc_b, hamming FROM acand""".stripMargin,
    "x_dedup_audio_incremental" ->
      s"""WITH $audioCtes,
         |adelta AS (SELECT doc_id, w0, band_idx, band_val FROM aband
         |           WHERE doc_id >= $AUD_CLONE_OFFSET),
         |aindex AS (SELECT doc_id, w0, band_idx, band_val FROM aband
         |           WHERE doc_id < $AUD_CLONE_OFFSET)
         |SELECT doc_id, match_id, hamming FROM (
         |  SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS match_id,
         |         CAST(bit_count(xor(a.w0, b.w0)) AS INTEGER) AS hamming
         |  FROM adelta a JOIN aindex b
         |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val)
         |WHERE hamming <= $AUD_MAX_HAMMING""".stripMargin,
    "x_dedup_audio_precision" ->
      s"""WITH $audioCtes,
         |aplanted AS (SELECT doc_id AS doc_a, doc_id + $AUD_CLONE_OFFSET AS doc_b
         |             FROM documents WHERE doc_id % $AUD_CLONE_MOD = 0)
         |SELECT CAST(count(c.doc_a) AS BIGINT) AS n_candidates,
         |       CAST(count(p.doc_a) AS BIGINT) AS n_planted,
         |       CAST(SUM(CASE WHEN c.doc_a IS NOT NULL AND p.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_both
         |FROM acand c FULL OUTER JOIN aplanted p
         |  ON c.doc_a = p.doc_a AND c.doc_b = p.doc_b""".stripMargin,
    // Ground truth, not a mirrored parser: the synthesized stream plants
    // width/height as pure doc_id arithmetic, so the oracle states what the
    // marker walk MUST recover (and NULL for the corrupt every-10th rows).
    "x_multimodal_jpeg" ->
      """SELECT doc_id,
        |       (doc_id % 10 <> 0) AS is_jpeg,
        |       CASE WHEN doc_id % 10 <> 0 THEN CAST(16 + doc_id % 624 AS INTEGER) END AS width,
        |       CASE WHEN doc_id % 10 <> 0 THEN CAST(16 + doc_id % 464 AS INTEGER) END AS height
        |FROM documents WHERE doc_id < 300""".stripMargin,
    "x_dedup_image" ->
      s"""WITH $imageCtes
         |SELECT doc_a, doc_b, hamming FROM icand""".stripMargin,
    "x_dedup_image_incremental" ->
      s"""WITH $imageCtes,
         |idelta AS (SELECT doc_id, w0, band_idx, band_val FROM iband
         |           WHERE doc_id >= $IMG_CLONE_OFFSET),
         |iindex AS (SELECT doc_id, w0, band_idx, band_val FROM iband
         |           WHERE doc_id < $IMG_CLONE_OFFSET)
         |SELECT doc_id, match_id, hamming FROM (
         |  SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS match_id,
         |         CAST(bit_count(xor(a.w0, b.w0)) AS INTEGER) AS hamming
         |  FROM idelta a JOIN iindex b
         |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val)
         |WHERE hamming <= $IMG_MAX_HAMMING""".stripMargin,
    // The composed image pipeline: the gate and dims come from the
    // synthesis GROUND TRUTH (doc_id arithmetic) — a parser deviation
    // inside the Spark chain changes fit/shard numbers and fails the hash.
    "x_pipeline_multimodal" ->
      s"""WITH mj AS (
         |  SELECT doc_id, text,
         |         CAST(16 + doc_id % 624 AS INTEGER) AS w,
         |         CAST(16 + doc_id % 464 AS INTEGER) AS h
         |  FROM documents WHERE doc_id % 10 <> 0),
         |g2 AS (SELECT doc_id,
         |         list_transform(range(0,${IMG_ROWS * IMG_COLS}),
         |           i -> CAST('0x' || substring(md5(text || '#g' || i),1,2) AS BIGINT)) AS g
         |       FROM mj),
         |s2 AS (SELECT doc_id, CAST($dhashTermsSql AS BIGINT) AS w0 FROM g2),
         |b2 AS (SELECT doc_id, w0, b.b AS band_idx,
         |              (w0 >> CAST(b.b*$IMG_BAND_BITS AS INTEGER)) & ${(1 << IMG_BAND_BITS) - 1} AS band_val
         |       FROM s2, (SELECT unnest(range(0,${60 / IMG_BAND_BITS})) AS b) b),
         |drp AS (SELECT doc_id FROM (
         |    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_id,
         |           CAST(bit_count(xor(a.w0, b.w0)) AS INTEGER) AS hamming
         |    FROM b2 a JOIN b2 b
         |      ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.doc_id < b.doc_id)
         |  WHERE hamming <= $IMG_MAX_HAMMING),
         |sv AS (SELECT m.doc_id, m.w, m.h FROM mj m ANTI JOIN drp USING (doc_id)),
         |ft AS (SELECT doc_id,
         |         CAST(greatest(floor(w * sc), 1) AS BIGINT)
         |           * CAST(greatest(floor(h * sc), 1) AS BIGINT) AS px
         |       FROM (SELECT doc_id, w, h,
         |               least(CAST(224 AS DOUBLE) / w, CAST(224 AS DOUBLE) / h, CAST(1 AS DOUBLE)) AS sc
         |             FROM sv)),
         |st2 AS (SELECT doc_id, px, md5('shard:' || CAST(doc_id AS VARCHAR)) AS hh FROM ft),
         |cs2 AS (SELECT doc_id, px,
         |               sum(px) OVER (ORDER BY hh, doc_id ROWS UNBOUNDED PRECEDING) AS cum
         |        FROM st2)
         |SELECT CAST((cum - px) // ${1L << 22} AS BIGINT) AS shard_id,
         |       count(*) AS n_images, CAST(sum(px) AS BIGINT) AS n_pixels
         |FROM cs2 GROUP BY 1""".stripMargin,
    // The real-codec trio: grids the Spark side must EARN via an actual
    // PNG encode + javax.imageio decode; the oracle recomputes them from
    // the generator formula (lossless codec + exact integer downscale).
    "x_image_real_roundtrip" ->
      s"""WITH $imageRealCtes
         |SELECT doc_id,
         |       CAST(list_sum(g) AS BIGINT) AS g_sum,
         |       CAST(list_min(g) AS BIGINT) AS g_min,
         |       CAST(list_max(g) AS BIGINT) AS g_max
         |FROM irg""".stripMargin,
    "x_dedup_image_real" ->
      s"""WITH $imageRealCtes
         |SELECT doc_a, doc_b, hamming FROM ircand""".stripMargin,
    "x_dedup_image_real_incremental" ->
      s"""WITH $imageRealCtes,
         |irdelta AS (SELECT doc_id, w0, band_idx, band_val FROM irband
         |            WHERE doc_id >= $IMG_CLONE_OFFSET),
         |irindex AS (SELECT doc_id, w0, band_idx, band_val FROM irband
         |            WHERE doc_id < $IMG_CLONE_OFFSET)
         |SELECT doc_id, match_id, hamming FROM (
         |  SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS match_id,
         |         CAST(bit_count(xor(a.w0, b.w0)) AS INTEGER) AS hamming
         |  FROM irdelta a JOIN irindex b
         |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val)
         |WHERE hamming <= $IMG_MAX_HAMMING""".stripMargin,
    "x_dedup_image_real_precision" ->
      s"""WITH $imageRealCtes,
         |irplanted AS (SELECT doc_id AS doc_a, doc_id + $IMG_CLONE_OFFSET AS doc_b
         |              FROM documents WHERE doc_id % $IMG_CLONE_MOD = 0)
         |SELECT CAST(count(c.doc_a) AS BIGINT) AS n_candidates,
         |       CAST(count(p.doc_a) AS BIGINT) AS n_planted,
         |       CAST(SUM(CASE WHEN c.doc_a IS NOT NULL AND p.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_both
         |FROM ircand c FULL OUTER JOIN irplanted p
         |  ON c.doc_a = p.doc_a AND c.doc_b = p.doc_b""".stripMargin,
    "x_dedup_image_precision" ->
      s"""WITH $imageCtes,
         |planted AS (SELECT doc_id AS doc_a, doc_id + $IMG_CLONE_OFFSET AS doc_b
         |            FROM documents WHERE doc_id % $IMG_CLONE_MOD = 0)
         |SELECT CAST(count(c.doc_a) AS BIGINT) AS n_candidates,
         |       CAST(count(p.doc_a) AS BIGINT) AS n_planted,
         |       CAST(SUM(CASE WHEN c.doc_a IS NOT NULL AND p.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_both
         |FROM icand c FULL OUTER JOIN planted p
         |  ON c.doc_a = p.doc_a AND c.doc_b = p.doc_b""".stripMargin,
    "x_resize_plan" ->
      """WITH m AS (
        |  SELECT doc_id,
        |         CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
        |         CAST((octet_length(encode(text)) * 31) % 480 AS INTEGER) AS height,
        |         CASE octet_length(encode(text)) % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind
        |  FROM documents WHERE doc_id < 300),
        |f AS (
        |  SELECT doc_id, kind, width, height,
        |         least(CAST(224 AS DOUBLE) / width, CAST(224 AS DOUBLE) / height, CAST(1 AS DOUBLE)) AS scale
        |  FROM m WHERE kind <> 'audio' AND width > 0 AND height > 0)
        |SELECT doc_id, kind, width, height,
        |       CAST(greatest(floor(width * scale), 1) AS INTEGER) AS fit_w,
        |       CAST(greatest(floor(height * scale), 1) AS INTEGER) AS fit_h
        |FROM f""".stripMargin,
    "x_frame_sample" ->
      """SELECT doc_id, CAST(n_frames AS INTEGER) AS n_frames,
        |       CAST(i.i AS INTEGER) AS sample_idx,
        |       CAST((i.i * n_frames) // 4 AS INTEGER) AS frame_idx
        |FROM (SELECT doc_id, octet_length(encode(text)) % 30 AS n_frames
        |      FROM documents WHERE doc_id < 300) d,
        |     (SELECT unnest(range(0,4)) AS i) i
        |WHERE n_frames > 0""".stripMargin,
    "x_multimodal_meta" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |       CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
        |       CAST((octet_length(encode(text)) * 31) % 480 AS INTEGER) AS height,
        |       CAST(octet_length(encode(text)) % 30 AS INTEGER) AS n_frames,
        |       CASE octet_length(encode(text)) % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind
        |FROM documents WHERE doc_id < 300""".stripMargin
  )
}
