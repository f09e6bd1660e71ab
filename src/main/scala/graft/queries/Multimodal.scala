package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column operators (north-star extension class): treat
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, and run decode / frame-sample / feature-extract as
  * distributed per-partition operators.
  *
  * The test corpus has no real media, so the payload is synthesized
  * deterministically (`cast(text AS binary)` ≙ DuckDB `encode(text)`) and
  * the decode step is a clearly-marked deterministic fake ([[FakeDecoder]]);
  * the Spark-side plumbing — binary schema, metadata projection, frame
  * slicing, fixed-shape feature batches via mapPartitions — is real and is
  * what a production pipeline would keep, swapping only the decoder body.
  *
  * Scale design (100 TB): every operator here is a per-row projection or
  * per-partition map over the payload scan — no shuffle; parquet stores
  * binary columns page-compressed, and column pruning means metadata-only
  * queries never read payload bytes. Cross-engine parity runs over
  * `hex(payload)` because DuckDB's substring/md5 are VARCHAR-only.
  */
object Multimodal {

  /** Deterministic fake decoder — stands in for an image/audio codec
    * (libs not present in this container). Produces a fixed-shape
    * "feature" row per payload: 8 doubles, each the sum of one stripe of
    * payload bytes, plus fake width/height parsed from the first bytes.
    * Deterministic in the payload alone, so results are partition- and
    * retry-invariant. */
  object FakeDecoder extends Serializable {
    val FeatureDim = 8
    def decode(payload: Array[Byte]): (Int, Int, Array[Double]) = {
      val w = 1 + (payload.headOption.getOrElse(0: Byte) & 0x7f)
      val h = 1 + (payload.drop(1).headOption.getOrElse(0: Byte) & 0x7f)
      val feat = new Array[Double](FeatureDim)
      var i = 0
      while (i < payload.length) {
        feat(i % FeatureDim) += (payload(i) & 0xff).toDouble
        i += 1
      }
      (w, h, feat)
    }

    /** Integer stripe sums at arbitrary width `m` — [[decode]]'s 8-double
      * feature row is the m=8 case; q108's 64-bit pHash uses m=64. */
    def stripes(payload: Array[Byte], m: Int): Array[Long] = {
      val f = new Array[Long](m)
      var i = 0
      while (i < payload.length) {
        f(i % m) += (payload(i) & 0xff).toLong
        i += 1
      }
      f
    }
  }

  /** q108 hamming tolerance. With the 64-bit hash split into 4 bands,
    * any pair at hamming <= 3 differs in at most 3 bands and therefore
    * MATCHES in at least one (pigeonhole) — the band join is candidate-
    * complete for this threshold, exactly like q37's MinHash banding. */
  private val HamT = 3

  val specs: Seq[QuerySpec] = Seq(

    // ------------------------------------------------------------------
    // Typed metadata over opaque payloads: size, magic bytes, kind
    // classification, frame count at a fixed 32-byte frame stride.
    // Column pruning keeps this scan payload-free in a real layout where
    // metadata is stored alongside the blob.
    QuerySpec.sqlBacked("q43_mm_metadata",
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |  substr(hex(encode(text)), 1, 8) AS magic,
        |  CASE WHEN octet_length(encode(text)) >= 400 THEN 'video'
        |       WHEN octet_length(encode(text)) >= 200 THEN 'audio'
        |       ELSE 'image' END AS kind,
        |  CAST(ceil(octet_length(encode(text)) / 32.0) AS BIGINT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .select(col("doc_id"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          substring(hex(col("payload")), 1, 8).as("magic"),
          when(octet_length(col("payload")) >= 400, "video")
            .when(octet_length(col("payload")) >= 200, "audio")
            .otherwise("image").as("kind"),
          ceil(octet_length(col("payload")) / 32.0).cast("long").as("n_frames"))
        .orderBy(col("doc_id"))
    },

    // ------------------------------------------------------------------
    // Frame sampling: cut the payload into 32-byte frames (64 hex chars),
    // keep every 4th frame, fingerprint each — the video-keyframe-sample
    // shape. Pure projection; explodes to one row per sampled frame.
    QuerySpec.sqlBacked("q44_mm_framesample",
      """SELECT doc_id, frame_no, md5(frame) AS frame_fp FROM (
        |  SELECT doc_id, 4*(j-1) AS frame_no,
        |    substr(hx, 256*(j-1)+1, 64) AS frame
        |  FROM (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
        |    unnest(range(1, 1 + CAST(ceil(len(hx)/256.0) AS BIGINT))) AS t(j))
        |WHERE len(frame) > 0 ORDER BY doc_id, frame_no""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), hex(col("text").cast("binary")).as("hx"))
        .select(col("doc_id"), expr(
          """posexplode(transform(
            |  sequence(1, CAST(ceil(length(hx)/256.0) AS INT)),
            |  j -> substring(hx, 256*(j-1)+1, 64)))""".stripMargin)
          .as(Seq("p", "frame")))
        .select(col("doc_id"), (col("p") * 4).cast("long").as("frame_no"),
          md5(col("frame")).as("frame_fp"), col("frame"))
        .filter(length(col("frame")) > 0)
        .select(col("doc_id"), col("frame_no"), col("frame_fp"))
        .orderBy(col("doc_id"), col("frame_no"))
    },

    // ------------------------------------------------------------------
    // Resize/downsample: fixed-size thumbnail by byte-stride sampling —
    // 16 evenly-strided payload bytes (clamped at the tail) rendered as
    // hex, the stand-in for an image resize kernel with the same
    // pipeline shape (pure projection over the payload scan, fixed
    // output size regardless of input size). Deterministic in the
    // payload alone; a real codec would swap in at the same slot.
    QuerySpec.sqlBacked("q68_mm_resize",
      """SELECT doc_id, n_bytes, stride,
        |  array_to_string(list_transform(range(0, 16),
        |    i -> substr(hx, 2*least(i*stride + 1, n_bytes) - 1, 2)), '') AS thumb
        |FROM (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) AS n_bytes,
        |    CAST(ceil(octet_length(encode(text)) / 16.0) AS BIGINT) AS stride
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), hex(col("text").cast("binary")).as("hx"),
          octet_length(col("text").cast("binary")).cast("long").as("n_bytes"))
        .withColumn("stride", ceil(col("n_bytes") / 16.0).cast("long"))
        .select(col("doc_id"), col("n_bytes"), col("stride"), expr(
          """concat_ws('', transform(sequence(0, 15),
            |  i -> substring(hx, CAST(2*least(i*stride + 1, n_bytes) - 1 AS INT), 2)))""".stripMargin)
          .as("thumb"))
        .orderBy(col("doc_id"))
    },

    // ------------------------------------------------------------------
    // Batch decode: per-partition typed map through the (stub) codec into
    // fixed-shape feature rows. The decoder is imperative (mapPartitions —
    // the slot a real codec plugs into; partition count bounds codec
    // parallelism), but its arithmetic is deterministic byte sums, so the
    // oracle reproduces it over hex(encode(text)) and the query IS
    // hash-gated. Stripe sums are integers by construction (sums of byte
    // values), shipped as BIGINTs: exact cross-engine text, no
    // double-formatting divergence.
    QuerySpec.sqlBacked("q45_mm_decode",
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |         octet_length(encode(text)) AS n FROM documents)
        |SELECT doc_id,
        |  1 + (CAST(('0x' || substr(hx, 1, 2)) AS INTEGER) & 127) AS width,
        |  1 + (CASE WHEN n >= 2
        |            THEN CAST(('0x' || substr(hx, 3, 2)) AS INTEGER) & 127
        |            ELSE 0 END) AS height,
        |  array_to_string(list_transform(range(0, 8), k ->
        |    CAST(coalesce(list_sum(list_transform(range(0, (n - k + 7) // 8),
        |      j -> CAST(('0x' || substr(hx, 2*(k + 8*j) + 1, 2)) AS INTEGER))),
        |      0) AS BIGINT)), ',') AS features
        |FROM b ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, payload) =>
            val (w, h, feat) = FakeDecoder.decode(payload)
            // comma-joined: the driver's canonicalizer can't hash arrays;
            // stripe sums are whole numbers, so longs are lossless
            (id, w, h, feat.map(_.toLong).mkString(","))
          }
        }
        .toDF("doc_id", "width", "height", "features")
        .orderBy(col("doc_id"))
    },

    // ------------------------------------------------------------------
    // Perceptual-hash media dedup, 64-bit with hamming banding: the
    // classic pHash construction over 64 decoded stripes — bit k is set
    // iff stripe k is ABOVE the payload's mean stripe (integer
    // cross-multiplication 64*f_k > tot, never a division, so the
    // boundary is bit-exact in both engines). The hash is carried as
    // four 16-bit band integers (sign-safe in both engines; the
    // rendered phash is their hex concatenation), and near-dup
    // candidates come from q37's banding shape: docs sharing ANY band
    // value collide, and a pair within hamming <= HamT=3 differs in at
    // most 3 of the 4 bands, so it MUST share one (pigeonhole) — the
    // band join is candidate-complete for the threshold. Verdict is
    // keep-lowest-id (the q35/q66/q103 convention).
    //
    // Scale (100 TB): decode is the q45 per-partition projection; the
    // pair-generating exchange carries (band_no, band_val, doc_id) —
    // ~20 bytes/row, never the payload; the hamming confirm joins the
    // candidate SLIVER back to the 33-byte/row hash table; and the
    // 16-bit bands keep each band bucket ~corpus/65536 — no 8-bit
    // everything-collides collapse (the round-5 weakness this replaces).
    QuerySpec.sqlBacked("q108_mm_phash_dedup",
      s"""WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |         octet_length(encode(text)) AS n FROM documents),
        |f AS (
        |  SELECT doc_id, list_transform(range(0, 64), k ->
        |    CAST(coalesce(list_sum(list_transform(range(0, (n - k + 63) // 64),
        |      j -> CAST(('0x' || substr(hx, 2*(k + 64*j) + 1, 2)) AS INTEGER))),
        |      0) AS BIGINT)) AS fs
        |  FROM b),
        |p AS (
        |  SELECT doc_id, list_transform(range(0, 4), bb ->
        |    CAST(coalesce(list_sum(list_transform(range(0, 16), i ->
        |      CASE WHEN 64 * fs[16*bb + i + 1] > list_sum(fs)
        |           THEN 1 << i ELSE 0 END)), 0) AS BIGINT)) AS bands
        |  FROM f),
        |ph AS (SELECT doc_id, bands,
        |         printf('%04x%04x%04x%04x',
        |           bands[4], bands[3], bands[2], bands[1]) AS phash
        |       FROM p),
        |e AS (SELECT doc_id, j AS band_no, bands[j + 1] AS band_val
        |      FROM ph, unnest(range(0, 4)) AS t(j)),
        |cand AS (SELECT DISTINCT a.doc_id AS a_id, c.doc_id AS b_id
        |         FROM e a JOIN e c ON a.band_no = c.band_no
        |           AND a.band_val = c.band_val AND a.doc_id < c.doc_id),
        |drp AS (SELECT DISTINCT b_id FROM (
        |  SELECT cand.b_id,
        |      bit_count(xor(pa.bands[1], pb.bands[1]))
        |    + bit_count(xor(pa.bands[2], pb.bands[2]))
        |    + bit_count(xor(pa.bands[3], pb.bands[3]))
        |    + bit_count(xor(pa.bands[4], pb.bands[4])) AS hamming
        |  FROM cand JOIN ph pa ON pa.doc_id = cand.a_id
        |  JOIN ph pb ON pb.doc_id = cand.b_id)
        |  WHERE hamming <= $HamT)
        |SELECT ph.doc_id, ph.phash, (d.b_id IS NULL) AS keep
        |FROM ph LEFT JOIN drp d ON ph.doc_id = d.b_id
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ph = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, payload) =>
            val f = FakeDecoder.stripes(payload, 64)
            val tot = f.sum
            val bands = Array.tabulate(4) { b =>
              var acc = 0L
              var i = 0
              while (i < 16) {
                if (64L * f(16 * b + i) > tot) acc |= (1L << i)
                i += 1
              }
              acc
            }
            (id, bands(0), bands(1), bands(2), bands(3))
          }
        }
        .toDF("doc_id", "b0", "b1", "b2", "b3")
        .withColumn("phash", format_string("%04x%04x%04x%04x",
          col("b3"), col("b2"), col("b1"), col("b0")))
      // ph feeds the band explode, both confirm sides and the verdict
      Dedup.withScratch(ph) {
        val e = ph.select(col("doc_id"),
          posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
            .as(Seq("band_no", "band_val")))
        val cand = e
          .select(col("doc_id").as("a_id"), col("band_no"), col("band_val"))
          .join(e.select(col("doc_id").as("b_id"), col("band_no").as("bn2"),
              col("band_val").as("bv2")),
            col("band_no") === col("bn2") && col("band_val") === col("bv2") &&
              col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id")).distinct()
        val pa = ph.select(col("doc_id").as("pa_id"), col("b0").as("a0"),
          col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"))
        val pb = ph.select(col("doc_id").as("pb_id"), col("b0").as("c0"),
          col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3"))
        val drp = cand.join(pa, col("a_id") === col("pa_id"))
          .join(pb, col("b_id") === col("pb_id"))
          .filter(expr("bit_count(a0 ^ c0) + bit_count(a1 ^ c1) + " +
            "bit_count(a2 ^ c2) + bit_count(a3 ^ c3)") <= HamT)
          .select(col("b_id")).distinct()
        ph.join(drp, col("doc_id") === col("b_id"), "left")
          .select(col("doc_id"), col("phash"), col("b_id").isNull.as("keep"))
          .orderBy(col("doc_id"))
      }
    },

    // ------------------------------------------------------------------
    // q228: scene-cut detection — the TEMPORAL media operator over q44's
    // sampled frames: each frame gets a 16-bit mini-pHash (the q108
    // construction at m=16 stripes — bit k set iff 16·s_k > Σs, integer
    // cross-multiplication, no division), and a CUT is a consecutive-
    // frame hamming jump >= 6/16 within the same media — the shot-
    // boundary signal a video curation pipeline samples keyframes at
    // (one representative frame per shot beats every-Nth-frame for
    // training-data diversity). The per-media lag window is keyed by
    // doc_id — frames per media are bounded (payload/32), so no
    // partition outgrows a shot list; the decode is the q45/q108
    // mapPartitions codec slot (deterministic stripe sums, so the hex
    // oracle reproduces it and the query stays hash-gated).
    QuerySpec.sqlBacked("q228_mm_scene_cut",
      """WITH fr AS (
        |  SELECT doc_id, 4*(j-1) AS frame_no,
        |    substr(hx, 256*(j-1)+1, 64) AS frame
        |  FROM (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
        |    unnest(range(1, 1 + CAST(ceil(len(hx)/256.0) AS BIGINT))) AS t(j)),
        |f AS (SELECT doc_id, frame_no, frame, len(frame) // 2 AS nb
        |      FROM fr WHERE len(frame) > 0),
        |st AS (SELECT doc_id, frame_no, list_transform(range(0, 16), k ->
        |    CAST(coalesce(list_sum(list_transform(range(0, (nb - k + 15) // 16),
        |      j -> CAST(('0x' || substr(frame, 2*(k + 16*j) + 1, 2)) AS INTEGER))),
        |      0) AS BIGINT)) AS fs
        |  FROM f),
        |ph AS (SELECT doc_id, frame_no,
        |    CAST(coalesce(list_sum(list_transform(range(0, 16), i ->
        |      CASE WHEN 16 * fs[i + 1] > list_sum(fs)
        |           THEN 1 << i ELSE 0 END)), 0) AS BIGINT) AS fph
        |  FROM st),
        |sc AS (SELECT doc_id, frame_no, fph,
        |    lag(fph) OVER (PARTITION BY doc_id ORDER BY frame_no) AS prev
        |  FROM ph)
        |SELECT doc_id, frame_no,
        |  CAST(bit_count(xor(fph, prev)) AS BIGINT) AS hamming
        |FROM sc
        |WHERE prev IS NOT NULL AND bit_count(xor(fph, prev)) >= 6
        |ORDER BY doc_id, frame_no""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ph = Tables(s, dir, "documents")
        .select(col("doc_id"), hex(col("text").cast("binary")).as("hx"))
        .select(col("doc_id"), expr(
          """posexplode(transform(
            |  sequence(1, CAST(ceil(length(hx)/256.0) AS INT)),
            |  j -> substring(hx, 256*(j-1)+1, 64)))""".stripMargin)
          .as(Seq("p", "frame")))
        .filter(length(col("frame")) > 0)
        .select(col("doc_id"), (col("p") * 4).cast("long").as("frame_no"),
          unhex(col("frame")).as("payload"))
        .as[(Long, Long, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, fno, payload) =>
            val f = FakeDecoder.stripes(payload, 16)
            val tot = f.sum
            var acc = 0L
            var i = 0
            while (i < 16) {
              if (16L * f(i) > tot) acc |= (1L << i)
              i += 1
            }
            (id, fno, acc)
          }
        }
        .toDF("doc_id", "frame_no", "fph")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("frame_no"))
      ph.withColumn("prev", lag(col("fph"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("doc_id"), col("frame_no"),
          expr("CAST(bit_count(fph ^ prev) AS BIGINT)").as("hamming"))
        .filter(col("hamming") >= 6)
        .orderBy(col("doc_id"), col("frame_no"))
    },

    // ------------------------------------------------------------------
    // q235: voice-activity segmentation — the AUDIO-side temporal
    // operator completing the media set (q44/q228 cover video frames,
    // q108 images): an energy-threshold VAD over the q43 'audio' kind
    // (payloads 200..399 bytes), the curation step that cuts long
    // recordings into speech-like segments before transcription or
    // training. Payload frames at a 16-byte PCM-ish stride; per-frame
    // ENERGY = Σ (byte − 128)² — exact integers, computed in the
    // q45/q228 mapPartitions codec slot (a real DSP frontend swaps in
    // there). The threshold is ADAPTIVE per media — a frame is active
    // iff energy · n_frames > total_energy, i.e. above the media's own
    // mean frame energy, by integer cross-multiplication (the q108
    // no-division trick; headroom: frame energy <= 16·128², so the
    // product holds to ~2e13 frames ≈ 300 GB of audio per media).
    // Consecutive active frames coalesce into segments by
    // gaps-and-islands (run-start flag via lag, running sum = segment
    // id) — both windows are keyed by doc_id, and frames per media are
    // payload-bounded, so no partition outgrows one recording. Output:
    // one row per segment with span and energy mass.
    QuerySpec.sqlBacked("q235_mm_audio_vad",
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx
        |  FROM documents
        |  WHERE octet_length(encode(text)) >= 200
        |    AND octet_length(encode(text)) < 400),
        |fr AS (
        |  SELECT doc_id, CAST(j - 1 AS BIGINT) AS frame_no,
        |    substr(hx, 32*(j-1)+1, 32) AS frame
        |  FROM b,
        |    unnest(range(1, 1 + CAST(ceil(len(hx)/32.0) AS BIGINT))) AS t(j)),
        |f AS (
        |  SELECT doc_id, frame_no,
        |    CAST(coalesce(list_sum(list_transform(range(0, len(frame)//2),
        |      i -> (CAST(('0x'||substr(frame, 2*i+1, 2)) AS INTEGER) - 128)
        |         * (CAST(('0x'||substr(frame, 2*i+1, 2)) AS INTEGER) - 128))),
        |      0) AS BIGINT) AS e
        |  FROM fr WHERE len(frame) > 0),
        |m AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nf,
        |        CAST(sum(e) AS BIGINT) AS te FROM f GROUP BY doc_id),
        |a AS (SELECT f.doc_id, frame_no, e, (e * nf > te) AS act
        |      FROM f JOIN m USING (doc_id)),
        |g AS (SELECT doc_id, frame_no, e, act,
        |        CASE WHEN act AND NOT coalesce(
        |            lag(act) OVER (PARTITION BY doc_id ORDER BY frame_no),
        |            FALSE)
        |          THEN 1 ELSE 0 END AS st
        |      FROM a),
        |sg AS (SELECT doc_id, frame_no, e, act,
        |        sum(st) OVER (PARTITION BY doc_id ORDER BY frame_no) AS seg
        |      FROM g)
        |SELECT doc_id, CAST(seg AS BIGINT) AS seg_no,
        |  min(frame_no) AS start_frame, max(frame_no) AS end_frame,
        |  CAST(count(*) AS BIGINT) AS n_frames,
        |  CAST(sum(e) AS BIGINT) AS energy
        |FROM sg WHERE act
        |GROUP BY doc_id, seg ORDER BY doc_id, seg_no""".stripMargin) { (s, dir) =>
      import s.implicits._
      val f = Tables(s, dir, "documents")
        .select(col("doc_id"), hex(col("text").cast("binary")).as("hx"),
          octet_length(col("text").cast("binary")).as("n"))
        .filter(col("n") >= 200 && col("n") < 400)
        .select(col("doc_id"), expr(
          """posexplode(transform(
            |  sequence(1, CAST(ceil(length(hx)/32.0) AS INT)),
            |  j -> substring(hx, 32*(j-1)+1, 32)))""".stripMargin)
          .as(Seq("p", "frame")))
        .filter(length(col("frame")) > 0)
        .select(col("doc_id"), col("p").cast("long").as("frame_no"),
          unhex(col("frame")).as("payload"))
        .as[(Long, Long, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, fno, pl) =>
            var e = 0L
            var i = 0
            while (i < pl.length) {
              val d = (pl(i) & 0xff) - 128
              e += d.toLong * d
              i += 1
            }
            (id, fno, e)
          }
        }
        .toDF("doc_id", "frame_no", "e")
      // f feeds the per-media totals AND the threshold join — persist
      // once or the scan + hex round-trip + energy loop run twice
      Dedup.withScratch(f) {
      val m = f.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("nf"), sum(col("e")).as("te"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("frame_no"))
      val a = f.join(m, "doc_id")
        .withColumn("act", col("e") * col("nf") > col("te"))
      a.withColumn("st",
          when(col("act") && !coalesce(lag(col("act"), 1).over(w), lit(false)),
            1L).otherwise(0L))
        .withColumn("seg", sum(col("st")).over(w))
        .filter(col("act"))
        .groupBy(col("doc_id"), col("seg"))
        .agg(min(col("frame_no")).as("start_frame"),
          max(col("frame_no")).as("end_frame"),
          count(lit(1)).as("n_frames"), sum(col("e")).as("energy"))
        .select(col("doc_id"), col("seg").cast("long").as("seg_no"),
          col("start_frame"), col("end_frame"), col("n_frames"),
          col("energy"))
        .orderBy(col("doc_id"), col("seg_no"))
      }
    }
  )
}
