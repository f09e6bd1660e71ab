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
  }

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
    // Perceptual-hash media dedup: the classic pHash construction over
    // the decoded features — bit k is set iff stripe k is ABOVE the
    // payload's mean stripe (integer cross-multiplication 8*f_k > tot,
    // never a division, so the boundary is bit-exact in both engines) —
    // then payloads sharing an 8-bit hash are a near-dup candidate
    // group (keep-lowest-id, the q35/q66 convention). This is the
    // cheap banding pass a media pipeline runs before expensive
    // embedding comparison: decode is the q45 per-partition projection,
    // then ONE shuffle of (phash, doc_id) — 9 bytes per row, never the
    // payload — into at most 256 groups. At 100 TB the payload column
    // never crosses the wire: fingerprints do.
    QuerySpec.sqlBacked("q108_mm_phash_dedup",
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |         octet_length(encode(text)) AS n FROM documents),
        |f AS (
        |  SELECT doc_id, list_transform(range(0, 8), k ->
        |    CAST(coalesce(list_sum(list_transform(range(0, (n - k + 7) // 8),
        |      j -> CAST(('0x' || substr(hx, 2*(k + 8*j) + 1, 2)) AS INTEGER))),
        |      0) AS BIGINT)) AS fs
        |  FROM b),
        |p AS (
        |  SELECT doc_id, CAST(coalesce(list_sum(list_transform(range(0, 8),
        |    k -> CASE WHEN 8 * fs[k + 1] > list_sum(fs)
        |              THEN 1 << k ELSE 0 END)), 0) AS BIGINT) AS phash
        |  FROM f)
        |SELECT phash, min(doc_id) AS keep_id, count(*) AS n_docs
        |FROM p GROUP BY phash HAVING count(*) > 1
        |ORDER BY phash""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, payload) =>
            val f = FakeDecoder.decode(payload)._3.map(_.toLong)
            val tot = f.sum
            val phash = f.indices.foldLeft(0L) { (acc, k) =>
              if (8 * f(k) > tot) acc | (1L << k) else acc
            }
            (id, phash)
          }
        }
        .toDF("doc_id", "phash")
        .groupBy(col("phash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_docs"))
        .filter(col("n_docs") > 1)
        .orderBy(col("phash"))
    }
  )
}
