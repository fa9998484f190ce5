package graft.qsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal-column queries: binary payload metadata, a REAL PNG
  * decode pipeline (`mm_decode` — ImageIO encode→decode roundtrip whose
  * decoded pixel stats the oracle predicts arithmetically), and the
  * stubbed opaque-codec fallback. All oracle-checked. */
object MultimodalQueries extends QuerySet {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // REAL image decode: deterministic per-doc PNGs (pixel formula in
    // doc_id) encoded with ImageIO, decoded back with ImageIO, stats +
    // nearest-neighbor thumbnail emitted. The oracle computes the same
    // stats from the formula alone — only a correct lossless decode can
    // match it. Binary bytes never leave the partition batch.
    "mm_decode" -> ((s, dir) => {
      val imgs = Multimodal.withPngPayload(
        s, t(s, dir, "documents").filter(col("doc_id") < 100), "doc_id")
      Multimodal.decodeImages(s, imgs).toDF()
        .select(col("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("channels").cast("long").as("channels"),
          col("sum_r"), col("sum_g"), col("sum_b"),
          col("thumb_w").cast("long").as("thumb_w"),
          col("thumb_h").cast("long").as("thumb_h"),
          col("thumb_sum"))
        .orderBy(col("doc_id"))
    }),

    // Perceptual-hash image dedup, sketch-then-verify (the minhash
    // band/verify discipline applied to pixels): REAL PNG decode →
    // 64-bit average-hash over the top-left 8×8 crop as the CANDIDATE
    // bucket (aHash is brightness-pattern-invariant, so it coarsely
    // groups visually-similar images), then the exact crop digest
    // verifies true duplicates inside each bucket. The pixel formula
    // makes ids that agree mod 256 crop-identical (31/17/23 are odd,
    // hence invertible mod 256), so docs < 600 plant {i, i+256, i+512}
    // exact triples inside wider perceptual buckets — and the oracle
    // predicts every hash bit, digest, and cluster arithmetically: only
    // a correct lossless decode + hash chain matches. Shape: decode and
    // both signatures are per-row map work inside partition batches
    // (image bytes never shuffle); candidate and verify clustering are
    // counts-only hash-aggs on fixed-width keys + joins back.
    "mm_image_phash" -> ((s, dir) => {
      val imgs = Multimodal.withPngPayload(
        s, t(s, dir, "documents").filter(col("doc_id") < 600), "doc_id")
      val h = Multimodal.imageAHash(s, imgs).toDF()
      val cand = h.groupBy(col("phash"))
        .agg(count(lit(1)).as("n_candidates"))
      val exact = h.groupBy(col("crop_md5"))
        .agg(count(lit(1)).as("exact_size"), min(col("doc_id")).as("rep_id"))
      h.join(cand, "phash").join(exact, "crop_md5")
        .select(col("doc_id"), col("phash"), col("n_candidates"),
          col("exact_size"), col("rep_id"))
        .orderBy(col("doc_id"))
    }),

    // Acoustic-fingerprint audio dedup, sketch-then-verify (the
    // mm_image_phash contract on the audio modality): REAL WAV decode →
    // 31-bit energy-contour fingerprint over 32 windows of the first
    // 2048 samples as the candidate bucket (contour bits are
    // level-invariant — gain changes keep the bucket), exact
    // energy-vector digest as the verify key. The sample formula depends
    // on id only through id·31 mod 4096, so planting +4096 copies of
    // ids < 50 creates exact duplicate pairs inside wider contour
    // buckets; the oracle predicts every window energy, bit, and digest
    // arithmetically — only a correct little-endian PCM decode matches.
    "mm_audio_fingerprint" -> ((s, dir) => {
      val base = t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"))
      val ids = base.unionByName(base.filter(col("doc_id") < 50)
        .select((col("doc_id") + 4096L).as("doc_id")))
      val h = Multimodal.audioFingerprint(s,
        Multimodal.withWavPayload(s, ids, "doc_id")).toDF()
      val cand = h.groupBy(col("afp")).agg(count(lit(1)).as("n_candidates"))
      val exact = h.groupBy(col("energy_md5"))
        .agg(count(lit(1)).as("exact_size"), min(col("doc_id")).as("rep_id"))
      h.join(cand, "afp").join(exact, "energy_md5")
        .select(col("doc_id"), col("afp"), col("n_candidates"),
          col("exact_size"), col("rep_id"))
        .orderBy(col("doc_id"))
    }),

    // REAL audio decode: deterministic per-doc WAVs (16-bit mono PCM,
    // sample formula in doc_id) through the JDK's WAV codec; format
    // metadata + integer signal stats the oracle predicts arithmetically.
    "mm_audio_decode" -> ((s, dir) => {
      val wavs = Multimodal.withWavPayload(
        s, t(s, dir, "documents").filter(col("doc_id") < 100), "doc_id")
      Multimodal.decodeAudio(s, wavs).toDF()
        .select(col("doc_id"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("channels").cast("long").as("channels"),
          col("bits").cast("long").as("bits"),
          col("n_samples"), col("sum_abs"),
          col("peak").cast("long").as("peak"))
        .orderBy(col("doc_id"))
    }),

    // REAL video FRAME decode: deterministic framed MP4s (real stsz/stco
    // sample table, PNG-coded samples — a lossless QuickTime video
    // codec) demuxed by the sample-table walk and decoded frame-by-frame
    // through ImageIO. The oracle predicts every frame's pixel sums from
    // the generator formula — only a correct sample-table resolution AND
    // a correct lossless decode can hash-match. MJPEG (lossy) is covered
    // by a tolerance pin in MultimodalSpec.
    "mm_video_frames" -> ((s, dir) => {
      val vids = Multimodal.withFramedMp4Payload(
        s, t(s, dir, "documents").filter(col("doc_id") < 100), "doc_id")
      Multimodal.decodeVideoFrames(s, vids).toDF()
        .select(col("doc_id"),
          col("frame_idx").cast("long").as("frame_idx"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("sum_r"), col("sum_g"), col("sum_b"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // Scene-cut detection over REAL decoded frames — the frame-sampling
    // heuristic a VLM pipeline runs before picking frames to caption:
    // per-frame mean intensity from the lossless decode, then a
    // per-video lag compare (|mean_f − mean_{f−1}| > τ marks a cut;
    // production swaps the statistic for an aHash/histogram delta —
    // same plan shape). The window partitions BY VIDEO, so videos are
    // the parallel unit and decode stays partition-batched upstream.
    // The oracle replays decode + lag from the generator formulas — a
    // wrong frame order or a wrong decode breaks the hash.
    "mm_video_scene_cuts" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val vids = Multimodal.withFramedMp4Payload(
        s, t(s, dir, "documents").filter(col("doc_id") < 100), "doc_id")
      val means = Multimodal.decodeVideoFrames(s, vids).toDF()
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          round((col("sum_r") + col("sum_g") + col("sum_b")).cast("double") /
            (col("width").cast("long") * col("height") * lit(3L)), 6)
            .as("mean_px"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
      means
        .withColumn("delta",
          round(abs(col("mean_px") - lag(col("mean_px"), 1).over(w)), 6))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(when(col("delta") > 2.0, 1L).otherwise(0L)).as("n_cuts"),
          min(when(col("delta") > 2.0, col("frame_idx"))).as("fc"))
        .select(col("doc_id"), col("n_frames"), col("n_cuts"),
          coalesce(col("fc"), lit(-1L)).as("first_cut"))
        .orderBy(col("doc_id"))
    }),

    // REAL video container demux: deterministic minimal MP4s walked by
    // the bounds-checked ISO-BMFF box parser; box/track counts and
    // movie-header fields oracle-predicted. Frame decode for codecs the
    // JVM can't decode stays behind the declared stub.
    "mm_video_demux" -> ((s, dir) => {
      val vids = Multimodal.withMp4Payload(
        s, t(s, dir, "documents").filter(col("doc_id") < 100), "doc_id")
      Multimodal.demuxVideo(s, vids).toDF()
        .select(col("doc_id"),
          col("n_boxes").cast("long").as("n_boxes"),
          col("n_tracks").cast("long").as("n_tracks"),
          col("timescale"), col("duration"), col("mdat_bytes"),
          col("top_types"))
        .orderBy(col("doc_id"))
    }),

    // Columnar metadata over opaque binary payloads.
    "mm_binary_meta" -> ((s, dir) => {
      Multimodal.binaryMetadata(
          Multimodal.withBinaryPayload(t(s, dir, "documents"), "doc_id", "text"))
        .orderBy(col("doc_id"))
    }),

    // Frame sampling: fixed-size byte frames, every 2nd kept. The slicing
    // is columnar, so sampling prunes frames BEFORE any decode stage.
    "mm_frame_sample" -> ((s, dir) => {
      val bin = Multimodal.withBinaryPayload(
        t(s, dir, "documents").filter(col("doc_id") < 100), "doc_id", "text")
      Multimodal.sampleFrames(bin, frameBytes = 256, every = 2)
        .select(col("doc_id"), col("frame_idx"),
          length(col("frame_bytes")).cast("long").as("frame_len"),
          lower(hex(substring(col("frame_bytes"), 1, 8))).as("frame_magic"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // Stubbed decode → fixed-width feature vector via partition-batched
    // typed transform (the production plumbing shape, fake features).
    "mm_decode_stub" -> ((s, dir) => {
      val bin = Multimodal.withBinaryPayload(
        t(s, dir, "documents").filter(col("doc_id") < 100), "doc_id", "text")
      Multimodal.decodeStub(s, bin).toDF()
        .select(col("doc_id"), col("n_bytes").cast("long").as("n_bytes"),
          element_at(col("features"), 1).as("f0"),
          element_at(col("features"), 2).as("f1"),
          element_at(col("features"), 3).as("f2"),
          element_at(col("features"), 4).as("f3"))
        .orderBy(col("doc_id"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    // Predicts the DECODED per-frame stats of mm_video_frames from the
    // generator formulas: n_frames = 2 + id%4, frame f = the synthetic
    // pixel image for fid = id·1000 + f (dims 8+fid%9 × 8+fid%7, channel
    // sums per the mm_decode formulas). A sample-table slip (stsz size,
    // stco offset, slice bounds) or any decode loss breaks the match.
    "mm_video_frames" ->
      """WITH d AS (
        |  SELECT doc_id, 2 + doc_id % 4 AS nf
        |  FROM documents WHERE doc_id < 100),
        |fr AS (SELECT doc_id, unnest(range(nf)) AS f FROM d),
        |dim AS (
        |  SELECT doc_id, f, doc_id*1000 + f AS fid,
        |    8 + (doc_id*1000 + f) % 9 AS w, 8 + (doc_id*1000 + f) % 7 AS h
        |  FROM fr),
        |xs AS (SELECT doc_id, f, fid, w, h, unnest(range(w)) AS x FROM dim),
        |px AS (SELECT doc_id, f, fid, w, h, x, unnest(range(h)) AS y FROM xs)
        |SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
        |  CAST(MAX(w) AS BIGINT) AS width, CAST(MAX(h) AS BIGINT) AS height,
        |  CAST(SUM((fid*31 + x*7 + y*13) % 256) AS BIGINT) AS sum_r,
        |  CAST(SUM((fid*17 + x*5 + y*11) % 256) AS BIGINT) AS sum_g,
        |  CAST(SUM((fid*23 + x*3 + y*19) % 256) AS BIGINT) AS sum_b
        |FROM px GROUP BY doc_id, f
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // mm_video_frames' formula replay extended by the lag compare: the
    // per-frame mean in explicit DOUBLE over an integer denominator,
    // delta rounded 6, τ compared as DOUBLE (a bare 2.0 is DECIMAL).
    "mm_video_scene_cuts" ->
      """WITH d AS (
        |  SELECT doc_id, 2 + doc_id % 4 AS nf
        |  FROM documents WHERE doc_id < 100),
        |fr AS (SELECT doc_id, unnest(range(nf)) AS f FROM d),
        |dim AS (
        |  SELECT doc_id, f, doc_id*1000 + f AS fid,
        |    8 + (doc_id*1000 + f) % 9 AS w, 8 + (doc_id*1000 + f) % 7 AS h
        |  FROM fr),
        |xs AS (SELECT doc_id, f, fid, w, h, unnest(range(w)) AS x FROM dim),
        |px AS (SELECT doc_id, f, fid, w, h, x, unnest(range(h)) AS y FROM xs),
        |fs AS (
        |  SELECT doc_id, f, MAX(w) AS w, MAX(h) AS h,
        |    SUM((fid*31 + x*7 + y*13) % 256) AS sr,
        |    SUM((fid*17 + x*5 + y*11) % 256) AS sg,
        |    SUM((fid*23 + x*3 + y*19) % 256) AS sb
        |  FROM px GROUP BY doc_id, f),
        |m AS (
        |  SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
        |    round(CAST(sr + sg + sb AS DOUBLE) / (w * h * 3), 6) AS mean_px
        |  FROM fs),
        |del AS (
        |  SELECT doc_id, frame_idx,
        |    round(abs(mean_px -
        |      lag(mean_px) OVER (PARTITION BY doc_id ORDER BY frame_idx)), 6) AS delta
        |  FROM m)
        |SELECT doc_id, COUNT(*) AS n_frames,
        |  CAST(SUM(CASE WHEN delta > CAST(2.0 AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_cuts,
        |  CAST(coalesce(MIN(CASE WHEN delta > CAST(2.0 AS DOUBLE)
        |    THEN frame_idx END), -1) AS BIGINT) AS first_cut
        |FROM del GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    // Predicts the DEMUXED structure of mm_video_demux from the
    // generator formulas: n tracks = 1 + id%3, boxes = ftyp + moov +
    // mvhd + (trak+tkhd)·n + mdat, timescale/duration/mdat sizes are
    // direct arithmetic. A box-walk slip (header size, container
    // recursion, field offset) breaks the hash match.
    "mm_video_demux" ->
      """SELECT doc_id,
        |  CAST(4 + 2 * (1 + doc_id % 3) AS BIGINT) AS n_boxes,
        |  CAST(1 + doc_id % 3 AS BIGINT) AS n_tracks,
        |  CAST(1000 + doc_id % 100 AS BIGINT) AS timescale,
        |  CAST(5000 + (doc_id * 7) % 1000 AS BIGINT) AS duration,
        |  CAST(100 + doc_id % 50 AS BIGINT) AS mdat_bytes,
        |  'ftyp,moov,mdat' AS top_types
        |FROM documents WHERE doc_id < 100
        |ORDER BY doc_id""".stripMargin,

    // Predicts the DECODED stats of mm_audio_decode from the sample
    // formula: n = 2048 + (id%7)·256 samples, s(t) = (id·31 + t·7) %
    // 4096 − 2048. A header mis-parse or byte-order slip breaks the
    // hash match.
    "mm_audio_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 2048 + (doc_id % 7) * 256 AS n
        |  FROM documents WHERE doc_id < 100),
        |t AS (SELECT doc_id, n, unnest(range(n)) AS t FROM d),
        |s AS (SELECT doc_id, n, (doc_id*31 + t*7) % 4096 - 2048 AS v FROM t)
        |SELECT doc_id, CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(1 AS BIGINT) AS channels, CAST(16 AS BIGINT) AS bits,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
        |  CAST(MAX(ABS(v)) AS BIGINT) AS peak
        |FROM s GROUP BY doc_id, n
        |ORDER BY doc_id""".stripMargin,

    // Predicts the DECODED stats of mm_decode from the pixel formula —
    // dims 8+id%9 × 8+id%7, channel c at (x,y) = (id·kc + x·ac + y·bc)
    // % 256, thumbnail = 4×4 nearest-neighbor (source pixel at
    // floor(t·dim/4)). Any loss in the encode→decode roundtrip breaks
    // the hash match.
    "mm_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
        |  FROM documents WHERE doc_id < 100),
        |xs AS (SELECT doc_id, w, h, unnest(range(w)) AS x FROM d),
        |px AS (SELECT doc_id, w, h, x, unnest(range(h)) AS y FROM xs),
        |sums AS (
        |  SELECT doc_id,
        |    SUM((doc_id*31 + x*7 + y*13) % 256) AS sum_r,
        |    SUM((doc_id*17 + x*5 + y*11) % 256) AS sum_g,
        |    SUM((doc_id*23 + x*3 + y*19) % 256) AS sum_b
        |  FROM px GROUP BY doc_id),
        |txs AS (SELECT doc_id, w, h, unnest(range(4)) AS tx FROM d),
        |tp AS (SELECT doc_id, w, h, tx, unnest(range(4)) AS ty FROM txs),
        |tsum AS (
        |  SELECT doc_id,
        |    SUM((doc_id*31 + ((tx*w)//4)*7 + ((ty*h)//4)*13) % 256
        |      + (doc_id*17 + ((tx*w)//4)*5 + ((ty*h)//4)*11) % 256
        |      + (doc_id*23 + ((tx*w)//4)*3 + ((ty*h)//4)*19) % 256) AS thumb_sum
        |  FROM tp GROUP BY doc_id)
        |SELECT d.doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(3 AS BIGINT) AS channels,
        |  CAST(sum_r AS BIGINT) AS sum_r, CAST(sum_g AS BIGINT) AS sum_g,
        |  CAST(sum_b AS BIGINT) AS sum_b,
        |  CAST(4 AS BIGINT) AS thumb_w, CAST(4 AS BIGINT) AS thumb_h,
        |  CAST(thumb_sum AS BIGINT) AS thumb_sum
        |FROM d JOIN sums USING (doc_id) JOIN tsum USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // DuckDB cannot slice BLOBs, but the builder's documents are ASCII
    // (octet_length == length for every row), so char slicing on the text
    // then encode() reproduces the byte slicing exactly.
    "mm_frame_sample" ->
      """WITH b AS (
        |  SELECT doc_id, text, length(text) AS n
        |  FROM documents WHERE doc_id < 100),
        |idx AS (
        |  SELECT doc_id, text,
        |    unnest(range(0, CAST(ceil(n / 256.0) AS BIGINT))) AS frame_idx
        |  FROM b)
        |SELECT doc_id, frame_idx,
        |  CAST(octet_length(encode(substring(text, CAST(frame_idx * 256 + 1 AS INT), 256))) AS BIGINT) AS frame_len,
        |  lower(hex(encode(substring(text, CAST(frame_idx * 256 + 1 AS INT), 8)))) AS frame_magic
        |FROM idx
        |WHERE frame_idx % 2 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin,

    "mm_binary_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  lower(hex(encode(substring(text, 1, 8)))) AS magic_hex
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // The stub's "features" are 8 interleaved byte-block sums — pure
    // arithmetic over the payload, so (ASCII corpus: ord == byte) the
    // oracle reproduces them exactly and the partition-batched typed
    // transform gets a hash-checked row, not just a rows-only count.
    "mm_decode_stub" ->
      """WITH b AS (
        |  SELECT doc_id, text, strlen(text) AS n
        |  FROM documents WHERE doc_id < 100),
        |pos AS (
        |  SELECT doc_id, (i - 1) % 8 AS j,
        |    ord(substr(text, CAST(i AS INT), 1)) AS bv
        |  FROM (SELECT doc_id, text, unnest(generate_series(1, n)) AS i FROM b)),
        |f AS (
        |  SELECT b.doc_id, b.n,
        |    CAST(COALESCE(SUM(CASE WHEN j = 0 THEN bv END), 0) AS DOUBLE) AS f0,
        |    CAST(COALESCE(SUM(CASE WHEN j = 1 THEN bv END), 0) AS DOUBLE) AS f1,
        |    CAST(COALESCE(SUM(CASE WHEN j = 2 THEN bv END), 0) AS DOUBLE) AS f2,
        |    CAST(COALESCE(SUM(CASE WHEN j = 3 THEN bv END), 0) AS DOUBLE) AS f3
        |  FROM b LEFT JOIN pos ON pos.doc_id = b.doc_id
        |  GROUP BY b.doc_id, b.n)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_bytes, f0, f1, f2, f3
        |FROM f
        |ORDER BY doc_id""".stripMargin,

    // The sample formula replayed over 32×64 windows: energies, contour
    // bits via lag, digest via the identical comma-joined string, both
    // clusterings — no codec in the loop.
    "mm_audio_fingerprint" ->
      """WITH base AS (SELECT doc_id FROM documents WHERE doc_id < 100),
        |ids AS (
        |  SELECT doc_id FROM base
        |  UNION ALL
        |  SELECT doc_id + 4096 AS doc_id FROM base WHERE doc_id < 50),
        |ws AS (SELECT doc_id, unnest(range(32)) AS w FROM ids),
        |ts AS (SELECT doc_id, w, unnest(range(64)) AS t FROM ws),
        |sm AS (
        |  SELECT doc_id, w,
        |    SUM(abs((31 * doc_id + 7 * (64 * w + t)) % 4096 - 2048)) AS e
        |  FROM ts GROUP BY doc_id, w),
        |lagd AS (
        |  SELECT doc_id, w, e,
        |    lag(e) OVER (PARTITION BY doc_id ORDER BY w) AS pe
        |  FROM sm),
        |f AS (
        |  SELECT doc_id,
        |    string_agg(CASE WHEN e > pe THEN '1' ELSE '0' END, '' ORDER BY w)
        |      FILTER (WHERE w > 0) AS afp,
        |    md5(string_agg(CAST(e AS VARCHAR), ',' ORDER BY w)) AS energy_md5
        |  FROM lagd GROUP BY doc_id),
        |cand AS (SELECT afp, COUNT(*) AS n_candidates FROM f GROUP BY afp),
        |ex AS (
        |  SELECT energy_md5, COUNT(*) AS exact_size, MIN(doc_id) AS rep_id
        |  FROM f GROUP BY energy_md5)
        |SELECT f.doc_id, f.afp, cand.n_candidates, ex.exact_size, ex.rep_id
        |FROM f JOIN cand USING (afp) JOIN ex USING (energy_md5)
        |ORDER BY f.doc_id""".stripMargin,

    // The pixel formula replayed over the 8×8 crop: the division-free
    // bit rule (64·gray > Σgray) for the candidate hash, md5 over the
    // identical comma-joined gray string for the verify digest, then
    // both clusterings — every bit and byte arithmetic, no codec in
    // the loop.
    "mm_image_phash" ->
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 600),
        |ys AS (SELECT doc_id, unnest(range(8)) AS y FROM ids),
        |px AS (SELECT doc_id, y, unnest(range(8)) AS x FROM ys),
        |g AS (
        |  SELECT doc_id, y, x,
        |      (31 * doc_id + 7 * x + 13 * y) % 256
        |    + (17 * doc_id + 5 * x + 11 * y) % 256
        |    + (23 * doc_id + 3 * x + 19 * y) % 256 AS g
        |  FROM px),
        |s AS (SELECT doc_id, SUM(g) AS tot FROM g GROUP BY doc_id),
        |h AS (
        |  SELECT g.doc_id,
        |    string_agg(CASE WHEN 64 * g.g > s.tot THEN '1' ELSE '0' END, ''
        |               ORDER BY g.y, g.x) AS phash,
        |    md5(string_agg(CAST(g.g AS VARCHAR), ',' ORDER BY g.y, g.x)) AS crop_md5
        |  FROM g JOIN s USING (doc_id)
        |  GROUP BY g.doc_id),
        |cand AS (SELECT phash, COUNT(*) AS n_candidates FROM h GROUP BY phash),
        |ex AS (
        |  SELECT crop_md5, COUNT(*) AS exact_size, MIN(doc_id) AS rep_id
        |  FROM h GROUP BY crop_md5)
        |SELECT h.doc_id, h.phash, cand.n_candidates, ex.exact_size, ex.rep_id
        |FROM h JOIN cand USING (phash) JOIN ex USING (crop_md5)
        |ORDER BY h.doc_id""".stripMargin
  )
}
