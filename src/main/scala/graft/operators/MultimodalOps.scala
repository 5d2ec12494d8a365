package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.OpModule
import graft.sources.{Sql, Tables}

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * decode / feature-extract / frame-sample stages.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A
  * DETERMINISTIC STUB (arithmetic on the byte length — clearly marked
  * below). Everything around it is real and tested: the binary column
  * flows through a typed Dataset into `mapPartitions` in batches (the
  * Scala analogue of a Pandas-UDF `mapInPandas` stage), the schema is
  * explicit, and the frame-sampler is a generator over per-row metadata.
  * Swapping `fakeDecode` for a real codec changes no plumbing.
  */
object MultimodalOps extends OpModule {

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int,
      height: Int, format: String)

  /** STUB decoder: derives fake image metadata from the byte length.
    * Deterministic so the stage stays oracle-checkable. */
  def fakeDecode(r: MediaRow): MediaMeta = {
    val n = r.payload.length
    MediaMeta(r.doc_id, n, 320 + n % 320, 240 + n % 240,
      (n % 3) match { case 0 => "jpeg"; case 1 => "png"; case _ => "webp" })
  }

  /** documents.text encoded as a binary payload column — the stand-in for
    * image/audio bytes (the reference similarly treats LAZ point clouds
    * as opaque payloads routed by path, worker.py:201-208). */
  def media(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // decode stage: binary batches through mapPartitions → typed metadata
    "mm1_decode_meta" -> ((s, dir) => {
      import s.implicits._
      media(s, dir).as[MediaRow]
        .mapPartitions(_.map(fakeDecode))
        .toDF()
    }),

    // feature extraction: byte histogram computed over the raw payload in
    // mapPartitions (real distributed binary processing; oracle counts
    // the same classes on the ASCII text side)
    "mm3_byte_histogram" -> ((s, dir) => {
      import s.implicits._
      media(s, dir).as[MediaRow].mapPartitions(_.map { r =>
        var alpha = 0; var space = 0; var digit = 0; var other = 0
        r.payload.foreach { b =>
          // explicit ASCII ranges, byte-exact vs the oracle's [A-Za-z]/[0-9]
          // regexes regardless of corpus encoding (non-ASCII bytes → other)
          if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) alpha += 1
          else if (b == ' ') space += 1
          else if (b >= '0' && b <= '9') digit += 1
          else other += 1
        }
        (r.doc_id, alpha, space, digit, other)
      }).toDF("doc_id", "n_alpha", "n_space", "n_digit", "n_other")
    }),

    // resize stage: stride-5 byte subsampling in mapPartitions, verified
    // by fingerprint (the STUB stand-in for an image resize kernel — the
    // plumbing, batching, and verification are the real parts)
    "mm4_resize_stride" -> ((s, dir) => {
      import s.implicits._
      media(s, dir).as[MediaRow].mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { r =>
          val resized = r.payload.indices.collect {
            case i if i % 5 == 0 => r.payload(i) }.toArray
          val hex = md.digest(resized).map("%02x".format(_)).mkString
          (r.doc_id, r.payload.length, resized.length, hex)
        }
      }.toDF("doc_id", "orig_len", "new_len", "resized_md5")
    }),

    // embedding extraction in BATCHES: the mapInPandas batch shape —
    // rows flow through mapPartitions in bounded groups (grouped(64)), a
    // whole batch is featurized at once, results stream back out. The
    // fake featurizer (byte sums folded mod 8 — integer, so
    // oracle-exact) stands where an ONNX/codec batch call would run;
    // swapping it changes no plumbing, batching, or schema. The vector
    // leaves the query as a CSV string so the correctness harness can
    // hash it (array columns are unhashable for its comparator); the
    // in-flight type is the real Array[Long].
    "mm5_embed_batch" -> ((s, dir) => {
      import s.implicits._
      media(s, dir).filter(length(col("payload")) >= 1)
        .as[MediaRow].mapPartitions { it =>
          it.grouped(64).flatMap { batch =>
            batch.map { r =>
              val acc = new Array[Long](8)
              var i = 0
              while (i < r.payload.length) {
                acc(i % 8) += (r.payload(i) & 0xff); i += 1
              }
              (r.doc_id, acc.toSeq)
            }
          }
        }.toDF("doc_id", "feat")
        .select(col("doc_id"), concat_ws(",", col("feat")).as("feat_csv"))
    }),

    // modality routing: the dispatch stage of a heterogeneous-payload
    // pipeline — classify each opaque payload by its leading byte (the
    // magic-bytes sniff real decoders start with) and profile each
    // route. Pure map-side classification + one partial-aggregated
    // groupBy; at 100 TB the route key also becomes the write-side
    // partition for per-modality downstream jobs.
    "mm6_modality_route" -> ((s, dir) =>
      media(s, dir)
        .withColumn("b0",
          conv(hex(substring(col("payload"), 1, 1)), 16, 10).cast("int"))
        .withColumn("route",
          when(col("b0").between('a'.toInt, 'f'.toInt), "fmt_a")
            .when(col("b0").between('g'.toInt, 'm'.toInt), "fmt_b")
            .when(col("b0").between('n'.toInt, 's'.toInt), "fmt_c")
            .otherwise("fmt_d"))
        .groupBy("route")
        .agg(count(lit(1)).as("n"),
          // avg over integer byte lengths is order-safe: the int sum is
          // exact in double (no float-order hazard; see Exact's scaladoc)
          round(avg(length(col("payload"))), 6).as("avg_bytes"))),

    // frame sampling: every 5th frame of n_bytes/100 frames per doc
    "mm2_frame_sample" -> ((s, dir) => {
      import s.implicits._
      val meta = media(s, dir).as[MediaRow].mapPartitions(_.map(fakeDecode)).toDF()
      meta.withColumn("n_frames", floor(col("n_bytes") / 100).cast("int"))
        .filter(col("n_frames") >= 1)
        .select(col("doc_id"),
          explode(expr("sequence(0, n_frames - 1, 5)")).as("frame_id"))
    }),

    // mm7 — perceptual-hash near-dup over binary payloads (image-dedup
    // shape): an aHash-style 8-bit signature — bit b set iff stripe b's
    // byte sum exceeds its equal share of the payload total (the STUB
    // stand-in for block-mean-vs-global-mean over decoded pixels; same
    // signature algebra, no codec) — then near-dup grouping is a plain
    // groupBy on the signature. At 100 TB this is the dd1 hash-groupBy
    // with a similarity-preserving key: the shuffle key is the 256-value
    // signature space (salt-extendable to 64-bit pHash), never pairs.
    "mm7_phash_neardup" -> ((s, dir) => {
      import s.implicits._
      val sigs = media(s, dir).filter(length(col("payload")) >= 1)
        .as[MediaRow].mapPartitions(_.map { r =>
          val acc = new Array[Long](8)
          var i = 0
          while (i < r.payload.length) { acc(i % 8) += (r.payload(i) & 0xffL); i += 1 }
          val total = acc.sum
          var sig = 0L
          var b = 0
          while (b < 8) { if (acc(b) * 8 > total) sig |= (1L << b); b += 1 }
          (r.doc_id, sig)
        }).toDF("doc_id", "phash")
      val buckets = sigs.groupBy("phash").agg(count(lit(1)).as("n_bucket"))
      sigs.join(buckets, Seq("phash"))
        .select("doc_id", "phash", "n_bucket")
    })
  )

  def oracles: Map[String, String] = Map(
    // strlen() = UTF-8 byte count in DuckDB; text is ASCII here
    "mm1_decode_meta" ->
      """SELECT doc_id, CAST(strlen(text) AS INT) AS n_bytes,
        |       CAST(320 + strlen(text) % 320 AS INT) AS width,
        |       CAST(240 + strlen(text) % 240 AS INT) AS height,
        |       CASE strlen(text) % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
        |            ELSE 'webp' END AS format
        |FROM documents""".stripMargin,

    "mm3_byte_histogram" ->
      """SELECT doc_id,
        |  CAST(strlen(text) - strlen(regexp_replace(text, '[A-Za-z]', '', 'g')) AS INT) AS n_alpha,
        |  CAST(strlen(text) - strlen(replace(text, ' ', '')) AS INT) AS n_space,
        |  CAST(strlen(text) - strlen(regexp_replace(text, '[0-9]', '', 'g')) AS INT) AS n_digit,
        |  CAST(strlen(regexp_replace(replace(text, ' ', ''), '[A-Za-z0-9]', '', 'g')) AS INT) AS n_other
        |FROM documents""".stripMargin,

    "mm4_resize_stride" ->
      """SELECT doc_id, CAST(MAX(strlen(text)) AS INT) AS orig_len,
        |       CAST(COUNT(*) AS INT) AS new_len,
        |       md5(string_agg(substr(text, i, 1), '' ORDER BY i)) AS resized_md5
        |FROM (SELECT doc_id, text,
        |             unnest(generate_series(1, strlen(text), 5)) AS i
        |      FROM documents) t
        |GROUP BY doc_id""".stripMargin,

    // mm5: positional byte sums per residue class — ord() of each ASCII
    // char; docs shorter than 8 bytes still produce all 8 (zero) lanes
    // via the residue generate_series. CSV-joined so the comparator can
    // hash the row (lists are unhashable on the harness side).
    "mm5_embed_batch" ->
      """SELECT doc_id, string_agg(CAST(s AS VARCHAR), ',' ORDER BY k) AS feat_csv
        |FROM (
        |  SELECT d.doc_id, g.k,
        |         CAST(COALESCE(SUM(ord(substr(d.text, b.i, 1))), 0) AS BIGINT) AS s
        |  FROM (SELECT doc_id, text FROM documents WHERE strlen(text) >= 1) d
        |  CROSS JOIN generate_series(0, 7) AS g(k)
        |  LEFT JOIN (SELECT doc_id, unnest(generate_series(1, strlen(text))) AS i
        |             FROM documents) b
        |    ON b.doc_id = d.doc_id AND (b.i - 1) % 8 = g.k
        |  GROUP BY d.doc_id, g.k) t
        |GROUP BY doc_id""".stripMargin,

    // ord() of the first char == the first UTF-8 byte for ASCII corpora
    "mm6_modality_route" ->
      """SELECT CASE WHEN b0 BETWEEN 97 AND 102 THEN 'fmt_a'
        |            WHEN b0 BETWEEN 103 AND 109 THEN 'fmt_b'
        |            WHEN b0 BETWEEN 110 AND 115 THEN 'fmt_c'
        |            ELSE 'fmt_d' END AS route,
        |       COUNT(*) AS n,
        |       ROUND(AVG(strlen(text)), 6) AS avg_bytes
        |FROM (SELECT ord(substr(text, 1, 1)) AS b0, text FROM documents) t
        |GROUP BY 1""".stripMargin,

    "mm2_frame_sample" ->
      """SELECT doc_id, CAST(f AS INT) AS frame_id
        |FROM (SELECT doc_id, unnest(generate_series(0, n_frames - 1, 5)) AS f
        |      FROM (SELECT doc_id, CAST(strlen(text) // 100 AS INT) AS n_frames
        |            FROM documents) d
        |      WHERE n_frames >= 1) t""".stripMargin,

    // mm7: stripe sums via mm5's positional-ord machinery, then the
    // signature bit algebra and the bucket self-count
    "mm7_phash_neardup" ->
      """WITH stripes AS (
        |  SELECT d.doc_id, g.k,
        |         CAST(COALESCE(SUM(ord(substr(d.text, b.i, 1))), 0) AS BIGINT) AS s
        |  FROM (SELECT doc_id, text FROM documents WHERE strlen(text) >= 1) d
        |  CROSS JOIN generate_series(0, 7) AS g(k)
        |  LEFT JOIN (SELECT doc_id, unnest(generate_series(1, strlen(text))) AS i
        |             FROM documents) b
        |    ON b.doc_id = d.doc_id AND (b.i - 1) % 8 = g.k
        |  GROUP BY d.doc_id, g.k),
        |tot AS (SELECT doc_id, SUM(s) AS total FROM stripes GROUP BY doc_id),
        |sigs AS (
        |  SELECT s.doc_id,
        |         CAST(SUM(CASE WHEN s.s * 8 > t.total
        |                  THEN CAST(2**s.k AS BIGINT) ELSE 0 END)
        |              AS BIGINT) AS phash
        |  FROM stripes s JOIN tot t USING (doc_id)
        |  GROUP BY s.doc_id),
        |buckets AS (SELECT phash, COUNT(*) AS n_bucket FROM sigs GROUP BY phash)
        |SELECT doc_id, phash, n_bucket FROM sigs JOIN buckets USING (phash)""".stripMargin
  )
}
