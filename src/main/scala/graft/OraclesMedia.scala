package graft

import graft.OraclesShared._

/** DuckDB oracle SQL for the QueriesMedia (multimodal stats, pHash, frame-sampled dedup)
  * family — one entry per [[SparkEntry.queries]] key owned by that
  * file, kept next to its queries (ContractSpec enforces parity
  * with the Spark side at sbt-test time; [[Oracles]] unions the
  * family maps and rejects duplicate keys).
  */
private[graft] object OraclesMedia {
  private val primary: Map[String, String] = Map(
    "q40_media_stats" ->
      """SELECT doc_id AS media_id,
        |       CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        |            WHEN doc_id % 3 = 1 THEN 'audio/wav'
        |            ELSE 'video/mp4' END AS mime,
        |       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |       sha256(text) AS content_key,
        |       CAST(n_chars % 2048 AS INT) * CAST((doc_id % 1080) + 1 AS INT) AS n_pixels,
        |       CASE WHEN n_chars % 2048 >= 1920 THEN 'hd'
        |            WHEN n_chars % 2048 >= 640 THEN 'sd'
        |            ELSE 'thumb' END AS res_bucket
        |FROM documents ORDER BY media_id""".stripMargin,
    "q41_frame_sample" ->
      """SELECT doc_id AS media_id, unnest(range(0, n_chars * 7 + 1, 500)) AS frame_ms
        |FROM documents
        |WHERE doc_id % 3 = 2 AND n_chars * 7 > 0
        |ORDER BY media_id, frame_ms""".stripMargin,
    // q51/q52: the whole pHash pipeline recomputed in SQL — stub
    // features are sha256 hex digits (integer-valued doubles, so the
    // mean comparison is float-order-exact), bits are the >= mean rule.
    "q51_phash_media" ->
      """WITH h AS (SELECT doc_id AS media_id, sha256(text) AS hx FROM documents),
        |f AS (SELECT media_id, list_transform(range(64), j ->
        |        CAST(instr('0123456789abcdef', substring(hx, CAST(j+1 AS INT), 1)) - 1 AS DOUBLE)) AS fv FROM h)
        |SELECT media_id, array_to_string(list_transform(range(64), j ->
        |  CASE WHEN fv[CAST(j+1 AS INT)] >= list_sum(fv)/64 THEN '1' ELSE '0' END), '') AS phash
        |FROM f ORDER BY media_id""".stripMargin,
    "q52_phash_pairs" ->
      """WITH m AS (SELECT d.doc_id AS media_id, r.text AS txt
        |           FROM documents d JOIN documents r ON r.doc_id = d.doc_id - d.doc_id % 5),
        |h AS (SELECT media_id, sha256(txt) AS hx FROM m),
        |f AS (SELECT media_id, list_transform(range(64), j ->
        |        CAST(instr('0123456789abcdef', substring(hx, CAST(j+1 AS INT), 1)) - 1 AS DOUBLE)) AS fv FROM h),
        |p AS (SELECT media_id, list_transform(range(64), j ->
        |        CASE WHEN fv[CAST(j+1 AS INT)] >= list_sum(fv)/64 THEN 1 ELSE 0 END) AS bits FROM f)
        |SELECT id_a, id_b, hamming FROM (
        |  SELECT a.media_id AS id_a, b.media_id AS id_b,
        |         CAST(len(list_filter(range(64), j ->
        |           a.bits[CAST(j+1 AS INT)] <> b.bits[CAST(j+1 AS INT)])) AS INT) AS hamming
        |  FROM p a JOIN p b ON a.media_id < b.media_id)
        |WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin,
    // q209: frame-sampled video dedup — the whole pipeline brute-forced:
    // per-frame stub features from sha256(payload || '|' || frame_ms),
    // the q51 bit rule, ALL aligned frame pairs at hamming <= 3, then
    // the matched-share rollup. frame_share is one IEEE division (no
    // rounding) so the >= 0.8 gate agrees bit-for-bit across engines.
    "q209_frame_dedup" ->
      """WITH m AS (SELECT d.doc_id AS media_id, r.text AS txt, r.n_chars
        |           FROM documents d JOIN documents r ON r.doc_id = d.doc_id - d.doc_id % 5),
        |fr AS (SELECT media_id, txt,
        |              CAST(unnest(range(0, CAST(n_chars AS BIGINT) * 7 + 1, 500)) AS BIGINT) AS frame_ms
        |       FROM m),
        |h AS (SELECT media_id, frame_ms, sha256(txt || '|' || CAST(frame_ms AS VARCHAR)) AS hx FROM fr),
        |f AS (SELECT media_id, frame_ms, list_transform(range(64), j ->
        |        CAST(instr('0123456789abcdef', substring(hx, CAST(j+1 AS INT), 1)) - 1 AS DOUBLE)) AS fv FROM h),
        |p AS (SELECT media_id, frame_ms, list_transform(range(64), j ->
        |        CASE WHEN fv[CAST(j+1 AS INT)] >= list_sum(fv)/64 THEN 1 ELSE 0 END) AS bits FROM f),
        |mp AS (
        |  SELECT a.media_id AS id_a, b.media_id AS id_b, count(*) AS matched_frames
        |  FROM p a JOIN p b ON a.frame_ms = b.frame_ms AND a.media_id < b.media_id
        |  WHERE len(list_filter(range(64), j -> a.bits[CAST(j+1 AS INT)] <> b.bits[CAST(j+1 AS INT)])) <= 3
        |  GROUP BY 1, 2),
        |nf AS (SELECT media_id, CAST(count(*) AS BIGINT) AS n_frames FROM fr GROUP BY 1)
        |SELECT id_a, id_b, na.n_frames AS n_frames_a, nb.n_frames AS n_frames_b,
        |       CAST(matched_frames AS BIGINT) AS matched_frames,
        |       CAST(matched_frames AS DOUBLE) / greatest(na.n_frames, nb.n_frames) AS frame_share
        |FROM mp JOIN nf na ON na.media_id = id_a JOIN nf nb ON nb.media_id = id_b
        |WHERE CAST(matched_frames AS DOUBLE) / greatest(na.n_frames, nb.n_frames) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin
  )

  /** Queries whose CONTRACT is exact equality with an already-
    * oracled query reuse that query's SQL verbatim. */
  val sql: Map[String, String] = primary ++ Map(
    "q56_phash_pairs_collapsed" -> primary("q52_phash_pairs"),
    // q210: collapse-first frame dedup — EXACT-equality contract with
    // q209 (identical payload ⇒ identical per-frame signatures, so the
    // member expansion reproduces the direct form's rows bit-for-bit)
    "q210_frame_dedup_collapsed" -> primary("q209_frame_dedup")
  )
}
