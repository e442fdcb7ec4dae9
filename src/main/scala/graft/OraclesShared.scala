package graft

import graft.functions.TextFunctions

/** SQL fragments shared across the per-family oracle files. */
private[graft] object OraclesShared {


  /** Spark ML's default English stop words, escaped as a SQL IN-list —
    * built from the same constant the Spark side uses so the two can
    * never drift. */
  val stopwordsSqlList: String =
    TextFunctions.englishStopWords
      .map(w => "'" + w.replace("'", "''") + "'")
      .mkString(", ")

  /** DuckDB form of [[TextFunctions.cleanText]]. */
  val cleanedSql: String =
    "regexp_replace(regexp_replace(regexp_replace(lower(text), '^rt ', ''), " +
      "'(https?://)\\S+', '', 'g'), '[^a-z0-9\\s]', '', 'g')"


  /** DuckDB mirror of [[graft.operators.Dedup.simhash64]] over 3-gram
    * shingles of the documents table. */
  val simhashSigSql: String =
    """WITH tok AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
      |sh AS (SELECT doc_id, list_distinct(list_transform(range(len(toks)-2),
      |         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS ss
      |       FROM tok WHERE len(toks) >= 3),
      |hx AS (SELECT doc_id, list_transform(ss, t -> substring(sha256(t), 1, 16)) AS hexes FROM sh)
      |SELECT doc_id, array_to_string(list_transform(range(64), j ->
      |  CASE WHEN list_sum(list_transform(hexes, h ->
      |    2 * ((CAST(instr('0123456789abcdef', substring(h, CAST(floor(j/4) AS INT)+1, 1)) AS INT) - 1)
      |         // CAST(pow(2, 3 - (j % 4)) AS INT) % 2) - 1)) > 0
      |  THEN '1' ELSE '0' END), '') AS sig
      |FROM hx""".stripMargin

  /** Shared PQ CTE chain (train → encode → snap → ADC scores): `scored`
    * is (query_id, neighbor_id, score) for the 8 audit queries. Used by
    * q86/q87 (rank output) and q192 (recall vs the exact ranking).
    */
  def pqAdcCte: String =
      """WITH dv AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
        |  FROM embeddings
        |), nv AS (
        |  SELECT vec_id,
        |         list_transform(ev, x -> x / sqrt(list_inner_product(ev, ev))) AS vn
        |  FROM dv
        |), sub AS (
        |  SELECT vec_id, CAST(j AS INT) AS j, vn[j*8+1 : j*8+8] AS sv,
        |         sha256(CAST(vec_id AS VARCHAR) || ':' || CAST(j AS VARCHAR) || ':42') AS hk
        |  FROM nv, range(8) r(j)
        |), cent AS (
        |  SELECT j, rn - 1 AS c, sv FROM (
        |    SELECT j, sv, row_number() OVER (PARTITION BY j ORDER BY hk, vec_id) AS rn
        |    FROM sub)
        |  WHERE rn <= 16
        |), enc AS (
        |  -- rank by the SQUARED distance, summed left-to-right exactly
        |  -- like PqEncode's `d += diff*diff` loop — list_distance takes
        |  -- a sqrt that can collapse two strictly-ordered squared
        |  -- distances into equal doubles, flipping the tie-break
        |  SELECT vec_id, j, c FROM (
        |    SELECT s.vec_id, s.j, ct.c,
        |           row_number() OVER (PARTITION BY s.vec_id, s.j
        |             ORDER BY ((s.sv[1]-ct.sv[1])*(s.sv[1]-ct.sv[1])
        |                     + (s.sv[2]-ct.sv[2])*(s.sv[2]-ct.sv[2])
        |                     + (s.sv[3]-ct.sv[3])*(s.sv[3]-ct.sv[3])
        |                     + (s.sv[4]-ct.sv[4])*(s.sv[4]-ct.sv[4])
        |                     + (s.sv[5]-ct.sv[5])*(s.sv[5]-ct.sv[5])
        |                     + (s.sv[6]-ct.sv[6])*(s.sv[6]-ct.sv[6])
        |                     + (s.sv[7]-ct.sv[7])*(s.sv[7]-ct.sv[7])
        |                     + (s.sv[8]-ct.sv[8])*(s.sv[8]-ct.sv[8])), ct.c) AS rn
        |    FROM sub s JOIN cent ct ON ct.j = s.j)
        |  WHERE rn = 1
        |), snap AS (
        |  SELECT e.vec_id, flatten(list(ct.sv ORDER BY e.j)) AS sv
        |  FROM enc e JOIN cent ct ON ct.j = e.j AND ct.c = e.c
        |  GROUP BY e.vec_id
        |), q AS (
        |  SELECT vec_id AS query_id, vn AS qn FROM nv WHERE vec_id < 8
        |), scored AS (
        |  SELECT q.query_id, s.vec_id AS neighbor_id,
        |         list_inner_product(q.qn, s.sv) AS score
        |  FROM q CROSS JOIN snap s
        |  WHERE s.vec_id <> q.query_id
        |)""".stripMargin

  /** Shared near-dup closure CTE (the q38/q39/q47 machinery): distinct
    * 3-gram shingles → Jaccard ≥ 0.5 pairs → recursive reachability →
    * `comp` = (doc_id, cluster_id) for every clustered doc. Reused by
    * the q164 mixture shift and the q165 size histogram.
    */
  def nearDupClosureCte: String =
    """WITH RECURSIVE
      |tok AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks)-2),
      |         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS s
      |       FROM tok WHERE len(toks) >= 3),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      |shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
      |           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |           GROUP BY 1, 2),
      |pairs AS (SELECT id_a, id_b
      |          FROM shared JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
      |          WHERE CAST(n_shared AS DOUBLE) / (sa.sz + sb.sz - n_shared) >= 0.5),
      |edges AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
      |reach(src, dst) AS (
      |  SELECT u, v FROM edges
      |  UNION
      |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),
      |comp AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
      |         FROM reach GROUP BY src)""".stripMargin

  /** Shared k-means CTE (k = 8, two assignment passes, one exact
    * integer-sum centroid update): `a2` is the final (vec_id, cluster)
    * assignment. Mirrors [[graft.operators.Clustering.kmeans]]
    * step-for-step; see the q138 comment for the exactness argument.
    */
  def kmeansCte: String = kmeansCteK(8)

  /** [[kmeansCte]] at an arbitrary k — q215 replays the LARGE-k
    * (distributed broadcast-model) engine path, which dispatches past
    * `Clustering.joinAssignThreshold`, against the identical
    * relational recipe; only the seed LIMIT differs from the k=8 CTE.
    */
  def kmeansCteK(k: Int): String =
    s"""WITH v AS (
      |  SELECT vec_id,
      |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS vq
      |  FROM embeddings),
      |vd AS (SELECT vec_id, vq, list_transform(vq, x -> CAST(x AS DOUBLE)) AS dv FROM v),
      |init AS (
      |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, dv AS cent
      |  FROM vd ORDER BY vec_id LIMIT $k),
      |a1 AS (
      |  SELECT vec_id, cluster FROM (
      |    SELECT vd.vec_id, i.cluster,
      |           row_number() OVER (PARTITION BY vd.vec_id
      |             ORDER BY list_inner_product(vd.dv, vd.dv)
      |                      - 2 * list_inner_product(vd.dv, i.cent)
      |                      + list_inner_product(i.cent, i.cent), i.cluster) AS rn
      |    FROM vd CROSS JOIN init i) WHERE rn = 1),
      |comp1 AS (
      |  SELECT a1.cluster, generate_subscripts(vd.vq, 1) AS pos, unnest(vd.vq) AS val
      |  FROM vd JOIN a1 USING (vec_id)),
      |c1 AS (
      |  SELECT cluster, list(comp ORDER BY pos) AS cent FROM (
      |    SELECT cluster, pos, CAST(sum(val) AS DOUBLE) / count(*) AS comp
      |    FROM comp1 GROUP BY cluster, pos) GROUP BY cluster),
      |a2 AS (
      |  SELECT vec_id, cluster FROM (
      |    SELECT vd.vec_id, c.cluster,
      |           row_number() OVER (PARTITION BY vd.vec_id
      |             ORDER BY list_inner_product(vd.dv, vd.dv)
      |                      - 2 * list_inner_product(vd.dv, c.cent)
      |                      + list_inner_product(c.cent, c.cent), c.cluster) AS rn
      |    FROM vd CROSS JOIN c1 c) WHERE rn = 1)""".stripMargin
}
