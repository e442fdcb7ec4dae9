package graft

import graft.OraclesShared._

/** DuckDB oracle SQL for the QueriesDedup (shingle/minhash/simhash/embedding dedup + ANN)
  * family — one entry per [[SparkEntry.queries]] key owned by that
  * file, kept next to its queries (ContractSpec enforces parity
  * with the Spark side at sbt-test time; [[Oracles]] unions the
  * family maps and rejects duplicate keys).
  */
private[graft] object OraclesDedup {
  /** Queries that provably reproduce another query's output reuse its
    * SQL (q87 = IVF-PQ at nprobe = nlist ≡ q86's flat ADC ranking).
    */
  // q89: the projection VALUES are bit-exact — ±1.0 signs from the
  // shared sha256 rule, and `list_inner_product` accumulates double
  // left-to-right exactly like the codegen DotProduct (verified
  // bit-exact on adversarial mixed-magnitude inputs), so both engines
  // run the identical IEEE op sequence. No decimal casts: double→
  // decimal TIE rounding diverges between engines (Spark rounds the
  // shortest repr, DuckDB the binary expansion) — fixed-order floats
  // are the portable form.
  private val q89Sql: String =
    """WITH r AS (
      |  SELECT j, list(CASE WHEN substring(sha256(CAST(j AS VARCHAR) || ':' || CAST(i AS VARCHAR) || ':42'), 1, 1) < '8'
      |                      THEN 1.0 ELSE -1.0 END ORDER BY i) AS srow
      |  FROM (SELECT CAST(a.j AS INT) AS j, CAST(b.i AS INT) AS i
      |        FROM range(16) a(j), range(64) b(i))
      |  GROUP BY j
      |)
      |SELECT e.vec_id, r.j AS out_dim,
      |       list_inner_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), r.srow) AS proj
      |FROM embeddings e, r
      |ORDER BY vec_id, out_dim""".stripMargin

  // q90: bit-exact mean pooling — chunks ordered by vec_id, summed
  // left-to-right per position (list_sum is sequential, verified like
  // q89's list_inner_product), one final divide by the chunk count.
  private val q90Sql: String =
    """WITH c AS (
      |  SELECT vec_id % 50 AS doc, vec_id,
      |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
      |  FROM embeddings
      |), g AS (
      |  SELECT doc, list(ev ORDER BY vec_id) AS chunks FROM c GROUP BY doc
      |)
      |SELECT doc, CAST(i AS INT) AS pos,
      |       list_sum(list_transform(chunks, e -> e[CAST(i AS INT) + 1])) / len(chunks) AS pooled
      |FROM g, range(64) r(i)
      |ORDER BY doc, pos""".stripMargin

  // q91: τ-calibration histogram — q25's co-occurrence jaccard with
  // floor(20·j) binning; j is one integer division so the binning is
  // the same IEEE sequence in both engines.
  private val q91Sql: String =
    """WITH tok AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks)-2),
      |         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS s
      |       FROM tok WHERE len(toks) >= 3),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      |shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
      |           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |           GROUP BY 1, 2)
      |SELECT CAST(floor(CAST(n_shared AS DOUBLE) / (sa.sz + sb.sz - n_shared) * 20) AS INT) AS bin,
      |       count(*) AS n_pairs
      |FROM shared JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // q99: the planted-copies construction makes the pruned IVF-PQ top-10
  // enumerable in closed form — ten bit-identical-direction copies per
  // query fill every rank, ordered by the id tie-break (see the query's
  // scaladoc for the argument; the empirical score margin is pinned in
  // PqSpec).
  private val q99Sql: String =
    """SELECT CAST(q AS BIGINT) AS query_id, CAST(i + 1 AS INT) AS rank,
      |       CAST(1000000 + q * 100 + i AS BIGINT) AS neighbor_id
      |FROM range(8) a(q), range(10) b(i)
      |ORDER BY query_id, rank""".stripMargin

  /** q183: replay the PORTABLE 16-component MinHash signature (two
    * sha-256 digests per shingle, 8-hex-char chunks, min per
    * component) and the exact shared-shingle Jaccard, then roll the
    * estimator error up by exact-Jaccard decile — the component list
    * is generated, not hand-written, so engine and oracle can't drift.
    */
  private def q183Sql: String = {
    val comps = (0 until 16).map { i =>
      val src = if (i < 8) "h1" else "h2"
      s"min(substring($src, ${1 + 8 * (i % 8)}, 8)) AS m$i"
    }.mkString(",\n|         ")
    val eq = (0 until 16)
      .map(i => s"CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH tok AS (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents),
       |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks)-2),
       |         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS s
       |       FROM tok WHERE len(toks) >= 3),
       |hx AS (SELECT doc_id, sha256(s) AS h1, sha256('x' || s) AS h2 FROM sh),
       |sig AS (
       |  SELECT doc_id,
       |         $comps
       |  FROM hx GROUP BY doc_id),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
       |shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
       |           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |           GROUP BY 1, 2),
       |pairs AS (
       |  SELECT id_a, id_b,
       |         CAST(n_shared AS DOUBLE) / (sa.sz + sb.sz - n_shared) AS jaccard
       |  FROM shared JOIN sizes sa ON sa.doc_id = id_a
       |              JOIN sizes sb ON sb.doc_id = id_b),
       |est AS (
       |  SELECT p.jaccard, ($eq) / 16.0 AS est
       |  FROM pairs p JOIN sig a ON a.doc_id = p.id_a JOIN sig b ON b.doc_id = p.id_b),
       |terms AS (
       |  SELECT CAST(floor(jaccard * 10) AS BIGINT) AS decile,
       |         CAST(jaccard AS DECIMAL(18,12)) AS j,
       |         CAST(est AS DECIMAL(18,12)) AS e,
       |         CAST(abs(est - jaccard) AS DECIMAL(18,12)) AS ae
       |  FROM est)
       |SELECT decile, CAST(count(*) AS BIGINT) AS n_pairs,
       |       round(CAST(sum(j) AS DOUBLE) / count(*), 6) AS mean_exact,
       |       round(CAST(sum(e) AS DOUBLE) / count(*), 6) AS mean_est,
       |       round(CAST(sum(ae) AS DOUBLE) / count(*), 6) AS mean_abs_err
       |FROM terms GROUP BY decile ORDER BY decile""".stripMargin
  }

  /** q192: PQ recall@10 — the shared ADC `scored` ranking intersected
    * with the exact cosine ranking of the same 8 audit queries.
    */
  private def q192Sql: String =
    pqAdcCte + """,
      |pq AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT query_id, neighbor_id,
      |           row_number() OVER (PARTITION BY query_id
      |             ORDER BY score DESC, neighbor_id) AS rn
      |    FROM scored)
      |  WHERE rn <= 10),
      |ex AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
      |           row_number() OVER (PARTITION BY a.vec_id
      |             ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id) AS rn
      |    FROM embeddings a JOIN embeddings b ON a.vec_id < 8 AND b.vec_id != a.vec_id)
      |  WHERE rn <= 10)
      |SELECT ex.query_id,
      |       CAST(count(*) AS BIGINT) AS k,
      |       CAST(count(pq.neighbor_id) AS BIGINT) AS hits,
      |       round(CAST(count(pq.neighbor_id) AS DOUBLE) / count(*), 6) AS recall
      |FROM ex LEFT JOIN pq ON pq.query_id = ex.query_id AND pq.neighbor_id = ex.neighbor_id
      |GROUP BY ex.query_id ORDER BY ex.query_id""".stripMargin

  /** q199: RRF(60) of the exact and ADC rankings — ranks from the
    * shared CTEs, full-outer fused, two-term IEEE sum.
    */
  private def q199Sql: String =
    pqAdcCte + """,
      |pqr AS (
      |  SELECT query_id, neighbor_id, rn AS r_pq FROM (
      |    SELECT query_id, neighbor_id,
      |           row_number() OVER (PARTITION BY query_id
      |             ORDER BY score DESC, neighbor_id) AS rn
      |    FROM scored)
      |  WHERE rn <= 10),
      |exr AS (
      |  SELECT query_id, neighbor_id, rn AS r_exact FROM (
      |    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
      |           row_number() OVER (PARTITION BY a.vec_id
      |             ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id) AS rn
      |    FROM embeddings a JOIN embeddings b ON a.vec_id < 8 AND b.vec_id != a.vec_id)
      |  WHERE rn <= 10),
      |fused AS (
      |  SELECT COALESCE(exr.query_id, pqr.query_id) AS query_id,
      |         COALESCE(exr.neighbor_id, pqr.neighbor_id) AS neighbor_id,
      |         COALESCE(CAST(1.0 AS DOUBLE) / (60 + r_exact), CAST(0.0 AS DOUBLE))
      |           + COALESCE(CAST(1.0 AS DOUBLE) / (60 + r_pq), CAST(0.0 AS DOUBLE)) AS rrf
      |  FROM exr FULL JOIN pqr
      |    ON exr.query_id = pqr.query_id AND exr.neighbor_id = pqr.neighbor_id)
      |SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id, round(rrf, 6) AS rrf
      |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
      |        ORDER BY rrf DESC, neighbor_id) AS rn FROM fused)
      |WHERE rn <= 10 ORDER BY query_id, rank""".stripMargin

  private val primary: Map[String, String] = Map(
    "q25_ngram_jaccard_pairs" ->
      """WITH tok AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks)-2),
        |         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS s
        |       FROM tok WHERE len(toks) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
        |           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |           GROUP BY 1, 2)
        |SELECT id_a, id_b, n_shared,
        |       CAST(n_shared AS DOUBLE) / (sa.sz + sb.sz - n_shared) AS jaccard
        |FROM shared JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
        |WHERE CAST(n_shared AS DOUBLE) / (sa.sz + sb.sz - n_shared) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    "q38_dedup_clusters" ->
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
        |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u)
        |SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
        |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin,
    "q47_dedup_pipeline" ->
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
        |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u)
        |SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
        |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin,
    "q39_dedup_keep_one" ->
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
        |comp AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id FROM reach GROUP BY src)
        |SELECT cluster_id, doc_id AS kept_doc_id FROM (
        |  SELECT c.cluster_id, c.doc_id,
        |         row_number() OVER (PARTITION BY c.cluster_id ORDER BY d.n_chars DESC, c.doc_id) AS rn
        |  FROM comp c JOIN documents d ON d.doc_id = c.doc_id)
        |WHERE rn = 1 ORDER BY cluster_id""".stripMargin,
    "q48_incremental_dedup" ->
      """WITH tok AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks)-2),
        |         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS s
        |       FROM tok WHERE len(toks) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
        |           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |           GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |       CAST(n_shared AS DOUBLE) / (sa.sz + sb.sz - n_shared) AS jaccard
        |FROM shared JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
        |WHERE CAST(n_shared AS DOUBLE) / (sa.sz + sb.sz - n_shared) >= 0.5
        |  AND (id_a % 10 = 0 OR id_b % 10 = 0)
        |ORDER BY id_a, id_b""".stripMargin,
    "q26_minhash_lsh_pairs" ->
      """WITH tok AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks)-2),
        |         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS s
        |       FROM tok WHERE len(toks) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
        |           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |           GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |       CAST(n_shared AS DOUBLE) / (sa.sz + sb.sz - n_shared) AS jaccard
        |FROM shared JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
        |WHERE CAST(n_shared AS DOUBLE) / (sa.sz + sb.sz - n_shared) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    "q27_simhash" -> (simhashSigSql + " ORDER BY doc_id"),
    "q28_simhash_pairs" ->
      s"""WITH sigs AS ($simhashSigSql)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(list_sum(list_transform(range(64), i ->
        |         CASE WHEN substring(a.sig, i+1, 1) = substring(b.sig, i+1, 1) THEN 0 ELSE 1 END)) AS INT) AS hamming
        |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
        |WHERE CAST(list_sum(list_transform(range(64), i ->
        |         CASE WHEN substring(a.sig, i+1, 1) = substring(b.sig, i+1, 1) THEN 0 ELSE 1 END)) AS INT) <= 3
        |ORDER BY id_a, id_b""".stripMargin,
    "q29_embedding_cosine_pairs" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
        |ORDER BY id_a, id_b""".stripMargin,
    "q30_ann_topk" ->
      """SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id FROM (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |         row_number() OVER (PARTITION BY a.vec_id
        |           ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id) AS rn
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < 10 AND b.vec_id != a.vec_id)
        |WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin,
    // q31's contract: the multi-table LSH path must reproduce the EXACT
    // brute-force top-k (its per-neighbor miss probability at the pinned
    // seed/params is ≪ 1e-5 and equality is asserted in DedupSpec), so
    // the brute-force SQL is its oracle too.
    "q31_ann_lsh_topk" ->
      """SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id FROM (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |         row_number() OVER (PARTITION BY a.vec_id
        |           ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id) AS rn
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < 10 AND b.vec_id != a.vec_id)
        |WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin,
    // q121: the same brute-force rank, constrained to label-equal
    // neighbors — the metadata-filtered retrieval contract
    "q121_ann_filtered" ->
      """SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id FROM (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |         row_number() OVER (PARTITION BY a.vec_id
        |           ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id) AS rn
        |  FROM embeddings a JOIN embeddings b
        |    ON a.vec_id < 10 AND b.vec_id != a.vec_id AND b.label = a.label)
        |WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin,
    // q79: the Spark side is APPROXIMATE (hyperplane LSH) but provably
    // exact on this corpus — planted duplicates are scaled copies, and
    // scaling preserves every bucket sign (see the query's scaladoc) —
    // so the exact all-pairs SQL is a true oracle, not a rows-only check
    "q79_semantic_dedup_approx" ->
      """WITH dups AS (
        |  SELECT vec_id + 1000000 AS vec_id,
        |         list_transform(embedding, x -> CAST(x * 0.5 AS FLOAT)) AS embedding
        |  FROM embeddings WHERE vec_id % 50 = 0),
        |corpus AS (SELECT vec_id, embedding FROM embeddings UNION ALL SELECT * FROM dups)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,
    // q86/q87: a fully independent PQ oracle — because the codebook is
    // the deterministic sha256-rank sample (same cross-engine trick as
    // q59's sampler), DuckDB can rebuild codebook → codes → snapped
    // corpus from `embeddings` alone and brute-force the top-10 the
    // ADC scan must reproduce. Parameters mirror the Spark query:
    // m=8 subspaces × dsub=8 dims, ksub=16 centroids, seed 42, k=10,
    // queries vec_id < 8. Ranking is by score only (values withheld:
    // engines differ in float accumulation; observed score gaps ≫
    // float error, same argument as q29/q30). q87 (IVF-PQ) runs at
    // nprobe = nlist, where the probed cells cover the whole corpus
    // and each row exactly once — identical ADC ranking, same oracle.
    "q86_ann_pq_topk" ->
      (pqAdcCte + """
        |SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |         row_number() OVER (PARTITION BY query_id
        |           ORDER BY score DESC, neighbor_id) AS rn
        |  FROM scored)
        |WHERE rn <= 10 ORDER BY query_id, rank""".stripMargin),
"q89_random_projection" -> q89Sql,
"q90_mean_pooling" -> q90Sql,
"q91_similarity_histogram" -> q91Sql,
"q99_ann_ivfpq_pruned" -> q99Sql,
// q165: near-dup cluster-size histogram incl. singletons
"q165_cluster_size_histogram" -> (nearDupClosureCte +
        """,
          |csz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS size
          |        FROM comp GROUP BY cluster_id),
          |hist AS (
          |  SELECT size, CAST(count(*) AS BIGINT) AS n_clusters FROM csz GROUP BY size
          |  UNION ALL
          |  SELECT CAST(1 AS BIGINT), CAST(count(*) AS BIGINT)
          |  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
          |  WHERE c.doc_id IS NULL)
          |SELECT size, n_clusters, size * n_clusters AS n_docs
          |FROM hist WHERE n_clusters > 0 ORDER BY size""".stripMargin),
// q179: directed near-containment pairs — q25's shared-shingle
// join, both directions, normalized by the contained side's size
"q179_containment_pairs" ->
        """WITH tok AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
          |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks)-2),
          |         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS s
          |       FROM tok WHERE len(toks) >= 3),
          |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
          |shared AS (SELECT a.doc_id AS lo, b.doc_id AS hi, CAST(count(*) AS BIGINT) AS n_shared
          |           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          |           GROUP BY 1, 2),
          |directed AS (
          |  SELECT lo AS id_a, hi AS id_b, n_shared FROM shared
          |  UNION ALL
          |  SELECT hi AS id_a, lo AS id_b, n_shared FROM shared)
          |SELECT id_a, id_b, n_shared, sa.sz AS size_a,
          |       CAST(n_shared AS DOUBLE) / sa.sz AS containment
          |FROM directed JOIN sizes sa ON sa.doc_id = id_a
          |WHERE CAST(n_shared AS DOUBLE) / sa.sz >= 0.8
          |ORDER BY id_a, id_b""".stripMargin,
// q205: mergeable quantile ledger — the oracle pins the exact
// rank-selected quantiles and expects the bound flags to be 1
// q206: the 32x2 banding S-curve — explicit squaring chain, no
// pow/exp (libm last-bit divergence), zero data
"q206_lsh_curve" ->
        """WITH g AS (SELECT CAST(i * 5 AS BIGINT) AS pct FROM range(1, 20) t(i)),
          |c AS (
          |  SELECT pct,
          |         (1.0 - (pct / 100.0) * (pct / 100.0)) AS m
          |  FROM g),
          |p AS (
          |  SELECT pct,
          |         ((((m*m)*(m*m)) * ((m*m)*(m*m))) * (((m*m)*(m*m)) * ((m*m)*(m*m))))
          |         * (((((m*m)*(m*m)) * ((m*m)*(m*m))) * (((m*m)*(m*m)) * ((m*m)*(m*m))))) AS m32
          |  FROM c)
          |SELECT pct, round(CAST(1.0 AS DOUBLE) - m32, 6) AS p_candidate
          |FROM p ORDER BY pct""".stripMargin,
"q183_minhash_calibration" -> q183Sql,
"q192_pq_recall" -> q192Sql,
"q199_rrf_fusion" -> q199Sql,
// q195: mean simhash hamming per exact-Jaccard decile — the
// shared portable signature (q27) against the q25 candidates
"q195_simhash_calibration" ->
        s"""WITH sigs AS ($simhashSigSql),
           |tok AS (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents),
           |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks)-2),
           |         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS s
           |       FROM tok WHERE len(toks) >= 3),
           |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
           |shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
           |           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           |           GROUP BY 1, 2),
           |pairs AS (
           |  SELECT id_a, id_b,
           |         CAST(n_shared AS DOUBLE) / (sa.sz + sb.sz - n_shared) AS jaccard
           |  FROM shared JOIN sizes sa ON sa.doc_id = id_a
           |              JOIN sizes sb ON sb.doc_id = id_b),
           |terms AS (
           |  SELECT CAST(floor(jaccard * 10) AS BIGINT) AS decile,
           |         CAST(jaccard AS DECIMAL(18,12)) AS j,
           |         CAST(list_sum(list_transform(range(64), i ->
           |           CASE WHEN substring(a.sig, i+1, 1) = substring(b.sig, i+1, 1)
           |                THEN 0 ELSE 1 END)) AS BIGINT) AS h
           |  FROM pairs JOIN sigs a ON a.doc_id = id_a JOIN sigs b ON b.doc_id = id_b)
           |SELECT decile, CAST(count(*) AS BIGINT) AS n_pairs,
           |       round(CAST(sum(j) AS DOUBLE) / count(*), 6) AS mean_exact,
           |       round(CAST(sum(h) AS DOUBLE) / count(*), 6) AS mean_hamming
           |FROM terms GROUP BY decile ORDER BY decile""".stripMargin,
// q213: 3 integer-grid PageRank rounds over the q25 pair graph —
// floor division on non-negative longs at every step, so the
// replay is integer-exact (no float accumulation anywhere)
"q213_dup_graph_centrality" ->
      """WITH tok AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks)-2),
        |         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS s
        |       FROM tok WHERE len(toks) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
        |           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |           GROUP BY 1, 2),
        |pairs AS (SELECT id_a, id_b FROM shared
        |          JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
        |          WHERE CAST(n_shared AS DOUBLE) / (sa.sz + sb.sz - n_shared) >= 0.5),
        |edges AS (SELECT id_a AS u, id_b AS v FROM pairs UNION ALL SELECT id_b, id_a FROM pairs),
        |deg AS (SELECT u, count(*) AS d FROM edges GROUP BY u),
        |n AS (SELECT count(*) AS c FROM deg),
        |s0 AS (SELECT u, CAST(1000000 // c AS BIGINT) AS s FROM deg, n),
        |s1 AS (SELECT e.v AS u,
        |         CAST((SELECT (1000000 * 15) // (100 * c) FROM n)
        |              + sum((s0.s * 85) // (100 * deg.d)) AS BIGINT) AS s
        |       FROM edges e JOIN s0 ON s0.u = e.u JOIN deg ON deg.u = e.u GROUP BY e.v),
        |s2 AS (SELECT e.v AS u,
        |         CAST((SELECT (1000000 * 15) // (100 * c) FROM n)
        |              + sum((s1.s * 85) // (100 * deg.d)) AS BIGINT) AS s
        |       FROM edges e JOIN s1 ON s1.u = e.u JOIN deg ON deg.u = e.u GROUP BY e.v),
        |s3 AS (SELECT e.v AS u,
        |         CAST((SELECT (1000000 * 15) // (100 * c) FROM n)
        |              + sum((s2.s * 85) // (100 * deg.d)) AS BIGINT) AS s
        |       FROM edges e JOIN s2 ON s2.u = e.u JOIN deg ON deg.u = e.u GROUP BY e.v)
        |SELECT u AS doc_id, s AS score FROM s3 ORDER BY doc_id""".stripMargin
  )

  /** Queries whose CONTRACT is exact equality with an already-
    * oracled query reuse that query's SQL verbatim. */
  val sql: Map[String, String] = primary ++ Map(
    "q53_star_clusters" -> primary("q38_dedup_clusters"),
    // q214: cap + closure replayed verbatim — n_shared is an exact
    // integer, so the per-node top-k rank is cross-engine deterministic
    "q214_capped_clusters" ->
      """WITH RECURSIVE
        |tok AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks)-2),
        |         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS s
        |       FROM tok WHERE len(toks) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
        |           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |           GROUP BY 1, 2),
        |pairs AS (SELECT id_a, id_b, n_shared
        |          FROM shared JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
        |          WHERE CAST(n_shared AS DOUBLE) / (sa.sz + sb.sz - n_shared) >= 0.5),
        |sym AS (SELECT id_a AS u, id_b AS v, n_shared FROM pairs
        |        UNION ALL SELECT id_b, id_a, n_shared FROM pairs),
        |kept AS (SELECT least(u, v) AS id_a, greatest(u, v) AS id_b FROM (
        |           SELECT u, v, row_number() OVER (PARTITION BY u ORDER BY n_shared DESC, v) AS r
        |           FROM sym)
        |         WHERE r <= 2 GROUP BY 1, 2),
        |edges AS (SELECT id_a AS u, id_b AS v FROM kept UNION SELECT id_b, id_a FROM kept),
        |reach(src, dst) AS (
        |  SELECT u, v FROM edges
        |  UNION
        |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u)
        |SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
        |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin,
    "q54_indexed_dedup" -> primary("q48_incremental_dedup"),
    "q57_ann_ivf_topk" -> primary("q30_ann_topk"),
    // filtered ANN: IVF at nprobe=nlist and the persisted
    // partitionBy(label, cell) probe are EXACTLY the filtered brute
    // force (the q57/q61 endpoint contract), so q121's SQL gates both
    "q123_ann_filtered_ivf" -> primary("q121_ann_filtered"),
    "q124_ann_filtered_indexed" -> primary("q121_ann_filtered"),
"q87_ann_ivfpq_topk" -> primary("q86_ann_pq_topk")
  )
}
