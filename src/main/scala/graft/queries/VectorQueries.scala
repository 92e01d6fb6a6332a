package graft.queries

import graft.{Q, Tables}
import graft.functions.GraftFunctions._
import graft.operators.Similarity
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector similarity + multimodal surface over embeddings/documents
  * (SURVEY.md B29, B43, B44): norms, brute-force ANN, LSH-bucketed ANN,
  * cosine near-dup pairs, multimodal joins and binary-column plumbing.
  */
object VectorQueries {

  /** DuckDB fragment: embeddings unnested to (vec_id, i, v) positions. */
  private val OPOS =
    """e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
      |             CAST(unnest(embedding) AS DOUBLE) AS v
      |      FROM embeddings)""".stripMargin

  val qs: Seq[Q] = Seq(
    // B29/B43: per-vector norms and means.
    Q(
      "q60_vector_norms",
      (s, dir) => {
        val v = asDouble(col("embedding"))
        Tables.embeddings(s, dir)
          .select(
            col("vec_id"), col("label"),
            size(col("embedding")).as("dim"),
            round(l2norm(v), 6).as("nrm"),
            round(aggregate(v, lit(0.0), (a, x) => a + x) / size(col("embedding")), 6).as("mean"))
          .orderBy("vec_id")
      },
      Some(s"""
        WITH $OPOS
        SELECT vec_id, ANY_VALUE(label) AS label, CAST(COUNT(*) AS INT) AS dim,
               round(sqrt(SUM(v * v)), 6) AS nrm,
               round(SUM(v) / COUNT(*), 6) AS mean
        FROM e JOIN embeddings USING (vec_id)
        GROUP BY vec_id
        ORDER BY vec_id""")),

    // B43: brute-force top-k cosine — the exact baseline (broadcast the
    // query set, stream candidates once).
    Q(
      "q61_ann_bruteforce",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val queries = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qvec"))
        val candidates = emb.select(col("vec_id"), asDouble(col("embedding")).as("vec"))
        Similarity.topKCosine(queries, candidates, 5)
          .orderBy("qid", "rank")
      },
      Some(s"""
        WITH $OPOS,
        nrm AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM e GROUP BY 1),
        q AS (SELECT * FROM e WHERE vec_id < 10),
        dots AS (SELECT q.vec_id AS qid, c.vec_id AS vid, SUM(q.v * c.v) AS d
                 FROM q JOIN e c ON q.i = c.i AND q.vec_id <> c.vec_id
                 GROUP BY 1, 2),
        cos AS (SELECT qid, vid, round(d / (nq.nrm * nv.nrm), 6) AS cos_r
                FROM dots
                JOIN nrm nq ON nq.vec_id = qid
                JOIN nrm nv ON nv.vec_id = vid),
        rk AS (SELECT qid, vid, cos_r,
                      CAST(row_number() OVER (PARTITION BY qid ORDER BY cos_r DESC, vid) AS INT) AS rank
               FROM cos)
        SELECT qid, rank, vid AS neighbor, cos_r
        FROM rk WHERE rank <= 5
        ORDER BY qid, rank""")),

    // B43: LSH-bucketed ANN — the scale path (bucket-equi join instead of
    // a cross join; deterministic md5-derived hyperplanes shared with the
    // oracle as inline constants).
    Q(
      "q62_ann_lsh",
      (s, dir) => {
        val planes = Similarity.hyperplanes(4, 64)
        val emb = Tables.embeddings(s, dir)
        val queries = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qvec"))
        val candidates = emb.select(col("vec_id"), asDouble(col("embedding")).as("vec"))
        Similarity.topKCosineLsh(queries, candidates, planes, 3)
          .orderBy("qid", "rank")
      },
      Some {
        val planes = Similarity.hyperplanes(4, 64)
        val values = (for {
          p <- 0 until 4
          d <- 0 until 64
        } yield f"($p, ${d + 1}, ${planes(p)(d)}%.3f)").mkString(", ")
        s"""
        WITH $OPOS,
        w(p, i, wt) AS (SELECT * FROM (VALUES $values) t(p, i, wt)),
        sig AS (SELECT vec_id, CAST(SUM(CASE WHEN s > 0 THEN (1 << p) ELSE 0 END) AS INT) AS bucket
                FROM (SELECT e.vec_id, w.p, SUM(e.v * CAST(w.wt AS DOUBLE)) AS s
                      FROM e JOIN w ON e.i = w.i GROUP BY 1, 2)
                GROUP BY 1),
        nrm AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM e GROUP BY 1),
        q AS (SELECT vec_id AS qid,
                     unnest([bucket, xor(bucket, 1), xor(bucket, 2), xor(bucket, 4), xor(bucket, 8)]) AS probe
              FROM sig WHERE vec_id < 10),
        cand AS (SELECT DISTINCT q.qid, sig.vec_id AS vid
                 FROM q JOIN sig ON q.probe = sig.bucket AND sig.vec_id <> q.qid),
        dots AS (SELECT cand.qid, cand.vid, SUM(a.v * b.v) AS d
                 FROM cand
                 JOIN e a ON a.vec_id = cand.qid
                 JOIN e b ON b.vec_id = cand.vid AND b.i = a.i
                 GROUP BY 1, 2),
        cos AS (SELECT qid, vid, round(d / (nq.nrm * nv.nrm), 6) AS cos_r
                FROM dots
                JOIN nrm nq ON nq.vec_id = qid
                JOIN nrm nv ON nv.vec_id = vid),
        rk AS (SELECT qid, vid, cos_r,
                      CAST(row_number() OVER (PARTITION BY qid ORDER BY cos_r DESC, vid) AS INT) AS rank
               FROM cos)
        SELECT qid, rank, vid AS neighbor, cos_r
        FROM rk WHERE rank <= 3
        ORDER BY qid, rank"""
      }),

    // B43: IVF-style bucketed ANN — nearest-centroid cells (8 fixed
    // centroid vectors), queries probe their 2 nearest cells. The other
    // scale path next to LSH: candidate scan shrinks to ~nprobe/C of the
    // corpus.
    Q(
      "q66_ann_ivf",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val queries = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qvec"))
        val candidates = emb.select(col("vec_id"), asDouble(col("embedding")).as("vec"))
        val centroids = emb.filter(col("vec_id").between(100, 107))
          .select(col("vec_id").cast(IntegerType).as("cid"), asDouble(col("embedding")).as("cvec"))
        Similarity.topKCosineIvf(queries, candidates, centroids, nprobe = 2, k = 3)
          .orderBy("qid", "rank")
      },
      Some(s"""
        WITH $OPOS,
        nrm AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM e GROUP BY 1),
        cent AS (SELECT vec_id AS cid FROM embeddings WHERE vec_id BETWEEN 100 AND 107),
        cdots AS (SELECT x.vec_id AS vid, c.cid, SUM(x.v * ce.v) AS d
                  FROM e x CROSS JOIN cent c
                  JOIN e ce ON ce.vec_id = c.cid AND ce.i = x.i
                  GROUP BY 1, 2),
        ccos AS (SELECT vid, cid, round(d / (nv.nrm * nc.nrm), 6) AS ccos
                 FROM cdots
                 JOIN nrm nv ON nv.vec_id = vid
                 JOIN nrm nc ON nc.vec_id = cid),
        ranked AS (SELECT vid, cid, ccos,
                          row_number() OVER (PARTITION BY vid ORDER BY ccos DESC, cid) AS rn
                   FROM ccos),
        assign AS (SELECT vid, cid AS cell FROM ranked WHERE rn = 1),
        probes AS (SELECT vid AS qid, cid AS cell FROM ranked WHERE vid < 10 AND rn <= 2),
        cand AS (SELECT p.qid, a.vid FROM probes p JOIN assign a ON a.cell = p.cell AND a.vid <> p.qid),
        dots AS (SELECT cand.qid, cand.vid, SUM(qa.v * ca.v) AS d
                 FROM cand
                 JOIN e qa ON qa.vec_id = cand.qid
                 JOIN e ca ON ca.vec_id = cand.vid AND ca.i = qa.i
                 GROUP BY 1, 2),
        cos AS (SELECT qid, vid, round(d / (nq.nrm * nv.nrm), 6) AS cos_r
                FROM dots
                JOIN nrm nq ON nq.vec_id = qid
                JOIN nrm nv ON nv.vec_id = vid),
        rk AS (SELECT qid, vid, cos_r,
                      CAST(row_number() OVER (PARTITION BY qid ORDER BY cos_r DESC, vid) AS INT) AS rank
               FROM cos)
        SELECT qid, rank, vid AS neighbor, cos_r
        FROM rk WHERE rank <= 3
        ORDER BY qid, rank""")),

    // B43 scale path: int8 scalar-quantized ANN with exact rerank — the
    // scoring pass reads a 4×-smaller projection (int8 vector + 2 floats)
    // through the native graft_dot_i8 kernel, then re-scores the
    // oversampled candidates against full precision. Sketch-picked
    // candidates are engine-specific, so the contract is the boolean
    // pattern: result size anchored cross-engine, ≥90% of quantized picks
    // must appear in the exact top-k, and every recalled pair must carry
    // the identical exact cos_r.
    Q(
      "q110_ann_quantized",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val queries = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qvec"))
        val candidates = emb.select(col("vec_id"), asDouble(col("embedding")).as("vec"))
        val exact = Similarity.topKCosine(queries, candidates, 5)
          .select(col("qid"), col("neighbor"), col("cos_r").as("e_cos"))
        val quant = Similarity.topKCosineQuantized(queries, candidates, 5)
        quant
          .join(exact, Seq("qid", "neighbor"), "left")
          .agg(
            count(lit(1)).as("n_results"),
            (sum(when(col("e_cos").isNotNull, 1).otherwise(0)) >= count(lit(1)) * 0.9)
              .as("recall_ok"),
            (sum(when(col("e_cos").isNotNull && col("cos_r") =!= col("e_cos"), 1).otherwise(0)) === 0)
              .as("rerank_scores_exact"))
      },
      Some("""
        SELECT CAST((SELECT COUNT(*) FROM embeddings WHERE vec_id < 10) * 5 AS BIGINT)
                 AS n_results,
               TRUE AS recall_ok,
               TRUE AS rerank_scores_exact""")),

    // B43: Johnson–Lindenstrauss-style ±1 random projection, 64 -> 8
    // dims — the dimensionality-reduction front end of a sketch-based
    // ANN/clustering pipeline. The sign matrix is md5-derived so the
    // oracle inlines the identical ±1 constants, and the projection runs
    // over the x1000-floored integer view of each vector, making every
    // output coordinate integer-exact cross-engine. Pure scan-stage math:
    // no shuffle, no UDF.
    Q(
      "q116_random_projection",
      (s, dir) => {
        val signs = Similarity.signMatrix("rp", 8, 64)
        val ps = Similarity.randomProjectQuantized(col("embedding"), signs)
          .zipWithIndex.map { case (c, j) => c.as(s"p$j") }
        Tables.embeddings(s, dir)
          .select(col("vec_id") +: ps: _*)
          .orderBy("vec_id")
      },
      Some {
        val signs = Similarity.signMatrix("rp", 8, 64)
        val values = (for (j <- 0 until 8; i <- 0 until 64)
          yield s"($j,${i + 1},${signs(j)(i)})").mkString(",")
        val pivots = (0 until 8)
          .map(j => s"MAX(CASE WHEN j = $j THEN pj END) AS p$j").mkString(", ")
        s"""
        WITH $OPOS,
        q AS (SELECT vec_id, i, CAST(floor(v * 1000) AS BIGINT) AS qv FROM e),
        s AS (SELECT * FROM (VALUES $values) t(j, i, sg)),
        p AS (SELECT vec_id, j, CAST(SUM(qv * sg) AS BIGINT) AS pj
              FROM q JOIN s USING (i) GROUP BY 1, 2)
        SELECT vec_id, $pivots
        FROM p GROUP BY vec_id
        ORDER BY vec_id"""
      }),

    // B7/B43: embedding-cosine near-dup pairs (norms precomputed once).
    // The exact operator is input-bounded by contract (cap = 4096 lowest
    // ids — a TakeOrderedAndProject under each cross-join side, so the
    // O(n²) stays O(cap²) whatever the corpus size); the unbounded-corpus
    // path is q96's LSH-pruned twin. The oracle applies the same cap.
    Q(
      "q63_cosine_pairs",
      (s, dir) => {
        val v = Tables.embeddings(s, dir)
          .select(col("vec_id"), asDouble(col("embedding")).as("vec"))
        Similarity.cosinePairs(v, "vec_id", "vec", cap = 4096)
          .orderBy(col("cos_r").desc, col("a"), col("b"))
          .limit(50)
      },
      Some(s"""
        WITH $OPOS,
        capped AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4096),
        nrm AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM e GROUP BY 1),
        dots AS (SELECT a.vec_id AS a, b.vec_id AS b, SUM(a.v * b.v) AS d
                 FROM e a JOIN e b ON a.i = b.i AND a.vec_id < b.vec_id
                 JOIN capped ca ON ca.vec_id = a.vec_id
                 JOIN capped cb ON cb.vec_id = b.vec_id
                 GROUP BY 1, 2)
        SELECT a, b, round(d / (na.nrm * nb.nrm), 6) AS cos_r
        FROM dots JOIN nrm na ON na.vec_id = a JOIN nrm nb ON nb.vec_id = b
        ORDER BY cos_r DESC, a, b
        LIMIT 50""")),

    // B7/B43: candidate-pruned cosine near-dup pairs — the scale path of
    // q63. Candidates come from LSH buckets with Hamming-1 multi-probe
    // (no cross join), and the PLANE COUNT ADAPTS to corpus size
    // (Similarity.adaptivePlanes: smallest p in [4,24] with 2^p·64 ≥ n) —
    // a fixed count leaves candidate volume Θ(n²/2^p), measured as
    // exponent 2.06 in the 10× scale probe; adaptive p holds expected
    // bucket occupancy ~64 so candidates stay ~(p+1)·64·n. Every emitted
    // pair carries the identical cos_r the exact operator computes. The
    // oracle rebuilds the same buckets from the same inline hyperplane
    // constants and re-derives the same plane count with the same integer
    // arithmetic (no float log2 — engines could round a power-of-two
    // boundary differently).
    Q(
      "q96_cosine_pairs_lsh",
      (s, dir) => {
        val v = Tables.embeddings(s, dir)
          .select(col("vec_id"), asDouble(col("embedding")).as("vec"))
        val n = v.count()
        val np = Similarity.adaptivePlanes(n)
        val planes = Similarity.hyperplanes(np, 64)
        // hash the re-attach sides only past broadcast size (n already
        // counted for adaptivePlanes) - the hint would otherwise override
        // the broadcast Spark picks at small n. The boundary derives from
        // the session's autoBroadcastJoinThreshold + estimated row width
        // (Similarity.reattachPastBroadcast), not a hardcoded count.
        Similarity.cosinePairsLsh(v, "vec_id", "vec", planes,
          hashReattach = Similarity.reattachPastBroadcast(s, n, dim = 64))
          .orderBy(col("cos_r").desc, col("a"), col("b"))
          .limit(50)
      },
      Some {
        // r14: the inline plane table and both ranges track the widened
        // adaptivePlanes ceiling [4, 24] (2^24*64 ~ 1e9 vectors)
        val planes = Similarity.hyperplanes(24, 64)
        val values = (for {
          p <- 0 until 24
          d <- 0 until 64
        } yield f"($p, ${d + 1}, ${planes(p)(d)}%.3f)").mkString(", ")
        s"""
        WITH $OPOS,
        w(p, i, wt) AS (SELECT * FROM (VALUES $values) t(p, i, wt)),
        params AS (SELECT COALESCE(CAST(MIN(p) AS INT), 24) AS np
                   FROM range(4, 25) t(p), (SELECT COUNT(*) AS n FROM embeddings) c
                   WHERE (1 << p) * 64 >= c.n),
        sig AS (SELECT vec_id, CAST(SUM(CASE WHEN s > 0 THEN (1 << p) ELSE 0 END) AS INT) AS bucket
                FROM (SELECT e.vec_id, w.p, SUM(e.v * CAST(w.wt AS DOUBLE)) AS s
                      FROM e JOIN w ON e.i = w.i CROSS JOIN params
                      WHERE w.p < params.np GROUP BY 1, 2)
                GROUP BY 1),
        nrm AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM e GROUP BY 1),
        pr AS (SELECT vec_id, bucket AS probe FROM sig
               UNION ALL
               SELECT s.vec_id, xor(s.bucket, (1 << m.p)) AS probe
               FROM sig s CROSS JOIN range(0, 24) m(p) CROSS JOIN params
               WHERE m.p < params.np),
        cand AS (SELECT DISTINCT pr.vec_id AS a, s2.vec_id AS b
                 FROM pr JOIN sig s2 ON pr.probe = s2.bucket AND pr.vec_id < s2.vec_id),
        dots AS (SELECT cand.a, cand.b, SUM(x.v * y.v) AS d
                 FROM cand
                 JOIN e x ON x.vec_id = cand.a
                 JOIN e y ON y.vec_id = cand.b AND y.i = x.i
                 GROUP BY 1, 2)
        SELECT a, b, round(d / (na.nrm * nb.nrm), 6) AS cos_r
        FROM dots JOIN nrm na ON na.vec_id = a JOIN nrm nb ON nb.vec_id = b
        ORDER BY cos_r DESC, a, b
        LIMIT 50"""
      }),

    // SEMANTIC cross-corpus decontamination — the embedding tier next to
    // the n-gram tiers (q98 recall path, q111 precision path): eval
    // vectors (vec_id < 64) probe the train corpus (vec_id >= 64)
    // through the LSH bucket join (multi-probe from the eval side, ids
    // only through the candidate join), exact cosine on candidates,
    // threshold 0.35 (the near-dup regime of the synthetic embeddings —
    // the corpus-wide cosine max is ~0.51). A train doc that paraphrases an eval item shares no
    // 13-gram but sits at high cosine — this is the join that flags it
    // for removal. The oracle replays the identical bucketing and
    // cosine over the same split.
    Q(
      "q152_semantic_decontaminate",
      (s, dir) => {
        val planes = Similarity.hyperplanes(4, 64)
        val all = Tables.embeddings(s, dir)
          .select(col("vec_id"), asDouble(col("embedding")).as("vec"))
        val evalSet = all.filter(col("vec_id") < 64)
          .select(col("vec_id").as("eval_id"), col("vec").as("evec"))
        val train = all.filter(col("vec_id") >= 64)
          .select(col("vec_id").as("train_id"), col("vec").as("tvec"))
        Similarity
          .crossCosineLsh(evalSet, "eval_id", "evec", train, "train_id", "tvec", planes)
          .filter(col("cos_r") >= 0.35)
          .orderBy("eval_id", "train_id")
      },
      Some {
        val planes = Similarity.hyperplanes(4, 64)
        val values = (for {
          p <- 0 until 4
          d <- 0 until 64
        } yield f"($p, ${d + 1}, ${planes(p)(d)}%.3f)").mkString(", ")
        s"""
        WITH $OPOS,
        w(p, i, wt) AS (SELECT * FROM (VALUES $values) t(p, i, wt)),
        sig AS (SELECT vec_id, CAST(SUM(CASE WHEN s > 0 THEN (1 << p) ELSE 0 END) AS INT) AS bucket
                FROM (SELECT e.vec_id, w.p, SUM(e.v * CAST(w.wt AS DOUBLE)) AS s
                      FROM e JOIN w ON e.i = w.i GROUP BY 1, 2)
                GROUP BY 1),
        nrm AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM e GROUP BY 1),
        pr AS (SELECT vec_id,
                      unnest([bucket, xor(bucket, 1), xor(bucket, 2), xor(bucket, 4), xor(bucket, 8)]) AS probe
               FROM sig WHERE vec_id < 64),
        cand AS (SELECT DISTINCT pr.vec_id AS eval_id, s2.vec_id AS train_id
                 FROM pr JOIN sig s2 ON pr.probe = s2.bucket AND s2.vec_id >= 64),
        dots AS (SELECT cand.eval_id, cand.train_id, SUM(x.v * y.v) AS d
                 FROM cand
                 JOIN e x ON x.vec_id = cand.eval_id
                 JOIN e y ON y.vec_id = cand.train_id AND y.i = x.i
                 GROUP BY 1, 2)
        SELECT eval_id, train_id, round(d / (na.nrm * nb.nrm), 6) AS cos_r
        FROM dots JOIN nrm na ON na.vec_id = eval_id JOIN nrm nb ON nb.vec_id = train_id
        WHERE round(d / (na.nrm * nb.nrm), 6) >= 0.35
        ORDER BY eval_id, train_id"""
      }),

    // B43: trained IVF — Lloyd's k-means coarse quantizer (distributed
    // assignment, k x dims driver state). Float means make exact
    // cross-engine assignment unverifiable, so the oracle checks the
    // k-means CONTRACT instead (q16/q48 boolean-invariant pattern): every
    // vector lands in exactly one of <= k in-range cells, and Lloyd's
    // inertia is finite and non-increasing. The one cross-engine scalar
    // (total assigned vectors) anchors the row count.
    Q(
      "q86_ivf_kmeans",
      (s, dir) => {
        val v = Tables.embeddings(s, dir)
          .select(col("vec_id"), asDouble(col("embedding")).as("v"))
        val k = 8
        val (centroids, inertias) = graft.operators.KMeans.fit(v, "vec_id", "v", k = k, iters = 3)
        val nonIncreasing = inertias.sliding(2).forall {
          case Seq(prev, next) => next <= prev + 1e-6
          case _               => true
        }
        val allFinite = inertias.forall(i => !i.isNaN && !i.isInfinite)
        v.withColumn("cell", graft.operators.KMeans.assignCell(col("v"), centroids))
          .groupBy("cell")
          .agg(count(lit(1)).as("n"))
          .agg(
            sum(col("n")).as("n_vectors_total"),
            (count(lit(1)) <= k).as("n_cells_le_k"),
            (min(col("cell")) >= 0 && max(col("cell")) < k).as("cells_in_range"))
          .withColumn("inertia_nonincreasing", lit(nonIncreasing))
          .withColumn("inertia_finite", lit(allFinite))
      },
      Some("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors_total,
               TRUE AS n_cells_le_k,
               TRUE AS cells_in_range,
               TRUE AS inertia_nonincreasing,
               TRUE AS inertia_finite
        FROM embeddings""")),

    // B44: multimodal join — text metadata x embedding labels.
    Q(
      "q64_multimodal_join",
      (s, dir) =>
        Tables.documents(s, dir)
          .join(Tables.embeddings(s, dir), col("doc_id") === col("vec_id"))
          .groupBy(col("lang"), col("label"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("n_chars")).as("sum_chars"),
            round(sum(col("n_chars")).cast(DoubleType) / count(lit(1)), 6).as("avg_chars"))
          .orderBy("lang", "label"),
      Some("""
        SELECT lang, label, COUNT(*) AS cnt, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               round(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS avg_chars
        FROM documents JOIN embeddings ON doc_id = vec_id
        GROUP BY lang, label
        ORDER BY lang, label""")),

    // B44: binary-column plumbing — text encoded to a binary payload,
    // per-source byte stats + content hashing on the blob.
    Q(
      "q65_multimodal_binary",
      (s, dir) =>
        Tables.documents(s, dir)
          .withColumn("payload", encode(col("text"), "UTF-8"))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(expr("octet_length(payload)")).as("total_bytes"),
            countDistinct(md5(col("payload"))).as("n_distinct_payloads"))
          .orderBy("source"),
      Some("""
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
               COUNT(DISTINCT md5(text)) AS n_distinct_payloads
        FROM documents
        GROUP BY source
        ORDER BY source""")),

    // B43: nearest-centroid classification over the labeled embeddings —
    // the semantic-quality-classifier shape of a training-data pipeline
    // (fit per-label centroids, assign every vector to its nearest,
    // report the confusion matrix). Everything is exact on the x1000
    // integer grid (q116's floored view): centroid components floor to
    // BIGINT, distances are integer sums of squares (order-independent),
    // ties break on the smaller label — so both engines agree
    // bit-for-bit with zero float-aggregation wobble. Scale shape:
    // centroids are labels x dims (tiny, broadcast); the distance pass is
    // one partial-agg'd shuffle of corpus x |labels| rows — linear,
    // since the label set is bounded.
    Q(
      "q126_nearest_centroid",
      (s, dir) => {
        val pos = Tables.embeddings(s, dir)
          .select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("i0", "v")))
          .select(col("vec_id"), col("label"), (col("i0") + 1).as("i"),
            floor(col("v").cast(DoubleType) * 1000).cast(LongType).as("qv"))
        val cent = pos.groupBy(col("label").as("clabel"), col("i"))
          .agg(floor(sum(col("qv")).cast(DoubleType) / count(lit(1))).cast(LongType).as("cv"))
        val dists = pos.join(broadcast(cent), Seq("i"))
          .groupBy(col("vec_id"), col("label"), col("clabel"))
          .agg(sum((col("qv") - col("cv")) * (col("qv") - col("cv"))).as("d2"))
        val w = Window.partitionBy("vec_id").orderBy(col("d2"), col("clabel"))
        dists.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .groupBy(col("label"), col("clabel").as("pred_label"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy("label", "pred_label")
      },
      Some(s"""
        WITH $OPOS,
        q AS (SELECT e.vec_id, emb.label, i, CAST(floor(v * 1000) AS BIGINT) AS qv
              FROM e JOIN embeddings emb USING (vec_id)),
        c AS (SELECT label AS clabel, i,
                     CAST(floor(CAST(SUM(qv) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
              FROM q GROUP BY 1, 2),
        d AS (SELECT q.vec_id, q.label, c.clabel,
                     SUM((qv - cv) * (qv - cv)) AS d2
              FROM q JOIN c USING (i) GROUP BY 1, 2, 3),
        r AS (SELECT vec_id, label, clabel,
                     ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, clabel) AS rn
              FROM d)
        SELECT label, clabel AS pred_label, COUNT(*) AS cnt
        FROM r WHERE rn = 1
        GROUP BY 1, 2
        ORDER BY label, pred_label""")),

    // Embedding-level semantic dedup, end to end: cosine-threshold pairs
    // (B43) become the edge set of ConnectedComponents (B7's cluster
    // engine), producing dedup clusters whose sizes the oracle recomputes
    // with a RECURSIVE transitive closure in SQL — the distributed
    // min-label/pointer-jump loop must agree exactly with a from-first-
    // principles reachability fixpoint, including multi-hop chains where
    // a~b and b~c but a,c are NOT directly similar.
    Q(
      "q133_semantic_dedup",
      (s, dir) => {
        val v = Tables.embeddings(s, dir)
          .select(col("vec_id"), asDouble(col("embedding")).as("vec"))
        val pairs = Similarity.cosinePairs(v, "vec_id", "vec", cap = 4096)
          .filter(col("cos_r") >= 0.42)
        val capped = v.orderBy("vec_id").limit(4096).select(col("vec_id"))
        graft.operators.ConnectedComponents
          .components(capped, pairs.select(col("a"), col("b")), "vec_id")
          .groupBy("comp")
          .agg(count(lit(1)).as("n_members"))
          .filter(col("n_members") >= 2)
          .orderBy("comp")
      },
      Some(s"""
        WITH RECURSIVE $OPOS,
        capped AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4096),
        nrm AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM e GROUP BY 1),
        dots AS (SELECT a.vec_id AS a, b.vec_id AS b, SUM(a.v * b.v) AS d
                 FROM e a JOIN e b ON a.i = b.i AND a.vec_id < b.vec_id
                 JOIN capped ca ON ca.vec_id = a.vec_id
                 JOIN capped cb ON cb.vec_id = b.vec_id
                 GROUP BY 1, 2),
        edges AS (SELECT a, b FROM (SELECT a, b, round(d / (na.nrm * nb.nrm), 6) AS c
                  FROM dots JOIN nrm na ON na.vec_id = a JOIN nrm nb ON nb.vec_id = b)
                  WHERE c >= 0.42),
        sym AS (SELECT a AS src, b AS dst FROM edges
                UNION ALL SELECT b, a FROM edges),
        reach(node, lbl) AS (
          SELECT vec_id, vec_id FROM capped
          UNION
          SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.node
        ),
        comp AS (SELECT node, MIN(lbl) AS comp FROM reach GROUP BY node)
        SELECT comp, CAST(COUNT(*) AS BIGINT) AS n_members
        FROM comp
        GROUP BY comp
        HAVING COUNT(*) >= 2
        ORDER BY comp""")),

    // B162: LEAKAGE-SAFE train/val/test split — the assignment step a
    // training pipeline runs AFTER near-dup detection. Splitting by doc
    // hash leaks: near-duplicate pairs straddle train/test and inflate
    // eval, so the unit of assignment is the SEMANTIC COMPONENT (q133's
    // connected components over the cosine-threshold pairs) and every
    // doc inherits its component's bucket — hash60("split:" + comp) mod
    // 10 → 0–7 train, 8 val, 9 test (~80/10/10 in expectation,
    // deterministic, engine-replayable). The leak audit rides the
    // result: edges whose endpoints land in different splits —
    // identically ZERO under component assignment, the invariant per-doc
    // hashing breaks on every similar pair.
    Q(
      "q274_leakage_safe_split",
      (s, dir) => {
        val v = Tables.embeddings(s, dir)
          .select(col("vec_id"), asDouble(col("embedding")).as("vec"))
        val pairs = graft.Q.persistOnce(
          Similarity.cosinePairs(v, "vec_id", "vec", cap = 4096)
            .filter(col("cos_r") >= 0.42).select(col("a"), col("b")))
        val capped = v.orderBy("vec_id").limit(4096).select(col("vec_id"))
        val comp = graft.operators.ConnectedComponents
          .components(capped, pairs, "vec_id")
        val bucket = hash60("split", col("comp")) % 10
        val assigned = graft.Q.persistOnce(comp
          .withColumn("split",
            when(bucket <= 7, "train").when(bucket === 8, "val").otherwise("test")))
        val leaks = pairs
          .join(assigned.select(col("vec_id").as("a"), col("split").as("sa")), "a")
          .join(assigned.select(col("vec_id").as("b"), col("split").as("sb")), "b")
          .agg(coalesce(sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L)), lit(0L))
            .as("leak_edges"))
        assigned.groupBy("split")
          .agg(count(lit(1)).as("n_docs"), countDistinct(col("comp")).as("n_comps"))
          .crossJoin(broadcast(leaks))
          .orderBy("split")
      },
      Some(s"""
        WITH RECURSIVE $OPOS,
        capped AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4096),
        nrm AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM e GROUP BY 1),
        dots AS (SELECT a.vec_id AS a, b.vec_id AS b, SUM(a.v * b.v) AS d
                 FROM e a JOIN e b ON a.i = b.i AND a.vec_id < b.vec_id
                 JOIN capped ca ON ca.vec_id = a.vec_id
                 JOIN capped cb ON cb.vec_id = b.vec_id
                 GROUP BY 1, 2),
        edges AS (SELECT a, b FROM (SELECT a, b, round(d / (na.nrm * nb.nrm), 6) AS c
                  FROM dots JOIN nrm na ON na.vec_id = a JOIN nrm nb ON nb.vec_id = b)
                  WHERE c >= 0.42),
        sym AS (SELECT a AS src, b AS dst FROM edges
                UNION ALL SELECT b, a FROM edges),
        reach(node, lbl) AS (
          SELECT vec_id, vec_id FROM capped
          UNION
          SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.node
        ),
        comp AS (SELECT node, MIN(lbl) AS comp FROM reach GROUP BY node),
        asg AS (SELECT node, comp,
                       CASE WHEN b <= 7 THEN 'train' WHEN b = 8 THEN 'val'
                            ELSE 'test' END AS split
                FROM (SELECT node, comp,
                             ('0x' || substr(md5('split:' || CAST(comp AS VARCHAR)), 1, 15))::BIGINT % 10 AS b
                      FROM comp)),
        leaks AS (SELECT CAST(COALESCE(SUM(CASE WHEN x.split <> y.split THEN 1 ELSE 0 END), 0) AS BIGINT) AS leak_edges
                  FROM edges eg JOIN asg x ON x.node = eg.a JOIN asg y ON y.node = eg.b)
        SELECT split, COUNT(*) AS n_docs, COUNT(DISTINCT comp) AS n_comps,
               (SELECT leak_edges FROM leaks) AS leak_edges
        FROM asg
        GROUP BY split
        ORDER BY split""")),

    // B43's memory-bound tier: product quantization (Jégou et al. 2011).
    // 64-dim float vectors collapse to 4 one-byte codes (4 subspaces x 16
    // learned centroids); query scoring is 4 table lookups per row (ADC)
    // and the exact rerank touches only k x oversample candidates. The
    // codebooks come from k-means, so outputs are not SQL-reproducible —
    // the q86 contract pattern applies: every code in range, PQ recall@10
    // against the exact L2 top-10 at least half (empirically ~1.0 here),
    // anchored by the cross-engine corpus count. Exactness of the
    // oversample-covers-everything limit is property-pinned in
    // OperatorsSpec.
    Q(
      "q143_ann_pq",
      (s, dir) => {
        val v = Tables.embeddings(s, dir)
          .select(col("vec_id"), asDouble(col("embedding")).as("v"))
        val m = 4
        val ksub = 16
        val books = Similarity.pqTrain(v, "vec_id", "v", m = m, ksub = ksub, iters = 2)
        val query = v.orderBy("vec_id").limit(1).select("v")
          .head().getSeq[Double](0).toArray
        val k = 10
        // One pass carries both contract facts: every exploded code in
        // [0, ksub) AND the vector count (codes are exactly m per vector,
        // so n = count(codes) / m — no second scan for the total).
        val cr = v.select(explode(Similarity.pqEncode(col("v"), books)).as("c"))
          .agg(min(col("c")).as("cmin"), max(col("c")).as("cmax"),
            expr(s"count(1) div $m").as("n")).head()
        val codesInRange = cr.getInt(0) >= 0 && cr.getInt(1) < ksub
        val nVectors = cr.getLong(2)
        val approx = Similarity.annPq(v, "vec_id", "v", query, k, books)
          .select("vec_id")
        val qArr = array(query.toIndexedSeq.map(lit): _*)
        val exact = v
          .withColumn("d2",
            call_function("graft_dot", col("v"), col("v")) -
              lit(2.0) * call_function("graft_dot", col("v"), qArr) +
              lit(query.map(x => x * x).sum))
          .orderBy(col("d2"), col("vec_id")).limit(k).select("vec_id")
        val hits = approx.join(exact, "vec_id").count()
        import s.implicits._
        Seq((nVectors, codesInRange, hits * 2 >= k))
          .toDF("n_vectors_total", "codes_in_range", "recall_ge_half")
      },
      Some("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors_total,
               TRUE AS codes_in_range,
               TRUE AS recall_ge_half
        FROM embeddings""")),

    // B159: MMR diversity re-ranking (operators/Mmr) — greedy picks
    // maximizing wRel·rel − wDiv·max-sim-to-selected on the ×1000
    // integer grid, query = vec_id 0's embedding, k=8 at λ=3/5. Every
    // round is one scan of the checkpointed (id, grid, rel) frame + a
    // top-1 TakeOrdered; the oracle unrolls the 8 rounds as CTEs with
    // the identical grid, weights and smallest-id tie rule.
    Q(
      "q271_mmr_rerank",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        // query vector: one bounded 1-row collect (the Coverage
        // driver-touchpoint posture), floored onto the shared grid
        val qraw = emb.filter(col("vec_id") === 0)
          .select(asDouble(col("embedding"))).head().getSeq[Double](0)
        graft.operators.Mmr.rerank(
            emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
            graft.operators.Mmr.gridOf(qraw), k = 8, wRel = 3, wDiv = 2)
          .withColumnRenamed("id", "vec_id")
          .orderBy("round")
      },
      Some {
        val k = 8
        val rounds = (2 to k).map { r =>
          val sel = (1 until r).map(i => s"SELECT vec_id FROM p$i")
            .mkString(" UNION ALL ")
          s"""sel$r AS ($sel),
        ms$r AS (SELECT a_vid AS vec_id, CAST(MAX(d) AS BIGINT) AS ms FROM (
            SELECT a.vec_id AS a_vid, b.vec_id AS b_vid,
                   CAST(SUM(a.qv * b.qv) AS BIGINT) AS d
            FROM c a JOIN c b ON a.i = b.i
                 AND b.vec_id IN (SELECT vec_id FROM sel$r)
            GROUP BY 1, 2) GROUP BY 1),
        p$r AS MATERIALIZED (SELECT r.vec_id, r.rel, m.ms,
            CAST(3 * r.rel - 2 * m.ms AS BIGINT) AS score
            FROM rel r JOIN ms$r m ON m.vec_id = r.vec_id
            WHERE r.vec_id NOT IN (SELECT vec_id FROM sel$r)
            ORDER BY score DESC, r.vec_id LIMIT 1)"""
        }.mkString(",\n        ")
        val finalSel = (1 to k).map(r =>
          s"SELECT CAST($r AS BIGINT) AS round, vec_id, rel, ms AS max_sim, score FROM p$r")
          .mkString(" UNION ALL ")
        s"""
        WITH g AS MATERIALIZED (
          SELECT vec_id, i, CAST(floor(CAST(v AS DOUBLE) * 1000) AS BIGINT) AS qv
          FROM (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                       CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings)),
        q AS (SELECT i, qv FROM g WHERE vec_id = 0),
        c AS MATERIALIZED (SELECT * FROM g WHERE vec_id <> 0),
        rel AS MATERIALIZED (SELECT c.vec_id, CAST(SUM(c.qv * q.qv) AS BIGINT) AS rel
            FROM c JOIN q USING (i) GROUP BY 1),
        p1 AS MATERIALIZED (SELECT vec_id, rel, CAST(0 AS BIGINT) AS ms,
            CAST(3 * rel AS BIGINT) AS score
            FROM rel ORDER BY score DESC, vec_id LIMIT 1),
        $rounds
        $finalSel
        ORDER BY round"""
      })
  )
}
