package graft.queries

import graft.{Q, Tables}
import graft.functions.GraftFunctions._
import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis + deduplication surface over the documents table
  * (SURVEY.md B7, B42): token stats, term frequency, language ID, quality
  * scoring, fingerprinting, exact/minhash/simhash/jaccard dedup.
  *
  * The oracles rebuild the same pipelines in DuckDB SQL; both engines
  * share one tokenizer definition and the portable [[hash60]], so results
  * (including every minhash band and simhash bit) compare exactly.
  */
object TextQueries {

  /** Shared DuckDB fragments mirroring GraftFunctions.tokens and the
    * 3-word shingle index of Dedup.shingleIndex. */
  private val OTOKS =
    """toks AS (SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS ts FROM documents)"""
  private val OSHINGLES =
    """sh AS (SELECT DISTINCT doc_id, sh FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, greatest(len(ts) - 2, 0) + 1),
      |                          i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS sh
      |    FROM toks))""".stripMargin
  private def ohash(seed: String, e: String) =
    s"('0x' || substr(md5('$seed:' || $e), 1, 15))::BIGINT"

  val qs: Seq[Q] = Seq(
    // B42: token counting + per-doc length stats.
    Q(
      "q50_token_stats",
      (s, dir) => {
        val ts = tokens(col("text"))
        Tables.documents(s, dir)
          .select(
            col("doc_id"),
            size(ts).as("n_tokens"),
            aggregate(transform(ts, t => length(t).cast(LongType)), lit(0L), (a, x) => a + x)
              .as("total_token_chars"),
            round(
              aggregate(transform(ts, t => length(t).cast(LongType)), lit(0L), (a, x) => a + x)
                .cast(DoubleType) / size(ts), 6).as("avg_token_len"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH $OTOKS
        SELECT doc_id,
               CAST(len(ts) AS INT) AS n_tokens,
               CAST(list_sum(list_transform(ts, t -> length(t))) AS BIGINT) AS total_token_chars,
               round(CAST(list_sum(list_transform(ts, t -> length(t))) AS DOUBLE) / len(ts), 6) AS avg_token_len
        FROM toks
        ORDER BY doc_id""")),

    // B42: corpus term frequency (explode -> count), top 30.
    Q(
      "q51_term_frequency",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(explode(tokens(col("text"))).as("term"))
          .groupBy("term")
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("term"))
          .limit(30),
      Some(s"""
        WITH $OTOKS
        SELECT t AS term, COUNT(*) AS cnt
        FROM (SELECT unnest(ts) AS t FROM toks)
        GROUP BY 1
        ORDER BY cnt DESC, term
        LIMIT 30""")),

    // B42: marker-based language ID vs the labeled lang column.
    Q(
      "q52_lang_id",
      (s, dir) => {
        val ts = tokens(col("text"))
        val scores = TextAnalysis.markers.map { case (l, ws) =>
          l -> TextAnalysis.markerCount(ts, ws)
        }.toMap
        Tables.documents(s, dir)
          .select(col("lang"), TextAnalysis.predictLang(scores).as("predicted"))
          .groupBy("lang", "predicted")
          .agg(count(lit(1)).as("cnt"))
          .orderBy("lang", "predicted")
      },
      Some {
        def sc(ws: Seq[String]) =
          s"len(list_filter(ts, t -> t IN (${ws.map(w => s"'$w'").mkString(",")})))"
        val m = TextAnalysis.markers.toMap
        s"""
        WITH $OTOKS,
        scored AS (SELECT doc_id,
                          ${sc(m("en"))} AS s_en, ${sc(m("de"))} AS s_de,
                          ${sc(m("es"))} AS s_es, ${sc(m("fr"))} AS s_fr,
                          ${sc(m("zh"))} AS s_zh
                   FROM toks)
        SELECT d.lang,
               CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
                    WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
                    WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
                    WHEN s_fr >= s_zh THEN 'fr'
                    ELSE 'zh' END AS predicted,
               COUNT(*) AS cnt
        FROM scored JOIN documents d USING (doc_id)
        GROUP BY 1, 2
        ORDER BY lang, predicted"""
      }),

    // B42: quality scoring (length/punctuation/stopword features).
    Q(
      "q53_quality_score",
      (s, dir) => {
        val ts = tokens(col("text"))
        val stop = TextAnalysis.markerCount(ts, TextAnalysis.markers.toMap.apply("en"))
        Tables.documents(s, dir)
          .select(
            col("doc_id"), col("n_chars"),
            size(ts).as("n_tokens"),
            TextAnalysis.punctCount(col("text")).as("punct_cnt"),
            round(stop.cast(DoubleType) / size(ts), 6).as("stop_ratio"),
            round(
              least(size(ts).cast(DoubleType) / 200.0, lit(1.0)) * 0.5 +
                (stop.cast(DoubleType) / size(ts)) * 0.5, 6).as("quality"))
          .orderBy("doc_id")
      },
      Some {
        val en = TextAnalysis.markers.toMap.apply("en").map(w => s"'$w'").mkString(",")
        s"""
        WITH $OTOKS
        SELECT d.doc_id, d.n_chars,
               CAST(len(ts) AS INT) AS n_tokens,
               CAST(length(d.text) - length(regexp_replace(d.text, '[.,!?;:]', '', 'g')) AS INT) AS punct_cnt,
               round(CAST(len(list_filter(ts, t -> t IN ($en))) AS DOUBLE) / len(ts), 6) AS stop_ratio,
               round(least(CAST(len(ts) AS DOUBLE) / 200.0, 1.0) * 0.5 +
                     (CAST(len(list_filter(ts, t -> t IN ($en))) AS DOUBLE) / len(ts)) * 0.5, 6) AS quality
        FROM toks JOIN documents d USING (doc_id)
        ORDER BY doc_id"""
      }),

    // B42: suffix-stripping normalizer (stemming-lite) before term
    // counting — vocabulary compression ahead of dedup/tf.
    Q(
      "q88_stemmed_terms",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(explode(tokens(lower(col("text")))).as("t"))
          .select(regexp_replace(col("t"), "(ing|edly|ed|es|s)$", "").as("stem"))
          .filter(length(col("stem")) >= 2)
          .groupBy("stem")
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("stem"))
          .limit(25),
      Some("""
        SELECT stem, COUNT(*) AS cnt FROM (
          SELECT regexp_replace(t, '(ing|edly|ed|es|s)$', '') AS stem
          FROM (SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')) AS t
                FROM documents))
        WHERE length(stem) >= 2
        GROUP BY stem
        ORDER BY cnt DESC, stem
        LIMIT 25""")),

    // B42: the corpus-cleaning filter funnel — every document classified
    // by its first failing rule (too short, low stopword signal, low
    // alpha ratio) or kept; the counts-by-reason report every
    // training-data pipeline emits.
    Q(
      "q89_filter_funnel",
      (s, dir) => {
        val ts = tokens(col("text"))
        val stop = TextAnalysis.markerCount(ts, TextAnalysis.markers.toMap.apply("en"))
        Tables.documents(s, dir)
          .select(
            col("doc_id"),
            when(size(ts) < 30, "too_short")
              .when(stop.cast(DoubleType) / size(ts) < 0.01, "no_stopwords")
              .when(TextAnalysis.punctCount(col("text")).cast(DoubleType) / length(col("text")) > 0.1,
                "too_much_punct")
              .otherwise("kept").as("verdict"))
          .groupBy("verdict")
          .agg(count(lit(1)).as("cnt"))
          .orderBy("verdict")
      },
      Some {
        val en = TextAnalysis.markers.toMap.apply("en").map(w => s"'$w'").mkString(",")
        s"""
        WITH $OTOKS
        SELECT verdict, COUNT(*) AS cnt FROM (
          SELECT CASE
            WHEN len(ts) < 30 THEN 'too_short'
            WHEN CAST(len(list_filter(ts, t -> t IN ($en))) AS DOUBLE) / len(ts) < 0.01 THEN 'no_stopwords'
            WHEN CAST(length(d.text) - length(regexp_replace(d.text, '[.,!?;:]', '', 'g')) AS DOUBLE)
                 / length(d.text) > 0.1 THEN 'too_much_punct'
            ELSE 'kept' END AS verdict
          FROM toks JOIN documents d USING (doc_id))
        GROUP BY verdict
        ORDER BY verdict"""
      }),

    // B6/B42: exact content dedup via normalized md5 fingerprint.
    Q(
      "q54_exact_dedup_stats",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(md5(concat_ws(" ", tokens(lower(col("text"))))).as("fp"))
          .groupBy("fp").agg(count(lit(1)).as("cnt"))
          .agg(
            sum(col("cnt")).as("n_docs"),
            count(lit(1)).as("n_unique"),
            sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("n_dup_groups"),
            max(col("cnt")).as("max_group")),
      Some("""
        WITH fp AS (
          SELECT md5(array_to_string(list_filter(string_split_regex(trim(lower(text)), '\s+'), t -> t <> ''), ' ')) AS fp
          FROM documents),
        g AS (SELECT fp, COUNT(*) AS cnt FROM fp GROUP BY fp)
        SELECT CAST(SUM(cnt) AS BIGINT) AS n_docs, COUNT(*) AS n_unique,
               CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
               MAX(cnt) AS max_group
        FROM g""")),

    // B42: winnowing fingerprints (rolling k-gram hash, window-min).
    Q(
      "q55_winnowing",
      (s, dir) =>
        Tables.documents(s, dir)
          // two projections: gram hashes and fingerprints each land in a
          // real column before being referenced repeatedly (interpreted
          // HOFs have no CSE — see TextAnalysis.charGramHashes)
          .select(col("doc_id"), TextAnalysis.charGramHashes("text", 8).as("__hs"))
          .select(col("doc_id"), TextAnalysis.winnowMins(col("__hs"), 4).as("__fps"))
          .select(
            col("doc_id"),
            size(col("__fps")).as("n_fp"),
            array_min(col("__fps")).as("fp_min"),
            array_max(col("__fps")).as("fp_max"))
          .orderBy("doc_id"),
      Some("""
        WITH h AS (
          SELECT doc_id,
                 list_transform(range(1, greatest(length(text) - 7, 1) + 1),
                                i -> ('0x' || substr(md5(substr(text, i, 8)), 1, 15))::BIGINT) AS hs
          FROM documents),
        w AS (
          SELECT doc_id,
                 list_distinct(list_transform(range(1, greatest(len(hs) - 3, 1) + 1),
                               j -> list_min(hs[j:j+3]))) AS fps
          FROM h)
        SELECT doc_id, CAST(len(fps) AS INT) AS n_fp,
               list_min(fps) AS fp_min, list_max(fps) AS fp_max
        FROM w
        ORDER BY doc_id""")),

    // B42: BPE-ish regex tokenization (letter runs / digit runs / symbol
    // runs — the GPT-2-style pre-tokenizer shape) for token counting;
    // regexp_extract_all exists in both engines with identical semantics
    // for this ASCII pattern.
    Q(
      "q67_bpe_tokens",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(
            col("doc_id"),
            expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]+', 0)").as("toks"))
          .select(
            col("doc_id"),
            size(col("toks")).as("n_bpe_tokens"),
            size(array_distinct(col("toks"))).as("n_unique"),
            element_at(array_sort(col("toks")), 1).as("first_tok"))
          .orderBy("doc_id"),
      Some("""
        WITH t AS (SELECT doc_id,
                          regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]+', 0) AS toks
                   FROM documents)
        SELECT doc_id,
               CAST(len(toks) AS INT) AS n_bpe_tokens,
               CAST(len(list_distinct(toks)) AS INT) AS n_unique,
               list_sort(toks)[1] AS first_tok
        FROM t
        ORDER BY doc_id""")),

    // B7: n-gram Jaccard near-dup pairs via the shared-shingle inverted
    // index (docs with no common shingle never meet the comparator).
    Q(
      "q56_dedup_ngram_jaccard",
      (s, dir) => {
        // the index feeds both join sides and the size counts — persist it
        // once instead of re-exploding the corpus three times
        val idx = Dedup.shingleIndex(Tables.documents(s, dir), "doc_id", "text", 3).persist()
        // maxDf=100: stop-shingle cap (no shingle reaches it in this
        // corpus — max df is 7 at sf0.01, 25 at sf0.1 — so the result is
        // bit-identical to uncapped, while a pathological stop-phrase at
        // scale is bounded). The oracle applies the identical cap.
        Dedup.jaccardPairs(idx, "doc_id", maxDf = 100)
          .select(col("a"), col("b"), round(col("jacc"), 6).as("jacc_r"))
          .orderBy(col("jacc_r").desc, col("a"), col("b"))
          .limit(30)
      },
      Some(s"""
        WITH $OTOKS,
        $OSHINGLES,
        keep AS (SELECT sh FROM (SELECT sh, COUNT(*) AS df FROM sh GROUP BY sh) WHERE df <= 100),
        shk AS (SELECT s.doc_id, s.sh FROM sh s JOIN keep k ON s.sh = k.sh),
        cnt AS (SELECT doc_id, COUNT(*) AS c FROM shk GROUP BY 1),
        pair AS (SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS inter
                 FROM shk x JOIN shk y ON x.sh = y.sh AND x.doc_id < y.doc_id
                 GROUP BY 1, 2)
        SELECT a, b,
               round(CAST(inter AS DOUBLE) / (ca.c + cb.c - inter), 6) AS jacc_r
        FROM pair JOIN cnt ca ON ca.doc_id = a JOIN cnt cb ON cb.doc_id = b
        ORDER BY jacc_r DESC, a, b
        LIMIT 30""")),

    // B7: MinHash + LSH banding (12 hashes = 4 bands x 3 rows); output is
    // the candidate-pair set with band-collision counts — every minhash
    // value goes through the portable hash so the whole sketch is
    // oracle-checked, not just the final pair list.
    Q(
      "q57_dedup_minhash_lsh",
      (s, dir) => {
        val idx = Dedup.shingleIndex(Tables.documents(s, dir), "doc_id", "text", 3)
        val sig = Dedup.minhashSignatures(idx, "doc_id", 12)
        // bands feed both sides of the candidate self-join — persist so the
        // signature aggregation runs once
        val bands = Dedup.lshBands(sig, "doc_id", 4, 3).persist()
        Dedup.lshCandidates(bands, "doc_id")
          .orderBy("a", "b")
      },
      Some {
        val baseHash = "(('0x' || substr(md5(sh), 1, 15))::BIGINT % 2147483647)"
        val mins = Dedup.minhashParams(12).zipWithIndex.map { case ((a, b), i) =>
          s"min(($baseHash * $a + $b) % 2147483647) AS mh_$i"
        }.mkString(", ")
        val bandArms = (0 until 4).map { b =>
          val key = (0 until 3).map(j => s"CAST(mh_${b * 3 + j} AS VARCHAR)").mkString(" || '_' || ")
          s"SELECT doc_id, $b AS band, $key AS key FROM sig"
        }.mkString(" UNION ALL ")
        s"""
        WITH $OTOKS,
        $OSHINGLES,
        sig AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
        bands AS ($bandArms)
        SELECT x.doc_id AS a, y.doc_id AS b, COUNT(DISTINCT x.band) AS n_shared_bands
        FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
        GROUP BY 1, 2
        ORDER BY a, b"""
      }),

    // B7: cross-corpus decontamination — training-side documents (even
    // doc_id) whose minhash bands collide with any evaluation-side
    // document (odd doc_id). The band join is across two corpora, so no
    // self-pairs and no |A|x|B| blowup; at scale the benchmark band table
    // broadcasts. Oracle rebuilds both band sets bit-exactly.
    Q(
      "q98_decontaminate",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        def bands(side: org.apache.spark.sql.DataFrame) =
          Dedup.lshBands(
            Dedup.minhashSignatures(
              Dedup.shingleIndex(side, "doc_id", "text", 3), "doc_id", 12),
            "doc_id", 4, 3)
        Dedup.lshCrossCandidates(
            bands(docs.filter(col("doc_id") % 2 === 0)),
            bands(docs.filter(col("doc_id") % 2 === 1)),
            "doc_id")
          .orderBy("a", "b")
      },
      Some {
        val baseHash = "(('0x' || substr(md5(sh), 1, 15))::BIGINT % 2147483647)"
        val mins = Dedup.minhashParams(12).zipWithIndex.map { case ((a, b), i) =>
          s"min(($baseHash * $a + $b) % 2147483647) AS mh_$i"
        }.mkString(", ")
        def bandArms(sig: String) = (0 until 4).map { b =>
          val key = (0 until 3).map(j => s"CAST(mh_${b * 3 + j} AS VARCHAR)").mkString(" || '_' || ")
          s"SELECT doc_id, $b AS band, $key AS key FROM $sig"
        }.mkString(" UNION ALL ")
        s"""
        WITH $OTOKS,
        $OSHINGLES,
        siga AS (SELECT doc_id, $mins FROM sh WHERE doc_id % 2 = 0 GROUP BY doc_id),
        sigb AS (SELECT doc_id, $mins FROM sh WHERE doc_id % 2 = 1 GROUP BY doc_id),
        bandsa AS (${bandArms("siga")}),
        bandsb AS (${bandArms("sigb")})
        SELECT x.doc_id AS a, y.doc_id AS b, COUNT(DISTINCT x.band) AS n_shared_bands
        FROM bandsa x JOIN bandsb y ON x.band = y.band AND x.key = y.key
        GROUP BY 1, 2
        ORDER BY a, b"""
      }),

    // B7 decontamination, precision path: EXACT shared n-grams across the
    // corpora (the standard eval-set decontamination method) — the
    // complement of q98's minhash-band recall path. Benchmark shingles
    // broadcast; training corpus streams through one equi-join.
    Q(
      "q111_ngram_decontaminate",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Dedup.ngramContamination(
            Dedup.shingleIndex(docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", 3),
            Dedup.shingleIndex(docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", 3),
            "doc_id",
            minShared = 3)
          .orderBy("a", "b")
      },
      Some(s"""
        WITH $OTOKS,
        $OSHINGLES
        SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS n_shared
        FROM (SELECT * FROM sh WHERE doc_id % 2 = 0) x
        JOIN (SELECT * FROM sh WHERE doc_id % 2 = 1) y ON x.sh = y.sh
        GROUP BY 1, 2
        HAVING COUNT(*) >= 3
        ORDER BY a, b""")),

    // B42 pipeline hygiene: PII redaction. The synthetic corpus carries no
    // PII, so each doc gets deterministic planted PII (email + phone +
    // IPv4 derived from doc_id, built identically in the oracle); the
    // patterns are RE2/Java-agreeing subsets, so the REDACTED TEXT ITSELF
    // is md5-verified cross-engine, not just the counts. Pure
    // regexp_replace chain — codegen-resident, scan-stage, no shuffle.
    Q(
      "q112_redact_pii",
      (s, dir) => {
        val planted = concat(
          col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.org or 555-"),
          lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" ip 10.0."), (col("doc_id") % 256).cast("string"),
          lit("."), (col("doc_id") % 200).cast("string"))
        Tables.documents(s, dir)
          .select(col("doc_id"), planted.as("planted"))
          .select(
            col("doc_id"),
            TextAnalysis.piiCount(col("planted")).as("n_pii"),
            md5(TextAnalysis.redactPii(col("planted"))).as("redacted_md5"))
          .orderBy("doc_id")
      },
      Some {
        val em = TextAnalysis.EmailPattern
        val ph = TextAnalysis.PhonePattern
        val ip = TextAnalysis.Ipv4Pattern
        s"""
        WITH p AS (
          SELECT doc_id,
                 text || ' contact user' || CAST(doc_id AS VARCHAR) ||
                 '@mail.example.org or 555-' ||
                 lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
                 lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
                 ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' ||
                 CAST(doc_id % 200 AS VARCHAR) AS planted
          FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(planted, '$em', 0)) +
                    len(regexp_extract_all(planted, '$ph', 0)) +
                    len(regexp_extract_all(planted, '$ip', 0)) AS INT) AS n_pii,
               md5(regexp_replace(
                     regexp_replace(
                       regexp_replace(planted, '$em', '[EMAIL]', 'g'),
                       '$ph', '[PHONE]', 'g'),
                     '$ip', '[IP]', 'g')) AS redacted_md5
        FROM p
        ORDER BY doc_id"""
      }),

    // B26/B42: regexp function family over document text — extract-all
    // cardinality, word-boundary counting, group extraction, global
    // replace. Patterns are ASCII-only so Java (Spark) and RE2 (DuckDB)
    // agree; Spark's regexp_replace is global by default, DuckDB needs
    // the explicit 'g' flag.
    Q(
      "q99_regexp_family",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(
            col("doc_id"),
            size(expr("regexp_extract_all(text, '[a-z]+ing', 0)")).as("n_ing"),
            expr("regexp_count(text, '\\\\bthe\\\\b')").as("n_the"),
            length(regexp_replace(col("text"), "[aeiou]", "")).as("len_novowel"),
            expr("regexp_extract(text, '([a-z]+)ing', 1)").as("first_ing_stem"))
          .orderBy("doc_id"),
      Some("""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[a-z]+ing')) AS INT) AS n_ing,
               CAST(len(regexp_extract_all(text, '\bthe\b')) AS INT) AS n_the,
               CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS INT) AS len_novowel,
               regexp_extract(text, '([a-z]+)ing', 1) AS first_ing_stem
        FROM documents
        ORDER BY doc_id""")),

    // B7: 32-bit SimHash per document (exact integer compare).
    Q(
      "q58_dedup_simhash",
      (s, dir) =>
        Dedup.simhash32(Tables.documents(s, dir), "doc_id", "text")
          .orderBy("doc_id"),
      Some {
        val bitSums = (0 until 32).map(b => s"SUM((((hv >> $b) & 1) * 2) - 1) AS s_$b").mkString(", ")
        val assemble = (0 until 32)
          .map(b => s"CASE WHEN s_$b > 0 THEN (1::BIGINT << $b) ELSE 0::BIGINT END")
          .mkString(" + ")
        s"""
        WITH $OTOKS,
        tok AS (SELECT doc_id, unnest(ts) AS t FROM toks),
        h AS (SELECT doc_id, ${ohash("sim", "t")} AS hv FROM tok),
        bits AS (SELECT doc_id, $bitSums FROM h GROUP BY doc_id)
        SELECT doc_id, $assemble AS simhash
        FROM bits
        ORDER BY doc_id"""
      }),

    // B7: SimHash near-dup candidates by Hamming distance.
    Q(
      "q59_simhash_pairs",
      (s, dir) => {
        val sh = Dedup.simhash32(Tables.documents(s, dir), "doc_id", "text")
        Dedup.simhashTopPairs(sh, "doc_id", "simhash", 50)
      },
      Some {
        val bitSums = (0 until 32).map(b => s"SUM((((hv >> $b) & 1) * 2) - 1) AS s_$b").mkString(", ")
        val assemble = (0 until 32)
          .map(b => s"CASE WHEN s_$b > 0 THEN (1::BIGINT << $b) ELSE 0::BIGINT END")
          .mkString(" + ")
        s"""
        WITH $OTOKS,
        tok AS (SELECT doc_id, unnest(ts) AS t FROM toks),
        h AS (SELECT doc_id, ${ohash("sim", "t")} AS hv FROM tok),
        bits AS (SELECT doc_id, $bitSums FROM h GROUP BY doc_id),
        sh AS (SELECT doc_id, $assemble AS simhash FROM bits)
        SELECT x.doc_id AS a, y.doc_id AS b,
               CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS dist
        FROM sh x JOIN sh y ON x.doc_id < y.doc_id
        ORDER BY dist, a, b
        LIMIT 50"""
      }),

    // B7: distributed banded simhash pairs — the scale route for simhash
    // near-dup detection. A WIDE sketch (simhash60) with 4 bands x 15 bits
    // gives 2^15 keys per band: by pigeonhole any pair at Hamming distance
    // < 4 shares a band, and band buckets only collide for genuinely
    // similar documents, so the equi-join stays linear — no collect, no
    // cross join. The oracle replicates sketch and banding bit-exactly.
    Q(
      "q95_simhash_banded",
      (s, dir) => {
        val sh = Dedup.simhash60(Tables.documents(s, dir), "doc_id", "text")
        Dedup.simhashBandedTopPairs(sh, "doc_id", "simhash", 50, bands = 4, bitsPerBand = 15)
      },
      Some {
        val bitSums = (0 until 60).map(b => s"SUM((((hv >> $b) & 1) * 2) - 1) AS s_$b").mkString(", ")
        val assemble = (0 until 60)
          .map(b => s"CASE WHEN s_$b > 0 THEN (1::BIGINT << $b) ELSE 0::BIGINT END")
          .mkString(" + ")
        s"""
        WITH $OTOKS,
        tok AS (SELECT doc_id, unnest(ts) AS t FROM toks),
        h AS (SELECT doc_id, ${ohash("sim", "t")} AS hv FROM tok),
        bits AS (SELECT doc_id, $bitSums FROM h GROUP BY doc_id),
        sh AS (SELECT doc_id, $assemble AS simhash FROM bits),
        banded AS (SELECT doc_id, simhash, band,
                          (simhash >> (band * 15)) & 32767 AS key
                   FROM sh CROSS JOIN (SELECT unnest(range(4)) AS band)),
        cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
                        CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS dist
                 FROM banded x
                 JOIN banded y ON x.band = y.band AND x.key = y.key
                              AND x.doc_id < y.doc_id)
        SELECT a, b, dist FROM cand
        ORDER BY dist, a, b
        LIMIT 50"""
      })
  )
}
