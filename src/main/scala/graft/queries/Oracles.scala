package graft.queries

/** DuckDB oracle SQL for every entry in [[Queries.all]]. Column names,
  * aliases, and ORDER BY match the Spark side exactly — the driver's
  * compare sorts columns by name then hashes values, so any drift here is
  * a hash mismatch even when the data agrees.
  *
  * DuckDB-specific care: integer SUM returns HUGEINT → CAST to BIGINT;
  * regexp_replace needs the 'g' flag to match Spark's replace-all;
  * date_format ↔ strftime pattern mapping; epoch(ts) is double seconds.
  */
object Oracles {

  /** SQL mirror of TextFunctions.literalHits — same needle, same divisor. */
  private def hitsSql(word: String): String = {
    val needle = s" $word "
    s"CAST((length(text) - length(regexp_replace(text, ' $word ', '', 'g'))) / ${needle.length} AS INTEGER)"
  }

  /** SQL mirror of TextFunctions.langId: same marker sets, same greatest
    * + fixed preference order (en, de, fr, es, zh), same `und` fallback.
    * The greatest/CASE fragments are shared by q19 and q39.
    */
  private val langScores = graft.functions.TextFunctions.LangMarkers.map { case (l, ws) =>
    l -> ws.map(hitsSql).mkString("(", " + ", ")")
  }
  private val langGreatest = langScores.map(_._2).mkString("greatest(", ", ", ")")
  private val langCases = langScores.map { case (l, s) =>
    s"WHEN $s = best AND $s > 0 THEN '$l'"
  }.mkString(" ")

  private val langIdSql: String =
    s"""WITH scored AS (SELECT lang, text, $langGreatest AS best FROM documents)
        SELECT lang, CASE $langCases ELSE 'und' END AS predicted, count(*) AS n_docs
        FROM scored GROUP BY 1, 2 ORDER BY lang, predicted"""

  /** q39: the composed curation verdict. Repetition uses an INTEGER
    * cross-multiply (top*5 > total ⇔ top fraction > 0.2) so no double
    * division can drift between engines.
    */
  private val qualityFilterSql: String =
    s"""WITH tok AS (
          SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS t
          FROM documents),
        grams AS (
          SELECT doc_id,
                 CASE WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
                      ELSE [array_to_string(t[i:i+1], ' ')
                            for i in range(1, len(t))] END AS g
          FROM tok),
        rep AS (
          SELECT doc_id, max(c) * 5 > sum(c) AS bad_repetitive
          FROM (SELECT doc_id, gram, count(*) AS c
                FROM (SELECT doc_id, unnest(g) AS gram FROM grams)
                GROUP BY doc_id, gram)
          GROUP BY doc_id),
        lang AS (
          SELECT doc_id, CASE $langCases ELSE 'und' END AS predicted
          FROM (SELECT doc_id, text, $langGreatest AS best FROM documents)),
        base AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM tok)
        SELECT b.doc_id, b.n_tokens,
               b.n_tokens < 15 AS bad_short,
               r.bad_repetitive,
               l.predicted = 'und' AS bad_lang,
               NOT (b.n_tokens < 15 OR r.bad_repetitive OR l.predicted = 'und') AS keep
        FROM base b JOIN rep r USING (doc_id) JOIN lang l USING (doc_id)
        ORDER BY doc_id"""

  /** q40: the PII patterns are interpolated from the SAME Curation
    * constants the Spark side compiles, so the two engines run
    * byte-identical regex text (the patterns stay inside the
    * Java-regex ∩ RE2 subset). Replacement order — email, id, ip — is
    * part of the contract and mirrored exactly.
    */
  private val piiRedactionSql: String = {
    import graft.functions.Curation.{EmailRe, Ipv4Re, GovIdRe}
    s"""WITH aug AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 3 = 0 THEN text
                      ELSE concat(text, ' contact u', CAST(doc_id AS VARCHAR),
                                  '@ex', CAST(doc_id % 7 AS VARCHAR),
                                  '.org via 10.', CAST(doc_id % 200 AS VARCHAR),
                                  '.', CAST(doc_id % 256 AS VARCHAR),
                                  '.9 id 867-53-',
                                  lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))
                 END AS aug
          FROM documents),
        red AS (
          SELECT doc_id, aug,
                 regexp_replace(regexp_replace(regexp_replace(aug,
                   '$EmailRe', '<EMAIL>', 'g'),
                   '$GovIdRe', '<ID>', 'g'),
                   '$Ipv4Re', '<IP>', 'g') AS redacted
          FROM aug)
        SELECT doc_id,
               CAST(len(regexp_extract_all(aug, '$EmailRe')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(aug, '$Ipv4Re')) AS BIGINT) AS n_ips,
               CAST(len(regexp_extract_all(aug, '$GovIdRe')) AS BIGINT) AS n_ids,
               CAST(length(redacted) AS BIGINT) AS redacted_len,
               md5(redacted) AS redacted_md5
        FROM red ORDER BY doc_id"""
  }

  /** q49: the composed pipeline — dup survivorship (grouped by text —
    * identical grouping to Spark's md5 key absent collisions), the q39
    * quality fragments, and the q41 split arithmetic, composed exactly
    * as the Spark plan composes them.
    */
  private val curationPipelineSql: String =
    s"""WITH tok AS (
          SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS t
          FROM documents),
        grams AS (
          SELECT doc_id,
                 CASE WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
                      ELSE [array_to_string(t[i:i+1], ' ')
                            for i in range(1, len(t))] END AS g
          FROM tok),
        rep AS (
          SELECT doc_id, max(c) * 5 > sum(c) AS bad_repetitive
          FROM (SELECT doc_id, gram, count(*) AS c
                FROM (SELECT doc_id, unnest(g) AS gram FROM grams)
                GROUP BY doc_id, gram)
          GROUP BY doc_id),
        lang AS (
          SELECT doc_id, CASE $langCases ELSE 'und' END AS predicted
          FROM (SELECT doc_id, text, $langGreatest AS best FROM documents)),
        dup AS (
          SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS keep_id
          FROM documents),
        bucket AS (
          SELECT doc_id,
                 (strpos('0123456789abcdef', substring(hx, 1, 1)) - 1) * 16 +
                 (strpos('0123456789abcdef', substring(hx, 2, 1)) - 1) AS b
          FROM (SELECT doc_id, md5('split:' || CAST(doc_id AS VARCHAR)) AS hx
                FROM documents)),
        verdict AS (
          SELECT t.doc_id,
                 d.doc_id <> d.keep_id AS is_dup_loser,
                 NOT (CAST(len(t.t) AS BIGINT) < 15 OR r.bad_repetitive
                      OR l.predicted = 'und') AS quality_keep
          FROM tok t JOIN rep r ON t.doc_id = r.doc_id
                     JOIN lang l ON t.doc_id = l.doc_id
                     JOIN dup d ON t.doc_id = d.doc_id)
        SELECT v.doc_id, v.is_dup_loser, v.quality_keep,
               (NOT v.is_dup_loser) AND v.quality_keep AS keep,
               CASE WHEN (NOT v.is_dup_loser) AND v.quality_keep THEN
                 CASE WHEN k.b < 230 THEN 'train'
                      WHEN k.b < 243 THEN 'val'
                      ELSE 'test' END
               ELSE 'dropped' END AS split
        FROM verdict v JOIN bucket k ON v.doc_id = k.doc_id
        ORDER BY v.doc_id"""


  /** q204: the WHOLE composed pretraining pipeline replayed as one
    * DuckDB query — q50's normalize fragment, q40's scrub patterns
    * (interpolated from the same Curation constants), the exact-dup
    * window, q136's exact-Jaccard near-dup + recursive-closure
    * survivorship (so LSH completeness is certified INSIDE the
    * composition), q37's 13-gram contamination, q51's classifier
    * margin, q41's split arithmetic, and q80's packing closed form.
    */
  private val pretrainPipelineSql: String = {
    import graft.functions.Curation.{EmailRe, Ipv4Re, GovIdRe}
    s"""WITH RECURSIVE bodied AS (
          SELECT doc_id, n_chars,
                 CASE WHEN doc_id % 97 = 0 THEN
                   'standard boilerplate notice duplicated verbatim across ' ||
                   'mirrors retained canonical record nine ten eleven twelve thirteen'
                 ELSE text END AS text
          FROM documents),
        base AS (
          SELECT doc_id, n_chars,
                 trim(regexp_replace(regexp_replace(
                   chr(7) || '  ' ||
                   regexp_replace(text, ' the ',
                     ' ' || chr(9) || 'the' || chr(10) || '  ', 'g') ||
                   ' u@x.io 1.2.3.4 111-22-3333 ' || chr(127),
                   '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'),
                   '[ \\t\\n\\r]+', ' ', 'g')) AS norm
          FROM bodied),
        clean AS MATERIALIZED (
          SELECT doc_id, n_chars,
                 regexp_replace(regexp_replace(regexp_replace(norm,
                   '$EmailRe', '<EMAIL>', 'g'),
                   '$GovIdRe', '<ID>', 'g'),
                   '$Ipv4Re', '<IP>', 'g') AS clean
          FROM base),
        tokc AS MATERIALIZED (
          SELECT doc_id, regexp_split_to_array(trim(clean), '\\s+') AS t
          FROM clean),
        ntok AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tok FROM tokc),
        dup AS (
          SELECT doc_id, min(doc_id) OVER (PARTITION BY clean) AS keep_id
          FROM clean),
        winners AS MATERIALIZED (
          SELECT c.doc_id, c.n_chars, c.clean
          FROM clean c JOIN dup d USING (doc_id) WHERE d.doc_id = d.keep_id),
        wt AS (
          SELECT doc_id, regexp_split_to_array(trim(clean), '\\s+') AS t
          FROM winners),
        sh AS MATERIALIZED (
          SELECT doc_id,
                 CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                      ELSE list_distinct([array_to_string(t[i:i+2], ' ')
                                          for i in range(1, len(t) - 1)]) END AS s
          FROM wt),
        prs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                  / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5),
        edges AS (
          SELECT id_a AS a, id_b AS b FROM prs
          UNION SELECT id_b, id_a FROM prs),
        reach(id, r) AS (
          SELECT doc_id, doc_id FROM winners
          UNION
          SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
        comp AS (SELECT id AS doc_id, min(r) AS cluster FROM reach GROUP BY id),
        ndrep AS (
          SELECT cluster, doc_id AS rep FROM (
            SELECT c.cluster, c.doc_id,
                   row_number() OVER (PARTITION BY c.cluster
                     ORDER BY w.n_chars DESC, c.doc_id) AS rn
            FROM comp c JOIN winners w USING (doc_id)) WHERE rn = 1),
        nd AS (
          SELECT c.doc_id, c.doc_id = r.rep AS nd_keep
          FROM comp c JOIN ndrep r USING (cluster)),
        g13 AS (
          SELECT doc_id,
                 CASE WHEN len(t) < 13 THEN [array_to_string(t, ' ')]
                      ELSE list_distinct([array_to_string(t[i:i+12], ' ')
                                          for i in range(1, len(t) - 11)]) END AS g
          FROM tokc),
        bg AS (
          SELECT doc_id AS bench_id, unnest(g) AS gram
          FROM g13 WHERE doc_id % 50 = 0),
        candg AS (
          SELECT d.doc_id, unnest(d.g) AS gram
          FROM g13 d JOIN nd USING (doc_id)
          WHERE nd.nd_keep AND d.doc_id % 50 <> 0),
        contam AS (
          SELECT DISTINCT c.doc_id
          FROM candg c JOIN bg b USING (gram) WHERE c.doc_id <> b.bench_id),
        qw AS (
          SELECT doc_id,
                 SUM((strpos('0123456789abcdef',
                        substring(md5('clf:' || t), 1, 1)) - 1) * 16 +
                     (strpos('0123456789abcdef',
                        substring(md5('clf:' || t), 2, 1)) - 1) - 128) AS margin
          FROM (SELECT doc_id, unnest(t) AS t FROM tokc)
          GROUP BY doc_id),
        spl AS (
          SELECT doc_id,
                 CASE WHEN b < 230 THEN 'train'
                      WHEN b < 243 THEN 'val' ELSE 'test' END AS split
          FROM (SELECT doc_id,
                       (strpos('0123456789abcdef', substring(hx, 1, 1)) - 1) * 16 +
                       (strpos('0123456789abcdef', substring(hx, 2, 1)) - 1) AS b
                FROM (SELECT doc_id, md5('split:' || CAST(doc_id AS VARCHAR)) AS hx
                      FROM clean))),
        labeled AS (
          SELECT c.doc_id, n.n_tok,
                 CASE WHEN d.doc_id <> d.keep_id THEN 'drop:exact_dup'
                      WHEN NOT nd.nd_keep THEN 'drop:near_dup'
                      WHEN c.doc_id % 50 = 0 THEN 'drop:benchmark'
                      WHEN ct.doc_id IS NOT NULL THEN 'drop:contaminated'
                      WHEN q.margin < 0 THEN 'drop:quality'
                      ELSE s.split END AS bucket
          FROM clean c
          JOIN dup d USING (doc_id)
          JOIN ntok n USING (doc_id)
          LEFT JOIN nd USING (doc_id)
          LEFT JOIN contam ct USING (doc_id)
          JOIN qw q USING (doc_id)
          JOIN spl s USING (doc_id)),
        stats AS (
          SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(n_tok) AS BIGINT) AS n_tokens
          FROM labeled GROUP BY 1),
        keptt AS (
          SELECT bucket, CAST(sum(n_tok) AS BIGINT) AS tot
          FROM labeled WHERE bucket NOT LIKE 'drop:%' GROUP BY 1)
        SELECT st.bucket, st.n_docs, st.n_tokens,
               coalesce(CAST(ceil(k.tot / 256.0) AS BIGINT), 0) AS n_seqs,
               coalesce(k.tot, 0) AS packed_tokens,
               coalesce(k.tot // 256, 0) AS n_full
        FROM stats st LEFT JOIN keptt k USING (bucket)
        ORDER BY st.bucket"""
  }

  val all: Map[String, String] = Map(
    "q19_lang_id" -> langIdSql,
    "q39_quality_filter" -> qualityFilterSql,
    "q40_pii_redaction" -> piiRedactionSql,
    "q49_curation_pipeline" -> curationPipelineSql,
    "q204_pretrain_pipeline" -> pretrainPipelineSql,

    // q46: gram strings rebuilt with the same tokenization; DuckDB
    // counts/joins STRINGS where Spark rides xxhash64 — equality
    // certifies the hashed path. The avg is one IEEE division of
    // exact integers, so it is engine-exact.
    "q46_bigram_commonness" -> """
      WITH tok AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
      grams AS (
        SELECT doc_id, unnest(
          CASE WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
               ELSE [array_to_string(t[i:i+1], ' ')
                     for i in range(1, len(t))] END) AS gram
        FROM tok),
      counts AS (SELECT gram, count(*) AS corpus_count FROM grams GROUP BY gram)
      SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(c.corpus_count) AS BIGINT) AS sum_counts,
             CAST(sum(c.corpus_count) AS DOUBLE) / count(*) AS avg_commonness
      FROM grams g JOIN counts c ON g.gram = c.gram
      GROUP BY g.doc_id ORDER BY g.doc_id""",

    // q47: md5 hex strings sort identically (lowercase hex, ASCII), so
    // the per-stratum order and the integer quota arithmetic reproduce
    // the sample exactly.
    "q47_stratified_sample" -> """
      WITH w AS (
        SELECT lang, doc_id,
               row_number() OVER (PARTITION BY lang
                 ORDER BY md5('sample:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn,
               count(*) OVER (PARTITION BY lang) AS n
        FROM documents)
      SELECT lang, CAST(rn AS BIGINT) AS rank, doc_id
      FROM w WHERE rn <= floor((n + 9) / 10.0)
      ORDER BY lang, rank""",

    // q48: global top-5 vocab under (count desc, token asc) — a total
    // order, so LIMIT is deterministic in both engines.
    "q48_vocab_coverage" -> """
      WITH toks AS (
        SELECT lang, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        FROM documents),
      vocab AS (
        SELECT token FROM (
          SELECT token, count(*) AS c FROM toks GROUP BY token
          ORDER BY c DESC, token LIMIT 5)),
      j AS (
        SELECT t.lang, CASE WHEN v.token IS NOT NULL THEN 1 ELSE 0 END AS hit
        FROM toks t LEFT JOIN vocab v ON t.token = v.token)
      SELECT lang, CAST(count(*) AS BIGINT) AS total_tokens,
             CAST(sum(hit) AS BIGINT) AS covered_tokens,
             CAST(sum(hit) AS DOUBLE) / count(*) AS coverage
      FROM j GROUP BY lang ORDER BY lang""",

    // q51: every per-token bucket weight recomputed with md5 hex
    // arithmetic and re-summed through an explode+groupBy — the hash
    // match proves Spark's shuffle-free HOF reduce computes the same
    // margins as the relational formulation.
    "q51_classifier_score" -> """
      WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
        FROM documents),
      w AS (
        SELECT doc_id,
               (strpos('0123456789abcdef', substring(md5('clf:' || t), 1, 1)) - 1) * 16 +
               (strpos('0123456789abcdef', substring(md5('clf:' || t), 2, 1)) - 1)
               - 128 AS wt
        FROM tok)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(wt) AS BIGINT) AS margin,
             sum(wt) >= 0 AS keep
      FROM w GROUP BY doc_id ORDER BY doc_id""",

    // q52: first-occurrence-keep rebuilt with a window over paragraph
    // ordinals + an ordered string_agg — certifying array_distinct's
    // ordering contract engine-independently, md5-byte-exact.
    "q52_para_dedup" -> """
      WITH c AS (
        SELECT doc_id, text,
               text || chr(10) || text || chr(10) || 'END ' || substring(text, 1, 20)
                 AS corrupt
        FROM documents),
      p AS (
        SELECT doc_id, corrupt, text,
               unnest(string_split(corrupt, chr(10))) AS para,
               generate_subscripts(string_split(corrupt, chr(10)), 1) AS i
        FROM c),
      k AS (
        SELECT doc_id, corrupt, text, para, i,
               min(i) OVER (PARTITION BY doc_id, para) AS first_i
        FROM p),
      d AS (
        SELECT doc_id,
               CAST(max(i) AS BIGINT) AS n_paras_in,
               CAST(count(DISTINCT para) AS BIGINT) AS n_paras_out,
               string_agg(CASE WHEN i = first_i THEN para END, chr(10) ORDER BY i)
                 AS deduped,
               any_value(text) AS text
        FROM k GROUP BY doc_id)
      SELECT doc_id, n_paras_in, n_paras_out,
             md5(deduped) AS dedup_md5,
             deduped = text || chr(10) || 'END ' || substring(text, 1, 20) AS restored
      FROM d ORDER BY doc_id""",

    // q53: per-source counts + the integer cross-multiply keep rule,
    // bucket from the same md5 hex arithmetic as q41 — the match proves
    // the mixing decision is a pure engine-independent function.
    "q53_source_mix" -> """
      WITH c AS (SELECT source, count(*) AS n_source FROM documents GROUP BY source),
      t AS (SELECT min(n_source) AS target FROM c),
      b AS (
        SELECT doc_id, source,
               (strpos('0123456789abcdef', substring(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 +
               (strpos('0123456789abcdef', substring(md5('mix:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
                 AS bucket
        FROM documents)
      SELECT b.doc_id, b.source, CAST(c.n_source AS BIGINT) AS n_source,
             CAST(t.target AS BIGINT) AS target,
             CAST(b.bucket AS INTEGER) AS bucket,
             b.bucket * c.n_source < 256 * t.target AS keep
      FROM b JOIN c ON b.source = c.source CROSS JOIN t
      ORDER BY b.doc_id""",

    // q41: DuckDB reproduces Curation.hashBucket256 — first two hex
    // chars of md5('split:' || id) decoded with strpos arithmetic —
    // proving the split function is engine-independent, which is the
    // operator's entire point.
    "q41_split_assign" -> """
      WITH h AS (
        SELECT doc_id, md5('split:' || CAST(doc_id AS VARCHAR)) AS hx FROM documents),
      b AS (
        SELECT doc_id,
               (strpos('0123456789abcdef', substring(hx, 1, 1)) - 1) * 16 +
               (strpos('0123456789abcdef', substring(hx, 2, 1)) - 1) AS bucket
        FROM h)
      SELECT doc_id, CAST(bucket AS INTEGER) AS bucket,
             CASE WHEN bucket < 230 THEN 'train'
                  WHEN bucket < 243 THEN 'val'
                  ELSE 'test' END AS split
      FROM b ORDER BY doc_id""",

    // q42: lines rebuilt with the same 1-based slice arithmetic; the
    // oracle groups/joins on line STRINGS where Spark uses xxhash64 —
    // equality certifies the hashed path (q37's construction).
    "q42_line_dedup" -> """
      WITH tok AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
      ln AS (
        SELECT doc_id,
               array_to_string(t[(i*8+1):least((i+1)*8, len(t))], ' ') AS line,
               least((i+1)*8, len(t)) - i*8 AS n_tokens
        FROM (SELECT doc_id, t,
                     unnest(generate_series(0, CAST(ceil(len(t)/8.0) AS INT) - 1)) AS i
              FROM tok)),
      dup AS (
        SELECT line AS dline FROM ln GROUP BY line HAVING count(DISTINCT doc_id) >= 3)
      SELECT l.doc_id, CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CASE WHEN d.dline IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_lines,
             CAST(sum(CASE WHEN d.dline IS NULL THEN l.n_tokens ELSE 0 END) AS BIGINT)
               AS kept_tokens
      FROM ln l LEFT JOIN dup d ON l.line = d.dline
      GROUP BY l.doc_id ORDER BY l.doc_id""",

    // q43: window cumsum + generate_series reproduces the closed-form
    // offset expansion; all arithmetic integer-exact.
    "q43_seq_packing" -> """
      WITH d AS (
        SELECT source, doc_id,
               len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
        FROM documents),
      off AS (
        SELECT source, doc_id, n_tokens,
               sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM d),
      ex AS (
        SELECT source, doc_id, cum - n_tokens AS start_tok, cum,
               unnest(generate_series(CAST(floor((cum - n_tokens) / 128.0) AS BIGINT),
                                      CAST(floor((cum - 1) / 128.0) AS BIGINT))) AS seq_id
        FROM off)
      SELECT source, seq_id, CAST(count(*) AS BIGINT) AS n_docs,
             min(doc_id) AS first_doc, max(doc_id) AS last_doc,
             CAST(sum(least(cum, (seq_id + 1) * 128) -
                      greatest(start_tok, seq_id * 128)) AS BIGINT) AS n_tokens
      FROM ex GROUP BY source, seq_id ORDER BY source, seq_id""",

    // q50: DuckDB re-plants the identical damage (chr() for the control
    // bytes, literal tab/newline in the replacement) and repairs it with
    // the same two regexes — `restored` certifies byte-exact inversion.
    "q50_normalize_text" -> """
      WITH c AS (
        SELECT doc_id, text,
               chr(7) || '  ' ||
               regexp_replace(text, ' the ', ' ' || chr(9) || 'the' || chr(10) || '  ', 'g') ||
               chr(127) || ' ' AS corrupt
        FROM documents),
      n AS (
        SELECT doc_id, text, corrupt,
               trim(regexp_replace(regexp_replace(corrupt,
                 '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
                 '[ \t\n\r]+', ' ', 'g')) AS norm
        FROM c)
      SELECT doc_id,
             CAST(length(corrupt) AS BIGINT) AS len_corrupt,
             CAST(length(norm) AS BIGINT) AS len_norm,
             md5(norm) = md5(text) AS restored
      FROM n ORDER BY doc_id""",

    // q44: discrete quantiles at explicitly-defined ranks (value at
    // row_number ceil(p*n) under (n_chars, doc_id)) — integer-exact
    // where interpolated quantile_cont would drift in the last ulp.
    "q44_length_quantiles" -> """
      WITH r AS (
        SELECT lang, n_chars, doc_id,
               row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
               count(*) OVER (PARTITION BY lang) AS n
        FROM documents)
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             min(n_chars) AS min_chars,
             max(CASE WHEN rn = floor((n + 1) / 2.0) THEN n_chars END) AS p50,
             max(CASE WHEN rn = floor((n * 9 + 9) / 10.0) THEN n_chars END) AS p90,
             max(CASE WHEN rn = floor((n * 99 + 99) / 100.0) THEN n_chars END) AS p99,
             max(n_chars) AS max_chars
      FROM r GROUP BY lang ORDER BY lang""",

    // q20/q21: the oracle is ALL-pairs exact Jaccard — no LSH. Equality
    // with Spark's banded-LSH output proves the candidate stage missed
    // nothing above threshold on this dataset (hashes are seeded, so
    // this is deterministic, and the planted near-dups sit at
    // jaccard >= 0.9 where band recall is effectively total).
    "q20_minhash_dedup" -> """
      WITH tok AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
      sh AS (
        SELECT doc_id,
               CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                    ELSE list_distinct([array_to_string(t[i:i+2], ' ')
                                        for i in range(1, len(t) - 1)]) END AS s
        FROM tok),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= 0.5
      ORDER BY id_a, id_b""",

    // q36: q20's edges + a recursive-CTE transitive closure — the
    // sequential answer to what large-star/small-star computes
    // distributively. min reachable id per doc = cluster root.
    "q36_dup_clusters" -> """
      WITH RECURSIVE tok AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
      sh AS (
        SELECT doc_id,
               CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                    ELSE list_distinct([array_to_string(t[i:i+2], ' ')
                                        for i in range(1, len(t) - 1)]) END AS s
        FROM tok),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5),
      edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
      reach(id, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
      comp AS (SELECT id AS doc_id, min(r) AS cluster FROM reach GROUP BY id)
      SELECT doc_id, cluster, doc_id = cluster AS keep
      FROM comp ORDER BY doc_id""",

    // q37: gram tables rebuilt from the same tokenization; DuckDB joins
    // gram STRINGS where Spark joins xxhash64 gram hashes — equality
    // certifies the hashed path too. Short docs (< 13 tokens) take the
    // whole-text fallback, mirroring Shingles' semantics.
    "q37_contamination" -> """
      WITH tok AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
      grams AS (
        SELECT doc_id,
               CASE WHEN len(t) < 13 THEN [array_to_string(t, ' ')]
                    ELSE list_distinct([array_to_string(t[i:i+12], ' ')
                                        for i in range(1, len(t) - 11)]) END AS g
        FROM tok),
      dg AS (SELECT doc_id, unnest(g) AS gram FROM grams),
      bg AS (SELECT doc_id AS bench_id, gram FROM dg WHERE doc_id % 50 = 0)
      SELECT d.doc_id, count(DISTINCT d.gram) AS matched_grams,
             count(DISTINCT b.bench_id) AS bench_docs
      FROM dg d JOIN bg b USING (gram) WHERE d.doc_id <> b.bench_id
      GROUP BY d.doc_id ORDER BY d.doc_id""",

    // q38: the oracle counts gram STRINGS via explode + group; Spark's
    // GramStats hashes windows in one codegen'd pass — equality also
    // certifies the hashed run-scan. Bigrams keep duplicates (no
    // list_distinct), unlike the dedup oracles.
    "q38_repetition" -> """
      WITH tok AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
      grams AS (
        SELECT doc_id,
               CASE WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
                    ELSE [array_to_string(t[i:i+1], ' ')
                          for i in range(1, len(t))] END AS g
        FROM tok),
      counts AS (
        SELECT doc_id, gram, count(*) AS c
        FROM (SELECT doc_id, unnest(g) AS gram FROM grams)
        GROUP BY doc_id, gram)
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS total_bigrams,
             CAST(count(*) AS BIGINT) AS distinct_bigrams,
             CAST(max(c) AS BIGINT) AS top_count
      FROM counts GROUP BY doc_id ORDER BY doc_id""",

    "q21_simhash_dedup" -> """
      WITH tok AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
      sh AS (
        SELECT doc_id,
               CASE WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
                    ELSE list_distinct([array_to_string(t[i:i+1], ' ')
                                        for i in range(1, len(t))]) END AS s
        FROM tok),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= 0.5
      ORDER BY id_a, id_b""",

    // q30/q31: the SAME SQL text Spark executes — textual SQL parity
    "q30_sql_scalar_subquery" -> graft.queries.Queries.sqlScalarSubquery,
    "q31_sql_exists_having" -> graft.queries.Queries.sqlExistsHaving,

    // q32: the chunk boundary is RollingChunks' neutral mode — token
    // hash = first 13 hex chars of md5 (byte-identical in both
    // engines), boundary where the 8-token window SUM ≡ 0 mod 16, last
    // token always closes. The oracle rebuilds the chunks as STRINGS
    // from that arithmetic and joins on them where Spark joins the
    // 64-bit fingerprint fold — equality certifies the hashed path
    // collides on nothing (the q37/q42/q56 construction).
    "q32_chunk_dedup" -> """
      WITH tok AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
      tl AS (
        SELECT doc_id, i, t[i] AS tk
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i FROM tok)),
      h AS (
        SELECT doc_id, i, tk,
               ('0x' || substr(md5(tk), 1, 13))::BIGINT AS hv FROM tl),
      s AS (
        SELECT doc_id, i, tk,
               sum(hv) OVER (PARTITION BY doc_id ORDER BY i
                             ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS ws,
               count(*) OVER (PARTITION BY doc_id ORDER BY i
                              ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS wn
        FROM h),
      b AS (
        SELECT doc_id, i, tk,
               CASE WHEN wn = 8 AND ws % 16 = 0 THEN 1 ELSE 0 END AS is_b
        FROM s),
      cid AS (
        SELECT doc_id, i, tk,
               COALESCE(sum(is_b) OVER (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
        FROM b),
      ch AS (
        SELECT DISTINCT doc_id, chunk
        FROM (SELECT doc_id, c, string_agg(tk, ' ' ORDER BY i) AS chunk
              FROM cid GROUP BY doc_id, c))
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(count(*) AS BIGINT) AS shared_chunks
      FROM ch a JOIN ch b ON a.chunk = b.chunk AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING count(*) >= 1
      ORDER BY id_a, id_b""",

    // q34: the engine-specific sketch binaries stay out of the output —
    // the oracle replays the exact per-day and union distinct legs and
    // pins in_bracket TRUE (the merged HLL estimate at lgK=12 sits well
    // inside 5% of exact; drift flips the hash). The q81/q78/q126
    // recipe.
    "q34_sketch_union" -> """
      WITH ev AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
      tot AS (SELECT count(DISTINCT user_id) AS u FROM ev)
      SELECT day,
             count(DISTINCT user_id) AS exact_users,
             CAST(count(*) AS BIGINT) AS n_events,
             (SELECT u FROM tot) AS exact_union_users,
             TRUE AS in_bracket
      FROM ev GROUP BY day ORDER BY day""",

    "q22_embedding_topk" -> """
      WITH pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
               list_cosine_similarity(c.embedding, q.embedding) AS cos
        FROM embeddings c JOIN embeddings q
          ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
      ranked AS (
        SELECT query_id, corpus_id,
               CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, corpus_id) AS INTEGER) AS rank
        FROM pairs)
      SELECT query_id, rank, corpus_id FROM ranked WHERE rank <= 5
      ORDER BY query_id, rank""",

    "q24_embedding_meta" -> """
      SELECT label, count(*) AS n_vecs,
             CAST(min(len(embedding)) AS BIGINT) AS dim_min,
             CAST(max(len(embedding)) AS BIGINT) AS dim_max
      FROM embeddings GROUP BY label ORDER BY label""",

    "q25_bpe_tokens" -> """
      SELECT lang, count(*) AS n_docs,
             CAST(sum(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]'))) AS BIGINT) AS total_bpeish,
             CAST(max(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]'))) AS BIGINT) AS max_bpeish
      FROM documents GROUP BY lang ORDER BY lang""",

    "q27_sessionize" -> """
      WITH ordered AS (
        SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
      flags AS (
        SELECT user_id, sec, event_id,
               CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM ordered WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
      sess AS (
        SELECT user_id,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY sec, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flags),
      per AS (SELECT user_id, session_seq, count(*) AS n_events FROM sess GROUP BY 1, 2)
      SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_session_events
      FROM per GROUP BY 1 ORDER BY user_id""",

    "q28_exact_dedup_keep" -> """
      WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id < 50),
      groups AS (
        SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS dup_count
        FROM corpus GROUP BY 1)
      SELECT dup_count, count(*) AS n_groups, CAST(sum(keep_id) AS BIGINT) AS keep_id_sum
      FROM groups GROUP BY 1 ORDER BY dup_count""",

    // q29: the exact distinct leg replays directly; in_bracket (the
    // HLL++ estimate within 3x its requested rsd of the exact count)
    // is pinned TRUE — the q78 bracket recipe, so estimator drift
    // flips the hash while the engine-specific estimate stays out of
    // the compare.
    "q29_approx_distinct" -> """
      SELECT l_returnflag,
             CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
             count(*) AS n_rows,
             TRUE AS in_bracket
      FROM lineitem GROUP BY 1 ORDER BY l_returnflag""",
    "q01_pricing_summary" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q02_top_orders" -> """
      SELECT l_orderkey, o_orderpriority,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1996-07-01 00:00:00'
      GROUP BY l_orderkey, o_orderpriority
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10""",

    "q03_region_revenue" -> """
      SELECT n_name,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
             count(*) AS n_lineitems
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY n_name
      ORDER BY n_name""",

    "q04_distinct_agg" -> """
      SELECT l_returnflag,
             count(DISTINCT l_orderkey) AS n_orders,
             count(DISTINCT l_partkey) AS n_parts,
             count(*) AS n_rows
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    "q05_window_rank" -> """
      SELECT l_suppkey, rn, l_orderkey, l_linenumber,
             CAST(CAST(revenue AS DECIMAL(18,6)) AS DOUBLE) AS revenue
      FROM (
        SELECT l_suppkey, l_orderkey, l_linenumber,
               l_extendedprice * (1.0 - l_discount) AS revenue,
               row_number() OVER (PARTITION BY l_suppkey
                 ORDER BY l_extendedprice * (1.0 - l_discount) DESC, l_orderkey, l_linenumber) AS rn
        FROM lineitem)
      WHERE rn <= 3
      ORDER BY l_suppkey, rn""",

    "q06_cust_no_orders" -> """
      SELECT c_mktsegment, count(*) AS n_customers
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",

    "q07_rollup" -> """
      SELECT coalesce(l_returnflag, 'ALL') AS return_flag,
             coalesce(l_linestatus, 'ALL') AS line_status,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
             count(*) AS n_rows
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY return_flag, line_status""",

    "q08_orders_by_month" -> """
      SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
             count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_price
      FROM orders
      GROUP BY 1
      ORDER BY order_month""",

    "q09_priority_customers" -> """
      SELECT upper(substr(c_mktsegment, 1, 4)) AS segment_prefix,
             count(*) AS n_customers,
             CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_acctbal
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_orderpriority IN ('1-URGENT', '2-HIGH'))
      GROUP BY 1
      ORDER BY segment_prefix""",

    "q10_ledger_dedup" -> """
      SELECT user_id,
             count(*) AS times_received,
             CAST(floor(epoch(min(ts))) AS BIGINT) AS first_receive_epoch,
             CAST(floor(epoch(max(ts))) AS BIGINT) AS last_receive_epoch
      FROM events
      GROUP BY user_id
      ORDER BY user_id""",

    "q11_batch_assign" -> """
      SELECT user_id,
             CAST(floor(rn / 10) AS INTEGER) AS batch_seq,
             count(*) AS n_files,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS batch_bytes,
             CAST(floor(epoch(min(ts))) AS BIGINT) AS first_write_epoch,
             CAST(floor(epoch(max(ts))) AS BIGINT) AS last_write_epoch
      FROM (
        SELECT user_id, ts, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn
        FROM events)
      GROUP BY user_id, CAST(floor(rn / 10) AS INTEGER)
      ORDER BY user_id, batch_seq""",

    "q12_prefix_wildcard" -> """
      SELECT regexp_replace(source || '/lang=' || lang || '/doc', '=([^/]*)', '=*', 'g') AS config_prefix,
             count(*) AS n_files,
             CAST(sum(n_chars) AS BIGINT) AS total_bytes
      FROM documents
      GROUP BY 1
      ORDER BY config_prefix""",

    "q13_admission_filter" -> """
      SELECT event_type,
             count(*) AS n_admitted,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_size
      FROM events
      WHERE regexp_matches(event_type, '^(click|view|purchase)$') AND value > 1.0
      GROUP BY event_type
      ORDER BY event_type""",

    "q14_event_window" -> """
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS window_hour,
             event_type,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      FROM events
      GROUP BY 1, 2
      ORDER BY window_hour, event_type""",

    "q15_text_stats" -> """
      SELECT lang,
             count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS total_chars,
             CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS total_tokens,
             CAST(sum(CAST(n_chars AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_chars
      FROM documents
      GROUP BY lang
      ORDER BY lang""",

    "q35_top_tokens" -> """
      WITH toks AS (
        SELECT lang, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        FROM documents
      ), counts AS (
        SELECT lang, token, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY 1, 2
      ), ranked AS (
        SELECT lang, token, n,
               row_number() OVER (PARTITION BY lang ORDER BY n DESC, token ASC) AS rank
        FROM counts
      )
      SELECT lang, CAST(rank AS BIGINT) AS rank, token, n
      FROM ranked WHERE rank <= 5
      ORDER BY lang, rank""",

    "q16_exact_dedup" -> """
      SELECT dup_count, count(*) AS n_groups
      FROM (SELECT md5(text) AS h, count(*) AS dup_count
            FROM documents GROUP BY 1)
      GROUP BY dup_count
      ORDER BY dup_count""",

    "q17_quality_score" -> """
      WITH scored AS (
        SELECT lang,
               len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
               CAST((length(text) - length(regexp_replace(text, ' the ', '', 'g'))) / 5 AS INTEGER) AS stop_hits
        FROM documents)
      SELECT lang,
             count(*) AS n_docs,
             CAST(sum(CASE WHEN n_tokens >= 20 AND stop_hits >= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
             CAST(sum(stop_hits) AS BIGINT) AS total_stop_hits,
             max(n_tokens) AS max_tokens
      FROM scored
      GROUP BY lang
      ORDER BY lang""",

    "q18_fingerprint" -> """
      SELECT substr(md5(lower(trim(text))), 1, 2) AS bucket,
             count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS total_chars
      FROM documents
      GROUP BY 1
      ORDER BY bucket""",

    // q56: ExactSubstr span dedup — grams rebuilt as strings with the
    // same 0-based position arithmetic (Spark rides xxhash64 of the
    // chr(1)-joined gram; equality certifies the hashed path), islands
    // merged with the same running-max rule, one IEEE division.
    "q56_span_dedup" -> """
      WITH tok AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents),
      g AS (
        SELECT doc_id, i AS pos, array_to_string(t[(i+1):(i+8)], chr(1)) AS gram
        FROM (SELECT doc_id, t, unnest(generate_series(0, len(t)-8)) AS i
              FROM tok WHERE len(t) >= 8)),
      dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
      dp AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)),
      isl AS (
        SELECT doc_id, pos,
               CASE WHEN coalesce(max(pos + 8) OVER (PARTITION BY doc_id
                    ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -1) >= pos THEN 0 ELSE 1 END AS new_span
        FROM dp),
      isl2 AS (
        SELECT doc_id, pos, sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
        FROM isl),
      spans AS (
        SELECT doc_id, span_id, min(pos) AS s, max(pos) + 8 AS e
        FROM isl2 GROUP BY doc_id, span_id)
      SELECT sp.doc_id, CAST(count(*) AS BIGINT) AS n_spans,
             CAST(sum(e - s) AS BIGINT) AS dup_tokens,
             CAST(any_value(len(t.t)) AS BIGINT) AS n_tokens,
             CAST(sum(e - s) AS DOUBLE) / any_value(len(t.t)) AS dup_frac
      FROM spans sp JOIN tok t ON sp.doc_id = t.doc_id
      GROUP BY sp.doc_id ORDER BY sp.doc_id""",

    // q60: DuckDB's NATIVE ASOF LEFT JOIN checks AsofJoin's
    // union-and-carry implementation against an independent
    // first-class implementation; the right side is tie-regularized
    // identically on both engines (greatest event_id per (user, ts)).
    "q60_asof_join" -> """
      WITH l AS (
        SELECT event_id, user_id, ts, value FROM events
        WHERE event_type = 'purchase'),
      r AS (
        SELECT user_id, ts, max(event_id) AS event_id,
               max_by(value, event_id) AS value
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
      SELECT l.user_id, l.event_id, l.ts, l.value,
             r.event_id AS r_event_id, r.ts AS r_ts, r.value AS r_value
      FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
      ORDER BY l.event_id""",

    // q68: the tolerance gate as a CASE over the native ASOF match,
    // integer epoch-second arithmetic (q60's construction otherwise).
    "q68_asof_tolerance" -> """
      WITH l AS (
        SELECT event_id, user_id, ts, value FROM events
        WHERE event_type = 'purchase'),
      r AS (
        SELECT user_id, ts, max(event_id) AS event_id,
               max_by(value, event_id) AS value
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
      j AS (
        SELECT l.user_id, l.event_id, l.ts, l.value,
               r.event_id AS re, r.value AS rv, r.ts AS rts
        FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts),
      g AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN rts IS NOT NULL AND
                    abs(CAST(floor(epoch(ts)) AS BIGINT) -
                        CAST(floor(epoch(rts)) AS BIGINT)) <= 3600
                    THEN 1 ELSE 0 END AS fresh,
               re, rv
        FROM j)
      SELECT user_id, event_id, ts, value,
             CASE WHEN fresh = 1 THEN re END AS r_event_id,
             CASE WHEN fresh = 1 THEN rv END AS r_value
      FROM g ORDER BY event_id""",

    // q61: the bucketed equi-join form is checked against DuckDB's
    // plain inequality join over identical click sessions.
    "q61_range_join" -> """
      WITH ev AS (
        SELECT event_id, user_id, event_type,
               CAST(floor(epoch(ts)) AS BIGINT) AS sec
        FROM events),
      flags AS (
        SELECT user_id, event_id, sec,
               CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 1800
                    THEN 1 ELSE 0 END AS new_s
        FROM ev WHERE event_type = 'click'
        WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
      sess0 AS (
        SELECT user_id, sec,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY sec, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
        FROM flags),
      sessions AS (
        SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
               min(sec) AS start_sec, max(sec) + 1800 AS end_sec,
               CAST(count(*) AS BIGINT) AS n_clicks
        FROM sess0 GROUP BY user_id, session_no)
      SELECT e.event_id, e.user_id, e.sec,
             s.session_no AS i_session_no, s.start_sec AS i_start_sec,
             s.end_sec AS i_end_sec, s.n_clicks AS i_n_clicks
      FROM ev e JOIN sessions s
        ON e.user_id = s.user_id AND e.sec BETWEEN s.start_sec AND s.end_sec
      WHERE e.event_type = 'error'
      ORDER BY e.event_id""",

    // q62: same integer rank arithmetic (cum·B ≥ k·n), same
    // strictly-greater bucket rule — ties share a bucket on both
    // engines by construction.
    "q62_quantile_bins" -> """
      WITH counts AS (
        SELECT n_chars AS v, count(*) AS c FROM documents GROUP BY n_chars),
      cum AS (
        SELECT v, sum(c) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               sum(c) OVER () AS n
        FROM counts),
      th AS (
        SELECT k, min(v) AS threshold
        FROM cum, range(1, 10) AS r(k)
        WHERE cum * 10 >= k * n
        GROUP BY k),
      assigned AS (
        SELECT d.doc_id, d.n_chars,
               1 + (SELECT count(*) FROM th WHERE d.n_chars > th.threshold)
                 AS bucket
        FROM documents d)
      SELECT CAST(bucket AS INT) AS bucket,
             count(*) AS n_docs,
             min(n_chars) AS min_chars,
             max(n_chars) AS max_chars
      FROM assigned GROUP BY bucket ORDER BY bucket""",

    // q63: chunk windows rebuilt with the same closed-form positions;
    // md5 of the 1-based array slice proves the token arithmetic
    // byte-for-byte.
    "q63_chunk_manifest" -> """
      WITH tok AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents),
      m AS (
        SELECT doc_id, t, len(t) AS n,
               CASE WHEN len(t) <= 64 THEN 1
                    ELSE 1 + CAST(ceil((len(t) - 64) / 48.0) AS BIGINT) END AS m
        FROM tok),
      ch AS (
        SELECT doc_id, n, i AS chunk_id, i * 48 AS start_tok,
               least(i * 48 + 64, n) AS end_tok, t
        FROM (SELECT doc_id, t, n, unnest(generate_series(0, m - 1)) AS i FROM m))
      SELECT doc_id, chunk_id, start_tok, end_tok,
             end_tok - start_tok AS chunk_tokens,
             md5(array_to_string(t[(start_tok + 1):end_tok], ' ')) AS chunk_md5
      FROM ch ORDER BY doc_id, chunk_id""",

    // q64: the composed normalize → chunk → chunk-dedup pipeline —
    // q50's normalization fragment + q63's chunk expansion + a
    // windowed keeper rule, composed exactly as the Spark plan.
    "q64_rag_prep" -> """
      WITH n AS (
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(text,
                 '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
                 '[ \t\n\r]+', ' ', 'g')) AS text
        FROM documents),
      tok AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM n),
      m AS (
        SELECT doc_id, t, len(t) AS n,
               CASE WHEN len(t) <= 64 THEN 1
                    ELSE 1 + CAST(ceil((len(t) - 64) / 48.0) AS BIGINT) END AS m
        FROM tok),
      ch AS (
        SELECT doc_id, i AS chunk_id,
               least(i * 48 + 64, n) - i * 48 AS chunk_tokens,
               md5(array_to_string(t[(i * 48 + 1):least(i * 48 + 64, n)], ' '))
                 AS chunk_md5
        FROM (SELECT doc_id, t, n, unnest(generate_series(0, m - 1)) AS i FROM m)),
      marked AS (
        SELECT doc_id, chunk_tokens,
               count(*) OVER (PARTITION BY chunk_md5) AS occ,
               row_number() OVER (PARTITION BY chunk_md5
                 ORDER BY doc_id, chunk_id) AS rn
        FROM ch)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
             CAST(sum(CASE WHEN occ >= 2 AND rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_chunks,
             CAST(sum(CASE WHEN occ >= 2 AND rn > 1 THEN 0 ELSE chunk_tokens END)
               AS BIGINT) AS kept_chunk_tokens
      FROM marked GROUP BY doc_id ORDER BY doc_id""",

    // q66: the same md5 bucket (q41's strpos arithmetic) and integer
    // div/mod fixed-point expansion, instance-for-instance.
    "q66_epoch_expand" -> """
      WITH recipe AS (
        SELECT 'src' || CAST(i AS VARCHAR) AS source,
               CASE WHEN i = 0 THEN 640 WHEN i = 1 THEN 256
                    WHEN i = 2 THEN 128 ELSE 320 END AS e256
        FROM range(0, 20) AS r(i)),
      b AS (
        SELECT d.doc_id, d.source, r.e256,
               (strpos('0123456789abcdef', substring(hx, 1, 1)) - 1) * 16 +
               (strpos('0123456789abcdef', substring(hx, 2, 1)) - 1) AS bucket
        FROM (SELECT doc_id, source,
                     md5('epoch:' || CAST(doc_id AS VARCHAR)) AS hx
              FROM documents) d
        JOIN recipe r USING (source)),
      n AS (
        SELECT doc_id, source,
               e256 // 256 + CASE WHEN bucket < e256 % 256 THEN 1 ELSE 0 END
                 AS n_copies
        FROM b)
      SELECT doc_id, source, CAST(unnest(generate_series(1, n_copies)) AS INT)
               AS epoch_no
      FROM n WHERE n_copies > 0
      ORDER BY doc_id, epoch_no""",

    // q58: DSIR importance — bigrams rebuilt as strings (Spark rides
    // xxhash64), integer masses, one IEEE division.
    "q58_importance" -> """
      WITH tok AS (
        SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents),
      g AS (
        SELECT doc_id, lang, array_to_string(t[(i+1):(i+2)], chr(1)) AS gram
        FROM (SELECT doc_id, lang, t, unnest(generate_series(0, len(t)-2)) AS i
              FROM tok WHERE len(t) >= 2)),
      c AS (
        SELECT gram, count(*) AS raw_n,
               sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tgt_n
        FROM g GROUP BY gram)
      SELECT g.doc_id,
             CAST(sum(c.tgt_n) AS BIGINT) AS tgt_mass,
             CAST(sum(c.raw_n) AS BIGINT) AS raw_mass,
             CAST(sum(c.tgt_n) + 1 AS DOUBLE) / (sum(c.raw_n) + 1) AS importance
      FROM g JOIN c USING (gram)
      GROUP BY g.doc_id ORDER BY g.doc_id""",

    // q69: q59's exact bracket legs recomputed with the identical
    // clamped integer ceil-rank arithmetic over the same total order —
    // hash equality certifies the GK bracket's ground truth.
    "q69_exact_quantiles" -> """
      WITH ranked AS (
        SELECT lang, n_chars,
               row_number() OVER (PARTITION BY lang
                 ORDER BY n_chars, doc_id) AS rn,
               count(*) OVER (PARTITION BY lang) AS n
        FROM documents)
      SELECT lang, count(*) AS n_docs,
             max(CASE WHEN rn = greatest(1, least(n, (n*48 + 99)//100))
                 THEN n_chars END) AS p48,
             max(CASE WHEN rn = greatest(1, least(n, (n*50 + 99)//100))
                 THEN n_chars END) AS p50,
             max(CASE WHEN rn = greatest(1, least(n, (n*52 + 99)//100))
                 THEN n_chars END) AS p52
      FROM ranked GROUP BY lang ORDER BY lang""",

    // q70: q29's exact bracket legs — per-flag distinct parts + rows.
    "q70_exact_distinct" -> """
      SELECT l_returnflag,
             count(DISTINCT l_partkey) AS exact_parts,
             count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    // q71: q34's exact bracket leg — global distinct users + events.
    "q71_exact_users" -> """
      SELECT count(DISTINCT user_id) AS exact_users,
             count(*) AS n_events
      FROM events""",

    // q72: bigram-LM likelihood masses — grams rebuilt as strings
    // (Spark rides xxhash64), integer masses, one IEEE division.
    "q72_ngram_lm" -> """
      WITH tok AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents),
      g AS (
        SELECT doc_id, t[(i+1)] AS w1,
               array_to_string(t[(i+1):(i+2)], chr(1)) AS gram
        FROM (SELECT doc_id, t, unnest(generate_series(0, len(t)-2)) AS i
              FROM tok WHERE len(t) >= 2)),
      c2 AS (SELECT gram, count(*) AS c2 FROM g GROUP BY gram),
      c1 AS (SELECT w1, count(*) AS c1 FROM g GROUP BY w1),
      v AS (SELECT count(DISTINCT w) AS v
            FROM (SELECT unnest(t) AS w FROM tok))
      SELECT g.doc_id, count(*) AS n_grams,
             CAST(sum(c2.c2 + 1) AS BIGINT) AS hit_mass,
             CAST(sum(c1.c1 + v.v) AS BIGINT) AS prefix_mass,
             CAST(CAST(sum(c2.c2 + 1) AS BIGINT) AS DOUBLE)
               / CAST(sum(c1.c1 + v.v) AS BIGINT) AS score
      FROM g JOIN c2 USING (gram) JOIN c1 USING (w1) CROSS JOIN v
      GROUP BY g.doc_id ORDER BY g.doc_id""",

    // q73: BM25 per-(doc, term) integers + the k1=1.2/b=0.75 scaled
    // tf-norm — 22*tf*S / (10*tf*S + 3*S + 9*dl*N), one division of
    // two exact integers.
    "q73_bm25_stats" -> """
      WITH tok AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents),
      corpus AS (
        SELECT count(*) AS n_docs, CAST(sum(len(t)) AS BIGINT) AS sum_dl
        FROM tok),
      tf AS (
        SELECT doc_id, dl, term, count(*) AS tf
        FROM (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl,
                     unnest(t) AS term FROM tok)
        WHERE term IN ('join', 'hash', 'customer')
        GROUP BY doc_id, dl, term),
      df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term)
      SELECT tf.doc_id, tf.term, tf.tf, tf.dl, df.df,
             corpus.n_docs, corpus.sum_dl,
             CAST(22 * tf.tf * corpus.sum_dl AS DOUBLE) /
               (10 * tf.tf * corpus.sum_dl + 3 * corpus.sum_dl
                 + 9 * tf.dl * corpus.n_docs) AS tf_norm
      FROM tf JOIN df USING (term) CROSS JOIN corpus
      ORDER BY tf.doc_id, tf.term""",

    // q74: the composed LM-quality gate — q72's score, per-lang lower
    // median as the cut (ties keep), surviving count + char mass.
    "q74_lm_quality_gate" -> """
      WITH tok AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents),
      g AS (
        SELECT doc_id, t[(i+1)] AS w1,
               array_to_string(t[(i+1):(i+2)], chr(1)) AS gram
        FROM (SELECT doc_id, t, unnest(generate_series(0, len(t)-2)) AS i
              FROM tok WHERE len(t) >= 2)),
      c2 AS (SELECT gram, count(*) AS c2 FROM g GROUP BY gram),
      c1 AS (SELECT w1, count(*) AS c1 FROM g GROUP BY w1),
      v AS (SELECT count(DISTINCT w) AS v
            FROM (SELECT unnest(t) AS w FROM tok)),
      scores AS (
        SELECT g.doc_id,
               CAST(CAST(sum(c2.c2 + 1) AS BIGINT) AS DOUBLE)
                 / CAST(sum(c1.c1 + v.v) AS BIGINT) AS score
        FROM g JOIN c2 USING (gram) JOIN c1 USING (w1) CROSS JOIN v
        GROUP BY g.doc_id),
      ranked AS (
        SELECT d.lang, d.n_chars, s.score, s.doc_id,
               row_number() OVER (PARTITION BY d.lang
                 ORDER BY s.score, s.doc_id) AS rn,
               count(*) OVER (PARTITION BY d.lang) AS n
        FROM scores s JOIN documents d USING (doc_id)),
      cuts AS (
        SELECT lang, score AS cut FROM ranked
        WHERE rn = greatest(1, least(n, (n+1)//2)))
      SELECT r.lang, count(*) AS n_kept,
             CAST(sum(r.n_chars) AS BIGINT) AS kept_chars
      FROM ranked r JOIN cuts c USING (lang)
      WHERE r.score >= c.cut
      GROUP BY r.lang ORDER BY r.lang""",

    // q78: q73's integer stats + rational idf bounds (x/(1+x) ≤
    // ln(1+x) ≤ x, cleared to integer ratios), DECIMAL(18,6) pre-sum
    // per doc; in_bracket is pinned TRUE — the engine's transcendental
    // score must sit inside or the hash flips.
    "q78_bm25_bracket" -> """
      WITH tok AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents),
      corpus AS (
        SELECT count(*) AS n_docs, CAST(sum(len(t)) AS BIGINT) AS sum_dl
        FROM tok),
      tf AS (
        SELECT doc_id, dl, term, count(*) AS tf
        FROM (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl,
                     unnest(t) AS term FROM tok)
        WHERE term IN ('join', 'hash', 'customer')
        GROUP BY doc_id, dl, term),
      df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
      c AS (
        SELECT tf.doc_id,
               CAST(22 * tf.tf * corpus.sum_dl AS DOUBLE) /
                 (10 * tf.tf * corpus.sum_dl + 3 * corpus.sum_dl
                   + 9 * tf.dl * corpus.n_docs) AS tf_norm,
               CAST(2 * corpus.n_docs - 2 * df.df + 1 AS DOUBLE)
                 / (2 * corpus.n_docs + 2) AS idf_lo,
               CAST(2 * corpus.n_docs - 2 * df.df + 1 AS DOUBLE)
                 / (2 * df.df + 1) AS idf_hi
        FROM tf JOIN df USING (term) CROSS JOIN corpus)
      SELECT doc_id, count(*) AS n_terms_hit,
             CAST(sum(CAST(tf_norm * idf_lo AS DECIMAL(18,6))) AS DOUBLE) AS score_lo,
             CAST(sum(CAST(tf_norm * idf_hi AS DECIMAL(18,6))) AS DOUBLE) AS score_hi,
             TRUE AS in_bracket
      FROM c GROUP BY doc_id ORDER BY doc_id""",

    // q54: the BPE fit's first-round bracket — single-char adjacent
    // pair counts with the engine's non-overlapping rule (boundary
    // pairs always count; a same-char run of length L yields
    // floor(L/2) pairs), top-8 under (count desc, left, right), and
    // the fit's first merge pinned to that list's head.
    "q54_bpe_fit" -> """
      WITH w AS (
        SELECT word, count(*) AS c FROM (
          SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]')) AS word
          FROM documents) GROUP BY word),
      pos AS (
        SELECT word, c, i,
               substr(word, CAST(i AS INT), 1) AS ch,
               substr(word, CAST(i AS INT) + 1, 1) AS nx
        FROM w, unnest(range(1, len(word) + 1)) AS t(i)),
      diffpairs AS (
        SELECT ch AS l, nx AS r, CAST(sum(c) AS BIGINT) AS cnt
        FROM pos WHERE CAST(i AS INT) < len(word) AND nx <> ch
        GROUP BY 1, 2),
      runs AS (
        SELECT word, c, ch, run_id, count(*) AS run_len FROM (
          SELECT word, c, i, ch,
                 sum(CASE WHEN ch = lag_ch THEN 0 ELSE 1 END)
                   OVER (PARTITION BY word ORDER BY i) AS run_id
          FROM (SELECT word, c, i, ch,
                       lag(ch) OVER (PARTITION BY word ORDER BY i) AS lag_ch
                FROM pos))
        GROUP BY word, c, ch, run_id),
      samepairs AS (
        SELECT ch AS l, ch AS r,
               CAST(sum((run_len // 2) * c) AS BIGINT) AS cnt
        FROM runs WHERE run_len >= 2 GROUP BY 1, 2),
      pairs AS (
        SELECT l, r, CAST(sum(cnt) AS BIGINT) AS count
        FROM (SELECT * FROM diffpairs UNION ALL SELECT * FROM samepairs)
        GROUP BY 1, 2 HAVING sum(cnt) >= 2),
      topk AS (
        SELECT l, r, count FROM pairs
        ORDER BY count DESC, l, r LIMIT 8),
      first AS (
        SELECT l AS first_left, r AS first_right, count AS first_count
        FROM pairs ORDER BY count DESC, l, r LIMIT 1)
      SELECT t.l AS left, t.r AS right, t.count,
             CAST(8 AS BIGINT) AS n_merges,
             f.first_left, f.first_right, f.first_count
      FROM topk t CROSS JOIN first f
      ORDER BY t.count DESC, t.l, t.r""",

    // q79: the BPE round-trip identity — per-doc word count, symbol
    // char mass, and round-trip successes recomputed straight off the
    // raw text with q25's tokenizer; n_roundtrip = n_words pins the
    // identity.
    // q57: the q54 recipe at the ENCODE — the fit's first merge is
    // re-derived in SQL (identical CTEs), per-word greedy non-
    // overlapping occurrence counts replay mergePair's left-to-right
    // rule (floor(run/2) same-char, substring count otherwise), and
    // per-doc depth-1 token counts are chars minus merges. Full-depth
    // invariants are pinned as literal TRUE booleans.
    "q57_bpe_encode" -> """
      WITH w AS (
        SELECT word, count(*) AS c FROM (
          SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]')) AS word
          FROM documents) GROUP BY word),
      pos AS (
        SELECT word, c, i,
               substr(word, CAST(i AS INT), 1) AS ch,
               substr(word, CAST(i AS INT) + 1, 1) AS nx
        FROM w, unnest(range(1, len(word) + 1)) AS t(i)),
      diffpairs AS (
        SELECT ch AS l, nx AS r, CAST(sum(c) AS BIGINT) AS cnt
        FROM pos WHERE CAST(i AS INT) < len(word) AND nx <> ch
        GROUP BY 1, 2),
      runs AS (
        SELECT word, c, ch, run_id, count(*) AS run_len FROM (
          SELECT word, c, i, ch,
                 sum(CASE WHEN ch = lag_ch THEN 0 ELSE 1 END)
                   OVER (PARTITION BY word ORDER BY i) AS run_id
          FROM (SELECT word, c, i, ch,
                       lag(ch) OVER (PARTITION BY word ORDER BY i) AS lag_ch
                FROM pos))
        GROUP BY word, c, ch, run_id),
      samepairs AS (
        SELECT ch AS l, ch AS r,
               CAST(sum((run_len // 2) * c) AS BIGINT) AS cnt
        FROM runs WHERE run_len >= 2 GROUP BY 1, 2),
      pairs AS (
        SELECT l, r, CAST(sum(cnt) AS BIGINT) AS count
        FROM (SELECT * FROM diffpairs UNION ALL SELECT * FROM samepairs)
        GROUP BY 1, 2 HAVING sum(cnt) >= 2),
      first AS (SELECT l, r FROM pairs ORDER BY count DESC, l, r LIMIT 1),
      mcsame AS (
        SELECT r.word, CAST(sum(r.run_len // 2) AS BIGINT) AS cnt
        FROM runs r, first f
        WHERE f.l = f.r AND r.ch = f.l AND r.run_len >= 2
        GROUP BY r.word),
      mcdiff AS (
        SELECT w.word,
               CAST((len(w.word) - len(replace(w.word, f.l || f.r, ''))) // 2 AS BIGINT) AS cnt
        FROM w, first f WHERE f.l <> f.r),
      mc AS (SELECT word, cnt FROM mcsame
             UNION ALL SELECT word, cnt FROM mcdiff WHERE cnt > 0),
      docw AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]')) AS word
        FROM documents)
      SELECT d.doc_id,
             count(*) AS n_words,
             CAST(sum(len(d.word)) - sum(coalesce(mc.cnt, 0)) AS BIGINT) AS n_tokens_r1,
             TRUE AS roundtrip_ok,
             TRUE AS tokens_in_bracket
      FROM docw d LEFT JOIN mc ON d.word = mc.word
      GROUP BY d.doc_id
      ORDER BY d.doc_id""",

    // q67: q57's depth-1 counts summed per source and pushed through
    // q80's packing closed form (n_seqs = ceil, n_full = floor, token
    // conservation); full-depth pack invariants pinned as TRUE.
    "q67_tokenize_pack" -> """
      WITH w AS (
        SELECT word, count(*) AS c FROM (
          SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]')) AS word
          FROM documents) GROUP BY word),
      pos AS (
        SELECT word, c, i,
               substr(word, CAST(i AS INT), 1) AS ch,
               substr(word, CAST(i AS INT) + 1, 1) AS nx
        FROM w, unnest(range(1, len(word) + 1)) AS t(i)),
      diffpairs AS (
        SELECT ch AS l, nx AS r, CAST(sum(c) AS BIGINT) AS cnt
        FROM pos WHERE CAST(i AS INT) < len(word) AND nx <> ch
        GROUP BY 1, 2),
      runs AS (
        SELECT word, c, ch, run_id, count(*) AS run_len FROM (
          SELECT word, c, i, ch,
                 sum(CASE WHEN ch = lag_ch THEN 0 ELSE 1 END)
                   OVER (PARTITION BY word ORDER BY i) AS run_id
          FROM (SELECT word, c, i, ch,
                       lag(ch) OVER (PARTITION BY word ORDER BY i) AS lag_ch
                FROM pos))
        GROUP BY word, c, ch, run_id),
      samepairs AS (
        SELECT ch AS l, ch AS r,
               CAST(sum((run_len // 2) * c) AS BIGINT) AS cnt
        FROM runs WHERE run_len >= 2 GROUP BY 1, 2),
      pairs AS (
        SELECT l, r, CAST(sum(cnt) AS BIGINT) AS count
        FROM (SELECT * FROM diffpairs UNION ALL SELECT * FROM samepairs)
        GROUP BY 1, 2 HAVING sum(cnt) >= 2),
      first AS (SELECT l, r FROM pairs ORDER BY count DESC, l, r LIMIT 1),
      mcsame AS (
        SELECT r.word, CAST(sum(r.run_len // 2) AS BIGINT) AS cnt
        FROM runs r, first f
        WHERE f.l = f.r AND r.ch = f.l AND r.run_len >= 2
        GROUP BY r.word),
      mcdiff AS (
        SELECT w.word,
               CAST((len(w.word) - len(replace(w.word, f.l || f.r, ''))) // 2 AS BIGINT) AS cnt
        FROM w, first f WHERE f.l <> f.r),
      mc AS (SELECT word, cnt FROM mcsame
             UNION ALL SELECT word, cnt FROM mcdiff WHERE cnt > 0),
      docw AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]')) AS word
        FROM documents),
      r1 AS (
        SELECT d.doc_id,
               CAST(sum(len(d.word)) - sum(coalesce(mc.cnt, 0)) AS BIGINT) AS n_tok
        FROM docw d LEFT JOIN mc ON d.word = mc.word
        GROUP BY d.doc_id),
      src AS (
        SELECT doc.source, CAST(sum(r1.n_tok) AS BIGINT) AS s
        FROM r1 JOIN documents doc ON r1.doc_id = doc.doc_id
        GROUP BY doc.source)
      SELECT source,
             CAST((s + 255) // 256 AS BIGINT) AS n_seqs,
             s AS packed_tokens,
             CAST(s // 256 AS BIGINT) AS n_full,
             s AS doc_tokens,
             TRUE AS full_pack_conserved,
             TRUE AS full_all_but_last_full
      FROM src ORDER BY source""",

    "q79_bpe_roundtrip" -> """
      WITH w AS (
        SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]')) AS word
        FROM documents)
      SELECT doc_id, count(*) AS n_words,
             CAST(sum(len(word)) AS BIGINT) AS n_chars,
             count(*) AS n_roundtrip
      FROM w GROUP BY doc_id ORDER BY doc_id""",

    // q80: packing invariants in closed form — concatenation slicing
    // at budget 256 forces n_seqs = ceil(total/256), n_full =
    // floor(total/256), and both token columns equal the per-source
    // total off the raw text.
    "q80_pack_invariants" -> """
      WITH d AS (
        SELECT source,
               len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]')) AS n_words
        FROM documents),
      t AS (
        SELECT source, CAST(sum(n_words) AS BIGINT) AS doc_tokens
        FROM d GROUP BY source)
      SELECT source,
             CAST(ceil(doc_tokens / 256.0) AS BIGINT) AS n_seqs,
             doc_tokens AS packed_tokens,
             doc_tokens // 256 AS n_full,
             doc_tokens
      FROM t ORDER BY source""",

    // q81: q77's exact frequency leg — deterministic (count desc, user)
    // top-5, active-day counts, corpus total.
    "q81_exact_top_users" -> """
      WITH u AS (
        SELECT CAST(user_id AS VARCHAR) AS user_key, count(*) AS exact_n,
               count(DISTINCT CAST(ts AS DATE)) AS n_days
        FROM events GROUP BY 1),
      t AS (SELECT count(*) AS n_events FROM events)
      SELECT u.user_key, u.exact_n, u.n_days, t.n_events
      FROM u CROSS JOIN t
      ORDER BY exact_n DESC, user_key LIMIT 5""",

    // q82: per-language top-3 under the total order (n_chars desc,
    // doc_id asc) — the mergeable bounded-state aggregate must equal an
    // engine ranking with the identical order, ties included.
    "q82_group_topk" -> """
      WITH r AS (
        SELECT lang, doc_id, n_chars,
               row_number() OVER (PARTITION BY lang
                 ORDER BY n_chars DESC, doc_id) AS rank
        FROM documents)
      SELECT lang, rank, doc_id, CAST(n_chars AS BIGINT) AS n_chars
      FROM r WHERE rank <= 3 ORDER BY lang, rank""",

    // q83: the 10^18:1 weight ratio makes the draw's COMPOSITION
    // closed-form even though the A-ES keys themselves are engine
    // floats: every source samples min(5, n) docs of which exactly
    // min(5, n_heavy) are heavy, and pass is identically true. DuckDB
    // replays that closed form — hash equality certifies the sampler
    // honors weight dominance exactly (a wrong key order would surface
    // as a light doc displacing a heavy one and flip the counts).
    "q83_weighted_sample" -> """
      WITH s AS (
        SELECT source, COUNT(*) AS n,
               SUM(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) AS nh
        FROM documents GROUP BY source)
      SELECT source, CAST(nh AS BIGINT) AS n_heavy,
             CAST(LEAST(5, n) AS BIGINT) AS n_sampled,
             CAST(LEAST(nh, 5) AS BIGINT) AS n_sampled_heavy,
             TRUE AS pass
      FROM s ORDER BY source""",

    // q75: shard bucket via q41's strpos arithmetic mod 8; shuffle keys
    // are raw md5 hex (lowercase hex sorts identically, q47's rule).
    "q75_shuffle_shards" -> """
      WITH k AS (
        SELECT doc_id, n_chars,
               md5('shuffle:' || CAST(doc_id AS VARCHAR)) AS hx
        FROM documents),
      b AS (
        SELECT doc_id, n_chars, hx,
               ((strpos('0123456789abcdef', substring(hx, 1, 1)) - 1) * 16 +
                (strpos('0123456789abcdef', substring(hx, 2, 1)) - 1)) % 8
                 AS shard
        FROM k)
      SELECT CAST(shard AS INTEGER) AS shard, count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             min(hx) AS first_key, max(hx) AS last_key
      FROM b GROUP BY shard ORDER BY shard""",

    // q84: fuzzy decontamination. Same normalization, the lossless
    // length-band prune, FULL levenshtein (Spark's thresholded variant
    // agrees exactly for pairs inside the band), and the encoded
    // (dist, bench_id) integer min. ASCII restriction on both sides:
    // DuckDB's levenshtein counts bytes, Spark's counts code points —
    // equal only when byte==char. dist CASTs to BIGINT before the
    // 1e9 encode so the product can't overflow INT32.
    "q84_fuzzy_contamination" -> """
      WITH ascii AS (
        SELECT doc_id, text FROM documents
        WHERE regexp_full_match(text, '[\x20-\x7e\s]*')),
      norm AS (
        SELECT doc_id,
               regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
        FROM ascii),
      bench AS (
        SELECT doc_id AS bench_id, t AS bt FROM norm WHERE doc_id % 10 = 0),
      hits AS (SELECT * FROM (
        SELECT n.doc_id, b.bench_id,
               CAST(levenshtein(n.t, b.bt) AS BIGINT) AS dist
        FROM norm n JOIN bench b
          ON n.doc_id <> b.bench_id
         AND abs(length(n.t) - length(b.bt)) <= 48)
        WHERE dist <= 48)
      SELECT doc_id, count(*) AS n_matches,
             min(dist * 1000000000 + bench_id) // 1000000000 AS min_dist,
             min(dist * 1000000000 + bench_id) % 1000000000 AS closest_bench
      FROM hits GROUP BY doc_id ORDER BY doc_id""",

    // q85: integer-exact ANN ground truth. round(float·1024) is the
    // same integer in any engine (float times a power of two is exact;
    // both engines round ties away from zero), so the dot product is
    // pure BIGINT arithmetic and the top-5 under (iscore DESC,
    // corpus_id) is a total order both engines replay exactly.
    "q85_ann_bracket" -> """
      WITH probes AS (
        SELECT vec_id AS query_id, embedding AS q
        FROM embeddings WHERE vec_id < 20),
      scored AS (
        SELECT p.query_id, e.vec_id AS corpus_id,
               CAST(list_sum(list_transform(range(1, len(p.q) + 1),
                 i -> CAST(round(p.q[i] * 1024) AS BIGINT) *
                      CAST(round(e.embedding[i] * 1024) AS BIGINT)))
                 AS BIGINT) AS iscore
        FROM probes p CROSS JOIN embeddings e
        WHERE e.vec_id <> p.query_id),
      r AS (
        SELECT query_id, corpus_id, iscore,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY iscore DESC, corpus_id) AS rank
        FROM scored)
      SELECT query_id, CAST(rank AS INTEGER) AS rank, corpus_id, iscore
      FROM r WHERE rank <= 5 ORDER BY query_id, rank""",

    // q86: CCNet head/middle/tail split — q72's certified LM scorer,
    // exact score terciles (smallest value whose cumulative count
    // reaches ceil(k·n/3), the q44/q62 rank rule), bucket = 1 + number
    // of thresholds strictly below the doc's score. Thresholds are
    // score values PICKED from the corpus (each a single division of
    // two exact integers), so the comparison replays exactly.
    "q86_ccnet_buckets" -> """
      WITH tok AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents),
      g AS (
        SELECT doc_id, t[(i+1)] AS w1,
               array_to_string(t[(i+1):(i+2)], chr(1)) AS gram
        FROM (SELECT doc_id, t, unnest(generate_series(0, len(t)-2)) AS i
              FROM tok WHERE len(t) >= 2)),
      c2 AS (SELECT gram, count(*) AS c2 FROM g GROUP BY gram),
      c1 AS (SELECT w1, count(*) AS c1 FROM g GROUP BY w1),
      v AS (SELECT count(DISTINCT w) AS v
            FROM (SELECT unnest(t) AS w FROM tok)),
      scored AS (
        SELECT g.doc_id, count(*) AS n_grams,
               CAST(sum(c2.c2 + 1) AS BIGINT) AS hit_mass,
               CAST(sum(c1.c1 + v.v) AS BIGINT) AS prefix_mass,
               CAST(CAST(sum(c2.c2 + 1) AS BIGINT) AS DOUBLE)
                 / CAST(sum(c1.c1 + v.v) AS BIGINT) AS score
        FROM g JOIN c2 USING (gram) JOIN c1 USING (w1) CROSS JOIN v
        GROUP BY g.doc_id),
      cum AS (
        SELECT sv, sum(c) OVER (ORDER BY sv) AS cum, sum(c) OVER () AS n
        FROM (SELECT score AS sv, count(*) AS c FROM scored GROUP BY score)),
      th AS (
        SELECT k, min(sv) AS threshold
        FROM cum CROSS JOIN (SELECT unnest([1, 2]) AS k)
        WHERE cum * 3 >= k * n GROUP BY k),
      b AS (
        SELECT s.doc_id, s.n_grams, s.hit_mass, s.prefix_mass, s.score,
               CAST(1 + sum(CASE WHEN s.score > t.threshold THEN 1 ELSE 0 END)
                 AS INTEGER) AS bucket
        FROM scored s CROSS JOIN th t
        GROUP BY s.doc_id, s.n_grams, s.hit_mass, s.prefix_mass, s.score)
      SELECT bucket, count(*) AS n_docs,
             CAST(sum(n_grams) AS BIGINT) AS n_grams,
             CAST(sum(hit_mass) AS BIGINT) AS hit_mass,
             CAST(sum(prefix_mass) AS BIGINT) AS prefix_mass,
             min(score) AS min_score, max(score) AS max_score
      FROM b GROUP BY bucket ORDER BY bucket""",

    // q87: TF-IDF top terms — tf/df are plain counts and the ranking
    // weight is (tf·(N−df)·10^6) // df, one truncating division of
    // positive 64-bit integers (Spark DIV ≡ DuckDB // here), so the
    // per-doc top-3 under (weight DESC, term ASC) is a total order
    // both engines replay exactly.
    "q87_tfidf_terms" -> """
      WITH n AS (SELECT count(*) AS n_docs FROM documents),
      tf AS (
        SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id,
                     unnest(regexp_split_to_array(trim(text), '\s+')) AS term
              FROM documents)
        GROUP BY doc_id, term),
      df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      wt AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               (tf.tf * (n.n_docs - df.df) * 1000000) // df.df AS w_scaled
        FROM tf JOIN df USING (term) CROSS JOIN n),
      r AS (
        SELECT doc_id, term, tf, df, w_scaled,
               row_number() OVER (PARTITION BY doc_id
                 ORDER BY w_scaled DESC, term ASC) AS rank
        FROM wt)
      SELECT doc_id, rank, term, tf, df, CAST(w_scaled AS BIGINT) AS w_scaled
      FROM r WHERE rank <= 3 ORDER BY doc_id, rank""",

    // q88: α=1/2 temperature mix. IEEE sqrt is correctly rounded (the
    // one transcendental-looking op that ISN'T engine-specific), the
    // DECIMAL(18,6) fixed-pointing matches Spark's cast, and the keep
    // rule is pure BIGINT arithmetic over the q41/q53 md5 bucket.
    "q88_temperature_mix" -> """
      WITH c AS (SELECT source, count(*) AS n_source FROM documents GROUP BY source),
      w AS (SELECT source, n_source,
              CAST(CAST(sqrt(CAST(n_source AS DOUBLE)) AS DECIMAL(18,6))
                   * 1000000 AS BIGINT) AS w_micro
            FROM c),
      d AS (SELECT CAST(sum(w_micro) AS BIGINT) AS denom_micro FROM w),
      b AS (
        SELECT doc_id, source,
               CAST((strpos('0123456789abcdef', substring(md5('tmix:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 +
                    (strpos('0123456789abcdef', substring(md5('tmix:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
                 AS BIGINT) AS bucket
        FROM documents)
      SELECT w.source, CAST(w.n_source AS BIGINT) AS n_source,
             w.w_micro, d.denom_micro,
             CAST(w.w_micro AS DOUBLE) / d.denom_micro AS share,
             CAST(sum(CASE WHEN b.bucket * d.denom_micro < 256 * w.w_micro
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      FROM b JOIN w USING (source) CROSS JOIN d
      GROUP BY w.source, w.n_source, w.w_micro, d.denom_micro
      ORDER BY w.source""",

    // q89: row-validation profile — pure comparisons, one pass; the
    // per-rule counts and the row/clean totals are exact integers.
    "q89_validation_profile" -> """
      WITH f AS (
        SELECT
          CASE WHEN l_discount >= 0 AND l_discount <= 0.08 THEN 0 ELSE 1 END AS v_disc,
          CASE WHEN l_returnflag IN ('A','N','R') THEN 0 ELSE 1 END AS v_flag,
          CASE WHEN l_quantity >= 1 AND l_quantity <= 45.0 THEN 0 ELSE 1 END AS v_qty,
          CASE WHEN l_shipdate < TIMESTAMP '1998-06-01' THEN 0 ELSE 1 END AS v_ship,
          CASE WHEN l_tax <= 0.06 THEN 0 ELSE 1 END AS v_tax
        FROM lineitem),
      t AS (
        SELECT CAST(sum(v_disc) AS BIGINT) AS disc_range,
               CAST(sum(v_flag) AS BIGINT) AS flag_enum,
               CAST(sum(v_qty) AS BIGINT) AS qty_range,
               CAST(sum(v_ship) AS BIGINT) AS ship_window,
               CAST(sum(v_tax) AS BIGINT) AS tax_low,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN v_disc + v_flag + v_qty + v_ship + v_tax = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
        FROM f)
      SELECT u.rule, u.n_violations, t.n_rows, t.n_clean
      FROM t, (
        SELECT 'disc_range' AS rule, disc_range AS n_violations FROM t
        UNION ALL SELECT 'flag_enum', flag_enum FROM t
        UNION ALL SELECT 'qty_range', qty_range FROM t
        UNION ALL SELECT 'ship_window', ship_window FROM t
        UNION ALL SELECT 'tax_low', tax_low FROM t) u
      ORDER BY u.rule""",

    // q90: q72's replay at order 3 — 3-token grams, 2-token prefixes,
    // same count/join/mass arithmetic.
    "q90_trigram_lm" -> """
      WITH tok AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents),
      g AS (
        SELECT doc_id, array_to_string(t[(i+1):(i+2)], chr(1)) AS w1,
               array_to_string(t[(i+1):(i+3)], chr(1)) AS gram
        FROM (SELECT doc_id, t, unnest(generate_series(0, len(t)-3)) AS i
              FROM tok WHERE len(t) >= 3)),
      c2 AS (SELECT gram, count(*) AS c2 FROM g GROUP BY gram),
      c1 AS (SELECT w1, count(*) AS c1 FROM g GROUP BY w1),
      v AS (SELECT count(DISTINCT w) AS v
            FROM (SELECT unnest(t) AS w FROM tok))
      SELECT g.doc_id, count(*) AS n_grams,
             CAST(sum(c2.c2 + 1) AS BIGINT) AS hit_mass,
             CAST(sum(c1.c1 + v.v) AS BIGINT) AS prefix_mass,
             CAST(CAST(sum(c2.c2 + 1) AS BIGINT) AS DOUBLE)
               / CAST(sum(c1.c1 + v.v) AS BIGINT) AS score
      FROM g JOIN c2 USING (gram) JOIN c1 USING (w1) CROSS JOIN v
      GROUP BY g.doc_id ORDER BY g.doc_id""",

    // q91: EventOps.funnelCounts — the fold's greedy chain IS the
    // sequential min-if with the 48h per-step gap (scan order makes
    // the first admissible match the minimum).
    "q91_funnel" -> """
      WITH e AS (
        SELECT user_id, epoch_us(ts) AS t, event_type FROM events
        WHERE event_type IN ('signup','view','click','purchase')),
      s1 AS (SELECT user_id, min(t) AS t1 FROM e
             WHERE event_type = 'signup' GROUP BY 1),
      s2 AS (SELECT e.user_id, min(t) AS t2 FROM e JOIN s1 USING (user_id)
             WHERE event_type = 'view' AND t >= t1 AND t <= t1 + 172800000000 GROUP BY 1),
      s3 AS (SELECT e.user_id, min(t) AS t3 FROM e JOIN s2 USING (user_id)
             WHERE event_type = 'click' AND t >= t2 AND t <= t2 + 172800000000 GROUP BY 1),
      s4 AS (SELECT e.user_id, min(t) AS t4 FROM e JOIN s3 USING (user_id)
             WHERE event_type = 'purchase' AND t >= t3 AND t <= t3 + 172800000000 GROUP BY 1)
      SELECT * FROM (
        SELECT CAST(1 AS BIGINT) AS step, 'signup' AS step_type, count(*) AS n_users FROM s1
        UNION ALL SELECT 2, 'view', count(*) FROM s2
        UNION ALL SELECT 3, 'click', count(*) FROM s3
        UNION ALL SELECT 4, 'purchase', count(*) FROM s4)
      ORDER BY step""",

    // q92: EventOps.cohortRetention — first-signup-day cohorts ×
    // distinct active days.
    "q92_cohort_retention" -> """
      WITH days AS (
        SELECT user_id, event_type, CAST(ts AS DATE) AS day FROM events),
      coh AS (SELECT user_id, min(day) AS cohort_day FROM days
              WHERE event_type = 'signup' GROUP BY 1),
      act AS (SELECT DISTINCT user_id, day FROM days)
      SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
             CAST(day - cohort_day AS BIGINT) AS day_offset,
             count(DISTINCT user_id) AS n_active
      FROM act JOIN coh USING (user_id)
      WHERE day >= cohort_day
      GROUP BY 1, 2 ORDER BY 1, 2""",

    // q93: TimeSeries.gapFill — identical dense grid, neighbor scan,
    // and integer interpolation rationals; grid bounds at each user's
    // own [min, max] day mean interior gaps always have both
    // neighbors.
    "q93_gap_fill" -> """
      WITH daily AS (
        SELECT user_id,
               CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day_idx,
               count(*) AS n_events
        FROM events GROUP BY 1, 2),
      spans AS (SELECT user_id, min(day_idx) AS b0, max(day_idx) AS b1
                FROM daily GROUP BY 1),
      grid AS (SELECT user_id, unnest(generate_series(b0, b1)) AS day_idx FROM spans),
      j AS (SELECT g.user_id, g.day_idx, d.n_events
            FROM grid g LEFT JOIN daily d USING (user_id, day_idx)),
      nb AS (SELECT user_id, day_idx, n_events,
               last_value(n_events IGNORE NULLS) OVER wA AS pv,
               max(CASE WHEN n_events IS NOT NULL THEN day_idx END) OVER wA AS pp,
               first_value(n_events IGNORE NULLS) OVER wD AS nv,
               min(CASE WHEN n_events IS NOT NULL THEN day_idx END) OVER wD AS np
             FROM j
             WINDOW wA AS (PARTITION BY user_id ORDER BY day_idx
                           ROWS UNBOUNDED PRECEDING),
                    wD AS (PARTITION BY user_id ORDER BY day_idx
                           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      SELECT user_id, count(*) AS n_days,
             CAST(sum(CASE WHEN n_events IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_observed,
             CAST(sum(CASE WHEN n_events IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
             CAST(sum(pv) AS BIGINT) AS sum_ffill,
             CAST(sum(CASE WHEN n_events IS NULL
                           THEN pv * (np - day_idx) + nv * (day_idx - pp) END) AS BIGINT) AS sum_interp_num,
             CAST(sum(CASE WHEN n_events IS NULL THEN np - pp END) AS BIGINT) AS sum_interp_den
      FROM nb GROUP BY 1 ORDER BY user_id""",

    // q94: CUBE with SQL-standard grouping flags; DECIMAL pre-sums per
    // the q01 convention.
    "q94_cube_orders" -> """
      SELECT coalesce(o_orderstatus, 'ALL') AS status,
             coalesce(o_orderpriority, 'ALL') AS priority,
             CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
             CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
             count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY g_status, g_priority, status, priority""",

    // q95: pivot = FILTERed conditional sums over the explicit lang
    // domain; empty cells stay NULL on both sides.
    "q95_pivot_langs" -> """
      SELECT source,
             CAST(sum(n_chars) FILTER (lang = 'de') AS BIGINT) AS chars_de,
             CAST(sum(n_chars) FILTER (lang = 'en') AS BIGINT) AS chars_en,
             CAST(sum(n_chars) FILTER (lang = 'es') AS BIGINT) AS chars_es,
             CAST(sum(n_chars) FILTER (lang = 'fr') AS BIGINT) AS chars_fr,
             CAST(sum(n_chars) FILTER (lang = 'zh') AS BIGINT) AS chars_zh
      FROM documents GROUP BY source ORDER BY source""",

    // q96: TimeSeries.rollingSum — RANGE-framed trailing 7 days;
    // DECIMAL day sums keep the rolling mass associativity-exact.
    "q96_rolling_events" -> """
      WITH daily AS (
        SELECT user_id,
               CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day_idx,
               count(*) AS n_events,
               sum(CAST(value AS DECIMAL(18,6))) AS day_value
        FROM events GROUP BY 1, 2)
      SELECT user_id, day_idx, n_events,
             CAST(sum(n_events) OVER w AS BIGINT) AS n_7d,
             CAST(count(*) OVER w AS BIGINT) AS days_7d,
             CAST(CAST(sum(day_value) OVER w AS DECIMAL(28,6)) AS DOUBLE) AS value_7d
      FROM daily
      WINDOW w AS (PARTITION BY user_id ORDER BY day_idx
                   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, day_idx""",

    // q97: robust med/MAD outlier profile — quantile_disc(·,0.5) IS
    // the engine's lower median (rank ⌊(n+1)/2⌋, verified); the
    // deviations and the 3·MAD cut are shared IEEE arithmetic, so the
    // float columns hash-certify too.
    "q97_robust_outliers" -> """
      WITH v AS (
        SELECT event_type, value FROM events
        WHERE value IS NOT NULL AND event_type IS NOT NULL),
      med AS (
        SELECT event_type, quantile_disc(value, 0.5) AS med
        FROM v GROUP BY 1),
      dev AS (
        SELECT v.event_type, med.med, abs(v.value - med.med) AS dev
        FROM v JOIN med USING (event_type)),
      mad AS (
        SELECT event_type, quantile_disc(dev, 0.5) AS mad
        FROM dev GROUP BY 1)
      SELECT d.event_type,
             count(*) AS n,
             min(d.med) AS med,
             min(m.mad) AS mad,
             CAST(sum(CASE WHEN d.dev > 3.0 * m.mad THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_outliers,
             CAST(coalesce(sum(CASE WHEN d.dev > 3.0 * m.mad
                    THEN CAST(d.dev AS DECIMAL(18,6)) END),
                  CAST(0 AS DECIMAL(18,6))) AS DOUBLE) AS outlier_dev_mass
      FROM dev d JOIN mad m USING (event_type)
      GROUP BY 1 ORDER BY 1""",

    // q98: grouped OLS via integer sufficient statistics (day-anchored
    // x, micro-unit fixed-point y); slope/intercept derive from the
    // BIGINTs through the identical double expression shape.
    "q98_trend_slopes" -> """
      WITH b AS (
        SELECT event_type,
               CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS x,
               CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS y
        FROM events
        WHERE value IS NOT NULL AND event_type IS NOT NULL),
      s AS (
        SELECT event_type, count(*) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x*x) AS BIGINT) AS sxx,
               CAST(sum(x*y) AS BIGINT) AS sxy
        FROM b GROUP BY 1),
      d AS (
        SELECT *,
               CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE) AS num0,
               CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE) AS den0
        FROM s)
      SELECT event_type, n, sx, sy, sxx, sxy,
             CASE WHEN den0 <> 0 THEN num0 / den0 END AS slope,
             CASE WHEN den0 <> 0 THEN
               (CAST(sy AS DOUBLE) - (num0 / den0) * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE) END AS intercept
      FROM d ORDER BY event_type""",

    // q99: the incremental two-day accretion must land on exactly the
    // clusters of a from-scratch run — certified against q36's
    // sequential full-corpus transitive closure, verbatim.
    "q99_incremental_clusters" -> """
      WITH RECURSIVE tok AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
      sh AS (
        SELECT doc_id,
               CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                    ELSE list_distinct([array_to_string(t[i:i+2], ' ')
                                        for i in range(1, len(t) - 1)]) END AS s
        FROM tok),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5),
      edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
      reach(id, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
      comp AS (SELECT id AS doc_id, min(r) AS cluster FROM reach GROUP BY id)
      SELECT doc_id, cluster, doc_id = cluster AS keep
      FROM comp ORDER BY doc_id""",

    // q100: week-over-week residual anomalies — integer residuals,
    // quantile_disc med/MAD, shared IEEE flag arithmetic.
    "q100_seasonal_anomaly" -> """
      WITH daily AS (
        SELECT event_type,
               CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day_idx,
               count(*) AS n_events
        FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
      r AS (
        SELECT a.event_type,
               CAST(a.n_events AS BIGINT) - CAST(b.n_events AS BIGINT) AS residual_l,
               CAST(CAST(a.n_events AS BIGINT) - b.n_events AS DOUBLE) AS residual
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.day_idx = b.day_idx + 7),
      med AS (
        SELECT event_type, quantile_disc(residual, 0.5) AS med FROM r GROUP BY 1),
      dev AS (
        SELECT r.event_type, r.residual_l, med.med,
               abs(r.residual - med.med) AS dev
        FROM r JOIN med USING (event_type)),
      mad AS (
        SELECT event_type, quantile_disc(dev, 0.5) AS mad FROM dev GROUP BY 1)
      SELECT d.event_type,
             count(*) AS n_days,
             min(d.med) AS med,
             min(m.mad) AS mad,
             CAST(sum(CASE WHEN d.dev > 3.0 * m.mad THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_anomalies,
             CAST(min(d.residual_l) AS BIGINT) AS min_residual,
             CAST(max(d.residual_l) AS BIGINT) AS max_residual
      FROM dev d JOIN mad m USING (event_type)
      GROUP BY 1 ORDER BY 1""",

    // q101: exact P50/P90/P99 — quantile_disc shares the engine's
    // rank-⌈p·n⌉ convention, so the order statistics hash-match.
    "q101_tail_quantiles" -> """
      SELECT event_type,
             count(value) AS n,
             quantile_disc(value, 0.5)  AS p50,
             quantile_disc(value, 0.9)  AS p90,
             quantile_disc(value, 0.99) AS p99
      FROM events
      WHERE event_type IS NOT NULL AND value IS NOT NULL
      GROUP BY 1 ORDER BY 1""",

    // q102: equi-width histogram — bin arithmetic is the identical
    // IEEE expression shape on both engines (w = range/10, floor
    // division, last bin closed via least), so edges and counts match.
    "q102_value_histogram" -> """
      WITH b AS (
        SELECT event_type, value FROM events
        WHERE value IS NOT NULL AND event_type IS NOT NULL),
      s AS (
        SELECT event_type, min(value) AS vmin, max(value) AS vmax,
               (max(value) - min(value)) / 10.0 AS w
        FROM b GROUP BY 1),
      binned AS (
        SELECT b.event_type,
               CASE WHEN s.w = 0 THEN CAST(0 AS BIGINT)
                    ELSE least(CAST(9 AS BIGINT),
                               CAST(floor((b.value - s.vmin) / s.w) AS BIGINT))
               END AS bin,
               s.vmin, s.w
        FROM b JOIN s USING (event_type))
      SELECT event_type, bin,
             vmin + bin * w AS bin_lo,
             vmin + (bin + 1) * w AS bin_hi,
             count(*) AS n
      FROM binned
      GROUP BY event_type, bin, vmin, w
      ORDER BY event_type, bin""",

    // q103: retrieval metrics over the integer-cleared rational
    // ranking key (q87's convention) with (score DESC, doc_id ASC)
    // ties — row_number here, GroupTopK there, identical ranking;
    // metric floats are single IEEE divisions of small integers.
    "q103_retrieval_eval" -> """
      WITH tok AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents),
      nd AS (SELECT count(*) AS n FROM tok),
      tfc AS (
        SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id, unnest(t) AS term FROM tok)
        WHERE term IN ('join', 'hash', 'customer')
        GROUP BY 1, 2),
      dfc AS (SELECT term, count(DISTINCT doc_id) AS df FROM tfc GROUP BY 1),
      q(query_id, term) AS (VALUES
        ('q1','join'), ('q1','hash'), ('q2','customer'),
        ('q3','hash'), ('q3','customer')),
      scored AS (
        SELECT q.query_id, tfc.doc_id,
               CAST(sum((tfc.tf * (nd.n - dfc.df) * 1000000) // dfc.df)
                    AS BIGINT) AS score,
               count(DISTINCT q.term) AS n_hit
        FROM q JOIN tfc USING (term) JOIN dfc USING (term) CROSS JOIN nd
        GROUP BY 1, 2),
      qsize AS (SELECT query_id, count(DISTINCT term) AS qn FROM q GROUP BY 1),
      rel AS (
        SELECT s.query_id, s.doc_id
        FROM scored s JOIN qsize USING (query_id)
        WHERE s.n_hit = qsize.qn),
      ranked AS (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY score DESC, doc_id) AS rank
        FROM scored),
      top AS (SELECT * FROM ranked WHERE rank <= 10),
      m AS (
        SELECT t.query_id,
               CAST(count(r.doc_id) AS BIGINT) AS hits_at_k,
               min(CASE WHEN r.doc_id IS NOT NULL THEN t.rank END) AS first_rel_rank
        FROM top t LEFT JOIN rel r
          ON t.query_id = r.query_id AND t.doc_id = r.doc_id
        GROUP BY 1),
      nrel AS (SELECT query_id, count(*) AS n_relevant FROM rel GROUP BY 1)
      SELECT m.query_id,
             CAST(coalesce(nrel.n_relevant, 0) AS BIGINT) AS n_relevant,
             m.hits_at_k,
             CAST(m.first_rel_rank AS BIGINT) AS first_rel_rank,
             CASE WHEN m.first_rel_rank IS NOT NULL
                  THEN CAST(1 AS DOUBLE) / m.first_rel_rank
                  ELSE CAST(0 AS DOUBLE) END AS mrr,
             CAST(m.hits_at_k AS DOUBLE) / CAST(10 AS DOUBLE) AS precision_at_k,
             CASE WHEN coalesce(nrel.n_relevant, 0) > 0
                  THEN CAST(m.hits_at_k AS DOUBLE) / nrel.n_relevant
                  ELSE CAST(0 AS DOUBLE) END AS recall_at_k
      FROM m LEFT JOIN nrel USING (query_id)
      ORDER BY m.query_id""",

    // q104: q91's sequential min-chain funnel, full conversions only,
    // delay = t4 − t1; exact weekly P50/P90 via quantile_disc (the
    // engine's rank-⌈p·n⌉ convention).
    "q104_funnel_latency" -> """
      WITH e AS (
        SELECT user_id, epoch_us(ts) AS t, event_type FROM events
        WHERE event_type IN ('signup','view','click','purchase')),
      s1 AS (SELECT user_id, min(t) AS t1 FROM e
             WHERE event_type = 'signup' GROUP BY 1),
      s2 AS (SELECT e.user_id, min(t) AS t2 FROM e JOIN s1 USING (user_id)
             WHERE event_type = 'view' AND t >= t1 AND t <= t1 + 172800000000 GROUP BY 1),
      s3 AS (SELECT e.user_id, min(t) AS t3 FROM e JOIN s2 USING (user_id)
             WHERE event_type = 'click' AND t >= t2 AND t <= t2 + 172800000000 GROUP BY 1),
      s4 AS (SELECT e.user_id, min(t) AS t4 FROM e JOIN s3 USING (user_id)
             WHERE event_type = 'purchase' AND t >= t3 AND t <= t3 + 172800000000 GROUP BY 1),
      conv AS (
        SELECT CAST(CAST(make_timestamp(s1.t1) AS DATE) - DATE '2024-01-01'
                    AS BIGINT) // 7 AS week_idx,
               s4.t4 - s1.t1 AS delay_us
        FROM s4 JOIN s1 USING (user_id))
      SELECT week_idx,
             count(*) AS n_converted,
             quantile_disc(delay_us, 0.5) AS p50_us,
             quantile_disc(delay_us, 0.9) AS p90_us
      FROM conv GROUP BY 1 ORDER BY 1""",

    // q105: half-year drift — reference edges from the first half,
    // clamped binning, cleared-denominator L1, one IEEE division.
    "q105_drift_monitor" -> """
      WITH ev AS (
        SELECT event_type,
               CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day_idx,
               value
        FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
      ref AS (SELECT * FROM ev WHERE day_idx < 15),
      batch AS (SELECT * FROM ev WHERE day_idx >= 15),
      e AS (
        SELECT event_type, min(value) AS vmin,
               (max(value) - min(value)) / 10.0 AS w
        FROM ref GROUP BY 1),
      h1 AS (
        SELECT r.event_type,
               CASE WHEN e.w = 0 THEN CAST(0 AS BIGINT)
                    ELSE greatest(CAST(0 AS BIGINT), least(CAST(9 AS BIGINT),
                         CAST(floor((r.value - e.vmin) / e.w) AS BIGINT))) END AS bin,
               count(*) AS n
        FROM ref r JOIN e USING (event_type) GROUP BY 1, 2),
      h2 AS (
        SELECT b.event_type,
               CASE WHEN e.w = 0 THEN CAST(0 AS BIGINT)
                    ELSE greatest(CAST(0 AS BIGINT), least(CAST(9 AS BIGINT),
                         CAST(floor((b.value - e.vmin) / e.w) AS BIGINT))) END AS bin,
               count(*) AS n
        FROM batch b JOIN e USING (event_type) GROUP BY 1, 2),
      t1 AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS t_ref FROM h1 GROUP BY 1),
      t2 AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS t_batch FROM h2 GROUP BY 1),
      j AS (
        SELECT coalesce(h1.event_type, h2.event_type) AS event_type,
               coalesce(h1.n, 0) AS n_ref, coalesce(h2.n, 0) AS n_batch
        FROM h1 FULL OUTER JOIN h2
          ON h1.event_type = h2.event_type AND h1.bin = h2.bin),
      d AS (
        SELECT j.event_type, min(t1.t_ref) AS t_ref, min(t2.t_batch) AS t_batch,
               CAST(sum(abs(j.n_ref * t2.t_batch - j.n_batch * t1.t_ref))
                    AS BIGINT) AS l1_num
        FROM j JOIN t1 USING (event_type) JOIN t2 USING (event_type)
        GROUP BY 1)
      SELECT event_type, t_ref, t_batch, l1_num,
             CAST(l1_num AS DOUBLE) /
               (CAST(2 AS DOUBLE) * CAST(t_ref * t_batch AS DOUBLE)) AS tvd
      FROM d ORDER BY event_type""",

    // q106: categorical (language-mix) drift per source between the
    // doc_id-parity snapshots — categories as bins, same arithmetic.
    "q106_mix_drift" -> """
      WITH hb AS (
        SELECT source, lang,
               (strpos('0123456789abcdef', substring(hx, 1, 1)) - 1) * 16 +
               (strpos('0123456789abcdef', substring(hx, 2, 1)) - 1) AS bucket
        FROM (SELECT source, lang,
                     md5('snapshot:' || CAST(doc_id AS VARCHAR)) AS hx
              FROM documents)),
      ref AS (SELECT source, lang FROM hb WHERE bucket < 128),
      batch AS (SELECT source, lang FROM hb WHERE bucket >= 128),
      h1 AS (SELECT source, lang AS bin, count(*) AS n FROM ref GROUP BY 1, 2),
      h2 AS (SELECT source, lang AS bin, count(*) AS n FROM batch GROUP BY 1, 2),
      t1 AS (SELECT source, CAST(sum(n) AS BIGINT) AS t_ref FROM h1 GROUP BY 1),
      t2 AS (SELECT source, CAST(sum(n) AS BIGINT) AS t_batch FROM h2 GROUP BY 1),
      j AS (
        SELECT coalesce(h1.source, h2.source) AS source,
               coalesce(h1.n, 0) AS n_ref, coalesce(h2.n, 0) AS n_batch
        FROM h1 FULL OUTER JOIN h2
          ON h1.source = h2.source AND h1.bin = h2.bin),
      d AS (
        SELECT j.source, min(t1.t_ref) AS t_ref, min(t2.t_batch) AS t_batch,
               CAST(sum(abs(j.n_ref * t2.t_batch - j.n_batch * t1.t_ref))
                    AS BIGINT) AS l1_num
        FROM j JOIN t1 USING (source) JOIN t2 USING (source)
        GROUP BY 1)
      SELECT source, t_ref, t_batch, l1_num,
             CAST(l1_num AS DOUBLE) /
               (CAST(2 AS DOUBLE) * CAST(t_ref * t_batch AS DOUBLE)) AS tvd
      FROM d ORDER BY source""",

    // q107: the interval-overlap join as a straight inequality join —
    // DuckDB's IEJoin handles it natively; overlap length in exact
    // integer days.
    "q107_overlap_join" -> """
      WITH ord AS (
        SELECT o_custkey, o_orderkey, o_orderpriority,
               CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS BIGINT) AS d
        FROM orders),
      u AS (SELECT o_custkey, d AS u_start, d + 6 AS u_end FROM ord
            WHERE o_orderpriority = '1-URGENT'),
      l AS (SELECT o_custkey, d AS l_start, d + 6 AS l_end FROM ord
            WHERE o_orderpriority = '5-LOW'),
      p AS (
        SELECT u.o_custkey,
               least(u.u_end, l.l_end) - greatest(u.u_start, l.l_start) + 1
                 AS overlap_days
        FROM u JOIN l ON u.o_custkey = l.o_custkey
          AND u.u_start <= l.l_end AND l.l_start <= u.u_end)
      SELECT overlap_days, count(*) AS n_pairs,
             count(DISTINCT o_custkey) AS n_customers
      FROM p GROUP BY 1 ORDER BY 1""",

    // q108: sweep-line concurrency — net deltas per (customer, day),
    // running sum over distinct days, max per customer.
    "q108_concurrency" -> """
      WITH win AS (
        SELECT o_custkey,
               CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS BIGINT) AS s,
               CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS BIGINT) + 6 AS e
        FROM orders),
      ev AS (
        SELECT o_custkey, s AS t, CAST(1 AS BIGINT) AS d FROM win
        UNION ALL
        SELECT o_custkey, e + 1 AS t, CAST(-1 AS BIGINT) AS d FROM win),
      net AS (
        SELECT o_custkey, t, CAST(sum(d) AS BIGINT) AS net
        FROM ev GROUP BY 1, 2),
      run AS (
        SELECT o_custkey,
               CAST(sum(net) OVER (PARTITION BY o_custkey ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS open
        FROM net),
      mx AS (
        SELECT o_custkey, max(open) AS max_concurrent FROM run GROUP BY 1)
      SELECT max_concurrent, count(*) AS n_customers
      FROM mx GROUP BY 1 ORDER BY 1""",

    // q109: pairwise Pearson matrix from one aggregate's sufficient
    // statistics — linear sums BIGINT, quadratic sums exact
    // decimal(38,0) rounded once to double, r via the identical IEEE
    // expression shape (n·Σxy − Σx·Σy)/√(va·vb).
    "q109_corr_matrix" -> """
      WITH b AS (
        SELECT l_returnflag,
               CAST(CAST(l_quantity AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS qty,
               CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS price,
               CAST(CAST(l_discount AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS disc
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
          AND l_discount IS NOT NULL),
      s AS (
        SELECT l_returnflag, count(*) AS n,
               CAST(sum(qty) AS BIGINT) AS s_qty,
               CAST(sum(price) AS BIGINT) AS s_price,
               CAST(sum(disc) AS BIGINT) AS s_disc,
               CAST(CAST(sum(CAST(qty AS DECIMAL(19,0)) * CAST(qty AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS DOUBLE) AS ss_qty,
               CAST(CAST(sum(CAST(price AS DECIMAL(19,0)) * CAST(price AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS DOUBLE) AS ss_price,
               CAST(CAST(sum(CAST(disc AS DECIMAL(19,0)) * CAST(disc AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS DOUBLE) AS ss_disc,
               CAST(CAST(sum(CAST(qty AS DECIMAL(19,0)) * CAST(price AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS DOUBLE) AS sp_qty_price,
               CAST(CAST(sum(CAST(qty AS DECIMAL(19,0)) * CAST(disc AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS DOUBLE) AS sp_qty_disc,
               CAST(CAST(sum(CAST(price AS DECIMAL(19,0)) * CAST(disc AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS DOUBLE) AS sp_price_disc
        FROM b GROUP BY 1)
      SELECT l_returnflag, n, s_qty, s_price, s_disc,
             ss_qty, ss_price, ss_disc,
             sp_qty_price, sp_qty_disc, sp_price_disc,
             CASE WHEN (CAST(n AS DOUBLE)*ss_qty - CAST(s_qty AS DOUBLE)*CAST(s_qty AS DOUBLE)) > 0
                   AND (CAST(n AS DOUBLE)*ss_price - CAST(s_price AS DOUBLE)*CAST(s_price AS DOUBLE)) > 0
               THEN (CAST(n AS DOUBLE)*sp_qty_price - CAST(s_qty AS DOUBLE)*CAST(s_price AS DOUBLE))
                    / sqrt((CAST(n AS DOUBLE)*ss_qty - CAST(s_qty AS DOUBLE)*CAST(s_qty AS DOUBLE))
                         * (CAST(n AS DOUBLE)*ss_price - CAST(s_price AS DOUBLE)*CAST(s_price AS DOUBLE))) END
               AS corr_qty_price,
             CASE WHEN (CAST(n AS DOUBLE)*ss_qty - CAST(s_qty AS DOUBLE)*CAST(s_qty AS DOUBLE)) > 0
                   AND (CAST(n AS DOUBLE)*ss_disc - CAST(s_disc AS DOUBLE)*CAST(s_disc AS DOUBLE)) > 0
               THEN (CAST(n AS DOUBLE)*sp_qty_disc - CAST(s_qty AS DOUBLE)*CAST(s_disc AS DOUBLE))
                    / sqrt((CAST(n AS DOUBLE)*ss_qty - CAST(s_qty AS DOUBLE)*CAST(s_qty AS DOUBLE))
                         * (CAST(n AS DOUBLE)*ss_disc - CAST(s_disc AS DOUBLE)*CAST(s_disc AS DOUBLE))) END
               AS corr_qty_disc,
             CASE WHEN (CAST(n AS DOUBLE)*ss_price - CAST(s_price AS DOUBLE)*CAST(s_price AS DOUBLE)) > 0
                   AND (CAST(n AS DOUBLE)*ss_disc - CAST(s_disc AS DOUBLE)*CAST(s_disc AS DOUBLE)) > 0
               THEN (CAST(n AS DOUBLE)*sp_price_disc - CAST(s_price AS DOUBLE)*CAST(s_disc AS DOUBLE))
                    / sqrt((CAST(n AS DOUBLE)*ss_price - CAST(s_price AS DOUBLE)*CAST(s_price AS DOUBLE))
                         * (CAST(n AS DOUBLE)*ss_disc - CAST(s_disc AS DOUBLE)*CAST(s_disc AS DOUBLE))) END
               AS corr_price_disc
      FROM s ORDER BY l_returnflag""",

    // q110: deterministic bin packing — exact running byte totals per
    // source (doc_id order), bin = floor(exclusive-cum / target), then
    // the per-source packing profile. The engine's sliced cumsum must
    // land on exactly the sequential window's totals.
    "q110_compaction_plan" -> """
      WITH c AS (
        SELECT source, doc_id, n_chars,
               CAST(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum
        FROM documents),
      pb AS (
        SELECT source,
               CAST(floor(CAST(cum - n_chars AS DOUBLE) / 32768.0) AS BIGINT) AS bin,
               count(*) AS nf, CAST(sum(n_chars) AS BIGINT) AS bb
        FROM c GROUP BY 1, 2)
      SELECT source,
             CAST(sum(nf) AS BIGINT) AS n_files,
             count(*) AS n_bins,
             CAST(sum(bb) AS BIGINT) AS total_bytes,
             CAST(max(bb) AS BIGINT) AS max_bin_bytes,
             CAST(max(nf) AS BIGINT) AS max_bin_files
      FROM pb GROUP BY 1 ORDER BY 1""",

    // q111: gap sessionization — same (ts, event_id) total order; tied
    // timestamps have gap 0 so the boundary cumsum is order-free.
    "q111_sessionization" -> """
      WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS t FROM events),
      f AS (
        SELECT user_id, event_id, t,
               CASE WHEN t - lag(t) OVER (PARTITION BY user_id
                 ORDER BY t, event_id) > 3600000000 THEN 1 ELSE 0 END AS nf
        FROM e),
      sess AS (
        SELECT user_id, t,
               1 + sum(nf) OVER (PARTITION BY user_id ORDER BY t, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM f),
      g AS (
        SELECT user_id, sid, count(*) AS n_events,
               min(t) AS s, max(t) AS e2
        FROM sess GROUP BY 1, 2)
      SELECT n_events, count(*) AS n_sessions,
             count(DISTINCT user_id) AS n_users,
             CAST(sum(e2 - s) AS BIGINT) AS total_duration_us
      FROM g GROUP BY 1 ORDER BY 1""",

    // q112: journey transitions under the identical (ts, event_id)
    // frame; p_micro is one truncating division of positive integers
    // (Spark div ≡ DuckDB // on positives).
    "q112_transitions" -> """
      WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS t, event_type FROM events),
      p AS (
        SELECT user_id, event_type AS next_type,
               lag(event_type) OVER (PARTITION BY user_id
                 ORDER BY t, event_id) AS prev_type
        FROM e),
      c AS (
        SELECT prev_type, next_type, count(*) AS n_trans
        FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2)
      SELECT prev_type, next_type, n_trans,
             CAST((n_trans * 1000000) // sum(n_trans)
               OVER (PARTITION BY prev_type) AS BIGINT) AS p_micro
      FROM c ORDER BY 1, 2""",

    // q113: the oracle replays the ALL-PAIRS levenshtein definition —
    // hash equality certifies the deletion-neighborhood blocking
    // loses no pair (candidates are a proven superset; the engine
    // verifies with the same exact levenshtein).
    "q113_edit_pairs" -> """
      WITH p AS (
        SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
        FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        WHERE abs(length(a.c_name) - length(b.c_name)) <= 1
          AND levenshtein(a.c_name, b.c_name) <= 1),
      n AS (
        SELECT id, count(*) AS n_neighbors FROM (
          SELECT id_a AS id FROM p
          UNION ALL SELECT id_b AS id FROM p)
        GROUP BY 1)
      SELECT n_neighbors, count(*) AS n_customers
      FROM n GROUP BY 1 ORDER BY 1""",

    // q114: PageRank's three integer rounds unrolled — every term is
    // BIGINT with truncating division on positives, so the engines'
    // iterative and unrolled replays are bit-identical.
    "q114_pagerank" -> """
      WITH e AS (
        SELECT DISTINCT cn.n_name AS src, sn.n_name AS dst
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey),
      nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
      r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
      m1 AS (SELECT e.dst, CAST(sum(r.r // d.deg) AS BIGINT) AS mass
             FROM e JOIN r0 r ON e.src = r.node
                    JOIN deg d ON e.src = d.src GROUP BY 1),
      r1 AS (SELECT n.node,
               CAST(150000 + (85 * coalesce(m.mass, 0)) // 100 AS BIGINT) AS r
             FROM nodes n LEFT JOIN m1 m ON n.node = m.dst),
      m2 AS (SELECT e.dst, CAST(sum(r.r // d.deg) AS BIGINT) AS mass
             FROM e JOIN r1 r ON e.src = r.node
                    JOIN deg d ON e.src = d.src GROUP BY 1),
      r2 AS (SELECT n.node,
               CAST(150000 + (85 * coalesce(m.mass, 0)) // 100 AS BIGINT) AS r
             FROM nodes n LEFT JOIN m2 m ON n.node = m.dst),
      m3 AS (SELECT e.dst, CAST(sum(r.r // d.deg) AS BIGINT) AS mass
             FROM e JOIN r2 r ON e.src = r.node
                    JOIN deg d ON e.src = d.src GROUP BY 1),
      r3 AS (SELECT n.node,
               CAST(150000 + (85 * coalesce(m.mass, 0)) // 100 AS BIGINT) AS r
             FROM nodes n LEFT JOIN m3 m ON n.node = m.dst)
      SELECT node, r AS rank_micro FROM r3 ORDER BY node""",

    // q115: Morton interleave replayed as the closed-form bit
    // expansion — bit i of sz at 4^i, bit i of pr at 2·4^i.
    "q115_zorder" -> """
      WITH p AS (
        SELECT CAST(p_size AS BIGINT) AS sz,
               CAST(floor(p_retailprice) AS BIGINT) % 256 AS pr
        FROM part),
      z AS (
        SELECT sz, pr,
          ((sz // 1) % 2) * 1 + ((sz // 2) % 2) * 4 +
          ((sz // 4) % 2) * 16 + ((sz // 8) % 2) * 64 +
          ((sz // 16) % 2) * 256 + ((sz // 32) % 2) * 1024 +
          ((sz // 64) % 2) * 4096 + ((sz // 128) % 2) * 16384 +
          2 * (((pr // 1) % 2) * 1 + ((pr // 2) % 2) * 4 +
               ((pr // 4) % 2) * 16 + ((pr // 8) % 2) * 64 +
               ((pr // 16) % 2) * 256 + ((pr // 32) % 2) * 1024 +
               ((pr // 64) % 2) * 4096 + ((pr // 128) % 2) * 16384) AS zk
        FROM p)
      SELECT CAST(zk // 1024 AS BIGINT) AS z_bucket,
             count(*) AS n_parts,
             CAST(min(sz) AS BIGINT) AS min_size,
             CAST(max(sz) AS BIGINT) AS max_size,
             CAST(min(pr) AS BIGINT) AS min_price,
             CAST(max(pr) AS BIGINT) AS max_price
      FROM z GROUP BY 1 ORDER BY 1""",

    // q116: PMI collocations — DuckDB rebuilds the adjacent pairs as
    // strings under the shared whitespace tokenization (q46's
    // convention); the cleared rational is one truncating division of
    // positive BIGINTs, and the (pmi desc, w1, w2) order is total, so
    // the top-20 is deterministic on both engines.
    "q116_collocations" -> """
      WITH tok AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents),
      uni AS (SELECT unnest(t) AS w FROM tok),
      uc AS (SELECT w, count(*) AS n_w FROM uni GROUP BY 1),
      tot AS (SELECT count(*) AS n_tokens FROM uni),
      grams AS (
        SELECT unnest([array_to_string(t[i:i+1], ' ')
                       for i in range(1, len(t))]) AS g
        FROM tok WHERE len(t) >= 2),
      pc AS (
        SELECT split_part(g, ' ', 1) AS w1, split_part(g, ' ', 2) AS w2,
               count(*) AS n_pair
        FROM grams GROUP BY 1, 2 HAVING count(*) >= 5)
      SELECT p.w1, p.w2, p.n_pair, u1.n_w AS n_w1, u2.n_w AS n_w2,
             CAST((p.n_pair * t.n_tokens * 1000000) // (u1.n_w * u2.n_w)
               AS BIGINT) AS pmi_scaled
      FROM pc p
      JOIN uc u1 ON p.w1 = u1.w
      JOIN uc u2 ON p.w2 = u2.w
      CROSS JOIN tot t
      ORDER BY pmi_scaled DESC, w1, w2 LIMIT 20""",

    // q117: batch-wins MERGE replayed as union + anti-join; decimal
    // pre-sums keep the totals engine-exact.
    "q117_upsert" -> """
      WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 5 <> 0),
      upd AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice + 1000.0 AS o_totalprice
        FROM orders WHERE o_orderkey % 3 = 0),
      m AS (
        SELECT * FROM upd
        UNION ALL
        SELECT b.* FROM base b ANTI JOIN upd u ON b.o_orderkey = u.o_orderkey)
      SELECT o_orderstatus,
             count(*) AS n_orders,
             count(DISTINCT o_orderkey) AS n_keys,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS total
      FROM m GROUP BY 1 ORDER BY 1""",

    // q118: Gopher repetition signals replayed with string grams and
    // explicit position arithmetic — a gram at word position i covers
    // i..i+2; covered chars are summed over DISTINCT positions, so
    // overlapping duplicate occurrences never double-count. The two
    // fractions are single IEEE divisions of exact integers.
    "q118_repetition" -> """
      WITH tok AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
      words AS (
        SELECT doc_id, unnest(range(len(t))) AS pos, unnest(t) AS word FROM tok),
      stats AS (
        SELECT doc_id, count(*) AS n_words, sum(len(word)) AS word_chars
        FROM words GROUP BY doc_id),
      g2 AS (
        SELECT doc_id, unnest(
          CASE WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
               ELSE [array_to_string(t[i:i+1], ' ') for i in range(1, len(t))] END
        ) AS gram FROM tok),
      top2 AS (
        SELECT doc_id, gram, cnt FROM (
          SELECT doc_id, gram, count(*) AS cnt,
                 row_number() OVER (PARTITION BY doc_id
                   ORDER BY count(*) DESC, gram) AS rn
          FROM g2 GROUP BY doc_id, gram)
        WHERE rn = 1),
      g3l AS (
        SELECT doc_id,
          CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)] END
          AS gs FROM tok),
      g3 AS (
        SELECT doc_id, unnest(range(len(gs))) AS gpos, unnest(gs) AS gram FROM g3l),
      dup3 AS (
        SELECT doc_id, gram FROM g3 GROUP BY doc_id, gram HAVING count(*) >= 2),
      cov AS (
        SELECT DISTINCT g.doc_id, g.gpos + o.o AS pos
        FROM g3 g JOIN dup3 d ON g.doc_id = d.doc_id AND g.gram = d.gram,
             (SELECT unnest(range(3)) AS o) o),
      covc AS (
        SELECT c.doc_id, sum(len(w.word)) AS dup_covered_chars
        FROM cov c JOIN words w ON c.doc_id = w.doc_id AND c.pos = w.pos
        GROUP BY c.doc_id)
      SELECT s.doc_id, CAST(s.n_words AS BIGINT) AS n_words,
             CAST(s.word_chars AS BIGINT) AS word_chars,
             t.gram AS top_gram, CAST(t.cnt AS BIGINT) AS top_gram_count,
             CAST(t.cnt * len(replace(t.gram, ' ', '')) AS DOUBLE) / s.word_chars
               AS top_gram_frac,
             CAST(coalesce(c.dup_covered_chars, 0) AS BIGINT) AS dup_covered_chars,
             CAST(coalesce(c.dup_covered_chars, 0) AS DOUBLE) / s.word_chars
               AS dup_frac
      FROM stats s
      JOIN top2 t ON s.doc_id = t.doc_id
      LEFT JOIN covc c ON s.doc_id = c.doc_id
      ORDER BY s.doc_id""",

    // q119: winnowing replayed window-by-window — md5 hex ranks sort
    // identically in both engines; each full w-window keeps its
    // (rank asc, pos desc) leader; documents with fewer than w grams
    // keep their single global minimum via the j = 0 window.
    "q119_winnow" -> """
      WITH tok AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
      gl AS (
        SELECT doc_id,
          CASE WHEN len(t) < 4 THEN [array_to_string(t, ' ')]
               ELSE [array_to_string(t[i:i+3], ' ') for i in range(1, len(t) - 2)] END
          AS gs FROM tok),
      g AS (
        SELECT doc_id, unnest(range(len(gs))) AS gpos, unnest(gs) AS gram FROM gl),
      gr AS (SELECT doc_id, gpos, gram, md5(gram) AS rank FROM g),
      gt AS (SELECT doc_id, count(*) AS g_total FROM gr GROUP BY doc_id),
      wins AS (
        SELECT doc_id, unnest(range(
          CASE WHEN g_total < 4 THEN 1 ELSE g_total - 3 END)) AS j
        FROM gt),
      sel AS (
        SELECT w.doc_id, g.gpos, g.gram, g.rank,
               row_number() OVER (PARTITION BY w.doc_id, w.j
                 ORDER BY g.rank, g.gpos DESC) AS rn
        FROM wins w JOIN gr g
          ON g.doc_id = w.doc_id AND g.gpos >= w.j AND g.gpos < w.j + 4)
      SELECT DISTINCT doc_id, CAST(gpos AS BIGINT) AS pos, gram, rank
      FROM sel WHERE rn = 1
      ORDER BY doc_id, pos""",

    // q120: each phrase replayed as m-gram STRING equality (no
    // positional index) — occurrence = an m-gram equal to the phrase,
    // docs shorter than m contribute none. Equality certifies the
    // positional-alignment path including overlapping duplicate-term
    // matches.
    "q120_phrase_search" -> """
      WITH tok AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
      g2 AS (
        SELECT doc_id, unnest(
          CASE WHEN len(t) < 2 THEN []
               ELSE [array_to_string(t[i:i+1], ' ') for i in range(1, len(t))] END
        ) AS gram FROM tok),
      g3 AS (
        SELECT doc_id, unnest(
          CASE WHEN len(t) < 3 THEN []
               ELSE [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)] END
        ) AS gram FROM tok)
      SELECT phrase, n_docs, n_occ FROM (
        SELECT 'batch batch batch' AS phrase,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(count(doc_id) AS BIGINT) AS n_occ
        FROM g3 WHERE gram = 'batch batch batch'
        UNION ALL
        SELECT 'window window',
               CAST(count(DISTINCT doc_id) AS BIGINT),
               CAST(count(doc_id) AS BIGINT)
        FROM g2 WHERE gram = 'window window'
        UNION ALL
        SELECT 'key order sort',
               CAST(count(DISTINCT doc_id) AS BIGINT),
               CAST(count(doc_id) AS BIGINT)
        FROM g3 WHERE gram = 'key order sort'
        UNION ALL
        SELECT 'spark stream',
               CAST(count(DISTINCT doc_id) AS BIGINT),
               CAST(count(doc_id) AS BIGINT)
        FROM g2 WHERE gram = 'spark stream')
      ORDER BY phrase""",

    // q121: distinct 3-gram sets per source as STRINGS (Spark rides
    // xxhash64 — q46's certification construction); exact set sizes,
    // gram-keyed intersection, one IEEE division for Jaccard.
    "q121_source_overlap" -> """
      WITH tok AS (
        SELECT source, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
      g AS (
        SELECT DISTINCT source, unnest(
          CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)] END
        ) AS gram FROM tok),
      sz AS (SELECT source, count(*) AS n FROM g GROUP BY source),
      inter AS (
        SELECT a.source AS ga, b.source AS gb, count(*) AS n_common
        FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
        GROUP BY 1, 2)
      SELECT a.source AS group_a, b.source AS group_b,
             CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
             CAST(coalesce(i.n_common, 0) AS BIGINT) AS n_common,
             CAST(coalesce(i.n_common, 0) AS DOUBLE) /
               (a.n + b.n - coalesce(i.n_common, 0)) AS jaccard
      FROM sz a JOIN sz b ON a.source < b.source
      LEFT JOIN inter i ON i.ga = a.source AND i.gb = b.source
      ORDER BY group_a, group_b""",

    // q122: q119's winnowing replay rolled to the pair report —
    // distinct fingerprint ranks per doc, rank-keyed pair counts,
    // containment = n_shared / min(n_a, n_b) as one IEEE division.
    "q122_winnow_pairs" -> """
      WITH tok AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
      gl AS (
        SELECT doc_id,
          CASE WHEN len(t) < 4 THEN [array_to_string(t, ' ')]
               ELSE [array_to_string(t[i:i+3], ' ') for i in range(1, len(t) - 2)] END
          AS gs FROM tok),
      g AS (
        SELECT doc_id, unnest(range(len(gs))) AS gpos, unnest(gs) AS gram FROM gl),
      gr AS (SELECT doc_id, gpos, gram, md5(gram) AS rank FROM g),
      gt AS (SELECT doc_id, count(*) AS g_total FROM gr GROUP BY doc_id),
      wins AS (
        SELECT doc_id, unnest(range(
          CASE WHEN g_total < 4 THEN 1 ELSE g_total - 3 END)) AS j
        FROM gt),
      sel AS (
        SELECT w.doc_id, g.gpos, g.rank,
               row_number() OVER (PARTITION BY w.doc_id, w.j
                 ORDER BY g.rank, g.gpos DESC) AS rn
        FROM wins w JOIN gr g
          ON g.doc_id = w.doc_id AND g.gpos >= w.j AND g.gpos < w.j + 4),
      fp AS (SELECT DISTINCT doc_id, rank FROM sel WHERE rn = 1),
      sz AS (SELECT doc_id, count(*) AS n_fp FROM fp GROUP BY doc_id),
      pr AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
        FROM fp a JOIN fp b ON a.rank = b.rank AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 3)
      SELECT p.id_a, p.id_b, CAST(p.n_shared AS BIGINT) AS n_shared,
             CAST(sa.n_fp AS BIGINT) AS n_a, CAST(sb.n_fp AS BIGINT) AS n_b,
             CAST(p.n_shared AS DOUBLE) / least(sa.n_fp, sb.n_fp) AS containment
      FROM pr p
      JOIN sz sa ON p.id_a = sa.doc_id
      JOIN sz sb ON p.id_b = sb.doc_id
      ORDER BY p.id_a, p.id_b""",

    // q123: the diff replayed as a full-outer join with null-safe
    // (IS NOT DISTINCT FROM) comparison; integer counts.
    "q123_snapshot_diff" -> """
      WITH prev AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 7 <> 0),
      nxt AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 5 <> 0),
      d AS (
        SELECT CASE
            WHEN p.o_orderkey IS NULL THEN 'added'
            WHEN n.o_orderkey IS NULL THEN 'removed'
            WHEN p.o_orderstatus IS DISTINCT FROM n.o_orderstatus
              OR p.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'changed'
            ELSE 'unchanged' END AS change_type
        FROM prev p FULL OUTER JOIN nxt n ON p.o_orderkey = n.o_orderkey)
      SELECT change_type, CAST(count(*) AS BIGINT) AS n_keys
      FROM d GROUP BY change_type ORDER BY change_type""",

    // q124: suppression replayed with a group-size join; the released
    // segment of a suppressed row is the literal '*'. floor(x/100.0)
    // is IEEE-exact at the bin boundaries in both engines.
    "q124_k_anonymity" -> """
      WITH cust AS (
        SELECT c_custkey, c_mktsegment,
               CAST(CAST(floor(c_acctbal / 100.0) AS BIGINT) AS VARCHAR) AS bal_bin
        FROM customer),
      sz AS (
        SELECT c_mktsegment, bal_bin, count(*) AS n
        FROM cust GROUP BY 1, 2),
      anon AS (
        SELECT CASE WHEN s.n < 3 THEN '*' ELSE c.c_mktsegment END AS c_mktsegment,
               CASE WHEN s.n < 3 THEN '*' ELSE c.bal_bin END AS bal_bin,
               (s.n < 3) AS suppressed
        FROM cust c JOIN sz s
          ON c.c_mktsegment = s.c_mktsegment AND c.bal_bin = s.bal_bin)
      SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(DISTINCT bal_bin) AS BIGINT) AS n_bins,
             CAST(sum(CASE WHEN suppressed THEN 1 ELSE 0 END) AS BIGINT) AS n_suppressed
      FROM anon GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    // q127: SCD-2 replayed — change points under the (ts, event_id)
    // total order (both sides pre-filter null types, so plain lag
    // comparison suffices), lead over change points for interval
    // ends; durations are integer µs sums.
    // q126: q121's exact gram-keyed intersection replayed for the
    // exact legs; in_bracket (the KMV estimate within its theta-sketch
    // error envelope of the exact intersection) pinned TRUE — the
    // q81/q78 bracket recipe for the XXH64-specific estimator.
    "q126_kmv_overlap" -> """
      WITH tok AS (
        SELECT source, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
      g AS (
        SELECT DISTINCT source, unnest(
          CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)] END
        ) AS gram FROM tok),
      sz AS (SELECT source, count(*) AS n FROM g GROUP BY source),
      inter AS (
        SELECT a.source AS ga, b.source AS gb, count(*) AS n_common
        FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
        GROUP BY 1, 2)
      SELECT a.source AS group_a, b.source AS group_b,
             CAST(coalesce(i.n_common, 0) AS BIGINT) AS n_common,
             CAST(a.n + b.n - coalesce(i.n_common, 0) AS BIGINT) AS union_size,
             TRUE AS in_bracket
      FROM sz a JOIN sz b ON a.source < b.source
      LEFT JOIN inter i ON i.ga = a.source AND i.gb = b.source
      ORDER BY group_a, group_b""",

    "q127_scd2" -> """
      WITH e AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS t
        FROM events WHERE event_type IS NOT NULL),
      f AS (
        SELECT user_id, event_type, t, event_id,
               lag(event_type) OVER w AS prev,
               lag(1) OVER w AS hasprev
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
      ch AS (
        SELECT user_id, event_type, t, event_id FROM f
        WHERE hasprev IS NULL OR prev IS DISTINCT FROM event_type),
      iv AS (
        SELECT user_id, event_type, t AS vf,
               lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS vt
        FROM ch)
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_intervals,
             CAST(sum(CASE WHEN vt IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_current,
             CAST(sum(CASE WHEN vt IS NOT NULL THEN vt - vf ELSE 0 END) AS BIGINT)
               AS closed_micros
      FROM iv GROUP BY event_type ORDER BY event_type""",

    // q128: schema-on-read JSON extraction replayed with DuckDB's JSON
    // extension; missing keys and malformed documents null out in both
    // engines.
    "q128_json_props" -> """
      WITH e AS (
        SELECT event_type,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events WHERE event_type IS NOT NULL)
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(k) AS BIGINT) AS n_with_k,
             CAST(coalesce(sum(k), 0) AS BIGINT) AS sum_k,
             min(k) AS min_k, max(k) AS max_k
      FROM e GROUP BY event_type ORDER BY event_type""",

    // q129: Welch replayed off the identical integer sufficient
    // statistics and the identical IEEE shape (+, −, ·, /, sqrt are
    // correctly rounded — no libm transcendentals anywhere). CENTI
    // units keep Σv² under 2^53: the decimal→double cast is then
    // exact in both engines (micro-units measurably drift one ulp —
    // DuckDB's hugeint→double conversion double-rounds above 2^53).
    "q129_ab_welch" -> """
      WITH b AS (
        SELECT event_type, CAST(user_id % 2 AS INT) AS arm,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
      s AS (
        SELECT event_type,
               CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
               CAST(coalesce(sum(CASE WHEN arm = 0 THEN v END), 0) AS BIGINT) AS s_a,
               CAST(coalesce(sum(CASE WHEN arm = 1 THEN v END), 0) AS BIGINT) AS s_b,
               CAST(coalesce(sum(CASE WHEN arm = 0 THEN
                 CAST(v AS DECIMAL(19,0)) * CAST(v AS DECIMAL(19,0)) END), 0)
                 AS DOUBLE) AS ss_a,
               CAST(coalesce(sum(CASE WHEN arm = 1 THEN
                 CAST(v AS DECIMAL(19,0)) * CAST(v AS DECIMAL(19,0)) END), 0)
                 AS DOUBLE) AS ss_b
        FROM b GROUP BY 1),
      d AS (
        SELECT *,
               CAST(n_a AS DOUBLE) AS nad, CAST(n_b AS DOUBLE) AS nbd,
               CAST(s_a AS DOUBLE) AS sad, CAST(s_b AS DOUBLE) AS sbd
        FROM s),
      e AS (
        SELECT *,
               sad / nad AS mean_a, sbd / nbd AS mean_b,
               (ss_a - sad * sad / nad) / (nad - 1.0) AS va,
               (ss_b - sbd * sbd / nbd) / (nbd - 1.0) AS vb
        FROM d),
      f AS (
        SELECT *, va / nad AS sea, vb / nbd AS seb FROM e)
      SELECT event_type, n_a, n_b, s_a, s_b, ss_a, ss_b,
             mean_a, mean_b,
             CASE WHEN n_a >= 2 THEN va END AS var_a,
             CASE WHEN n_b >= 2 THEN vb END AS var_b,
             CASE WHEN n_a >= 2 AND n_b >= 2 AND sea + seb > 0
               THEN (mean_a - mean_b) / sqrt(sea + seb) END AS t_stat,
             CASE WHEN n_a >= 2 AND n_b >= 2 AND sea + seb > 0
               THEN ((sea + seb) * (sea + seb)) /
                    (sea * sea / (nad - 1.0) + seb * seb / (nbd - 1.0)) END
               AS df_welch
      FROM f ORDER BY event_type""",

    // q130: the closed-form CUSUM (cumsum − running min, slack 1,
    // threshold 25) replayed with the identical windows over the same
    // daily contraction; integer division for the per-type target.
    "q130_cusum" -> """
      WITH daily AS (
        SELECT event_type,
               CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day_idx,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events WHERE event_type IS NOT NULL
        GROUP BY 1, 2),
      tgt AS (
        SELECT event_type, sum(n_events) // count(*) AS target
        FROM daily GROUP BY 1),
      d AS (
        SELECT daily.*, tgt.target,
               n_events - tgt.target - 1 AS dev
        FROM daily JOIN tgt USING (event_type)),
      c1 AS (
        SELECT *, sum(dev) OVER w AS cs
        FROM d
        WINDOW w AS (PARTITION BY event_type ORDER BY day_idx
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      c2 AS (
        SELECT *, least(0, min(cs) OVER w) AS floor_cs
        FROM c1
        WINDOW w AS (PARTITION BY event_type ORDER BY day_idx
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      s AS (
        SELECT event_type, day_idx, cs - floor_cs AS cusum FROM c2)
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             CAST(max(cusum) AS BIGINT) AS max_cusum,
             CAST(sum(CASE WHEN cusum > 25 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_alarm_days,
             min(CASE WHEN cusum > 25 THEN day_idx END) AS first_alarm_day
      FROM s GROUP BY event_type ORDER BY event_type""",

    // q131: the NOT EXISTS dominance definition, verbatim — certifies
    // the two-phase distributed skyline exactly, ties included.
    "q131_skyline" -> """
      WITH p AS (
        SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size, p_retailprice
        FROM part)
      SELECT p_partkey, p_size, p_retailprice FROM p a
      WHERE NOT EXISTS (
        SELECT 1 FROM p b
        WHERE b.p_size <= a.p_size AND b.p_retailprice <= a.p_retailprice
          AND (b.p_size < a.p_size OR b.p_retailprice < a.p_retailprice))
      ORDER BY p_partkey""",

    // q132: the identical md5 draw arithmetic — hex prefix → integer
    // → mod N — replayed; dedup keeps the earliest draw, first k
    // survivors by draw order win.
    "q132_negative_samples" -> """
      WITH nn AS (SELECT count(*) AS n FROM documents),
      c AS (
        SELECT d.doc_id AS anchor, i.i AS draw_i,
               CAST(('0x' || substr(md5('neg:' || CAST(d.doc_id AS VARCHAR)
                 || ':' || CAST(i.i AS VARCHAR)), 1, 12)) AS BIGINT)
                 % (SELECT n FROM nn) AS neg_id
        FROM documents d, (SELECT unnest(range(8)) AS i) i),
      f AS (
        SELECT anchor, neg_id, min(draw_i) AS draw_i
        FROM c WHERE neg_id <> anchor GROUP BY 1, 2),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY anchor ORDER BY draw_i) AS rn
        FROM f)
      SELECT anchor, CAST(neg_id AS BIGINT) AS neg_id,
             CAST(draw_i AS INT) AS draw_i
      FROM r WHERE rn <= 4 ORDER BY anchor, draw_i""",

    // q134: the identical per-distinct-score Mann-Whitney fold —
    // u2 = Σ_v np_v·(2·cumNegBelow_v + nn_v), all integer.
    "q134_auc" -> """
      WITH c AS (
        SELECT n_chars AS v,
               SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS np,
               SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS nn
        FROM documents GROUP BY n_chars),
      w AS (
        SELECT np, nn,
               COALESCE(SUM(nn) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_nn
        FROM c)
      SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
             CAST(SUM(nn) AS BIGINT) AS n_neg,
             CAST(SUM(np * (2 * cum_nn + nn)) AS BIGINT) AS u2
      FROM w""",

    // q135: classifier rebuilt with q19's marker SQL; kappa sufficient
    // statistics via the same marginal product fold.
    "q135_kappa" -> s"""
      WITH scored AS (
        SELECT CASE $langCases ELSE 'und' END AS predicted, lang
        FROM (SELECT lang, text, $langGreatest AS best FROM documents)),
      t AS (
        SELECT COUNT(*) AS n,
               SUM(CASE WHEN predicted = lang THEN 1 ELSE 0 END) AS n_agree
        FROM scored),
      rm AS (SELECT predicted AS k, COUNT(*) AS ra FROM scored GROUP BY 1),
      cm AS (SELECT lang AS k, COUNT(*) AS cb FROM scored GROUP BY 1),
      pe AS (SELECT COALESCE(SUM(ra * cb), 0) AS pe_num FROM rm JOIN cm USING (k))
      SELECT CAST(n AS BIGINT) AS n, CAST(n_agree AS BIGINT) AS n_agree,
             CAST(pe_num AS BIGINT) AS pe_num
      FROM t, pe""",

    // q136: q36's recursive closure + the (n_chars desc, doc_id asc)
    // argmax as a window — certifying the struct-min representative
    // against the textbook ranking definition.
    "q136_survivorship" -> """
      WITH RECURSIVE tok AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
      sh AS MATERIALIZED (
        SELECT doc_id,
               CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                    ELSE list_distinct([array_to_string(t[i:i+2], ' ')
                                        for i in range(1, len(t) - 1)]) END AS s
        FROM tok),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5),
      edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
      reach(id, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
      comp AS (SELECT id AS doc_id, min(r) AS cluster FROM reach GROUP BY id),
      j AS (
        SELECT c.doc_id, c.cluster, d.n_chars
        FROM comp c JOIN documents d USING (doc_id)),
      rep AS (
        SELECT cluster, doc_id AS rep FROM (
          SELECT cluster, doc_id,
                 row_number() OVER (PARTITION BY cluster
                   ORDER BY n_chars DESC, doc_id) AS rn
          FROM j) WHERE rn = 1)
      SELECT j.doc_id, j.cluster, rep.rep AS rep, j.doc_id = rep.rep AS keep
      FROM j JOIN rep USING (cluster) ORDER BY j.doc_id""",

    // q137: the peeling fixpoint as a recursive single-row LIST
    // accumulator — each step re-derives removed-so-far ∪ {degree<k
    // among survivors}; UNION dedup terminates at the fixpoint, the
    // longest list is the final removed set.
    "q137_kcore" -> """
      WITH RECURSIVE ed AS (
        SELECT u, v FROM (
          SELECT DISTINCT a.l_orderkey AS ok, a.l_partkey AS u, b.l_partkey AS v
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
        GROUP BY u, v HAVING COUNT(*) >= 2),
      nbr AS (SELECT u AS node, v AS other FROM ed UNION ALL SELECT v, u FROM ed),
      peel(removed) AS (
        SELECT CAST([] AS BIGINT[])
        UNION
        SELECT (
          SELECT COALESCE(LIST(DISTINCT x ORDER BY x), CAST([] AS BIGINT[]))
          FROM (
            SELECT node AS x FROM nbr
            WHERE NOT list_contains(p.removed, node)
              AND NOT list_contains(p.removed, other)
            GROUP BY node HAVING COUNT(*) < 3
            UNION ALL
            SELECT UNNEST(p.removed) AS x) t)
        FROM peel p),
      final AS (SELECT removed FROM peel ORDER BY len(removed) DESC LIMIT 1)
      SELECT CAST(node AS BIGINT) AS node, CAST(COUNT(*) AS BIGINT) AS core_deg
      FROM nbr, final
      WHERE NOT list_contains(final.removed, node)
        AND NOT list_contains(final.removed, other)
      GROUP BY node ORDER BY node""",

    // q138: same digit-by-string-arithmetic, same fixed micro-prob
    // constants (Validate.BenfordMicro) — no engine takes a log.
    "q138_benford" -> {
      val probs = graft.operators.Validate.BenfordMicro.zipWithIndex
        .map { case (p, i) => s"(${i + 1}, ${p}::BIGINT)" }.mkString(", ")
      s"""
      WITH obs AS (
        SELECT CAST(substr(regexp_replace(
                 CAST(CAST(abs(l_extendedprice) AS DECIMAL(38,6)) AS VARCHAR),
                 '[0.]', '', 'g'), 1, 1) AS INTEGER) AS digit,
               COUNT(*) AS n_obs
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND abs(l_extendedprice) > 0
        GROUP BY 1),
      obs2 AS (SELECT digit, n_obs FROM obs WHERE digit IS NOT NULL),
      tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM obs2),
      expect(digit, p_micro) AS (VALUES $probs)
      SELECT e.digit, CAST(COALESCE(o.n_obs, 0) AS BIGINT) AS n_obs,
             CAST(t.n * e.p_micro AS BIGINT) AS expected_micro,
             CAST(COALESCE(o.n_obs, 0) * 1000000 - t.n * e.p_micro AS BIGINT) AS dev_micro
      FROM expect e LEFT JOIN obs2 o USING (digit), tot t
      ORDER BY e.digit"""
    },

    // q139: the same mean-cleared fold — num_l = Σ(n·x−S)(n·x_lead−S),
    // den = Σ(n·x−S)² — via lead() windows, all integer.
    "q139_acf" -> """
      WITH daily AS (
        SELECT event_type,
               CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day_idx,
               CAST(count(*) AS BIGINT) AS x
        FROM events WHERE event_type IS NOT NULL
        GROUP BY 1, 2),
      st AS (
        SELECT event_type, COUNT(*) AS n, SUM(x) AS s
        FROM daily GROUP BY 1),
      den AS (
        SELECT d.event_type,
               CAST(SUM((st.n * d.x - st.s) * (st.n * d.x - st.s)) AS BIGINT) AS den
        FROM daily d JOIN st USING (event_type) GROUP BY 1),
      led AS (
        SELECT d.event_type, l.lag, d.x,
               lead(d.x, l.lag) OVER (PARTITION BY d.event_type, l.lag
                 ORDER BY d.day_idx) AS xl
        FROM daily d, (SELECT UNNEST(range(1, 8)) AS lag) l),
      num AS (
        SELECT led.event_type, CAST(led.lag AS INTEGER) AS lag,
               CAST(SUM((st.n * led.x - st.s) * (st.n * led.xl - st.s)) AS BIGINT) AS num,
               CAST(COUNT(*) AS BIGINT) AS n_terms
        FROM led JOIN st USING (event_type)
        WHERE led.xl IS NOT NULL
        GROUP BY 1, 2)
      SELECT num.event_type, num.lag, num.num, den.den, num.n_terms
      FROM num JOIN den USING (event_type)
      ORDER BY event_type, lag""",

    // q140: distinct (basket,item) → pair counts ≥ 3 → both rule
    // directions joined to item counts — plain integer counting.
    "q140_assoc_rules" -> """
      WITH bi AS (
        SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
      nb AS (SELECT COUNT(DISTINCT b) AS n_baskets FROM bi),
      ic AS (SELECT i, COUNT(*) AS n_i FROM bi GROUP BY i),
      p AS (
        SELECT a.i AS x, c.i AS y, COUNT(*) AS n_pair
        FROM bi a JOIN bi c ON a.b = c.b AND a.i < c.i
        GROUP BY 1, 2 HAVING COUNT(*) >= 3),
      r AS (
        SELECT x AS ante, y AS cons, n_pair FROM p
        UNION ALL SELECT y, x, n_pair FROM p)
      SELECT r.ante, r.cons, CAST(r.n_pair AS BIGINT) AS n_pair,
             CAST(ia.n_i AS BIGINT) AS n_ante, CAST(ic2.n_i AS BIGINT) AS n_cons,
             CAST(nb.n_baskets AS BIGINT) AS n_baskets
      FROM r JOIN ic ia ON ia.i = r.ante JOIN ic ic2 ON ic2.i = r.cons, nb
      ORDER BY r.ante, r.cons""",

    // q141: identical contingency + HUGEINT cross-multiply //-divide;
    // top-25 under the (chi2 desc, token) total order.
    "q141_chi2_terms" -> """
      WITH t AS (
        SELECT COUNT(*) AS n,
               SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_pos
        FROM documents),
      tok AS (
        SELECT doc_id, lang = 'en' AS y,
               UNNEST(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS token
        FROM documents),
      c AS (
        SELECT token, SUM(CASE WHEN y THEN 1 ELSE 0 END) AS a,
               COUNT(*) AS n_doc
        FROM tok GROUP BY token),
      k AS (
        SELECT token, a, t.n_pos - a AS b, n_doc - a AS c,
               t.n - t.n_pos - (n_doc - a) AS d, t.n AS n
        FROM c, t WHERE n_doc >= 5 AND n_doc < t.n),
      s AS (
        SELECT token, a, b, c, d,
               CASE WHEN (a+b)*(c+d)*(a+c)*(b+d) > 0 THEN
                 (1000000::HUGEINT * n * (a::HUGEINT*d - b::HUGEINT*c)
                   * (a::HUGEINT*d - b::HUGEINT*c))
                 // ((a+b)::HUGEINT * (c+d) * (a+c) * (b+d))
               ELSE 0 END AS chi2
        FROM k)
      SELECT token, CAST(a AS BIGINT) AS n_both,
             CAST(b AS BIGINT) AS n_label_only,
             CAST(c AS BIGINT) AS n_token_only,
             CAST(d AS BIGINT) AS n_neither,
             CAST(chi2 AS BIGINT) AS chi2_micro
      FROM s ORDER BY chi2 DESC, token LIMIT 25""",

    // q142: depth-capped recursive min-distance BFS — (node, dist)
    // pairs dedup via UNION, the cap bounds cycles, MIN settles the
    // first-reach distance.
    "q142_bfs" -> """
      WITH RECURSIVE ed AS (
        SELECT u, v FROM (
          SELECT DISTINCT a.l_orderkey AS ok, a.l_partkey AS u, b.l_partkey AS v
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
        GROUP BY u, v HAVING COUNT(*) >= 2),
      sym AS (SELECT u AS src, v AS dst FROM ed UNION ALL SELECT v, u FROM ed),
      walk(node, dist) AS (
        SELECT p_partkey, CAST(0 AS BIGINT) FROM part WHERE p_brand = 'Brand#1'
        UNION
        SELECT s.dst, w.dist + 1
        FROM walk w JOIN sym s ON s.src = w.node
        WHERE w.dist < 4)
      SELECT CAST(node AS BIGINT) AS node, CAST(MIN(dist) AS BIGINT) AS dist
      FROM walk GROUP BY node ORDER BY node""",

    // q143: both HITS rounds unrolled with the identical BIGINT
    // max-div normalization — hub0 = auth0 = 10^6 everywhere.
    "q143_hits" -> """
      WITH e AS MATERIALIZED (
        SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE c.c_nationkey <> s.s_nationkey),
      nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
      a1r AS (SELECT dst AS node, CAST(COUNT(*) AS BIGINT) * 1000000 AS ar
              FROM e GROUP BY dst),
      a1m AS (SELECT MAX(ar) AS m FROM a1r),
      a1 AS MATERIALIZED (SELECT n.node, COALESCE(ar, 0) * 1000000 // a1m.m AS auth
             FROM nodes n LEFT JOIN a1r ON a1r.node = n.node, a1m),
      h1r AS (SELECT e.src AS node, CAST(SUM(a1.auth) AS BIGINT) AS hr
              FROM e JOIN a1 ON a1.node = e.dst GROUP BY e.src),
      h1m AS (SELECT MAX(hr) AS m FROM h1r),
      h1 AS MATERIALIZED (SELECT n.node, COALESCE(hr, 0) * 1000000 // h1m.m AS hub
             FROM nodes n LEFT JOIN h1r ON h1r.node = n.node, h1m),
      a2r AS (SELECT e.dst AS node, CAST(SUM(h1.hub) AS BIGINT) AS ar
              FROM e JOIN h1 ON h1.node = e.src GROUP BY e.dst),
      a2m AS (SELECT MAX(ar) AS m FROM a2r),
      a2 AS MATERIALIZED (SELECT n.node, COALESCE(ar, 0) * 1000000 // a2m.m AS auth
             FROM nodes n LEFT JOIN a2r ON a2r.node = n.node, a2m),
      h2r AS (SELECT e.src AS node, CAST(SUM(a2.auth) AS BIGINT) AS hr
              FROM e JOIN a2 ON a2.node = e.dst GROUP BY e.src),
      h2m AS (SELECT MAX(hr) AS m FROM h2r),
      h2 AS (SELECT n.node, COALESCE(hr, 0) * 1000000 // h2m.m AS hub
             FROM nodes n LEFT JOIN h2r ON h2r.node = n.node, h2m)
      SELECT CAST(h2.node AS BIGINT) AS node, CAST(h2.hub AS BIGINT) AS hub,
             CAST(a2.auth AS BIGINT) AS auth
      FROM h2 JOIN a2 ON a2.node = h2.node ORDER BY h2.node""",

    // q144: pairwise micro-slopes with the same truncating integer
    // division, lower median at rank ⌈n/2⌉ = (n+1)//2.
    "q144_theilsen" -> """
      WITH daily AS (
        SELECT event_type,
               CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day_idx,
               CAST(count(*) AS BIGINT) AS x
        FROM events WHERE event_type IS NOT NULL
        GROUP BY 1, 2),
      p AS (
        SELECT a.event_type,
               (1000000 * (b.x - a.x)) // (b.day_idx - a.day_idx) AS s
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.day_idx < b.day_idx),
      n AS (SELECT event_type, COUNT(*) AS n_pairs FROM p GROUP BY 1),
      r AS (
        SELECT event_type, s,
               row_number() OVER (PARTITION BY event_type ORDER BY s) AS rn
        FROM p),
      m AS (
        SELECT r.event_type, r.s
        FROM r JOIN n USING (event_type)
        WHERE rn = (n_pairs + 1) // 2)
      SELECT n.event_type, CAST(n.n_pairs AS BIGINT) AS n_pairs,
             CAST(m.s AS BIGINT) AS slope_micro
      FROM n JOIN m USING (event_type) ORDER BY event_type""",

    // q145: distinct-value weight cumsum, threshold ⌈W/2⌉, smallest
    // value whose cumulative weight reaches it.
    "q145_weighted_median" -> """
      WITH v AS (
        SELECT l_returnflag,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
               CAST(l_quantity AS BIGINT) AS w
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND l_quantity > 0),
      pv AS (
        SELECT l_returnflag, price_cents, SUM(w) AS wv
        FROM v GROUP BY 1, 2),
      t AS (SELECT l_returnflag, SUM(wv) AS tw FROM pv GROUP BY 1),
      c AS (
        SELECT pv.l_returnflag, pv.price_cents, pv.wv, t.tw,
               (t.tw + 1) // 2 AS k,
               SUM(pv.wv) OVER (PARTITION BY pv.l_returnflag
                 ORDER BY pv.price_cents
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM pv JOIN t USING (l_returnflag))
      SELECT l_returnflag, CAST(price_cents AS BIGINT) AS cut,
             CAST(tw AS BIGINT) AS total_weight, CAST(k AS BIGINT) AS target_rank
      FROM c WHERE cum >= k AND cum - wv < k
      ORDER BY l_returnflag""",

    // q146: textbook Gini via row_number over keys (tiny at oracle SF);
    // equality certifies the engine's closed-form tie-run fold.
    "q146_skew_profile" -> """
      WITH pk AS (
        SELECT l_returnflag, l_orderkey AS k, COUNT(*) AS c
        FROM lineitem GROUP BY 1, 2),
      agg AS (
        SELECT l_returnflag, COUNT(*) AS n_keys, CAST(SUM(c) AS BIGINT) AS n_rows
        FROM pk GROUP BY 1),
      top AS (
        SELECT l_returnflag, c AS max_count, k AS top_key FROM (
          SELECT *, row_number() OVER (PARTITION BY l_returnflag
            ORDER BY c DESC, k) AS rn FROM pk) WHERE rn = 1),
      r AS (
        SELECT l_returnflag, c,
               row_number() OVER (PARTITION BY l_returnflag ORDER BY c, k) AS i
        FROM pk),
      rm AS (
        SELECT l_returnflag, CAST(SUM(i * c) AS BIGINT) AS rmass
        FROM r GROUP BY 1)
      SELECT a.l_returnflag, CAST(a.n_keys AS BIGINT) AS n_keys, a.n_rows,
             CAST(t.max_count AS BIGINT) AS max_count,
             CAST(t.top_key AS BIGINT) AS top_key,
             CAST(2 * rm.rmass - (a.n_keys + 1) * a.n_rows AS BIGINT) AS gini_num,
             CAST(a.n_keys * a.n_rows AS BIGINT) AS gini_den
      FROM agg a JOIN top t USING (l_returnflag) JOIN rm USING (l_returnflag)
      ORDER BY a.l_returnflag""",

    // q147: q62's integer threshold rule (cum·5 ≥ k·n, smallest value)
    // replayed per metric; same horizon/cents arithmetic.
    "q147_rfm" -> """
      WITH rfm AS (
        SELECT o_custkey,
               CAST(DATE '2025-01-01' - CAST(MAX(o_orderdate) AS DATE) AS BIGINT) AS r_days,
               CAST(COUNT(*) AS BIGINT) AS f_orders,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS m_cents
        FROM orders GROUP BY 1),
      rc AS (SELECT r_days AS v, COUNT(*) AS c FROM rfm GROUP BY 1),
      rcum AS (SELECT v, SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS cum, SUM(c) OVER () AS n FROM rc),
      rth AS (SELECT k, MIN(v) AS t FROM rcum, range(1, 5) AS g(k)
              WHERE cum * 5 >= k * n GROUP BY k),
      fc AS (SELECT f_orders AS v, COUNT(*) AS c FROM rfm GROUP BY 1),
      fcum AS (SELECT v, SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS cum, SUM(c) OVER () AS n FROM fc),
      fth AS (SELECT k, MIN(v) AS t FROM fcum, range(1, 5) AS g(k)
              WHERE cum * 5 >= k * n GROUP BY k),
      mc AS (SELECT m_cents AS v, COUNT(*) AS c FROM rfm GROUP BY 1),
      mcum AS (SELECT v, SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS cum, SUM(c) OVER () AS n FROM mc),
      mth AS (SELECT k, MIN(v) AS t FROM mcum, range(1, 5) AS g(k)
              WHERE cum * 5 >= k * n GROUP BY k),
      assigned AS (
        SELECT m_cents,
               1 + (SELECT COUNT(*) FROM rth WHERE rfm.r_days > rth.t) AS r_q,
               1 + (SELECT COUNT(*) FROM fth WHERE rfm.f_orders > fth.t) AS f_q,
               1 + (SELECT COUNT(*) FROM mth WHERE rfm.m_cents > mth.t) AS m_q
        FROM rfm)
      SELECT CAST(r_q AS INT) AS r_q, CAST(f_q AS INT) AS f_q,
             CAST(m_q AS INT) AS m_q, COUNT(*) AS n_customers,
             CAST(SUM(m_cents) AS BIGINT) AS segment_cents
      FROM assigned GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

    // q148: all-pairs Levenshtein (q113's definition) + recursive
    // closure + balance-argmax window — blocking completeness,
    // clusters, and survivor choice certified in one hash.
    "q148_golden_record" -> """
      WITH RECURSIVE p AS MATERIALIZED (
        SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
        FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        WHERE abs(length(a.c_name) - length(b.c_name)) <= 1
          AND levenshtein(a.c_name, b.c_name) <= 1),
      edges AS MATERIALIZED (
        SELECT id_a AS a, id_b AS b FROM p
        UNION SELECT id_b, id_a FROM p),
      reach(id, r) AS (
        SELECT c_custkey, c_custkey FROM customer
        UNION
        SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
      comp AS MATERIALIZED (SELECT id AS doc_id, MIN(r) AS cluster FROM reach GROUP BY id),
      j AS MATERIALIZED (
        SELECT comp.doc_id, comp.cluster,
               CAST(round(c.c_acctbal * 100) AS BIGINT) AS bal
        FROM comp JOIN customer c ON c.c_custkey = comp.doc_id),
      rep AS (
        SELECT cluster, doc_id AS rep FROM (
          SELECT cluster, doc_id,
                 row_number() OVER (PARTITION BY cluster
                   ORDER BY bal DESC, doc_id) AS rn
          FROM j) WHERE rn = 1)
      SELECT j.doc_id, j.cluster, rep.rep AS rep, j.doc_id = rep.rep AS keep
      FROM j JOIN rep USING (cluster) ORDER BY j.doc_id""",

    // q149: q51's md5 margin arithmetic + the identical mid-rank
    // percentile fold per source, gate at 0.4 in micro-units.
    "q149_score_calibration" -> """
      WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
        FROM documents),
      m AS (
        SELECT doc_id, CAST(SUM(
          (strpos('0123456789abcdef', substring(md5('clf:' || t), 1, 1)) - 1) * 16 +
          (strpos('0123456789abcdef', substring(md5('clf:' || t), 2, 1)) - 1)
          - 128) AS BIGINT) AS margin
        FROM tok GROUP BY doc_id),
      d AS (
        SELECT doc.doc_id, doc.source, doc.n_chars, m.margin
        FROM documents doc JOIN m USING (doc_id)),
      pv AS (SELECT source, margin, COUNT(*) AS c FROM d GROUP BY 1, 2),
      r AS (
        SELECT source, margin,
               (2 * COALESCE(SUM(c) OVER (PARTITION BY source ORDER BY margin
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c)
                 * 1000000
                 // (2 * SUM(c) OVER (PARTITION BY source)) AS pct
        FROM pv),
      g AS (
        SELECT d.source, d.n_chars, r.pct >= 400000 AS keep
        FROM d JOIN r ON r.source = d.source AND r.margin = d.margin)
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             CAST(SUM(CASE WHEN keep THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
      FROM g GROUP BY source ORDER BY source""",

    // q150: the identical md5 coin selects the identical subgraph;
    // q133's triangle definition counts it; est = t·8 (p=1/2 cubed).
    "q150_sampled_triangles" -> """
      WITH e AS MATERIALIZED (
        SELECT u, v FROM (
          SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
        WHERE CAST(('0x' || substr(md5('tri:42:' || CAST(u AS VARCHAR)
                || ':' || CAST(v AS VARCHAR)), 1, 12)) AS BIGINT) % 2 < 1),
      deg AS (
        SELECT node, COUNT(*) AS d
        FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
        GROUP BY node),
      tri AS (
        SELECT COUNT(*) AS t
        FROM e e1
        JOIN e e2 ON e2.u = e1.u AND e1.v < e2.v
        JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v)
      SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
             (SELECT COUNT(*) FROM e) AS n_edges,
             (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
             CAST(t AS BIGINT) AS n_triangles,
             CAST(t * 3 AS BIGINT) AS n_closed_wedges,
             CAST(t * 8 AS BIGINT) AS est_triangles
      FROM tri""",

    // q151: id-ordered triple join, each triangle credits its three
    // corners; top-15 under the (triangles desc, node) total order.
    "q151_node_triangles" -> """
      WITH ed AS MATERIALIZED (
        SELECT u, v FROM (
          SELECT DISTINCT a.l_orderkey AS ok, a.l_partkey AS u, b.l_partkey AS v
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
        GROUP BY u, v HAVING COUNT(*) >= 2),
      deg AS (
        SELECT node, COUNT(*) AS deg
        FROM (SELECT u AS node FROM ed UNION ALL SELECT v AS node FROM ed)
        GROUP BY node),
      tr AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM ed e1
        JOIN ed e2 ON e2.u = e1.u AND e1.v < e2.v
        JOIN ed e3 ON e3.u = e1.v AND e3.v = e2.v),
      pn AS (
        SELECT node, COUNT(*) AS t FROM (
          SELECT a AS node FROM tr
          UNION ALL SELECT b FROM tr
          UNION ALL SELECT c FROM tr)
        GROUP BY node)
      SELECT CAST(d.node AS BIGINT) AS node, CAST(d.deg AS BIGINT) AS deg,
             CAST(COALESCE(pn.t, 0) AS BIGINT) AS n_triangles,
             CAST(2 * COALESCE(pn.t, 0) AS BIGINT) AS lcc_num,
             CAST(d.deg * (d.deg - 1) AS BIGINT) AS lcc_den
      FROM deg d LEFT JOIN pn USING (node)
      ORDER BY n_triangles DESC, node LIMIT 15""",

    // q152: q140's counts both directions → HUGEINT cleared squared
    // cosine → row_number under (score desc, neighbor) per item.
    "q152_item_similarity" -> """
      WITH bi AS (
        SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
      ic AS (SELECT i, COUNT(*) AS n_i FROM bi GROUP BY i),
      p AS (
        SELECT a.i AS x, c.i AS y, COUNT(*) AS n_pair
        FROM bi a JOIN bi c ON a.b = c.b AND a.i < c.i
        GROUP BY 1, 2 HAVING COUNT(*) >= 3),
      r AS (
        SELECT x AS item, y AS neighbor, n_pair FROM p
        UNION ALL SELECT y, x, n_pair FROM p),
      s AS (
        SELECT r.item, r.neighbor,
               CAST((r.n_pair::HUGEINT * r.n_pair * 1000000000000)
                 // (ia.n_i::HUGEINT * ib.n_i) AS BIGINT) AS score_micro12
        FROM r JOIN ic ia ON ia.i = r.item JOIN ic ib ON ib.i = r.neighbor),
      k AS (
        SELECT item, neighbor, score_micro12,
               row_number() OVER (PARTITION BY item
                 ORDER BY score_micro12 DESC, neighbor) AS rank
        FROM s)
      SELECT CAST(item AS BIGINT) AS item, CAST(rank AS BIGINT) AS rank,
             CAST(neighbor AS BIGINT) AS neighbor, score_micro12
      FROM k WHERE rank <= 3 ORDER BY item, rank""",

    // q153: (user, day) dedup fans to anchor days within 30; the three
    // windows are conditional distinct counts — plain integers.
    "q153_engagement" -> """
      WITH ud AS (
        SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      days AS (SELECT DISTINCT day AS anchor FROM ud),
      j AS (
        SELECT d.anchor, ud.u, ud.day
        FROM ud JOIN days d
          ON ud.day > d.anchor - 30 AND ud.day <= d.anchor)
      SELECT CAST(anchor AS VARCHAR) AS day,
             CAST(COUNT(DISTINCT CASE WHEN day = anchor THEN u END) AS BIGINT) AS dau,
             CAST(COUNT(DISTINCT CASE WHEN day > anchor - 7 THEN u END) AS BIGINT) AS wau,
             CAST(COUNT(DISTINCT u) AS BIGINT) AS mau
      FROM j GROUP BY anchor ORDER BY anchor""",

    // q154: three LPA rounds unrolled — per round, neighbor-label
    // counts then the (count desc, label) argmax via row_number.
    "q154_communities" -> """
      WITH ed AS MATERIALIZED (
        SELECT u, v FROM (
          SELECT DISTINCT a.l_orderkey AS ok, a.l_partkey AS u, b.l_partkey AS v
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
        GROUP BY u, v HAVING COUNT(*) >= 2),
      nbr AS MATERIALIZED (
        SELECT u AS node, v AS nbr FROM ed UNION ALL SELECT v, u FROM ed),
      l0 AS (SELECT DISTINCT node, node AS label FROM nbr),
      r1 AS (
        SELECT n.node, l.label, COUNT(*) AS c
        FROM nbr n JOIN l0 l ON l.node = n.nbr GROUP BY 1, 2),
      l1 AS MATERIALIZED (
        SELECT node, label FROM (
          SELECT node, label, row_number() OVER (PARTITION BY node
            ORDER BY c DESC, label) AS rn FROM r1) WHERE rn = 1),
      r2 AS (
        SELECT n.node, l.label, COUNT(*) AS c
        FROM nbr n JOIN l1 l ON l.node = n.nbr GROUP BY 1, 2),
      l2 AS MATERIALIZED (
        SELECT node, label FROM (
          SELECT node, label, row_number() OVER (PARTITION BY node
            ORDER BY c DESC, label) AS rn FROM r2) WHERE rn = 1),
      r3 AS (
        SELECT n.node, l.label, COUNT(*) AS c
        FROM nbr n JOIN l2 l ON l.node = n.nbr GROUP BY 1, 2),
      l3 AS (
        SELECT node, label FROM (
          SELECT node, label, row_number() OVER (PARTITION BY node
            ORDER BY c DESC, label) AS rn FROM r3) WHERE rn = 1)
      SELECT CAST(node AS BIGINT) AS node, CAST(label AS BIGINT) AS label
      FROM l3 ORDER BY node""",

    // q155: the identical lag chain with the cleared dyadic weights
    // 2^(7-i) — num/den BIGINTs, // truncates toward zero like Spark
    // div, so the whole smoothed level hash-certifies.
    "q155_ewma" -> """
      WITH d AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                 AS BIGINT) AS v
        FROM events
        WHERE value IS NOT NULL AND user_id IS NOT NULL AND ts IS NOT NULL
        GROUP BY 1, 2),
      g AS (
        SELECT user_id, day, v,
               lag(v, 1) OVER w AS g1, lag(v, 2) OVER w AS g2,
               lag(v, 3) OVER w AS g3, lag(v, 4) OVER w AS g4,
               lag(v, 5) OVER w AS g5, lag(v, 6) OVER w AS g6,
               lag(v, 7) OVER w AS g7,
               row_number() OVER (PARTITION BY user_id ORDER BY day DESC) AS rn
        FROM d WINDOW w AS (PARTITION BY user_id ORDER BY day)),
      e AS (
        SELECT user_id, day, v,
          CAST(v * 128
            + CASE WHEN g1 IS NOT NULL THEN g1 * 64 ELSE 0 END
            + CASE WHEN g2 IS NOT NULL THEN g2 * 32 ELSE 0 END
            + CASE WHEN g3 IS NOT NULL THEN g3 * 16 ELSE 0 END
            + CASE WHEN g4 IS NOT NULL THEN g4 * 8 ELSE 0 END
            + CASE WHEN g5 IS NOT NULL THEN g5 * 4 ELSE 0 END
            + CASE WHEN g6 IS NOT NULL THEN g6 * 2 ELSE 0 END
            + CASE WHEN g7 IS NOT NULL THEN g7 ELSE 0 END AS BIGINT) AS ewma_num,
          CAST(128
            + CASE WHEN g1 IS NOT NULL THEN 64 ELSE 0 END
            + CASE WHEN g2 IS NOT NULL THEN 32 ELSE 0 END
            + CASE WHEN g3 IS NOT NULL THEN 16 ELSE 0 END
            + CASE WHEN g4 IS NOT NULL THEN 8 ELSE 0 END
            + CASE WHEN g5 IS NOT NULL THEN 4 ELSE 0 END
            + CASE WHEN g6 IS NOT NULL THEN 2 ELSE 0 END
            + CASE WHEN g7 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS ewma_den
        FROM g WHERE rn = 1)
      SELECT user_id, CAST(day AS VARCHAR) AS day, v, ewma_num, ewma_den,
             CAST(ewma_num // ewma_den AS BIGINT) AS ewma_c
      FROM e ORDER BY ewma_c DESC, user_id LIMIT 20""",

    // q156: q111's session frame, then ordered string_agg over the
    // first-5 step prefix (string_agg skips the NULLed tail steps,
    // mirroring Spark's filtered collect_list).
    "q156_session_paths" -> """
      WITH e AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS t FROM events),
      f AS (
        SELECT user_id, event_id, event_type, t,
               CASE WHEN t - lag(t) OVER (PARTITION BY user_id
                 ORDER BY t, event_id) > 1800000000 THEN 1 ELSE 0 END AS nf
        FROM e),
      sess AS (
        SELECT user_id, event_id, event_type, t,
               1 + sum(nf) OVER (PARTITION BY user_id ORDER BY t, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM f),
      r AS (
        SELECT user_id, sid, event_type,
               row_number() OVER (PARTITION BY user_id, sid
                 ORDER BY t, event_id) AS step
        FROM sess),
      p AS (
        SELECT user_id, sid,
               string_agg(CASE WHEN step <= 5 THEN event_type END,
                          '>' ORDER BY step) AS path,
               count(*) AS n_steps
        FROM r GROUP BY 1, 2)
      SELECT path, CAST(count(*) AS BIGINT) AS n_sessions,
             CAST(sum(CASE WHEN n_steps <= 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_complete
      FROM p GROUP BY path ORDER BY n_sessions DESC, path LIMIT 25""",

    // q157: both retrieval legs replayed as QUALIFY'd row_number cuts
    // under the identical (score desc, doc_id) total order; with two
    // lists the cleared RRF collapses to num = Σkr, den = Πkr; the
    // HUGEINT // replays Spark's DECIMAL(38,0) div.
    "q157_rank_fusion" -> """
      WITH tok AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents),
      r1 AS (
        SELECT doc_id, row_number() OVER (
          ORDER BY len(list_filter(t, x -> x = 'data')) DESC, doc_id) AS rnk
        FROM tok QUALIFY rnk <= 100),
      r2 AS (
        SELECT doc_id, row_number() OVER (
          ORDER BY len(list_distinct(t)) DESC, doc_id) AS rnk
        FROM tok QUALIFY rnk <= 100),
      u AS (
        SELECT doc_id, 60 + rnk AS kr FROM r1
        UNION ALL SELECT doc_id, 60 + rnk FROM r2),
      f AS (
        SELECT doc_id AS id, CAST(count(*) AS BIGINT) AS n_lists,
               CAST(CASE WHEN count(*) = 1 THEN 1
                         ELSE sum(kr) END AS BIGINT) AS rrf_num,
               CAST(CASE WHEN count(*) = 1 THEN min(kr)
                         ELSE min(kr) * max(kr) END AS BIGINT) AS rrf_den
        FROM u GROUP BY doc_id)
      SELECT id, n_lists, rrf_num, rrf_den,
             CAST(CAST(rrf_num AS HUGEINT) * 1000000000000 // rrf_den
               AS BIGINT) AS rrf_micro12
      FROM f ORDER BY rrf_micro12 DESC, id LIMIT 50""",

    // q158: the BETWEEN candidate join (DuckDB IEJoin) + the
    // (diff, c_id) row_number argmin replays the bucketed min_by.
    "q158_caliper_match" -> """
      WITH o AS (
        SELECT o_orderkey AS id, o_orderpriority AS pri,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
        FROM orders),
      t AS (SELECT id AS t_id, x AS t_x FROM o WHERE pri = '1-URGENT'),
      c AS (SELECT id AS c_id, x AS c_x FROM o WHERE pri <> '1-URGENT'),
      cand AS (
        SELECT t_id, t_x, c_id, c_x, abs(t_x - c_x) AS diff
        FROM t JOIN c ON c.c_x BETWEEN t.t_x - 10000 AND t.t_x + 10000),
      r AS (
        SELECT t_id, t_x, c_id, c_x, diff,
               row_number() OVER (PARTITION BY t_id
                 ORDER BY diff, c_id) AS rn
        FROM cand)
      SELECT t_id, t_x, c_id, c_x, diff FROM r WHERE rn = 1
      ORDER BY t_id""",

    // q159: q60's ASOF construction with the q68 freshness gate over
    // the click/view union; max_by regularizes same-(user, ts) touch
    // ties exactly like the engine's as-of tie rule.
    "q159_attribution" -> """
      WITH l AS (
        SELECT event_id, user_id, ts,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS rev_c
        FROM events WHERE event_type = 'purchase'),
      r AS (
        SELECT user_id, ts, max_by(event_type, event_id) AS touch
        FROM events WHERE event_type IN ('click', 'view')
        GROUP BY user_id, ts),
      j AS (
        SELECT l.rev_c, r.touch, l.ts AS lts, r.ts AS rts
        FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts),
      g AS (
        SELECT rev_c,
               CASE WHEN rts IS NOT NULL AND
                    abs(CAST(floor(epoch(lts)) AS BIGINT) -
                        CAST(floor(epoch(rts)) AS BIGINT)) <= 86400
                    THEN touch END AS touch
        FROM j)
      SELECT coalesce(touch, 'direct') AS channel,
             CAST(count(*) AS BIGINT) AS n_purchases,
             CAST(sum(rev_c) AS BIGINT) AS revenue_c
      FROM g GROUP BY 1 ORDER BY 1""",

    // q160: the PIT lookup replayed DIRECTLY against the signup stream
    // — SCD-2 run collapse must be invisible to any point-in-time
    // probe, so direct-asof equality certifies intervals + lookup.
    "q160_pit_lookup" -> """
      WITH su AS (
        SELECT user_id, ts,
               max_by(CASE CAST(CAST(value AS DECIMAL(18,2)) * 100
                             AS BIGINT) % 3
                      WHEN 0 THEN 'basic' WHEN 1 THEN 'plus'
                      ELSE 'pro' END, event_id) AS plan
        FROM events
        WHERE event_type = 'signup' AND value IS NOT NULL
        GROUP BY user_id, ts),
      l AS (
        SELECT user_id, ts,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS rev_c
        FROM events WHERE event_type = 'purchase'),
      j AS (
        SELECT l.rev_c, su.plan
        FROM l ASOF LEFT JOIN su
          ON l.user_id = su.user_id AND l.ts >= su.ts)
      SELECT coalesce(plan, 'none') AS plan,
             CAST(count(*) AS BIGINT) AS n_purchases,
             CAST(sum(rev_c) AS BIGINT) AS revenue_c
      FROM j GROUP BY 1 ORDER BY 1""",

    // q161: q91's step CTEs, per-user depth via LEFT JOIN presence,
    // then the per-arm rollup with the cleared conversion ratio.
    "q161_experiment_funnel" -> """
      WITH e AS (
        SELECT user_id, epoch_us(ts) AS t, event_type FROM events
        WHERE event_type IN ('signup','view','click','purchase')),
      s1 AS (SELECT user_id, min(t) AS t1 FROM e
             WHERE event_type = 'signup' GROUP BY 1),
      s2 AS (SELECT e.user_id, min(t) AS t2 FROM e JOIN s1 USING (user_id)
             WHERE event_type = 'view' AND t >= t1
               AND t <= t1 + 172800000000 GROUP BY 1),
      s3 AS (SELECT e.user_id, min(t) AS t3 FROM e JOIN s2 USING (user_id)
             WHERE event_type = 'click' AND t >= t2
               AND t <= t2 + 172800000000 GROUP BY 1),
      s4 AS (SELECT e.user_id, min(t) AS t4 FROM e JOIN s3 USING (user_id)
             WHERE event_type = 'purchase' AND t >= t3
               AND t <= t3 + 172800000000 GROUP BY 1),
      sc AS (
        SELECT s1.user_id, CAST(s1.user_id % 2 AS INT) AS arm,
               CASE WHEN s4.user_id IS NOT NULL THEN 4
                    WHEN s3.user_id IS NOT NULL THEN 3
                    WHEN s2.user_id IS NOT NULL THEN 2
                    ELSE 1 END AS done
        FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
                LEFT JOIN s4 USING (user_id)),
      a AS (
        SELECT arm, count(*) AS n1,
               sum(CASE WHEN done >= 2 THEN 1 ELSE 0 END) AS n2,
               sum(CASE WHEN done >= 3 THEN 1 ELSE 0 END) AS n3,
               sum(CASE WHEN done >= 4 THEN 1 ELSE 0 END) AS n4
        FROM sc GROUP BY arm)
      SELECT arm, CAST(step AS BIGINT) AS step, step_type,
             CAST(n_users AS BIGINT) AS n_users,
             CAST((n_users * 1000000) // n1 AS BIGINT) AS conv_micro
      FROM (
        SELECT arm, n1, 1 AS step, 'signup' AS step_type, n1 AS n_users FROM a
        UNION ALL SELECT arm, n1, 2, 'view', n2 FROM a
        UNION ALL SELECT arm, n1, 3, 'click', n3 FROM a
        UNION ALL SELECT arm, n1, 4, 'purchase', n4 FROM a)
      ORDER BY arm, step""",

    // q162: the day − row_number island anchor, then two rollups —
    // dates subtract to integers in both engines.
    "q162_streaks" -> """
      WITH d AS (
        SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      isl AS (
        SELECT u, day,
               day - CAST(row_number() OVER (PARTITION BY u ORDER BY day)
                 AS INT) AS anchor
        FROM d),
      runs AS (
        SELECT u, anchor, count(*) AS len FROM isl GROUP BY 1, 2),
      per_user AS (
        SELECT u, max(len) AS longest_streak, count(*) AS n_streaks,
               sum(len) AS n_active_days
        FROM runs GROUP BY u)
      SELECT CAST(longest_streak AS BIGINT) AS longest_streak,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(n_streaks) AS BIGINT) AS total_streaks,
             CAST(sum(n_active_days) AS BIGINT) AS total_active_days
      FROM per_user GROUP BY 1 ORDER BY 1""",

    // q163: centi-unit rollup, lag for MoM, month totals joined back;
    // // truncates toward zero on the possibly-negative delta exactly
    // like Spark div.
    "q163_mom_growth" -> """
      WITH rev AS (
        SELECT n_name, strftime(o_orderdate, '%Y-%m') AS month,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                 AS BIGINT)) AS BIGINT) AS rev_c
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2),
      tot AS (
        SELECT month, CAST(sum(rev_c) AS BIGINT) AS month_total_c
        FROM rev GROUP BY 1),
      l AS (
        SELECT n_name, month, rev_c,
               lag(rev_c) OVER (PARTITION BY n_name ORDER BY month) AS prev_c
        FROM rev)
      SELECT l.n_name, l.month, l.rev_c, l.prev_c,
             CAST(((l.rev_c - l.prev_c) * 1000000) // l.prev_c AS BIGINT)
               AS growth_micro,
             CAST((l.rev_c * 1000000) // t.month_total_c AS BIGINT)
               AS share_micro
      FROM l JOIN tot t USING (month)
      ORDER BY n_name, month""",

    // q164: integer year·12+month cohort index; cumulative window over
    // the (cohort, age) contraction; exact per-customer LTV div.
    "q164_ltv_curve" -> """
      WITH o AS (
        SELECT o_custkey,
               CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                 AS ym,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                 AS rev_c
        FROM orders),
      coh AS (
        SELECT o_custkey, min(ym) AS cohort_ym FROM o GROUP BY 1),
      sized AS (
        SELECT cohort_ym, count(DISTINCT o_custkey) AS n_customers
        FROM coh GROUP BY 1),
      curve AS (
        SELECT cohort_ym, ym - cohort_ym AS age,
               CAST(sum(rev_c) AS BIGINT) AS rev_c
        FROM o JOIN coh USING (o_custkey)
        GROUP BY 1, 2),
      c2 AS (
        SELECT cohort_ym, age, rev_c,
               CAST(sum(rev_c) OVER (PARTITION BY cohort_ym ORDER BY age
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum_rev_c
        FROM curve)
      SELECT c2.cohort_ym, c2.age,
             CAST(s.n_customers AS BIGINT) AS n_customers,
             c2.rev_c, c2.cum_rev_c,
             CAST(c2.cum_rev_c // s.n_customers AS BIGINT) AS ltv_per_cust_c
      FROM c2 JOIN sized s USING (cohort_ym)
      ORDER BY cohort_ym, age""",

    // q133: the textbook id-ordered triangle definition — each triangle
    // x<y<z closes edges (x,y),(x,z),(y,z) exactly once. The engine
    // counts under DEGREE ordering instead; equal counts certify the
    // oriented plan. n_wedges = Σ d(d−1)/2 in integer arithmetic.
    // q205: q151's per-node triple-join replay on the UNfiltered
    // co-purchase graph (q133's edge set), cross-joined with q133's
    // census scalars — one hash certifies the stored-adjacency build
    // and both stored readouts.
    "q205_stored_census" -> """
      WITH e AS MATERIALIZED (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      deg AS (
        SELECT node, COUNT(*) AS deg
        FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
        GROUP BY node),
      tr AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1
        JOIN e e2 ON e2.u = e1.u AND e1.v < e2.v
        JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
      pn AS (
        SELECT node, COUNT(*) AS t FROM (
          SELECT a AS node FROM tr
          UNION ALL SELECT b FROM tr
          UNION ALL SELECT c FROM tr)
        GROUP BY node),
      census AS (
        SELECT (SELECT COUNT(*) FROM e) AS n_edges,
               (SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM tr) AS total_triangles)
      SELECT CAST(d.node AS BIGINT) AS node, CAST(d.deg AS BIGINT) AS deg,
             CAST(COALESCE(pn.t, 0) AS BIGINT) AS n_triangles,
             CAST(2 * COALESCE(pn.t, 0) AS BIGINT) AS lcc_num,
             CAST(d.deg * (d.deg - 1) AS BIGINT) AS lcc_den,
             c.n_edges, c.n_wedges, c.total_triangles
      FROM deg d LEFT JOIN pn USING (node) CROSS JOIN census c
      ORDER BY n_triangles DESC, node LIMIT 15""",

    "q133_triangles" -> """
      WITH e AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      deg AS (
        SELECT node, COUNT(*) AS d
        FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
        GROUP BY node),
      tri AS (
        SELECT COUNT(*) AS t
        FROM e e1
        JOIN e e2 ON e2.u = e1.u AND e1.v < e2.v
        JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v)
      SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
             (SELECT COUNT(*) FROM e) AS n_edges,
             (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
             CAST(t AS BIGINT) AS n_triangles,
             CAST(t * 3 AS BIGINT) AS n_closed_wedges
      FROM tri""",

    // q125: q20's exact all-pairs construction verbatim — equality
    // certifies the prefix filter's completeness at the 1/2 threshold
    // and the hashed sorted-merge Jaccard.
    "q125_setsim_join" -> """
      WITH tok AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
      sh AS (
        SELECT doc_id,
               CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                    ELSE list_distinct([array_to_string(t[i:i+2], ' ')
                                        for i in range(1, len(t) - 1)]) END AS s
        FROM tok),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= 0.5
      ORDER BY id_a, id_b""",

    // q165: version-wins MERGE replayed as a row_number pick over
    // stored ∪ updates ordered by (version, src) desc — the stale
    // update (version below the stored row's) must lose, ties go to
    // the batch (src 1 > 0). Decimal pre-sums, final cast to double.
    "q165_upsert_latest" -> """
      WITH stored AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               o_orderkey % 7 AS version, 0 AS src
        FROM orders),
      upd AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice + 1000.0 AS o_totalprice,
               o_orderkey % 5 AS version, 1 AS src
        FROM orders WHERE o_orderkey % 3 = 0),
      merged AS (
        SELECT *, row_number() OVER (PARTITION BY o_orderkey
                 ORDER BY version DESC, src DESC) AS rn
        FROM (SELECT * FROM stored UNION ALL SELECT * FROM upd))
      SELECT o_orderstatus,
             count(*) AS n_orders,
             CAST(sum(src) AS BIGINT) AS n_from_updates,
             CAST(sum(version) AS BIGINT) AS version_sum,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
               AS DECIMAL(18,6)) AS DOUBLE) AS total
      FROM merged WHERE rn = 1
      GROUP BY 1 ORDER BY 1""",

    // q166: per-column profile replayed as one SELECT per column —
    // exact distinct counts, min/max canonicalized to strings.
    "q166_table_profile" -> """
      SELECT 'o_custkey' AS "column", count(*) AS n,
             CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
             CAST(min(o_custkey) AS VARCHAR) AS min_s,
             CAST(max(o_custkey) AS VARCHAR) AS max_s
      FROM orders
      UNION ALL
      SELECT 'o_orderdate', count(*),
             CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(count(DISTINCT o_orderdate) AS BIGINT),
             CAST(min(o_orderdate) AS VARCHAR), CAST(max(o_orderdate) AS VARCHAR)
      FROM orders
      UNION ALL
      SELECT 'o_orderkey', count(*),
             CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(count(DISTINCT o_orderkey) AS BIGINT),
             CAST(min(o_orderkey) AS VARCHAR), CAST(max(o_orderkey) AS VARCHAR)
      FROM orders
      UNION ALL
      SELECT 'o_orderpriority', count(*),
             CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(count(DISTINCT o_orderpriority) AS BIGINT),
             CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR)
      FROM orders
      UNION ALL
      SELECT 'o_orderstatus', count(*),
             CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(count(DISTINCT o_orderstatus) AS BIGINT),
             CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR)
      FROM orders
      ORDER BY "column"""",

    // q167: md5-derived 60-bit row signatures (first 15 hex chars
    // parsed as an integer — byte-identical across engines; fields
    // join on the chr(1) separator with NULL as the chr(0) sentinel,
    // distinct from ''), summed per key-range bucket in HUGEINT and
    // reduced mod 2^61.
    "q167_bucket_checksum" -> """
      WITH sig AS (
        SELECT l_orderkey % 16 AS bucket,
               CAST(concat('0x', substr(md5(concat_ws(chr(1),
                 coalesce(CAST(l_orderkey AS VARCHAR), chr(0)),
                 coalesce(CAST(l_linenumber AS VARCHAR), chr(0)),
                 coalesce(l_returnflag, chr(0)),
                 coalesce(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR), chr(0))
               )), 1, 15)) AS BIGINT) AS s
        FROM lineitem)
      SELECT bucket, count(*) AS n_rows,
             CAST(sum(s) % 2305843009213693952 AS BIGINT) AS checksum
      FROM sig GROUP BY bucket ORDER BY bucket""",

    // q168: Fleiss' kappa replayed from the same three deterministic
    // raters — cleared-integer sufficient statistics in HUGEINT, the
    // single IEEE division last.
    "q168_fleiss_kappa" -> """
      WITH ratings AS (
        SELECT doc_id AS i, n_chars % 3 AS j FROM documents
        UNION ALL
        SELECT doc_id, (n_chars // 7) % 3 FROM documents
        UNION ALL
        SELECT doc_id, doc_id % 3 FROM documents),
      nij AS (SELECT i, j, count(*) AS m FROM ratings GROUP BY 1, 2),
      scal AS (
        SELECT (SELECT count(DISTINCT i) FROM nij) AS n_items,
               3 AS n_raters,
               (SELECT count(DISTINCT j) FROM nij) AS n_categories,
               (SELECT sum(m * m) FROM nij) AS a_sum,
               (SELECT sum(c * c) FROM
                  (SELECT j, sum(m) AS c FROM nij GROUP BY j)) AS s_sum)
      SELECT CAST(n_items AS BIGINT) AS n_items,
             CAST(n_raters AS BIGINT) AS n_raters,
             CAST(n_categories AS BIGINT) AS n_categories,
             CAST(a_sum AS BIGINT) AS a_sum,
             CAST(s_sum AS BIGINT) AS s_sum,
             CAST(n_items * n_raters * (a_sum - n_items * n_raters)
                  - s_sum * (n_raters - 1) AS BIGINT) AS kappa_num,
             CAST((n_raters - 1) * (n_items * n_raters * n_items * n_raters
                  - s_sum) AS BIGINT) AS kappa_den,
             CAST(n_items * n_raters * (a_sum - n_items * n_raters)
                  - s_sum * (n_raters - 1) AS DOUBLE)
               / CAST((n_raters - 1) * (n_items * n_raters * n_items * n_raters
                  - s_sum) AS DOUBLE) AS kappa
      FROM scal""",

    // q169: readability signals — whitespace words, terminator-run
    // sentences (min 1 for non-empty text), vowel-group syllables,
    // and the Flesch score in milli-units with truncating divisions.
    "q169_readability" -> """
      WITH d AS (
        SELECT lang,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS w,
               CAST(CASE WHEN len(trim(text)) = 0 THEN 0
                    ELSE greatest(1, len(regexp_extract_all(text, '[.!?]+')))
                    END AS BIGINT) AS se,
               CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS sy
        FROM documents),
      g AS (
        SELECT lang, count(*) AS n_docs,
               CAST(sum(w) AS BIGINT) AS words,
               CAST(sum(se) AS BIGINT) AS sentences,
               CAST(sum(sy) AS BIGINT) AS syllables
        FROM d GROUP BY lang)
      SELECT lang, n_docs, words, sentences, syllables,
             CASE WHEN words = 0 OR sentences = 0 THEN NULL
                  ELSE 206835 - (1015 * ((1000 * words) // sentences)) // 1000
                             - (84600 * ((1000 * syllables) // words)) // 1000
             END AS flesch_milli
      FROM g ORDER BY lang""",

    // q170: sample-and-hold TWAP — lead() to the next sample (ties on
    // value for a total order), the last holds to the 2024-01-31
    // horizon; HUGEINT replays the DECIMAL(38,0) micro quotient.
    "q170_twap" -> """
      WITH d AS (
        SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        FROM events
        WHERE user_id < 500 AND ts IS NOT NULL AND value IS NOT NULL),
      g AS (
        SELECT user_id, sec, v,
               coalesce(lead(sec) OVER (PARTITION BY user_id ORDER BY sec, v),
                        1706659200) AS nxt
        FROM d)
      SELECT user_id, count(*) AS n_samples,
             CAST(sum(nxt - sec) AS BIGINT) AS held_sec,
             CAST(sum(v * (nxt - sec)) AS BIGINT) AS vt_sum,
             CAST((sum(v * (nxt - sec)) * 1000000) // sum(nxt - sec) AS BIGINT)
               AS twap_micro
      FROM g GROUP BY user_id ORDER BY user_id""",

    // q171: linear multi-touch attribution — the 24h window join
    // replayed non-equi (exact at oracle scale), first/last by
    // (touch_ts, touch_id) row_number, equal split via truncating //.
    "q171_multi_touch" -> """
      WITH conv AS (
        SELECT event_id AS conv_id, user_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS conv_ts,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS rev_c
        FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
      tch AS (
        SELECT event_id AS touch_id, user_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS touch_ts,
               event_type AS channel
        FROM events WHERE event_type IN ('click', 'view')),
      matched AS (
        SELECT c.conv_id, c.rev_c, t.touch_id, t.touch_ts, t.channel
        FROM conv c JOIN tch t
          ON c.user_id = t.user_id
         AND t.touch_ts >= greatest(0, c.conv_ts - 86400)
         AND t.touch_ts <= c.conv_ts - 1),
      ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY conv_id
                 ORDER BY touch_ts, touch_id) AS rn_first,
               row_number() OVER (PARTITION BY conv_id
                 ORDER BY touch_ts DESC, touch_id DESC) AS rn_last,
               count(*) OVER (PARTITION BY conv_id) AS n_touches
        FROM matched),
      credited AS (
        SELECT channel,
               CASE WHEN rn_first = 1 THEN 'first'
                    WHEN rn_last = 1 THEN 'last'
                    ELSE 'middle' END AS pos,
               (rev_c * 1000000) // n_touches AS credit_micro
        FROM ranked)
      SELECT channel, pos, count(*) AS n_touches,
             CAST(sum(credit_micro) AS BIGINT) AS credit_micro_sum
      FROM credited GROUP BY 1, 2 ORDER BY channel, pos""",

    // q172: the NAIVE full-outer diff over the same mutation — the
    // bucket-scoped summary must equal it exactly (dense four types).
    "q172_diff_by_buckets" -> """
      WITH base AS (
        SELECT o_orderkey AS k, o_orderstatus AS s,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS p
        FROM orders),
      nxt AS (
        SELECT k, s,
               CASE WHEN k % 13 = 0 THEN p + 100000 ELSE p END AS p
        FROM base WHERE k % 97 <> 0
        UNION ALL
        SELECT k + 10000000, s, p FROM base WHERE k % 101 = 0),
      d AS (
        SELECT CASE WHEN b.k IS NULL THEN 'added'
                    WHEN n.k IS NULL THEN 'removed'
                    WHEN b.s IS DISTINCT FROM n.s
                      OR b.p IS DISTINCT FROM n.p THEN 'changed'
                    ELSE 'unchanged' END AS change_type
        FROM base b FULL OUTER JOIN nxt n ON b.k = n.k),
      counts AS (
        SELECT change_type, count(*) AS n FROM d GROUP BY 1)
      SELECT t.change_type, CAST(coalesce(c.n, 0) AS BIGINT) AS n_keys
      FROM (VALUES ('added'), ('changed'), ('removed'), ('unchanged'))
        AS t(change_type)
      LEFT JOIN counts c USING (change_type)
      ORDER BY change_type""",

    // q173: the truss fixpoint replayed with q137's recursive
    // removed-list accumulator over EDGE ids (u·10^7+v); per-edge
    // support = common surviving neighbors, counted via the doubled
    // adjacency. k = 3 → peel support < 1.
    "q173_ktruss" -> """
      WITH RECURSIVE ed AS (
        SELECT u, v, u * 10000000 + v AS eid FROM (
          SELECT u, v FROM (
            SELECT DISTINCT a.l_orderkey AS ok, a.l_partkey AS u, b.l_partkey AS v
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
          GROUP BY u, v HAVING COUNT(*) >= 2)),
      nbr AS (SELECT u AS a, v AS b, eid FROM ed
              UNION ALL SELECT v, u, eid FROM ed),
      peel(removed) AS (
        SELECT CAST([] AS BIGINT[])
        UNION
        SELECT (
          SELECT COALESCE(LIST(DISTINCT x ORDER BY x), CAST([] AS BIGINT[]))
          FROM (
            SELECT s.eid AS x
            FROM ed s
            WHERE NOT list_contains(p.removed, s.eid)
              AND (SELECT COUNT(*)
                   FROM nbr n1 JOIN nbr n2 ON n1.b = n2.b
                   WHERE n1.a = s.u AND n2.a = s.v
                     AND NOT list_contains(p.removed, n1.eid)
                     AND NOT list_contains(p.removed, n2.eid)) < 1
            UNION ALL
            SELECT UNNEST(p.removed) AS x) t)
        FROM peel p),
      final AS (SELECT removed FROM peel ORDER BY len(removed) DESC LIMIT 1)
      SELECT CAST(s.u AS BIGINT) AS u, CAST(s.v AS BIGINT) AS v,
             CAST((SELECT COUNT(*)
                   FROM nbr n1 JOIN nbr n2 ON n1.b = n2.b
                   WHERE n1.a = s.u AND n2.a = s.v
                     AND NOT list_contains(f.removed, n1.eid)
                     AND NOT list_contains(f.removed, n2.eid)) AS BIGINT) AS support
      FROM ed s, final f
      WHERE NOT list_contains(f.removed, s.eid)
      ORDER BY u, v""",

    // q174: the unigram seed stage — every substring of length 2..8
    // of every distinct word, weighted by word frequency, top-10
    // under (count desc, piece).
    "q174_unigram_candidates" -> """
      WITH w AS (
        SELECT word, count(*) AS c FROM (
          SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]')) AS word
          FROM documents) GROUP BY word),
      sub AS (
        SELECT substr(word, CAST(i AS INT), CAST(l AS INT)) AS piece, c
        FROM w,
             unnest(range(1, len(word) + 1)) AS t(i),
             unnest(range(2, 9)) AS s(l)
        WHERE CAST(i AS INT) + CAST(l AS INT) - 1 <= len(word)),
      counts AS (
        SELECT piece, CAST(sum(c) AS BIGINT) AS count
        FROM sub GROUP BY piece HAVING sum(c) >= 2)
      SELECT piece, count FROM counts
      ORDER BY count DESC, piece LIMIT 10""",

    // q176: Fellegi–Sunter band classification replayed field by
    // field — same perturbations, same integer milli weights, same
    // thresholds.
    "q176_record_linkage" -> """
      WITH c AS (
        SELECT *, CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_c
        FROM customer),
      a AS (
        SELECT c_custkey AS id_a, c_nationkey AS nk, c_mktsegment AS seg,
               c_name AS name_a, bal_c AS bal_a
        FROM c),
      b AS (
        SELECT c_custkey AS id_b, c_nationkey AS nk, c_mktsegment AS seg,
               CASE WHEN c_custkey % 5 = 0 THEN upper(c_name) ELSE c_name END AS name_b,
               bal_c + CASE WHEN c_custkey % 3 = 0 THEN 100
                            WHEN c_custkey % 7 = 0 THEN 100000
                            ELSE 0 END AS bal_b
        FROM c),
      scored AS (
        SELECT id_a, id_b,
               (CASE WHEN name_a = name_b THEN 4000 ELSE -1500 END
                + CASE WHEN bal_a = bal_b THEN 3000 ELSE -1200 END
                + CASE WHEN CAST(bal_a AS HUGEINT) // 100000
                          = CAST(bal_b AS HUGEINT) // 100000
                       THEN 2000 ELSE -1000 END) AS score_milli
        FROM a JOIN b USING (nk, seg)),
      banded AS (
        SELECT *,
               CASE WHEN score_milli >= 5000 THEN 'link'
                    WHEN score_milli < 0 THEN 'reject'
                    ELSE 'review' END AS decision
        FROM scored)
      SELECT decision, count(*) AS n_pairs,
             CAST(sum(CASE WHEN id_a = id_b THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
             CAST(sum(score_milli) AS BIGINT) AS score_sum,
             CAST(min(score_milli) AS BIGINT) AS score_min,
             CAST(max(score_milli) AS BIGINT) AS score_max
      FROM banded GROUP BY 1 ORDER BY decision""",

    // q177: FD check per ordered pair — |distinct(A,B)| vs
    // |distinct A| with exact violation counts.
    "q177_functional_deps" -> """
      WITH pair AS (
        SELECT 'o_orderkey' AS determinant, 'o_custkey' AS dependent,
               CAST(o_orderkey AS VARCHAR) AS a, CAST(o_custkey AS VARCHAR) AS b
        FROM orders
        UNION ALL
        SELECT 'o_orderkey', 'o_orderpriority',
               CAST(o_orderkey AS VARCHAR), o_orderpriority FROM orders
        UNION ALL
        SELECT 'o_custkey', 'o_orderkey',
               CAST(o_custkey AS VARCHAR), CAST(o_orderkey AS VARCHAR) FROM orders
        UNION ALL
        SELECT 'o_custkey', 'o_orderpriority',
               CAST(o_custkey AS VARCHAR), o_orderpriority FROM orders
        UNION ALL
        SELECT 'o_orderpriority', 'o_orderkey',
               o_orderpriority, CAST(o_orderkey AS VARCHAR) FROM orders
        UNION ALL
        SELECT 'o_orderpriority', 'o_custkey',
               o_orderpriority, CAST(o_custkey AS VARCHAR) FROM orders),
      ab AS (
        SELECT DISTINCT determinant, dependent, a, b FROM pair),
      perA AS (
        SELECT determinant, dependent, a, count(*) AS nb
        FROM ab GROUP BY 1, 2, 3)
      SELECT determinant, dependent,
             count(*) AS n_distinct_det,
             CAST(sum(nb - 1) AS BIGINT) AS n_violations,
             sum(nb - 1) = 0 AS fd_holds
      FROM perA GROUP BY 1, 2
      ORDER BY determinant, dependent""",

    // q178: join size forecast from the two per-key count tables —
    // n_out = sum of count products, the heaviest key's product, and
    // the outer-join null-extension counts.
    "q178_join_forecast" -> """
      WITH ca AS (
        SELECT o_orderkey AS k, count(*) AS ca FROM orders GROUP BY 1),
      cb AS (
        SELECT l_orderkey AS k, count(*) AS cb FROM lineitem GROUP BY 1),
      j AS (SELECT * FROM ca FULL OUTER JOIN cb USING (k)),
      m AS (SELECT k, ca * cb AS prod FROM j
            WHERE ca IS NOT NULL AND cb IS NOT NULL)
      SELECT
        CAST((SELECT coalesce(sum(prod), 0) FROM m) AS BIGINT) AS n_out,
        CAST((SELECT count(*) FROM m) AS BIGINT) AS n_matched_keys,
        CAST((SELECT coalesce(max(prod), 0) FROM m) AS BIGINT) AS max_fanout,
        CAST((SELECT k FROM m ORDER BY prod DESC, k LIMIT 1) AS BIGINT) AS top_key,
        CAST((SELECT count(*) FROM j WHERE cb IS NULL) AS BIGINT) AS n_left_only,
        CAST((SELECT count(*) FROM j WHERE ca IS NULL) AS BIGINT) AS n_right_only""",

    // q179: the IVM identity replayed as a RECOMPUTE over the mutated
    // base — maintain(view(T), delta) must equal view(T +/- delta).
    "q179_ivm_delta" -> """
      WITH base AS (
        SELECT o_orderkey, o_orderstatus,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS rev_c
        FROM orders),
      mutated AS (
        SELECT o_orderstatus, rev_c FROM base WHERE o_orderkey % 97 <> 0
        UNION ALL
        SELECT o_orderstatus, rev_c + 100000 FROM base WHERE o_orderkey % 101 = 0)
      SELECT o_orderstatus, count(*) AS n,
             CAST(sum(rev_c) AS BIGINT) AS rev_c
      FROM mutated GROUP BY 1 ORDER BY 1""",

    // q180: hop-4-capped weighted path recursion — the relaxation
    // converges in <= 3 rounds at every SF (measured), so the cap has
    // one full round of margin; UNION dedups (node, dist, hops) and
    // MIN settles the metric.
    "q180_sssp" -> """
      WITH RECURSIVE tg AS MATERIALIZED (
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
               1000000 // count(*) AS w
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE c.c_nationkey <> s.s_nationkey
        GROUP BY 1, 2),
      walk(node, dist, hops) AS (
        SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), 0
        UNION
        SELECT tg.dst, w.dist + tg.w, w.hops + 1
        FROM walk w JOIN tg ON tg.src = w.node
        WHERE w.hops < 4)
      SELECT CAST(node AS BIGINT) AS node, CAST(MIN(dist) AS BIGINT) AS dist
      FROM walk GROUP BY node ORDER BY node""",

    // q181: relational division as the count-matching HAVING — the
    // divisor is the 3 smallest Brand#2 part keys (size-stable across
    // SFs), a supplier qualifies iff it covers all of them.
    "q181_division" -> """
      WITH div AS MATERIALIZED (
        SELECT p_partkey FROM part WHERE p_brand = 'Brand#2'
        ORDER BY p_partkey LIMIT 3),
      m AS (
        SELECT l_suppkey, count(DISTINCT l_partkey) AS c
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM div)
        GROUP BY 1)
      SELECT CAST(m.l_suppkey AS BIGINT) AS s_suppkey, s.s_name,
             CAST((SELECT count(*) FROM div) AS BIGINT) AS n_required
      FROM m JOIN supplier s ON s.s_suppkey = m.l_suppkey
      WHERE m.c = (SELECT count(*) FROM div)
      ORDER BY s_suppkey""",

    // q182: l-diversity over (event_type, day-of-week) with user_id
    // sensitive — the two-level contraction replayed as a nested
    // aggregate; diverse iff >= 50 distinct users.
    "q182_l_diversity" -> """
      WITH sv AS (
        SELECT event_type,
               CAST((datediff('day', DATE '2024-01-01', CAST(ts AS DATE))) % 7
                 AS BIGINT) AS dow,
               user_id, count(*) AS sn
        FROM events GROUP BY 1, 2, 3)
      SELECT event_type, dow,
             CAST(sum(sn) AS BIGINT) AS n,
             count(*) AS n_sensitive,
             CAST(max(sn) AS BIGINT) AS max_freq,
             count(*) >= 50 AS diverse
      FROM sv GROUP BY 1, 2 ORDER BY event_type, dow""",

    // q183: the Holt fixed-point recurrence replayed as a per-key
    // recursive CTE with the IDENTICAL truncating integer division
    // (alpha = 1/4, beta = 1/8: lvl' = (x + 3(lvl+tr)) // 4,
    // tr' = ((lvl' - lvl) + 7 tr) // 8, seed lvl=x_1, tr=0).
    "q183_holt" -> """
      WITH RECURSIVE daily AS MATERIALIZED (
        SELECT event_type,
               CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
                 AS BIGINT) AS day_idx,
               CAST(count(*) AS BIGINT) AS x
        FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
      num AS MATERIALIZED (
        SELECT event_type, day_idx, x,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY day_idx) AS rn
        FROM daily),
      rec(event_type, rn, lvl, tr) AS (
        SELECT event_type, rn, x, CAST(0 AS BIGINT) FROM num WHERE rn = 1
        UNION ALL
        SELECT n.event_type, n.rn,
               (n.x + 3 * (r.lvl + r.tr)) // 4,
               (((n.x + 3 * (r.lvl + r.tr)) // 4) - r.lvl + 7 * r.tr) // 8
        FROM rec r JOIN num n
          ON n.event_type = r.event_type AND n.rn = r.rn + 1)
      SELECT n.event_type, n.day_idx, n.x, r.lvl, r.tr,
             CASE WHEN n.rn = 1 THEN CAST(0 AS BIGINT)
                  ELSE n.x - (p.lvl + p.tr) END AS err
      FROM num n
      JOIN rec r ON r.event_type = n.event_type AND r.rn = n.rn
      LEFT JOIN rec p ON p.event_type = n.event_type AND p.rn = n.rn - 1
      ORDER BY 1, 2""",

    // q184: seasonal-naive MASE ingredients — row-lag semantics on
    // both engines (lag 7 = forecast, lag 1 = naive denominator, both
    // summed over the rows where the season lag exists).
    "q184_seasonal_naive" -> """
      WITH daily AS (
        SELECT event_type,
               datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_idx,
               CAST(count(*) AS BIGINT) AS x
        FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
      lagged AS (
        SELECT event_type, x,
               lag(x, 7) OVER (PARTITION BY event_type ORDER BY day_idx) AS xs,
               lag(x, 1) OVER (PARTITION BY event_type ORDER BY day_idx) AS x1
        FROM daily)
      SELECT event_type, count(*) AS n_eval,
             CAST(sum(abs(x - xs)) AS BIGINT) AS sae_seasonal,
             CAST(sum(abs(x - x1)) AS BIGINT) AS sae_naive
      FROM lagged WHERE xs IS NOT NULL
      GROUP BY 1 ORDER BY event_type""",

    // q185: per-column gini-impurity ingredients — value counts per
    // column, then n^2 - sum(c^2) over HUGEINT cast back to BIGINT.
    "q185_purity" -> """
      WITH s AS (SELECT o_orderstatus AS v FROM orders),
      sc AS (SELECT count(*) AS c FROM s GROUP BY v),
      sa AS (SELECT 'o_orderstatus' AS "column",
                    CAST(sum(c) AS BIGINT) AS n, count(*) AS n_distinct,
                    CAST(max(c) AS BIGINT) AS top_freq,
                    CAST(sum(c) * sum(c) - sum(c * c) AS BIGINT) AS gini_num,
                    CAST(sum(c) * sum(c) AS BIGINT) AS gini_den FROM sc),
      p AS (SELECT o_orderpriority AS v FROM orders),
      pc AS (SELECT count(*) AS c FROM p GROUP BY v),
      pa AS (SELECT 'o_orderpriority',
                    CAST(sum(c) AS BIGINT), count(*),
                    CAST(max(c) AS BIGINT),
                    CAST(sum(c) * sum(c) - sum(c * c) AS BIGINT),
                    CAST(sum(c) * sum(c) AS BIGINT) FROM pc),
      k AS (SELECT o_custkey AS v FROM orders),
      kc AS (SELECT count(*) AS c FROM k GROUP BY v),
      ka AS (SELECT 'o_custkey',
                    CAST(sum(c) AS BIGINT), count(*),
                    CAST(max(c) AS BIGINT),
                    CAST(sum(c) * sum(c) - sum(c * c) AS BIGINT),
                    CAST(sum(c) * sum(c) AS BIGINT) FROM kc)
      SELECT * FROM sa UNION ALL SELECT * FROM pa UNION ALL SELECT * FROM ka
      ORDER BY "column"""",

    // q186: zone-map pruning what-if — per (layout, range): a bucket
    // is touched iff its [min, max] envelope overlaps the range;
    // rows_scanned sums touched buckets, rows_matched is the exact
    // predicate count.
    "q186_zonemap" -> """
      WITH li AS MATERIALIZED (
        SELECT datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE))
                 AS ship_day,
               l_orderkey
        FROM lineitem),
      zs AS MATERIALIZED (
        SELECT ship_day // 30 AS bucket, count(*) AS n_rows,
               min(ship_day) AS min_v, max(ship_day) AS max_v,
               sum(CASE WHEN ship_day BETWEEN 1500 AND 1599 THEN 1 ELSE 0 END) AS m0,
               sum(CASE WHEN ship_day BETWEEN 2000 AND 2199 THEN 1 ELSE 0 END) AS m1,
               sum(CASE WHEN ship_day BETWEEN 3000 AND 3099 THEN 1 ELSE 0 END) AS m2
        FROM li GROUP BY 1),
      zr AS MATERIALIZED (
        SELECT l_orderkey // 1000 AS bucket, count(*) AS n_rows,
               min(ship_day) AS min_v, max(ship_day) AS max_v,
               sum(CASE WHEN ship_day BETWEEN 1500 AND 1599 THEN 1 ELSE 0 END) AS m0,
               sum(CASE WHEN ship_day BETWEEN 2000 AND 2199 THEN 1 ELSE 0 END) AS m1,
               sum(CASE WHEN ship_day BETWEEN 3000 AND 3099 THEN 1 ELSE 0 END) AS m2
        FROM li GROUP BY 1),
      u AS (
        SELECT 'time_sorted' AS layout, CAST(1500 AS BIGINT) AS lo,
               CAST(1599 AS BIGINT) AS hi, count(*) AS buckets_total,
               CAST(sum(CASE WHEN max_v >= 1500 AND min_v <= 1599 THEN 1 ELSE 0 END) AS BIGINT) AS buckets_touched,
               CAST(sum(n_rows) AS BIGINT) AS rows_total,
               CAST(sum(CASE WHEN max_v >= 1500 AND min_v <= 1599 THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
               CAST(sum(m0) AS BIGINT) AS rows_matched FROM zs
        UNION ALL
        SELECT 'time_sorted', 2000, 2199, count(*),
               CAST(sum(CASE WHEN max_v >= 2000 AND min_v <= 2199 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(sum(n_rows) AS BIGINT),
               CAST(sum(CASE WHEN max_v >= 2000 AND min_v <= 2199 THEN n_rows ELSE 0 END) AS BIGINT),
               CAST(sum(m1) AS BIGINT) FROM zs
        UNION ALL
        SELECT 'time_sorted', 3000, 3099, count(*),
               CAST(sum(CASE WHEN max_v >= 3000 AND min_v <= 3099 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(sum(n_rows) AS BIGINT),
               CAST(sum(CASE WHEN max_v >= 3000 AND min_v <= 3099 THEN n_rows ELSE 0 END) AS BIGINT),
               CAST(sum(m2) AS BIGINT) FROM zs
        UNION ALL
        SELECT 'orderkey', 1500, 1599, count(*),
               CAST(sum(CASE WHEN max_v >= 1500 AND min_v <= 1599 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(sum(n_rows) AS BIGINT),
               CAST(sum(CASE WHEN max_v >= 1500 AND min_v <= 1599 THEN n_rows ELSE 0 END) AS BIGINT),
               CAST(sum(m0) AS BIGINT) FROM zr
        UNION ALL
        SELECT 'orderkey', 2000, 2199, count(*),
               CAST(sum(CASE WHEN max_v >= 2000 AND min_v <= 2199 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(sum(n_rows) AS BIGINT),
               CAST(sum(CASE WHEN max_v >= 2000 AND min_v <= 2199 THEN n_rows ELSE 0 END) AS BIGINT),
               CAST(sum(m1) AS BIGINT) FROM zr
        UNION ALL
        SELECT 'orderkey', 3000, 3099, count(*),
               CAST(sum(CASE WHEN max_v >= 3000 AND min_v <= 3099 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(sum(n_rows) AS BIGINT),
               CAST(sum(CASE WHEN max_v >= 3000 AND min_v <= 3099 THEN n_rows ELSE 0 END) AS BIGINT),
               CAST(sum(m2) AS BIGINT) FROM zr)
      SELECT * FROM u ORDER BY layout, lo""",

    // q187: the randomization test replayed draw-for-draw — identical
    // md5 coins (q132's hex-prefix trick), identical HUGEINT
    // cross-multiplied extremeness comparison.
    "q187_permutation_test" -> """
      WITH units AS MATERIALIZED (
        SELECT user_id, CAST(user_id % 2 AS INT) AS arm,
               CAST(sum(CAST(value AS DECIMAL(18,6))) * 100 AS BIGINT) AS v
        FROM events WHERE value IS NOT NULL GROUP BY 1),
      obs AS (
        SELECT count(*) AS n,
               sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_treat,
               sum(v) AS s_tot,
               coalesce(sum(CASE WHEN arm = 1 THEN v END), 0) AS s_treat
        FROM units),
      reps AS (
        SELECT r.r,
               sum(CASE WHEN CAST(('0x' || substr(md5('perm:42:'
                 || CAST(u.user_id AS VARCHAR) || ':'
                 || CAST(r.r AS VARCHAR)), 1, 12)) AS BIGINT) % 2 = 1
                 THEN 1 ELSE 0 END) AS n1_r,
               coalesce(sum(CASE WHEN CAST(('0x' || substr(md5('perm:42:'
                 || CAST(u.user_id AS VARCHAR) || ':'
                 || CAST(r.r AS VARCHAR)), 1, 12)) AS BIGINT) % 2 = 1
                 THEN u.v END), 0) AS s1_r
        FROM units u, (SELECT unnest(range(199)) AS r) r
        GROUP BY 1),
      scored AS (
        SELECT o.n, o.n_treat,
               CAST(s1_r AS HUGEINT) * (o.n - n1_r)
                 - CAST(o.s_tot - s1_r AS HUGEINT) * n1_r AS num_r,
               CAST(n1_r AS HUGEINT) * (o.n - n1_r) AS den_r,
               CAST(o.s_treat AS HUGEINT) * (o.n - o.n_treat)
                 - CAST(o.s_tot - o.s_treat AS HUGEINT) * o.n_treat AS num_obs,
               CAST(o.n_treat AS HUGEINT) * (o.n - o.n_treat) AS den_obs
        FROM reps, obs o),
      f AS (
        SELECT CAST(min(n) AS BIGINT) AS n,
               CAST(min(n_treat) AS BIGINT) AS n_treat,
               CAST(min(num_obs) AS BIGINT) AS num_obs,
               CAST(min(den_obs) AS BIGINT) AS den_obs,
               CAST(sum(CASE WHEN den_r = 0
                 OR abs(num_r) * den_obs >= abs(num_obs) * den_r
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_exceed,
               count(*) AS n_reps
        FROM scored)
      SELECT n, n_treat, num_obs, den_obs, n_exceed, n_reps,
             n_exceed + 1 AS p_num, n_reps + 1 AS p_den
      FROM f""",

    // q188: Newman assortativity ingredients over the deduplicated
    // undirected trade edges — degrees, per-edge products, and the
    // cleared rational, all exact integers.
    "q188_assortativity" -> """
      WITH e AS MATERIALIZED (
        SELECT DISTINCT least(c.c_nationkey, s.s_nationkey) AS u,
                        greatest(c.c_nationkey, s.s_nationkey) AS v
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE c.c_nationkey <> s.s_nationkey),
      deg AS (
        SELECT node, count(*) AS deg FROM (
          SELECT u AS node FROM e UNION ALL SELECT v FROM e)
        GROUP BY 1),
      x AS (
        SELECT du.deg AS du, dv.deg AS dv
        FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v),
      agg AS (
        SELECT count(*) AS m, sum(du + dv) AS sum_deg,
               sum(CAST(du AS HUGEINT) * dv) AS sp,
               sum(CAST(du AS HUGEINT) * du + CAST(dv AS HUGEINT) * dv) AS ss
        FROM x)
      SELECT CAST(m AS BIGINT) AS m, CAST(sum_deg AS BIGINT) AS sum_deg,
             CAST(sp AS BIGINT) AS sum_prod, CAST(ss AS BIGINT) AS sum_sq,
             CAST(4 * m * sp - CAST(sum_deg AS HUGEINT) * sum_deg AS BIGINT)
               AS r_num,
             CAST(2 * m * ss - CAST(sum_deg AS HUGEINT) * sum_deg AS BIGINT)
               AS r_den
      FROM agg""",

    // q189: CUPED through the identical IEEE shape — exact sufficient
    // statistics (longs + DECIMAL(38,0)->double cross sums), then
    // theta/adjusted means/rho2 with q129's double discipline.
    "q189_cuped" -> """
      WITH u AS MATERIALIZED (
        SELECT event_type, CAST(user_id % 2 AS INT) AS arm,
               CAST(coalesce(sum(CASE WHEN datediff('day', DATE '2024-01-01',
                 CAST(ts AS DATE)) >= 15
                 THEN CAST(value AS DECIMAL(18,6)) END), 0) * 100 AS BIGINT) AS y,
               CAST(coalesce(sum(CASE WHEN datediff('day', DATE '2024-01-01',
                 CAST(ts AS DATE)) < 15
                 THEN CAST(value AS DECIMAL(18,6)) END), 0) * 100 AS BIGINT) AS x
        FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
        GROUP BY event_type, user_id),
      s AS (
        SELECT event_type, count(*) AS n,
               CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(coalesce(sum(CASE WHEN arm = 0 THEN x END), 0) AS BIGINT) AS sx_a,
               CAST(coalesce(sum(CASE WHEN arm = 1 THEN x END), 0) AS BIGINT) AS sx_b,
               CAST(coalesce(sum(CASE WHEN arm = 0 THEN y END), 0) AS BIGINT) AS sy_a,
               CAST(coalesce(sum(CASE WHEN arm = 1 THEN y END), 0) AS BIGINT) AS sy_b,
               CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DOUBLE) AS sxy,
               CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxx,
               CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE) AS syy
        FROM u GROUP BY 1),
      d AS (
        SELECT *, CAST(n AS DOUBLE) AS nD,
               CAST(sx AS DOUBLE) AS sxD, CAST(sy AS DOUBLE) AS syD
        FROM s),
      e AS (
        SELECT *,
               nD * sxy - sxD * syD AS covNum,
               nD * sxx - sxD * sxD AS varXNum,
               nD * syy - syD * syD AS varYNum,
               sxD / nD AS meanX,
               CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS mean_y_a,
               CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mean_y_b,
               CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS mean_x_a,
               CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mean_x_b
        FROM d),
      f AS (
        SELECT *, covNum / varXNum AS th,
               n_a >= 1 AND n_b >= 1 AND varXNum > 0.0 AS okx
        FROM e)
      SELECT event_type, n, n_a, n_b,
             CASE WHEN okx THEN th END AS theta,
             mean_y_a, mean_y_b,
             mean_y_b - mean_y_a AS diff_raw,
             CASE WHEN okx THEN mean_y_a - th * (mean_x_a - meanX) END AS adj_a,
             CASE WHEN okx THEN mean_y_b - th * (mean_x_b - meanX) END AS adj_b,
             CASE WHEN okx THEN (mean_y_b - th * (mean_x_b - meanX))
                  - (mean_y_a - th * (mean_x_a - meanX)) END AS diff_adj,
             CASE WHEN okx AND varYNum > 0.0
                  THEN (covNum * covNum) / (varXNum * varYNum) END AS rho2
      FROM f ORDER BY event_type""",

    // q190: trimmed mean replayed by literal sort-and-slice — value-
    // rank cuts are tie-invariant, so row_number order inside a tie
    // cannot change any emitted number.
    "q190_trimmed_mean" -> """
      WITH v AS (
        SELECT l_suppkey AS g,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        FROM lineitem),
      r AS (
        SELECT g, v,
               row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
               count(*) OVER (PARTITION BY g) AS n
        FROM v),
      k AS (SELECT *, (n * 1) // 10 AS kt FROM r),
      a AS (
        SELECT g,
               CAST(min(n) AS BIGINT) AS n,
               CAST(min(kt) AS BIGINT) AS k_trim,
               CAST(min(CASE WHEN rn = kt + 1 THEN v END) AS BIGINT) AS cut_lo,
               CAST(min(CASE WHEN rn = n - kt THEN v END) AS BIGINT) AS cut_hi,
               CAST(min(n) - 2 * min(kt) AS BIGINT) AS n_kept,
               CAST(sum(CASE WHEN rn > kt AND rn <= n - kt THEN v END)
                 AS BIGINT) AS trimmed_sum
        FROM k GROUP BY g)
      SELECT CAST(g AS BIGINT) AS l_suppkey, n, k_trim, cut_lo, cut_hi,
             n_kept, trimmed_sum,
             CAST((CAST(trimmed_sum AS HUGEINT) * 1000000) // n_kept AS BIGINT)
               AS trimmed_mean_micro
      FROM a ORDER BY l_suppkey""",

    "q191_ppr" -> """
      WITH e AS (
        SELECT DISTINCT cn.n_name AS src, sn.n_name AS dst
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey),
      seeds AS (
        SELECT n.n_name AS node FROM nation n
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'),
      nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
      r0 AS (
        SELECT n.node,
               CAST(CASE WHEN s.node IS NOT NULL THEN 1000000 ELSE 0 END
                 AS BIGINT) AS r
        FROM nodes n LEFT JOIN seeds s ON n.node = s.node),
      m1 AS (SELECT e.dst, CAST(sum(r.r // d.deg) AS BIGINT) AS mass
             FROM e JOIN r0 r ON e.src = r.node
                    JOIN deg d ON e.src = d.src GROUP BY 1),
      r1 AS (
        SELECT n.node,
               CAST(CASE WHEN s.node IS NOT NULL THEN 150000 ELSE 0 END
                 + (85 * coalesce(m.mass, 0)) // 100 AS BIGINT) AS r
        FROM nodes n LEFT JOIN m1 m ON n.node = m.dst
                     LEFT JOIN seeds s ON n.node = s.node),
      m2 AS (SELECT e.dst, CAST(sum(r.r // d.deg) AS BIGINT) AS mass
             FROM e JOIN r1 r ON e.src = r.node
                    JOIN deg d ON e.src = d.src GROUP BY 1),
      r2 AS (
        SELECT n.node,
               CAST(CASE WHEN s.node IS NOT NULL THEN 150000 ELSE 0 END
                 + (85 * coalesce(m.mass, 0)) // 100 AS BIGINT) AS r
        FROM nodes n LEFT JOIN m2 m ON n.node = m.dst
                     LEFT JOIN seeds s ON n.node = s.node),
      m3 AS (SELECT e.dst, CAST(sum(r.r // d.deg) AS BIGINT) AS mass
             FROM e JOIN r2 r ON e.src = r.node
                    JOIN deg d ON e.src = d.src GROUP BY 1),
      r3 AS (
        SELECT n.node,
               CAST(CASE WHEN s.node IS NOT NULL THEN 150000 ELSE 0 END
                 + (85 * coalesce(m.mass, 0)) // 100 AS BIGINT) AS r
        FROM nodes n LEFT JOIN m3 m ON n.node = m.dst
                     LEFT JOIN seeds s ON n.node = s.node)
      SELECT node, r AS rank_micro FROM r3 ORDER BY node""",

    "q192_mann_whitney" -> """
      WITH base AS (
        SELECT event_type, CAST(user_id % 2 AS INT) AS arm,
               CAST(CAST(value AS DECIMAL(18,6)) * 100 AS BIGINT) AS v
        FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
      pv AS (
        SELECT event_type, v, count(*) AS c,
               sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS c1
        FROM base GROUP BY 1, 2),
      rk AS (
        SELECT event_type, c, c1,
               coalesce(sum(c) OVER (PARTITION BY event_type ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS below
        FROM pv),
      ag AS (
        SELECT event_type,
               CAST(sum(c - c1) AS BIGINT) AS n_a,
               CAST(sum(c1) AS BIGINT) AS n_b,
               CAST(sum(CAST(c1 AS HUGEINT) * (2 * below + c + 1))
                 AS BIGINT) AS r_b_x2,
               CAST(sum(CAST(c AS HUGEINT) * c * c - c) AS BIGINT) AS tie_term
        FROM rk GROUP BY 1)
      SELECT event_type, n_a, n_b, r_b_x2,
             CAST(r_b_x2 - n_b * (n_b + 1) AS BIGINT) AS u_b_x2,
             CAST(2 * n_a * n_b - (r_b_x2 - n_b * (n_b + 1)) AS BIGINT)
               AS u_a_x2,
             tie_term,
             CAST(CASE WHEN n_a > 0 AND n_b > 0 THEN
               (CAST(r_b_x2 - n_b * (n_b + 1) AS HUGEINT) * 1000000)
                 // (2 * CAST(n_a AS HUGEINT) * n_b) END AS BIGINT)
               AS auc_micro
      FROM ag ORDER BY event_type""",

    "q193_inclusion_deps" -> """
      WITH legs AS (
        SELECT 'lineitem.l_orderkey<orders.o_orderkey' AS pair,
               CAST(l_orderkey AS VARCHAR) AS k, 1 AS sl, 0 AS sr
        FROM lineitem WHERE l_orderkey IS NOT NULL
        UNION ALL
        SELECT 'lineitem.l_orderkey<orders.o_orderkey',
               CAST(o_orderkey AS VARCHAR), 0, 1
        FROM orders WHERE o_orderkey IS NOT NULL
        UNION ALL
        SELECT 'orders.o_custkey<customer.c_custkey',
               CAST(o_custkey AS VARCHAR), 1, 0
        FROM orders WHERE o_custkey IS NOT NULL
        UNION ALL
        SELECT 'orders.o_custkey<customer.c_custkey',
               CAST(c_custkey AS VARCHAR), 0, 1
        FROM customer WHERE c_custkey IS NOT NULL
        UNION ALL
        SELECT 'lineitem.l_suppkey<supplier.s_suppkey',
               CAST(l_suppkey AS VARCHAR), 1, 0
        FROM lineitem WHERE l_suppkey IS NOT NULL
        UNION ALL
        SELECT 'lineitem.l_suppkey<supplier.s_suppkey',
               CAST(s_suppkey AS VARCHAR), 0, 1
        FROM supplier WHERE s_suppkey IS NOT NULL
        UNION ALL
        SELECT 'supplier.s_nationkey<nation.n_nationkey',
               CAST(s_nationkey AS VARCHAR), 1, 0
        FROM supplier WHERE s_nationkey IS NOT NULL
        UNION ALL
        SELECT 'supplier.s_nationkey<nation.n_nationkey',
               CAST(n_nationkey AS VARCHAR), 0, 1
        FROM nation WHERE n_nationkey IS NOT NULL
        UNION ALL
        SELECT 'nation.n_nationkey<supplier.s_nationkey',
               CAST(n_nationkey AS VARCHAR), 1, 0
        FROM nation WHERE n_nationkey IS NOT NULL
        UNION ALL
        SELECT 'nation.n_nationkey<supplier.s_nationkey',
               CAST(s_nationkey AS VARCHAR), 0, 1
        FROM supplier WHERE s_nationkey IS NOT NULL
        UNION ALL
        SELECT 'events.user_id<customer.c_custkey',
               CAST(user_id AS VARCHAR), 1, 0
        FROM events WHERE user_id IS NOT NULL
        UNION ALL
        SELECT 'events.user_id<customer.c_custkey',
               CAST(c_custkey AS VARCHAR), 0, 1
        FROM customer WHERE c_custkey IS NOT NULL),
      pk AS (
        SELECT pair, k, max(sl) AS in_l, max(sr) AS in_r
        FROM legs GROUP BY 1, 2)
      SELECT pair,
             CAST(sum(in_l) AS BIGINT) AS n_lhs,
             CAST(sum(in_r) AS BIGINT) AS n_rhs,
             CAST(sum(CASE WHEN in_l = 1 AND in_r = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_missing,
             sum(CASE WHEN in_l = 1 AND in_r = 0 THEN 1 ELSE 0 END) = 0
               AS contained,
             CAST((sum(in_l) - sum(CASE WHEN in_l = 1 AND in_r = 0
                 THEN 1 ELSE 0 END)) * 1000000 // sum(in_l) AS BIGINT)
               AS containment_micro
      FROM pk GROUP BY pair ORDER BY pair""",

    "q194_textrank" -> """
      WITH tok AS (
        SELECT regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
      grams AS (
        SELECT unnest([array_to_string(t[i:i+1], ' ')
                       for i in range(1, len(t))]) AS g
        FROM tok WHERE len(t) >= 2),
      pc AS (
        SELECT split_part(g, ' ', 1) AS w1, split_part(g, ' ', 2) AS w2,
               count(*) AS n_pair
        FROM grams WHERE split_part(g, ' ', 1) <> split_part(g, ' ', 2)
        GROUP BY 1, 2 HAVING count(*) >= 5),
      e AS (
        SELECT DISTINCT src, dst FROM (
          SELECT w1 AS src, w2 AS dst FROM pc
          UNION ALL SELECT w2, w1 FROM pc)),
      nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
      r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
      m1 AS (SELECT e.dst, CAST(sum(r.r // d.deg) AS BIGINT) AS mass
             FROM e JOIN r0 r ON e.src = r.node
                    JOIN deg d ON e.src = d.src GROUP BY 1),
      r1 AS (SELECT n.node,
               CAST(150000 + (85 * coalesce(m.mass, 0)) // 100 AS BIGINT) AS r
             FROM nodes n LEFT JOIN m1 m ON n.node = m.dst),
      m2 AS (SELECT e.dst, CAST(sum(r.r // d.deg) AS BIGINT) AS mass
             FROM e JOIN r1 r ON e.src = r.node
                    JOIN deg d ON e.src = d.src GROUP BY 1),
      r2 AS (SELECT n.node,
               CAST(150000 + (85 * coalesce(m.mass, 0)) // 100 AS BIGINT) AS r
             FROM nodes n LEFT JOIN m2 m ON n.node = m.dst),
      m3 AS (SELECT e.dst, CAST(sum(r.r // d.deg) AS BIGINT) AS mass
             FROM e JOIN r2 r ON e.src = r.node
                    JOIN deg d ON e.src = d.src GROUP BY 1),
      r3 AS (SELECT n.node,
               CAST(150000 + (85 * coalesce(m.mass, 0)) // 100 AS BIGINT) AS r
             FROM nodes n LEFT JOIN m3 m ON n.node = m.dst)
      SELECT node AS word, r AS rank_micro FROM r3
      ORDER BY rank_micro DESC, word LIMIT 30""",

    "q195_harmonic" -> """
      WITH RECURSIVE e AS (
        SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey),
      seeds AS (
        SELECT n.n_nationkey AS lm FROM nation n
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'),
      bfs AS (
        SELECT lm, lm AS node, 0 AS dist FROM seeds
        UNION
        SELECT b.lm, e.dst AS node, b.dist + 1
        FROM bfs b JOIN e ON b.node = e.src WHERE b.dist < 10),
      d AS (SELECT lm, node, min(dist) AS dist FROM bfs GROUP BY 1, 2)
      SELECT CAST(d.node AS BIGINT) AS node, n.n_name,
             CAST(count(*) AS BIGINT) AS n_reached,
             CAST(sum(1000000 // dist) AS BIGINT) AS harmonic_micro
      FROM d JOIN nation n ON d.node = n.n_nationkey
      WHERE dist >= 1 GROUP BY 1, 2 ORDER BY 1""",

    "q196_conformal" -> """
      WITH u AS MATERIALIZED (
        SELECT event_type, CAST(user_id % 2 AS INT) AS split,
               CAST(coalesce(sum(CASE WHEN datediff('day', DATE '2024-01-01',
                 CAST(ts AS DATE)) >= 15
                 THEN CAST(value AS DECIMAL(18,6)) END), 0) * 100 AS BIGINT) AS y,
               CAST(coalesce(sum(CASE WHEN datediff('day', DATE '2024-01-01',
                 CAST(ts AS DATE)) < 15
                 THEN CAST(value AS DECIMAL(18,6)) END), 0) * 100 AS BIGINT) AS x
        FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
        GROUP BY event_type, user_id),
      f AS (
        SELECT event_type, count(*) AS n_train,
               CAST(count(*) AS DOUBLE) AS nD,
               CAST(sum(x) AS DOUBLE) AS sxD, CAST(sum(y) AS DOUBLE) AS syD,
               CAST(sum(x * x) AS DOUBLE) AS sxxD,
               CAST(sum(x * y) AS DOUBLE) AS sxyD
        FROM u WHERE split = 0 GROUP BY 1),
      c AS (
        SELECT event_type, n_train, nD, sxD, syD,
               (nD * sxyD - sxD * syD) / (nD * sxxD - sxD * sxD) AS slope
        FROM f WHERE (nD * sxxD - sxD * sxD) <> 0),
      c2 AS (
        SELECT event_type, n_train, slope,
               (syD - slope * sxD) / nD AS intercept
        FROM c),
      r AS (
        SELECT u.event_type,
               CAST(floor(abs(CAST(u.y AS DOUBLE)
                 - (c2.intercept + c2.slope * CAST(u.x AS DOUBLE))) * 10000)
                 AS BIGINT) AS resid_q
        FROM u JOIN c2 ON u.event_type = c2.event_type WHERE u.split = 1),
      g AS (
        -- UNCLAMPED conformal rank: when it exceeds n_cal the LEFT JOIN
        -- below finds no order statistic and half_width_q is honestly
        -- NULL (the coverage guarantee is unattainable below
        -- n_cal = ceil(1/alpha) - 1)
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_cal,
               ((count(*) + 1) * 9 + 9) // 10 AS k_rank
        FROM r GROUP BY 1),
      rk AS (
        SELECT event_type, resid_q,
               row_number() OVER (PARTITION BY event_type
                 ORDER BY resid_q) AS rn
        FROM r)
      SELECT g.event_type, c2.n_train, g.n_cal, c2.slope, c2.intercept,
             CAST(g.k_rank AS BIGINT) AS k_rank,
             rk.resid_q AS half_width_q
      FROM g
      JOIN c2 ON g.event_type = c2.event_type
      LEFT JOIN rk ON rk.event_type = g.event_type AND rk.rn = g.k_rank
      ORDER BY g.event_type""",

    "q197_modularity" -> """
      WITH e0 AS (
        SELECT DISTINCT least(c.c_nationkey, s.s_nationkey) AS u,
                        greatest(c.c_nationkey, s.s_nationkey) AS v
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE c.c_nationkey <> s.s_nationkey),
      asg AS (SELECT n_nationkey AS node, n_regionkey AS community
              FROM nation),
      nodes AS (SELECT u AS node FROM e0 UNION SELECT v FROM e0),
      na AS (
        SELECT n.node, coalesce(a.community, n.node) AS community
        FROM nodes n LEFT JOIN asg a ON n.node = a.node),
      deg AS (
        SELECT node, count(*) AS deg FROM (
          SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0)
        GROUP BY 1),
      mm AS (SELECT count(*) AS m FROM e0),
      ein AS (
        SELECT nu.community, count(*) AS e_in
        FROM e0 JOIN na nu ON e0.u = nu.node
                JOIN na nv ON e0.v = nv.node
        WHERE nu.community = nv.community GROUP BY 1),
      dt AS (
        SELECT na.community, count(*) AS n_nodes, sum(deg.deg) AS d_tot
        FROM na JOIN deg ON na.node = deg.node GROUP BY 1)
      SELECT CAST(dt.community AS BIGINT) AS community,
             CAST(n_nodes AS BIGINT) AS n_nodes,
             CAST(coalesce(e_in, 0) AS BIGINT) AS e_in,
             CAST(d_tot AS BIGINT) AS d_tot,
             CAST(mm.m AS BIGINT) AS m,
             CAST(4 * mm.m * coalesce(e_in, 0) - d_tot * d_tot AS BIGINT)
               AS contrib_num
      FROM dt LEFT JOIN ein ON dt.community = ein.community
      CROSS JOIN mm ORDER BY 1""",

    "q198_cmh" -> """
      WITH u AS (
        SELECT (datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
                 % 7) AS stratum,
               CAST(user_id % 2 AS INT) AS arm,
               CASE WHEN CAST(CAST(value AS DECIMAL(18,6)) * 100 AS BIGINT)
                 >= 10000 THEN 1 ELSE 0 END AS converted
        FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
      per AS (
        SELECT stratum, count(*) AS n,
               sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1,
               sum(CASE WHEN converted = 1 THEN 1 ELSE 0 END) AS m1,
               sum(CASE WHEN arm = 1 AND converted = 1 THEN 1 ELSE 0 END)
                 AS a
        FROM u GROUP BY 1),
      q AS (
        SELECT stratum, n, a,
               CAST((CAST(n1 AS HUGEINT) * m1 * 1000000) // n AS BIGINT)
                 AS exp_micro,
               CASE WHEN n >= 2 THEN
                 CAST((CAST(n1 AS HUGEINT) * (n - n1) * m1 * (n - m1)
                   * 1000000) // (CAST(n AS HUGEINT) * n * (n - 1))
                   AS BIGINT)
               ELSE 0 END AS var_micro
        FROM per),
      f AS (
        SELECT CAST(count(*) AS BIGINT) AS k_strata,
               CAST(sum(a) AS BIGINT) AS sum_a,
               CAST(sum(exp_micro) AS BIGINT) AS sum_exp_micro,
               CAST(sum(var_micro) AS BIGINT) AS sum_var_micro
        FROM q)
      SELECT k_strata, sum_a, sum_exp_micro, sum_var_micro,
             CAST(sum_a * 1000000 - sum_exp_micro AS BIGINT) AS num_micro,
             CASE WHEN sum_var_micro > 0 THEN
               (CAST(sum_a * 1000000 - sum_exp_micro AS DOUBLE)
                 * CAST(sum_a * 1000000 - sum_exp_micro AS DOUBLE))
                 / (1000000.0 * CAST(sum_var_micro AS DOUBLE))
             END AS chi2
      FROM f""",

    "q199_kaplan_meier" -> """
      WITH RECURSIVE subj AS (
        SELECT event_type,
               CAST(max(dd) - min(dd) AS BIGINT) AS dur,
               CASE WHEN max(dd) < 25 THEN 1 ELSE 0 END AS ev
        FROM (SELECT event_type, user_id,
                datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS dd
              FROM events WHERE event_type IS NOT NULL)
        GROUP BY event_type, user_id),
      per AS (
        SELECT event_type, dur AS t,
               CAST(sum(CASE WHEN ev = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d,
               CAST(sum(CASE WHEN ev = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c
        FROM subj GROUP BY 1, 2),
      ord AS (
        SELECT event_type, t, d, c,
               row_number() OVER (PARTITION BY event_type ORDER BY t) AS rn,
               CAST(sum(d + c) OVER (PARTITION BY event_type) AS BIGINT)
                 AS n_total
        FROM per),
      km AS (
        SELECT event_type, rn, t, d, c,
               n_total AS n_risk,
               (CAST(1000000 AS BIGINT) * (n_total - d)) // n_total
                 AS s_micro
        FROM ord WHERE rn = 1
        UNION ALL
        SELECT o.event_type, o.rn, o.t, o.d, o.c,
               k.n_risk - k.d - k.c AS n_risk,
               (k.s_micro * (k.n_risk - k.d - k.c - o.d))
                 // (k.n_risk - k.d - k.c) AS s_micro
        FROM km k JOIN ord o
          ON o.event_type = k.event_type AND o.rn = k.rn + 1)
      SELECT event_type, t, n_risk, d AS d_events, c AS c_censored, s_micro
      FROM km ORDER BY event_type, t""",

    "q200_gains" -> """
      WITH base AS (
        SELECT n_chars AS v,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents WHERE n_chars IS NOT NULL),
      counts AS (SELECT v, count(*) AS c FROM base GROUP BY v),
      cum AS (
        SELECT v, sum(c) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               sum(c) OVER () AS n
        FROM counts),
      th AS (
        SELECT k, min(v) AS threshold
        FROM cum, range(1, 10) AS r(k)
        WHERE cum * 10 >= k * n
        GROUP BY k),
      assigned AS (
        SELECT b.v, b.y,
               1 + (SELECT count(*) FROM th WHERE b.v > th.threshold)
                 AS bucket
        FROM base b),
      pb AS (
        SELECT bucket, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS n_pos
        FROM assigned GROUP BY 1),
      g AS (
        SELECT bucket, n, n_pos,
               CAST(sum(n) OVER (ORDER BY bucket DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum_n,
               CAST(sum(n_pos) OVER (ORDER BY bucket DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum_pos,
               CAST(sum(n) OVER () AS BIGINT) AS nt,
               CAST(sum(n_pos) OVER () AS BIGINT) AS pt
        FROM pb)
      SELECT CAST(bucket AS INT) AS bucket, n, n_pos, cum_n, cum_pos,
             CAST(cum_pos * 1000000 // pt AS BIGINT) AS gain_micro,
             CAST((CAST(cum_pos AS HUGEINT) * nt * 1000000)
               // (CAST(pt AS HUGEINT) * cum_n) AS BIGINT) AS lift_micro
      FROM g ORDER BY bucket DESC""",

    "q201_fdr" -> """
      WITH units AS MATERIALIZED (
        SELECT event_type, user_id, CAST(user_id % 2 AS INT) AS arm,
               CAST(sum(CAST(value AS DECIMAL(18,6))) * 100 AS BIGINT) AS v
        FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
        GROUP BY 1, 2),
      obs AS (
        SELECT event_type, count(*) AS n,
               sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_treat,
               sum(v) AS s_tot,
               coalesce(sum(CASE WHEN arm = 1 THEN v END), 0) AS s_treat
        FROM units GROUP BY 1),
      reps AS (
        SELECT u.event_type, r.r,
               sum(CASE WHEN CAST(('0x' || substr(md5('perm:42:'
                 || u.event_type || ':'
                 || CAST(u.user_id AS VARCHAR) || ':'
                 || CAST(r.r AS VARCHAR)), 1, 12)) AS BIGINT) % 2 = 1
                 THEN 1 ELSE 0 END) AS n1_r,
               coalesce(sum(CASE WHEN CAST(('0x' || substr(md5('perm:42:'
                 || u.event_type || ':'
                 || CAST(u.user_id AS VARCHAR) || ':'
                 || CAST(r.r AS VARCHAR)), 1, 12)) AS BIGINT) % 2 = 1
                 THEN u.v END), 0) AS s1_r
        FROM units u, (SELECT unnest(range(199)) AS r) r
        GROUP BY 1, 2),
      scored AS (
        SELECT p.event_type,
               CAST(s1_r AS HUGEINT) * (o.n - n1_r)
                 - CAST(o.s_tot - s1_r AS HUGEINT) * n1_r AS num_r,
               CAST(n1_r AS HUGEINT) * (o.n - n1_r) AS den_r,
               CAST(o.s_treat AS HUGEINT) * (o.n - o.n_treat)
                 - CAST(o.s_tot - o.s_treat AS HUGEINT) * o.n_treat
                 AS num_obs,
               CAST(o.n_treat AS HUGEINT) * (o.n - o.n_treat) AS den_obs
        FROM reps p JOIN obs o ON p.event_type = o.event_type),
      pvals AS (
        SELECT event_type,
               CAST(sum(CASE WHEN den_r = 0
                 OR abs(num_r) * den_obs >= abs(num_obs) * den_r
                 THEN 1 ELSE 0 END) + 1 AS BIGINT) AS p_num,
               CAST(count(*) + 1 AS BIGINT) AS p_den
        FROM scored GROUP BY 1),
      bh AS (
        SELECT event_type, p_num, p_den,
               CAST(row_number() OVER (ORDER BY p_num, event_type)
                 AS BIGINT) AS rank,
               CAST(count(*) OVER () AS BIGINT) AS m
        FROM pvals),
      flg AS (
        SELECT *, p_num * m * 5 <= rank * 1 * p_den AS ok FROM bh),
      rej AS (
        SELECT *, max(CASE WHEN ok THEN 1 ELSE 0 END)
                 OVER (ORDER BY rank
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) = 1
                 AS rejected
        FROM flg)
      SELECT event_type AS key, p_num, p_den, rank, m, rejected
      FROM rej ORDER BY rank""",

    // q203: q201's randomization + BH replay with a KNOWN planted
    // lift (+50,000 centi-units on the treated arm of even-length
    // event types) injected before testing — certifies the rejected
    // column carries both decisions under ground truth.
    "q203_fdr_planted" -> """
      WITH units AS MATERIALIZED (
        SELECT event_type, user_id, CAST(user_id % 2 AS INT) AS arm,
               CAST(sum(CAST(value AS DECIMAL(18,6))) * 100 AS BIGINT)
                 + CASE WHEN user_id % 2 = 1 AND length(event_type) % 2 = 0
                        THEN 5000000 ELSE 0 END AS v
        FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
        GROUP BY 1, 2),
      obs AS (
        SELECT event_type, count(*) AS n,
               sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_treat,
               sum(v) AS s_tot,
               coalesce(sum(CASE WHEN arm = 1 THEN v END), 0) AS s_treat
        FROM units GROUP BY 1),
      reps AS (
        SELECT u.event_type, r.r,
               sum(CASE WHEN CAST(('0x' || substr(md5('perm:42:'
                 || u.event_type || ':'
                 || CAST(u.user_id AS VARCHAR) || ':'
                 || CAST(r.r AS VARCHAR)), 1, 12)) AS BIGINT) % 2 = 1
                 THEN 1 ELSE 0 END) AS n1_r,
               coalesce(sum(CASE WHEN CAST(('0x' || substr(md5('perm:42:'
                 || u.event_type || ':'
                 || CAST(u.user_id AS VARCHAR) || ':'
                 || CAST(r.r AS VARCHAR)), 1, 12)) AS BIGINT) % 2 = 1
                 THEN u.v END), 0) AS s1_r
        FROM units u, (SELECT unnest(range(199)) AS r) r
        GROUP BY 1, 2),
      scored AS (
        SELECT p.event_type,
               CAST(s1_r AS HUGEINT) * (o.n - n1_r)
                 - CAST(o.s_tot - s1_r AS HUGEINT) * n1_r AS num_r,
               CAST(n1_r AS HUGEINT) * (o.n - n1_r) AS den_r,
               CAST(o.s_treat AS HUGEINT) * (o.n - o.n_treat)
                 - CAST(o.s_tot - o.s_treat AS HUGEINT) * o.n_treat
                 AS num_obs,
               CAST(o.n_treat AS HUGEINT) * (o.n - o.n_treat) AS den_obs
        FROM reps p JOIN obs o ON p.event_type = o.event_type),
      pvals AS (
        SELECT event_type,
               CAST(sum(CASE WHEN den_r = 0
                 OR abs(num_r) * den_obs >= abs(num_obs) * den_r
                 THEN 1 ELSE 0 END) + 1 AS BIGINT) AS p_num,
               CAST(count(*) + 1 AS BIGINT) AS p_den
        FROM scored GROUP BY 1),
      bh AS (
        SELECT event_type, p_num, p_den,
               CAST(row_number() OVER (ORDER BY p_num, event_type)
                 AS BIGINT) AS rank,
               CAST(count(*) OVER () AS BIGINT) AS m
        FROM pvals),
      flg AS (
        SELECT *, p_num * m * 5 <= rank * 1 * p_den AS ok FROM bh),
      rej AS (
        SELECT *, max(CASE WHEN ok THEN 1 ELSE 0 END)
                 OVER (ORDER BY rank
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) = 1
                 AS rejected
        FROM flg)
      SELECT event_type AS key, p_num, p_den, rank, m, rejected
      FROM rej ORDER BY rank""",

    "q202_absorption" -> """
      WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS t, event_type FROM events),
      p AS (
        SELECT user_id, event_type AS next_type,
               lag(event_type) OVER (PARTITION BY user_id
                 ORDER BY t, event_id) AS prev_type
        FROM e),
      c AS (
        SELECT prev_type, next_type, count(*) AS n_trans
        FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2),
      tot AS (SELECT prev_type, sum(n_trans) AS n_out FROM c GROUP BY 1),
      states AS (
        SELECT prev_type AS state FROM c UNION SELECT next_type FROM c),
      r0 AS (
        SELECT state, CAST(CASE WHEN state = 'purchase' THEN 1000000
          ELSE 0 END AS BIGINT) AS p
        FROM states),
      m1 AS (
        SELECT c.prev_type AS state,
               CAST(sum(CAST(c.n_trans AS HUGEINT) * q.p) // min(t.n_out)
                 AS BIGINT) AS reach
        FROM c JOIN r0 q ON c.next_type = q.state
               JOIN tot t ON c.prev_type = t.prev_type
        GROUP BY 1),
      r1 AS (
        SELECT s.state, CAST(CASE WHEN s.state = 'purchase' THEN 1000000
          ELSE coalesce(m.reach, 0) END AS BIGINT) AS p
        FROM states s LEFT JOIN m1 m ON s.state = m.state),
      m2 AS (
        SELECT c.prev_type AS state,
               CAST(sum(CAST(c.n_trans AS HUGEINT) * q.p) // min(t.n_out)
                 AS BIGINT) AS reach
        FROM c JOIN r1 q ON c.next_type = q.state
               JOIN tot t ON c.prev_type = t.prev_type
        GROUP BY 1),
      r2 AS (
        SELECT s.state, CAST(CASE WHEN s.state = 'purchase' THEN 1000000
          ELSE coalesce(m.reach, 0) END AS BIGINT) AS p
        FROM states s LEFT JOIN m2 m ON s.state = m.state),
      m3 AS (
        SELECT c.prev_type AS state,
               CAST(sum(CAST(c.n_trans AS HUGEINT) * q.p) // min(t.n_out)
                 AS BIGINT) AS reach
        FROM c JOIN r2 q ON c.next_type = q.state
               JOIN tot t ON c.prev_type = t.prev_type
        GROUP BY 1),
      r3 AS (
        SELECT s.state, CAST(CASE WHEN s.state = 'purchase' THEN 1000000
          ELSE coalesce(m.reach, 0) END AS BIGINT) AS p
        FROM states s LEFT JOIN m3 m ON s.state = m.state)
      SELECT state, p AS p_micro FROM r3 ORDER BY state""",
  )
}
