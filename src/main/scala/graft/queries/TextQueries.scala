package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.operators.{Multimodal, TextAnalysis}

/** Text-analysis + multimodal verify queries over the `documents`
  * table — the training-data-pipeline operator surface (token
  * counting, quality scoring, profile/language classification,
  * fingerprinting, binary-column decode plumbing). */
object TextQueries {

  /** Token counting per source: whitespace tokenization, exact int
    * aggregates. */
  val qTextTokens: Q = Q(
    "q_text_tokens",
    (spark, dir) => Tables.documents(spark, dir)
      .select(col("source"), TextAnalysis.tokenCount(col("text")).as("n_toks"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("total_tokens"),
        round(sum(col("n_toks")).cast("double") / count(lit(1)), 6).as("avg_tokens"))
      .orderBy(col("source")),
    Some("""
      SELECT source, count(*) AS n_docs,
             CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT) AS total_tokens,
             round(CAST(sum(len(string_split_regex(text, '\s+'))) AS DOUBLE)
                   / count(*), 6) AS avg_tokens
      FROM documents GROUP BY source ORDER BY source
    """.trim))

  /** Per-document quality scoring: length saturation, stopword mass,
    * lexical diversity — fixed-order double arithmetic, rounded. */
  val qTextQuality: Q = Q(
    "q_text_quality",
    (spark, dir) => Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.stopwordCount(col("text")).as("n_stopwords"),
        TextAnalysis.distinctTokenCount(col("text")).as("n_unique"),
        round(TextAnalysis.avgTokenLen(col("text")), 6).as("avg_token_len"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id, n_tokens, n_stopwords, n_unique,
             round(CAST(tok_chars AS DOUBLE) / n_tokens, 6) AS avg_token_len,
             round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.3 +
                   (1.0 - CAST(n_stopwords AS DOUBLE) / n_tokens) * 0.3 +
                   (CAST(n_unique AS DOUBLE) / n_tokens) * 0.4, 6) AS quality
      FROM (
        SELECT doc_id,
               CAST(len(toks) AS INTEGER) AS n_tokens,
               CAST(len(list_filter(toks, x -> x IN ('the', 'a'))) AS INTEGER) AS n_stopwords,
               CAST(len(list_distinct(toks)) AS INTEGER) AS n_unique,
               list_sum(list_transform(toks, x -> length(x))) AS tok_chars
        FROM (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents))
      ORDER BY doc_id
    """.trim))

  /** Profile classification (the language-ID operator shape): argmax
    * over token-profile scores with tie-break toward the earlier
    * profile. */
  val qTextLangid: Q = Q(
    "q_text_langid",
    (spark, dir) => Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextAnalysis.profileScore(col("text"), TextAnalysis.profiles(0)._2).as("s_olap"),
        TextAnalysis.profileScore(col("text"), TextAnalysis.profiles(1)._2).as("s_stream"),
        TextAnalysis.profileScore(col("text"), TextAnalysis.profiles(2)._2).as("s_storage"),
        TextAnalysis.predictedProfile(col("text")).as("predicted"))
      .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id, s_olap, s_stream, s_storage,
             CASE WHEN s_storage > greatest(s_olap, s_stream) THEN 'storage'
                  WHEN s_stream > s_olap THEN 'stream'
                  ELSE 'olap' END AS predicted
      FROM (
        SELECT doc_id,
               CAST(len(list_filter(toks, x -> x IN ('join','query','table','scan','agg'))) AS INTEGER) AS s_olap,
               CAST(len(list_filter(toks, x -> x IN ('stream','batch','window','merge'))) AS INTEGER) AS s_stream,
               CAST(len(list_filter(toks, x -> x IN ('row','column','data','key'))) AS INTEGER) AS s_storage
        FROM (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents))
      ORDER BY doc_id
    """.trim))

  /** Canonical-form fingerprint per document (rolling-hash analog for
    * formatting-insensitive dedup keys). */
  val qTextFingerprint: Q = Q(
    "q_text_fingerprint",
    (spark, dir) => Tables.documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id,
             md5(trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
               '\s+', ' ', 'g'))) AS fp
      FROM documents ORDER BY doc_id
    """.trim))

  /** Shared reader for the materialized media table — every
    * multimodal query consumes STORED parquet binary blobs
    * ([[graft.operators.MediaArtifact]]) rather than bytes it just
    * synthesized, so the family exercises real binary-column IO with
    * partition pruning on the format directory. */
  private def media(spark: org.apache.spark.sql.SparkSession, dir: String,
      format: String) =
    graft.operators.MediaArtifact.records(spark, dir, format)

  /** Multimodal decode plumbing: opaque binary column -> typed metadata
    * via partition-batched decode (stubbed codec, real Spark mechanics:
    * mapPartitions over a typed Dataset reading a stored parquet blob
    * column). The oracle reproduces the deterministic stub
    * arithmetic. */
  val qMultimodalDecode: Q = Q(
    "q_multimodal_decode",
    (spark, dir) => Multimodal
      .decodeBatch(media(spark, dir, "plain"))
      .toDF()
      .select(col("id").as("doc_id"), col("nBytes").as("n_bytes"),
        col("contentHash").as("content_hash"), col("width"), col("height"))
      .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id, octet_length(encode(text)) AS n_bytes, md5(text) AS content_hash,
             CAST(64 + octet_length(encode(text)) % 512 AS INT) AS width,
             CAST(64 + octet_length(encode(text)) % 384 AS INT) AS height
      FROM documents ORDER BY doc_id
    """.trim))

  /** Content sniffing over REAL format headers — the ingest-QA step
    * that catches mislabeled uploads before any codec runs: media
    * containers carry genuine PNG IHDR / GIF89a / JPEG-JFIF byte
    * structure ([[Multimodal.wrapWithHeader]], with a deliberate
    * declared-mime lie on every 7th id), and
    * [[Multimodal.sniff]] re-derives format and dimensions from magic
    * bytes and format-specific offsets (big-endian IHDR ints,
    * little-endian GIF shorts). The oracle computes the ground truth
    * arithmetically — if the byte parser misread an offset or an
    * endianness, the dimension checksums diverge, so the parity check
    * is a real test of the parsing path. Partition-batched
    * `mapPartitions`, metadata-sized output, nothing shuffles but the
    * tiny per-(declared, sniffed) rollup. */
  val qMultimodalSniff: Q = Q(
    "q_multimodal_sniff",
    (spark, dir) => Multimodal
      .sniffBatch(media(spark, dir, "container"))
      .toDF()
      .groupBy(col("declared"), col("sniffed"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("declared") =!= col("sniffed"), 1L).otherwise(0L))
          .as("n_mislabeled"),
        sum(col("width").cast("long")).as("sum_width"),
        sum(col("height").cast("long")).as("sum_height"))
      .orderBy(col("declared"), col("sniffed")),
    Some("""
      WITH m AS (
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'image/png'
                 WHEN 1 THEN 'image/gif' ELSE 'image/jpeg' END AS sniffed,
               CASE WHEN doc_id % 7 = 0 THEN 'image/png'
                 ELSE CASE doc_id % 3 WHEN 0 THEN 'image/png'
                   WHEN 1 THEN 'image/gif' ELSE 'image/jpeg' END
               END AS declared,
               CASE WHEN doc_id % 3 = 2 THEN -1
                 ELSE 64 + octet_length(encode(text)) % 512 END AS w,
               CASE WHEN doc_id % 3 = 2 THEN -1
                 ELSE 64 + octet_length(encode(text)) % 384 END AS h
        FROM documents)
      SELECT declared, sniffed, count(*) AS n_docs,
             CAST(sum(CASE WHEN declared <> sniffed THEN 1 ELSE 0 END)
               AS BIGINT) AS n_mislabeled,
             CAST(sum(w) AS BIGINT) AS sum_width,
             CAST(sum(h) AS BIGINT) AS sum_height
      FROM m GROUP BY 1, 2 ORDER BY 1, 2
    """.trim))

  /** BPE-style pre-tokenization over a punctuation-bearing rendered
    * line (event_type + JSON props + fixed-point value) — the token
    * accounting an LLM-training pipeline runs before feeding a real BPE
    * vocabulary. Counts and per-class character mass per event type;
    * the double-cast value is rendered as exact cents so the string is
    * identical across engines. */
  val qTextBpeTokens: Q = Q(
    "q_text_bpe_tokens",
    (spark, dir) => {
      import TextAnalysis._
      val line = concat(col("event_type"), lit(" "), col("props"), lit(" v="),
        floor(col("value") * 100 + 0.5).cast("long").cast("string"))
      Tables.events(spark, dir)
        .select(col("event_type"), line.as("line"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(bpeTokenCount(col("line"))).as("n_tok"),
          sum(bpeTokenCount(col("line"), BpeAlpha)).as("n_alpha"),
          sum(bpeTokenCount(col("line"), BpeNum)).as("n_num"),
          sum(bpeTokenCount(col("line"), BpeOther)).as("n_other"),
          sum(bpeCharMass(col("line"), BpeAlpha)).as("alpha_chars"),
          sum(bpeCharMass(col("line"), BpeNum)).as("num_chars"),
          sum(bpeCharMass(col("line"), BpeOther)).as("other_chars"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH l AS (
        SELECT event_type,
               event_type || ' ' || props || ' v=' ||
               CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS VARCHAR) AS line
        FROM events)
      SELECT event_type, count(*) AS n_events,
             CAST(sum(len(regexp_extract_all(line, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+'))) AS BIGINT) AS n_tok,
             CAST(sum(len(regexp_extract_all(line, ' ?[a-zA-Z]+'))) AS BIGINT) AS n_alpha,
             CAST(sum(len(regexp_extract_all(line, ' ?[0-9]+'))) AS BIGINT) AS n_num,
             CAST(sum(len(regexp_extract_all(line, ' ?[^a-zA-Z0-9\s]+'))) AS BIGINT) AS n_other,
             CAST(sum(list_sum(list_transform(regexp_extract_all(line, ' ?[a-zA-Z]+'), m -> length(m)))) AS BIGINT) AS alpha_chars,
             CAST(sum(list_sum(list_transform(regexp_extract_all(line, ' ?[0-9]+'), m -> length(m)))) AS BIGINT) AS num_chars,
             CAST(sum(list_sum(list_transform(regexp_extract_all(line, ' ?[^a-zA-Z0-9\s]+'), m -> length(m)))) AS BIGINT) AS other_chars
      FROM l GROUP BY event_type ORDER BY event_type
    """.trim))

  /** PII-style scrubbing: redact numeric runs to a placeholder before a
    * corpus ships to training, and account for what was removed — the
    * redacted-line cardinality per type proves the rewrite actually
    * canonicalized the payloads. */
  val qTextRedact: Q = Q(
    "q_text_redact",
    (spark, dir) => {
      val line = concat(col("event_type"), lit(" "), col("props"), lit(" v="),
        floor(col("value") * 100 + 0.5).cast("long").cast("string"))
      Tables.events(spark, dir)
        .select(col("event_type"), line.as("line"))
        .select(col("event_type"),
          regexp_replace(col("line"), "[0-9]+", "<NUM>").as("red"),
          size(regexp_extract_all(col("line"), lit("[0-9]+"), lit(0))).as("n_hits"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("n_hits")).as("total_redactions"),
          countDistinct(col("red")).as("n_distinct_redacted"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH l AS (
        SELECT event_type,
               event_type || ' ' || props || ' v=' ||
               CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS VARCHAR) AS line
        FROM events)
      SELECT event_type, count(*) AS n_events,
             CAST(sum(len(regexp_extract_all(line, '[0-9]+'))) AS BIGINT) AS total_redactions,
             CAST(count(DISTINCT regexp_replace(line, '[0-9]+', '<NUM>', 'g')) AS BIGINT) AS n_distinct_redacted
      FROM l GROUP BY event_type ORDER BY event_type
    """.trim))

  /** Gopher-style repetition scoring: the most frequent word bigram's
    * share of all bigrams per document — a high ratio flags the
    * boilerplate/repetition documents a training pipeline drops.
    * Computed entirely in-row ([[TextAnalysis.maxRunCount]] over the
    * sorted bigram array), so the whole query is a map-only pass plus
    * the output sort — no corpus-scale shuffle of exploded grams. */
  val qTextRepetition: Q = Q(
    "q_text_repetition",
    (spark, dir) => Tables.documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.shingles(col("text"), 2).as("grams"))
      .filter(size(col("grams")) >= 1)
      .select(col("doc_id"),
        size(col("grams")).cast("long").as("n_bigrams"),
        TextAnalysis.maxRunCount(col("grams")).as("max_rep"))
      .select(col("doc_id"), col("n_bigrams"), col("max_rep"),
        round(col("max_rep").cast("double") / col("n_bigrams"), 6).as("rep_ratio"))
      .orderBy(col("doc_id")),
    Some("""
      WITH t AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
      g AS (
        SELECT doc_id,
               unnest([toks[i] || ' ' || toks[i+1]
                       FOR i IN generate_series(1, len(toks) - 1)]) AS gram
        FROM t WHERE len(toks) >= 2),
      c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY doc_id, gram)
      SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
             CAST(max(cnt) AS BIGINT) AS max_rep,
             round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 6) AS rep_ratio
      FROM c GROUP BY doc_id ORDER BY doc_id
    """.trim))

  /** Stub-modeled feature extraction over the media column — the
    * partition-batched "run the vision model" seam; 4 normalized
    * digest-derived doubles stand in for real features, so the oracle
    * replays the arithmetic exactly. */
  val qMultimodalFeatures: Q = Q(
    "q_multimodal_features",
    (spark, dir) => Multimodal
      .extractFeatures(media(spark, dir, "plain"))
      .toDF()
      .select(col("id").as("doc_id"), col("f0"), col("f1"), col("f2"), col("f3"))
      .orderBy(col("doc_id")),
    Some {
      def chunk(j: Int): String =
        (0 until 4).map { k =>
          s"(strpos('0123456789abcdef', substring(md5(text), ${j * 4 + k + 1}, 1)) - 1)" +
            s" * ${1 << (4 * (3 - k))}"
        }.mkString("(", " + ", ")")
      def f(j: Int): String =
        s"floor(${chunk(j)} / 65535.0 * 1000000 + 0.5) / 1000000 AS f$j"
      s"""
      SELECT doc_id, ${f(0)}, ${f(1)}, ${f(2)}, ${f(3)}
      FROM documents ORDER BY doc_id
      """.trim
    })

  /** Frame sampling: each media row fans out to 1-3 frame rows (byte
    * length decides) with evenly-spaced offsets and per-frame hashes —
    * the video-ingestion explode, shuffle-free inside partitions. */
  val qMultimodalFrames: Q = Q(
    "q_multimodal_frames",
    (spark, dir) => Multimodal
      .sampleFrames(media(spark, dir, "plain"))
      .toDF()
      .select(col("id").as("doc_id"), col("frameIdx").as("frame_idx"),
        col("frameOffset").as("frame_offset"), col("frameHash").as("frame_hash"))
      .orderBy(col("doc_id"), col("frame_idx")),
    Some("""
      WITH base AS (
        SELECT doc_id, text, octet_length(encode(text)) AS nb,
               1 + octet_length(encode(text)) % 3 AS k
        FROM documents),
      fr AS (
        SELECT doc_id, text, nb, k,
               unnest(generate_series(0, k - 1)) AS i
        FROM base)
      SELECT doc_id, CAST(i AS INT) AS frame_idx,
             CAST(i * (nb // k) AS BIGINT) AS frame_offset,
             md5(text || ':' || i) AS frame_hash
      FROM fr ORDER BY doc_id, frame_idx
    """.trim))

  /** Corpus mixture report: per (source, lang) token mass and its share
    * of the whole corpus — the data-mixture table a training run is
    * configured from. One hash aggregate; the share is a window over
    * the already-tiny grouped table, not the corpus. */
  val qCorpusMixture: Q = Q(
    "q_corpus_mixture",
    (spark, dir) => {
      val g = Tables.documents(spark, dir)
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("total_tokens"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy()
      g.select(col("source"), col("lang"), col("n_docs"), col("total_tokens"),
        round(col("total_tokens").cast("double") / sum(col("total_tokens")).over(w), 6)
          .as("token_share"))
        .orderBy(col("source"), col("lang"))
    },
    Some("""
      WITH g AS (
        SELECT source, lang, count(*) AS n_docs,
               CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT) AS total_tokens
        FROM documents GROUP BY source, lang)
      SELECT source, lang, n_docs, total_tokens,
             round(total_tokens::DOUBLE / sum(total_tokens) OVER (), 6) AS token_share
      FROM g ORDER BY source, lang
    """.trim))

  /** Karp-Rabin rolling-hash fingerprinting (winnowing-lite): rolling
    * 4-gram hashes over the token stream, document fingerprint = the
    * minimum hash. Map-only; the oracle recomputes every hash from the
    * same md5 token ints, Horner steps and modulus. */
  val qTextRollingFp: Q = {
    val chunk8 = (0 until 8).map { k =>
      s"(strpos('0123456789abcdef', substring(md5(tok), ${k + 1}, 1)) - 1)" +
        s" * ${1L << (4 * (7 - k))}"
    }.mkString("(", " + ", ")")
    val B = TextAnalysis.RollB
    val P = TextAnalysis.RollP
    val horner =
      s"((((((tt[i] % $P) * $B + tt[i+1]) % $P) * $B + tt[i+2]) % $P) * $B + tt[i+3]) % $P"
    Q(
      "q_text_rolling_fp",
      (spark, dir) => Tables.documents(spark, dir)
        .select(col("doc_id"), TextAnalysis.rollingHashes(col("text")).as("rh"))
        .filter(size(col("rh")) >= 1)
        .select(col("doc_id"),
          size(col("rh")).cast("long").as("n_windows"),
          array_min(col("rh")).as("fp_min"),
          size(array_distinct(col("rh"))).cast("long").as("n_distinct"))
        .orderBy(col("doc_id")),
      Some(s"""
      WITH t AS (
        SELECT doc_id,
               list_transform(string_split_regex(text, '\\s+'), tok -> $chunk8) AS tt
        FROM documents),
      r AS (
        SELECT doc_id,
               [$horner FOR i IN generate_series(1, len(tt) - 3)] AS rh
        FROM t WHERE len(tt) >= 4)
      SELECT doc_id, CAST(len(rh) AS BIGINT) AS n_windows,
             CAST(list_min(rh) AS BIGINT) AS fp_min,
             CAST(len(list_distinct(rh)) AS BIGINT) AS n_distinct
      FROM r ORDER BY doc_id
      """.trim))
  }

  /** Resize planning over decoded media: aspect-preserving fit into a
    * 224×224 box, floor-deterministic in both engines. */
  val qMultimodalResize: Q = Q(
    "q_multimodal_resize",
    (spark, dir) => Multimodal
      .resizeBatch(media(spark, dir, "plain"), 224)
      .toDF()
      .select(col("id").as("doc_id"), col("width"), col("height"),
        col("outWidth").as("out_width"), col("outHeight").as("out_height"))
      .orderBy(col("doc_id")),
    Some("""
      WITH d AS (
        SELECT doc_id,
               CAST(64 + octet_length(encode(text)) % 512 AS INT) AS width,
               CAST(64 + octet_length(encode(text)) % 384 AS INT) AS height
        FROM documents)
      SELECT doc_id, width, height,
             CAST(floor(width * least(224.0 / width, 224.0 / height)) AS INT) AS out_width,
             CAST(floor(height * least(224.0 / width, 224.0 / height)) AS INT) AS out_height
      FROM d ORDER BY doc_id
    """.trim))

  /** Sequence-length histogram (64-token buckets): the distribution
    * that decides padding waste vs packing strategy for a training
    * batch. One hash aggregate on a computed bucket key. */
  val qSeqlenHistogram: Q = Q(
    "q_seqlen_histogram",
    (spark, dir) => Tables.documents(spark, dir)
      .select((floor(TextAnalysis.tokenCount(col("text")).cast("double") / 64)
        .cast("long") * 64).as("bucket_start"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_toks"))
      .groupBy(col("bucket_start"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("total_tokens"))
      .orderBy(col("bucket_start")),
    Some("""
      SELECT (len(string_split_regex(text, '\s+')) // 64) * 64 AS bucket_start,
             count(*) AS n_docs,
             CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT) AS total_tokens
      FROM documents GROUP BY 1 ORDER BY bucket_start
    """.trim))

  /** Concat-and-chunk packing stats per source — exactly the
    * pretraining packing computation (concatenate the stream, cut every
    * `chunk` tokens): chunks needed, fill ratio of the padded final
    * chunk. Pure aggregate arithmetic, no sequential scan needed. */
  val qPackChunks: Q = Q(
    "q_pack_chunks",
    (spark, dir) => Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("total_tokens"))
      .select(col("source"), col("total_tokens"),
        ceil(col("total_tokens").cast("double") / 512).cast("long").as("n_chunks"),
        round(col("total_tokens").cast("double") /
          (ceil(col("total_tokens").cast("double") / 512) * 512), 6).as("fill_ratio"))
      .orderBy(col("source")),
    Some("""
      WITH g AS (
        SELECT source,
               CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT) AS total_tokens
        FROM documents GROUP BY source)
      SELECT source, total_tokens,
             CAST(ceil(total_tokens::DOUBLE / 512) AS BIGINT) AS n_chunks,
             round(total_tokens::DOUBLE /
                   (ceil(total_tokens::DOUBLE / 512) * 512), 6) AS fill_ratio
      FROM g ORDER BY source
    """.trim))

  /** Per-document TF-IDF top-3 terms (rational idf = N/df — no `ln`:
    * transcendental functions are not correctly-rounded and may differ
    * in the last ulp between engines exactly at a ranking boundary;
    * integer multiply + one double division is bit-portable). */
  val qTextTfidf: Q = Q(
    "q_text_tfidf",
    (spark, dir) => graft.operators.Ranking
      .tfIdfTopTerms(Tables.documents(spark, dir), k = 3),
    Some("""
      WITH tf AS (
        SELECT doc_id, term, count(*) AS tf FROM (
          SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS term
          FROM documents)
        GROUP BY doc_id, term),
      dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      stats AS (SELECT count(*) AS n_docs FROM documents),
      scored AS (
        SELECT t.doc_id, t.term, t.tf, d.df,
               round(CAST(t.tf * s.n_docs AS DOUBLE) / CAST(d.df AS DOUBLE), 6) AS score
        FROM tf t JOIN dft d USING (term) CROSS JOIN stats s),
      r AS (
        SELECT doc_id, term, tf, df, score,
               row_number() OVER (PARTITION BY doc_id
                 ORDER BY score DESC, term) AS rnk
        FROM scored)
      SELECT doc_id, term, tf, df, score, CAST(rnk AS INT) AS rnk
      FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk
    """.trim))

  /** BM25 top-10 docs for a fixed bag-of-terms query. Rational idf
    * (no log — see q_text_tfidf), constants pre-folded as identical
    * decimal literals on both sides, per-term scores quantized to
    * BIGINT nano-units before the per-doc sum so the ranked total is
    * an exact integer (float-sum order can never flip the ranking). */
  val qTextBm25: Q = Q(
    "q_text_bm25",
    (spark, dir) => graft.operators.Ranking.bm25TopDocs(
      Tables.documents(spark, dir),
      Seq("join", "stream", "data"), topN = 10),
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS tl FROM documents),
      tf AS (
        SELECT doc_id, dl, term, count(*) AS tf FROM (
          SELECT doc_id, len(tl) AS dl, unnest(tl) AS term FROM toks)
        WHERE term IN ('join', 'stream', 'data')
        GROUP BY doc_id, dl, term),
      dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      stats AS (SELECT count(*) AS n_docs, sum(len(tl)) AS sum_dl FROM toks),
      scored AS (
        SELECT t.doc_id,
               CAST(floor(
                 ((CAST(s.n_docs - d.df AS DOUBLE) + 0.5) / (CAST(d.df AS DOUBLE) + 0.5))
                 * ((CAST(t.tf AS DOUBLE) * 2.2) /
                    (CAST(t.tf AS DOUBLE) + 1.2 *
                     (0.25 + 0.75 * (CAST(t.dl AS DOUBLE) /
                       (CAST(s.sum_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE))))))
                 * 1000000000 + 0.5) AS BIGINT) AS nano
        FROM tf t JOIN dft d USING (term) CROSS JOIN stats s),
      ranked AS (
        SELECT doc_id, CAST(sum(nano) AS BIGINT) AS bm25_nanos
        FROM scored GROUP BY doc_id
        ORDER BY bm25_nanos DESC, doc_id LIMIT 10)
      SELECT doc_id, bm25_nanos,
             CAST(row_number() OVER (ORDER BY bm25_nanos DESC, doc_id) AS INT) AS rnk
      FROM ranked ORDER BY rnk
    """.trim))

  /** End-to-end corpus-prep pipeline — the capstone composition a
    * training run would actually execute: quality filter (≥0.64) →
    * canonical-fingerprint dedup (keep the lowest doc_id; drops 0 on
    * this corpus — a verified zero, like the bloom FN count) →
    * eval-contamination screen (<0.5 shingle overlap with the held-out
    * src0 set) → per-source manifest (kept docs, token mass, corpus
    * share). Every stage is an operator verified standalone elsewhere;
    * this query verifies they COMPOSE. All joins are hash-agg/semi
    * shaped; the held-out shingle set broadcasts. */
  val qCorpusPrep: Q = Q(
    "q_corpus_prep",
    (spark, dir) => {
      import graft.operators.Dedup
      val docs = Tables.documents(spark, dir)
      val scored = docs.filter(col("source") =!= "src0")
        .select(col("doc_id"), col("source"), col("text"),
          TextAnalysis.tokenCount(col("text")).as("n_toks"),
          TextAnalysis.qualityScore(col("text")).as("quality"),
          TextAnalysis.fingerprint(col("text")).as("fp"))
        .filter(col("quality") >= 0.64)
      val keeper = scored.groupBy(col("fp")).agg(min(col("doc_id")).as("keep_id"))
      // persisted: BOTH the shingle explode and the final screen join
      // consume deduped, and each use would otherwise re-run the
      // score-and-dedup join subtree (regex-heavy quality scoring of
      // the whole corpus, twice)
      val deduped = scored.join(keeper,
          scored("fp") === keeper("fp") && scored("doc_id") === keeper("keep_id"))
        .select(scored("doc_id"), col("source"), col("text"), col("n_toks"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // The eval shingle set is the materialized layout artifact
      // q_eval_shingles_build writes (operators/EvalSetArtifact.scala)
      // — fixed per corpus, never re-shingled inside this query.
      val evalSh = broadcast(graft.operators.EvalSetArtifact
        .shingles(spark, dir).withColumn("in_eval", lit(1L)))
      // deduped is a JOIN output — already distributed, and outside
      // Partitioning.spreadBy's scan-shaped contract (its .rdd probe
      // would materialize the upstream AQE stages as real jobs at
      // construction time); shingle it inline instead of docShingles.
      // One flagged broadcast join + ONE aggregate carries both the
      // shingle total and the contaminated count — the exploded
      // shingle stream is consumed by a single pass, so nothing is
      // persisted (the previous two-aggregate form materialized the
      // full shingle explosion to feed totals and contamination
      // separately — the engine's worst at-scale persist pattern).
      val shStats = deduped.select(col("doc_id"),
          explode(array_distinct(TextAnalysis.shingles(col("text")))).as("shingle"))
        .join(evalSh, Seq("shingle"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sh"),
          sum(coalesce(col("in_eval"), lit(0L))).as("n_contam"))
      val screened = deduped
        .join(shStats, Seq("doc_id"), "left")
        .filter(coalesce(col("n_contam"), lit(0L)).cast("double") /
          coalesce(col("n_sh"), lit(1L)) < 0.5)
      val agg = screened.groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_toks")).as("kept_tokens"))
      val total = agg.agg(sum(col("kept_tokens")).as("total_tokens"))
      agg.crossJoin(broadcast(total))
        .select(col("source"), col("n_kept"), col("kept_tokens"),
          round(col("kept_tokens").cast("double") / col("total_tokens"), 6)
            .as("corpus_share"))
        .orderBy(col("source"))
    },
    Some("""
      WITH scored AS (
        SELECT doc_id, source, text, n_tokens, fp FROM (
          SELECT doc_id, source, text,
                 len(toks) AS n_tokens,
                 round(least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.3 +
                       (1.0 - CAST(len(list_filter(toks, x -> x IN ('the', 'a'))) AS DOUBLE)
                         / len(toks)) * 0.3 +
                       (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 0.4,
                       6) AS quality,
                 md5(trim(regexp_replace(
                   regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                   '\s+', ' ', 'g'))) AS fp
          FROM (SELECT doc_id, source, text, string_split_regex(text, '\s+') AS toks
                FROM documents WHERE source <> 'src0'))
        WHERE quality >= 0.64),
      keeper AS (SELECT fp, min(doc_id) AS keep_id FROM scored GROUP BY fp),
      dd AS (
        SELECT s.doc_id, s.source, s.text, s.n_tokens
        FROM scored s JOIN keeper k ON s.fp = k.fp AND s.doc_id = k.keep_id),
      dsh AS (
        SELECT doc_id, unnest(list_distinct(
                 [array_to_string(tl[i:i+4], ' ')
                  FOR i IN generate_series(1, len(tl) - 4)])) AS shingle
        FROM (SELECT doc_id, string_split_regex(text, '\s+') AS tl FROM dd)
        WHERE len(tl) >= 5),
      esh AS (
        SELECT DISTINCT unnest(list_distinct(
                 [array_to_string(tl[i:i+4], ' ')
                  FOR i IN generate_series(1, len(tl) - 4)])) AS shingle
        FROM (SELECT string_split_regex(text, '\s+') AS tl FROM documents
              WHERE source = 'src0')
        WHERE len(tl) >= 5),
      ctm AS (
        SELECT doc_id, count(*) AS n_sh,
               sum(CASE WHEN shingle IN (SELECT shingle FROM esh)
                        THEN 1 ELSE 0 END) AS n_contam
        FROM dsh GROUP BY doc_id),
      screened AS (
        SELECT d.source, d.n_tokens
        FROM dd d LEFT JOIN ctm c USING (doc_id)
        WHERE CAST(coalesce(c.n_contam, 0) AS DOUBLE)
              / coalesce(c.n_sh, 1) < 0.5),
      agg AS (
        SELECT source, count(*) AS n_kept,
               CAST(sum(n_tokens) AS BIGINT) AS kept_tokens
        FROM screened GROUP BY source)
      SELECT source, n_kept, kept_tokens,
             round(CAST(kept_tokens AS DOUBLE) /
                   (SELECT CAST(sum(kept_tokens) AS DOUBLE) FROM agg), 6)
               AS corpus_share
      FROM agg ORDER BY source
    """.trim))

  /** Gopher-style quality gates, each reported separately per source
    * so the filter's selectivity is auditable rule by rule before
    * anything is dropped: token-count window, mean-word-length window,
    * stopword presence, and top-bigram repetition share. Thresholds
    * are fixture-scaled (production Gopher uses 50..100k tokens,
    * word length 3..10, rep share 0.2); the MECHANICS are the
    * deliverable — every rule is a pure in-row expression (the
    * repetition share uses the in-row sort/run-count, not a
    * corpus-scale (doc, gram) shuffle), so the whole gate table is one
    * scan plus a 20-row aggregate. Ratios are rounded to 6dp before
    * thresholding so both engines gate identical doubles. */
  val qTextGates: Q = Q(
    "q_text_gates",
    (spark, dir) => {
      val toks = TextAnalysis.tokens(col("text"))
      val nt = size(toks).cast("long")
      val charMass = aggregate(toks, lit(0L), (a, t) => a + length(t))
      val mwl = round(charMass.cast("double") / nt, 6)
      val grams = TextAnalysis.shingles(col("text"), 2)
      val rep = when(size(grams) >= 1,
        round(TextAnalysis.maxRunCount(grams).cast("double") / size(grams), 6))
      Tables.documents(spark, dir)
        .select(col("source"),
          nt.between(30, 80).as("pl"),
          mwl.between(3.0, 4.5).as("pw"),
          (array_contains(toks, "the") || array_contains(toks, "a")).as("ps"),
          coalesce(rep <= 0.05, lit(false)).as("pr"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("pl"), 1L).otherwise(0L)).as("n_pass_len"),
          sum(when(col("pw"), 1L).otherwise(0L)).as("n_pass_wordlen"),
          sum(when(col("ps"), 1L).otherwise(0L)).as("n_pass_stopword"),
          sum(when(col("pr"), 1L).otherwise(0L)).as("n_pass_repetition"),
          sum(when(col("pl") && col("pw") && col("ps") && col("pr"), 1L)
            .otherwise(0L)).as("n_pass_all"))
        .orderBy(col("source"))
    },
    Some("""
      WITH t AS (
        SELECT doc_id, source, string_split_regex(text, '\s+') AS toks
        FROM documents),
      base AS (
        SELECT doc_id, source, len(toks) AS nt,
               round(CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE)
                     / len(toks), 6) AS mwl,
               (list_contains(toks, 'the') OR list_contains(toks, 'a')) AS ps
        FROM t),
      g AS (
        SELECT doc_id,
               unnest([toks[i] || ' ' || toks[i+1]
                       FOR i IN generate_series(1, len(toks) - 1)]) AS gram
        FROM t WHERE len(toks) >= 2),
      r AS (
        SELECT doc_id, round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 6) AS rep
        FROM (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2)
        GROUP BY doc_id),
      j AS (
        SELECT b.source,
               b.nt BETWEEN 30 AND 80 AS pl,
               b.mwl BETWEEN 3.0 AND 4.5 AS pw,
               b.ps,
               coalesce(r.rep <= 0.05, false) AS pr
        FROM base b LEFT JOIN r USING (doc_id))
      SELECT source, count(*) AS n_docs,
             CAST(sum(CASE WHEN pl THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_len,
             CAST(sum(CASE WHEN pw THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_wordlen,
             CAST(sum(CASE WHEN ps THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_stopword,
             CAST(sum(CASE WHEN pr THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_repetition,
             CAST(sum(CASE WHEN pl AND pw AND ps AND pr THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pass_all
      FROM j GROUP BY source ORDER BY source
    """.trim))

  /** Bigram language-model statistics: the 20 most frequent bigrams
    * with their conditional probability p(w2 | w1) as a RATIONAL
    * (count(w1 w2), count(w1 ·), one rounded division) — the corpus
    * statistic repetition/perplexity-style quality filters build on,
    * kept log-free for cross-engine bit parity. Non-distinct bigrams
    * via the native [[graft.operators.TextAnalysis.shingles]] pass;
    * two hash aggregates (bigram, then first-token mass) and a top-20
    * cut. */
  val qTextBigrams: Q = Q(
    "q_text_bigrams",
    (spark, dir) => {
      val grams = Tables.documents(spark, dir)
        .select(explode(TextAnalysis.shingles(col("text"), 2)).as("bigram"))
        .select(col("bigram"), substring_index(col("bigram"), " ", 1).as("w1"))
      val byBigram = grams.groupBy(col("bigram"), col("w1"))
        .agg(count(lit(1)).as("n_bigram"))
      val byW1 = byBigram.groupBy(col("w1")).agg(sum(col("n_bigram")).as("n_w1"))
      byBigram.join(byW1, "w1")
        .select(col("bigram"), col("n_bigram"), col("n_w1"),
          round(col("n_bigram").cast("double") / col("n_w1"), 6).as("p_cond"))
        .orderBy(col("n_bigram").desc, col("bigram"))
        .limit(20)
    },
    Some("""
      WITH toks AS (
        SELECT string_split_regex(text, '\s+') AS tl FROM documents),
      grams AS (
        SELECT unnest([array_to_string(tl[i:i+1], ' ')
                       FOR i IN generate_series(1, len(tl) - 1)]) AS bigram
        FROM toks WHERE len(tl) >= 2),
      bg AS (
        SELECT bigram, string_split(bigram, ' ')[1] AS w1,
               count(*) AS n_bigram
        FROM grams GROUP BY bigram),
      w1m AS (SELECT w1, CAST(sum(n_bigram) AS BIGINT) AS n_w1 FROM bg GROUP BY w1)
      SELECT bigram, n_bigram, n_w1,
             round(CAST(n_bigram AS DOUBLE) / n_w1, 6) AS p_cond
      FROM bg JOIN w1m USING (w1)
      ORDER BY n_bigram DESC, bigram LIMIT 20
    """.trim))

  /** Concat-and-chunk packing map (the GPT-pretraining layout: concat
    * a source's docs in doc_id order, cut every 512 tokens): per
    * source, the chunk count, how many docs straddle a chunk boundary
    * (each straddle is a truncation-or-attention-mask decision), and
    * the tail waste. One window cumsum per source — the packing plan
    * derives from pure integer prefix sums, no per-chunk pass. */
  val qChunkBoundaries: Q = {
    val chunk = 512L
    Q(
      "q_chunk_boundaries",
      (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.documents(spark, dir)
          .select(col("doc_id"), col("source"),
            TextAnalysis.tokenCount(col("text")).cast("long").as("nt"))
          .filter(col("nt") > 0)
          .withColumn("cum", sum(col("nt")).over(w))
          .withColumn("start_chunk", expr(s"(cum - nt) DIV $chunk"))
          .withColumn("end_chunk", expr(s"(cum - 1) DIV $chunk"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            max(col("cum")).as("total_tokens"),
            sum(when(col("start_chunk") =!= col("end_chunk"), 1L).otherwise(0L))
              .as("n_straddling"),
            (max(col("end_chunk")) + 1).as("n_chunks"))
          .withColumn("tail_waste",
            col("n_chunks") * chunk - col("total_tokens"))
          .orderBy(col("source"))
      },
      Some(s"""
      WITH sized AS (
        SELECT doc_id, source,
               CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS nt
        FROM documents),
      cums AS (
        SELECT source, nt,
               sum(nt) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
        FROM sized WHERE nt > 0),
      marked AS (
        SELECT source, cum,
               (cum - nt) // $chunk AS start_chunk,
               (cum - 1) // $chunk AS end_chunk
        FROM cums),
      agg AS (
        SELECT source, count(*) AS n_docs,
               CAST(max(cum) AS BIGINT) AS total_tokens,
               CAST(sum(CASE WHEN start_chunk <> end_chunk THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_straddling,
               CAST(max(end_chunk) + 1 AS BIGINT) AS n_chunks
        FROM marked GROUP BY source)
      SELECT source, n_docs, total_tokens, n_straddling, n_chunks,
             n_chunks * $chunk - total_tokens AS tail_waste
      FROM agg ORDER BY source
    """.trim))
  }

  /** Hashing-trick feature buckets (the classic fixed-width
    * bag-of-words embedding): every token maps to
    * `md5-chunk mod 64`, and the query reports per-bucket occupancy —
    * occurrence mass and distinct-term collision load. The feature
    * space is a CONSTANT width regardless of vocabulary size (2²⁰ in
    * production; 64 here keeps the oracle small), which is the whole
    * point at 100 TB: the explode feeds one hash aggregate with
    * map-side partials, no vocabulary table, no join, no OOV path.
    * The md5-chunk hash is the engine-portable idiom shared with the
    * sampling/sketch families (DuckDB replays it nibble-by-nibble). */
  val qFeatureHash: Q = Q(
    "q_feature_hash",
    (spark, dir) => Tables.documents(spark, dir)
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .select(col("token"),
        pmod(conv(substring(md5(col("token")), 1, 8), 16, 10).cast("long"),
          lit(64L)).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("token")).as("n_terms"))
      .orderBy(col("bucket")),
    Some(s"""
      WITH tk AS (
        SELECT unnest(string_split_regex(text, '\\s+')) AS token FROM documents),
      h AS (
        SELECT token, md5(token) AS hx FROM tk WHERE token <> ''),
      b AS (
        SELECT token, ${DedupQueries.chunkSql(0)} % 64 AS bucket FROM h)
      SELECT bucket, count(*) AS n_occurrences,
             CAST(count(DISTINCT token) AS BIGINT) AS n_terms
      FROM b GROUP BY bucket ORDER BY bucket
    """.trim))

  /** Per-document language-model quality score — the CCNet-style
    * filter that ranks documents by how well a corpus-trained bigram
    * model predicts them. The model is the same self-consistent
    * bigram/head-count table `q_text_bigrams` builds; each document's
    * score is the integer-floored average conditional probability of
    * its bigrams in nano-units (every division floored BEFORE the
    * per-doc sum, so both engines accumulate identical BIGINTs —
    * log-free perplexity for cross-engine bit parity). Reported per
    * source with the below-corpus-mean count: exactly the cut a
    * mixture planner drops low-LM-fit sources by.
    *
    * Scale: two hash aggregates build the model (bigram vocab-sized,
    * not corpus-sized), one broadcast-able join scores the stream of
    * doc bigrams, per-doc and per-source rollups are map-side
    * combinable. The corpus mean joins back as a broadcast 1-row
    * table, not a window. */
  val qTextLmScore: Q = Q(
    "q_text_lm_score",
    (spark, dir) => {
      // The bigram stream is re-derived for each of its two consumers
      // (model build, scoring join) instead of persisted: the exploded
      // stream is tokens × row-overhead — at corpus scale the largest
      // materialization the engine would otherwise make — while
      // re-running the explode is a cheap scan-shaped recompute. The
      // model side is vocab-sized, so the scoring join broadcasts it
      // under AQE rather than shuffling the stream.
      def grams = Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"),
          explode(TextAnalysis.shingles(col("text"), 2)).as("bigram"))
        .select(col("doc_id"), col("source"), col("bigram"),
          substring_index(col("bigram"), " ", 1).as("w1"))
      val byBigram = grams.groupBy(col("bigram"), col("w1"))
        .agg(count(lit(1)).as("n_bigram"))
      val byW1 = byBigram.groupBy(col("w1")).agg(sum(col("n_bigram")).as("n_w1"))
      val model = byBigram.join(byW1, "w1")
        .select(col("bigram"),
          expr("n_bigram * 1000000000L DIV n_w1").as("p_nanos"))
      val perDoc = grams.join(model, "bigram")
        .groupBy(col("doc_id"), col("source"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("p_nanos")).as("p_sum"))
        .select(col("doc_id"), col("source"),
          expr("p_sum DIV n_bigrams").as("lm_nanos"))
      val corpusMean = perDoc.agg(
        expr("sum(lm_nanos) DIV count(1)").as("mean_nanos"))
      perDoc.crossJoin(broadcast(corpusMean))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          expr("sum(lm_nanos) DIV count(1)").as("avg_nanos"),
          min(col("lm_nanos")).as("min_nanos"),
          max(col("lm_nanos")).as("max_nanos"),
          sum((col("lm_nanos") < col("mean_nanos")).cast("long")).as("n_below_mean"))
        .orderBy(col("source"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, source, string_split_regex(text, '\s+') AS tl
        FROM documents),
      grams AS (
        SELECT doc_id, source,
               unnest([array_to_string(tl[i:i+1], ' ')
                       FOR i IN generate_series(1, len(tl) - 1)]) AS bigram
        FROM toks WHERE len(tl) >= 2),
      bg AS (
        SELECT bigram, string_split(bigram, ' ')[1] AS w1,
               count(*) AS n_bigram
        FROM grams GROUP BY bigram),
      w1m AS (SELECT w1, CAST(sum(n_bigram) AS BIGINT) AS n_w1 FROM bg GROUP BY w1),
      model AS (
        SELECT bigram, n_bigram * 1000000000 // n_w1 AS p_nanos
        FROM bg JOIN w1m USING (w1)),
      per_doc AS (
        SELECT doc_id, source,
               CAST(sum(p_nanos) // count(*) AS BIGINT) AS lm_nanos
        FROM grams JOIN model USING (bigram)
        GROUP BY doc_id, source),
      m AS (SELECT CAST(sum(lm_nanos) // count(*) AS BIGINT) AS mean_nanos
            FROM per_doc)
      SELECT source, count(*) AS n_docs,
             CAST(sum(lm_nanos) // count(*) AS BIGINT) AS avg_nanos,
             min(lm_nanos) AS min_nanos, max(lm_nanos) AS max_nanos,
             CAST(sum(CASE WHEN lm_nanos < mean_nanos THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_below_mean
      FROM per_doc, m GROUP BY source ORDER BY source
    """.trim))

  /** CCNet-style perplexity bucketing — the mixture plan the public
    * CCNet pipeline (Wenzek et al. 2020) derives from a reference LM:
    * per LANGUAGE, documents split into terciles by their LM score
    * (`q_text_lm_score`'s exact-integer bigram model; high average
    * bigram probability = predictable = "head"), and the standard
    * keep-plan retains head+middle. Exact terciles via `ntile(3)`
    * over (lm desc, doc_id) — deterministic total order, identical in
    * both engines. The window partitions by language: at production
    * scale the per-language sort is the honest cost of EXACT
    * quantile bucketing (CCNet itself buckets by quantile); a
    * threshold-based variant would read cuts off the equidepth
    * machinery instead. Docs under 2 tokens have no bigrams and fall
    * outside the plan (no score), same as the reference pipeline. */
  val qCcnetBuckets: Q = Q(
    "q_ccnet_buckets",
    (spark, dir) => {
      def grams = Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"),
          explode(TextAnalysis.shingles(col("text"), 2)).as("bigram"))
        .select(col("doc_id"), col("lang"), col("bigram"),
          substring_index(col("bigram"), " ", 1).as("w1"))
      val byBigram = grams.groupBy(col("bigram"), col("w1"))
        .agg(count(lit(1)).as("n_bigram"))
      val byW1 = byBigram.groupBy(col("w1"))
        .agg(sum(col("n_bigram")).as("n_w1"))
      val model = byBigram.join(byW1, "w1")
        .select(col("bigram"),
          expr("n_bigram * 1000000000L DIV n_w1").as("p_nanos"))
      val perDoc = grams.join(model, "bigram")
        .groupBy(col("doc_id"), col("lang"))
        .agg(expr("sum(p_nanos) DIV count(1)").as("lm_nanos"))
      val wb = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang"))
        .orderBy(col("lm_nanos").desc, col("doc_id"))
      perDoc.withColumn("bucket", ntile(3).over(wb))
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          expr("sum(lm_nanos) DIV count(1)").as("avg_nanos"),
          min(col("lm_nanos")).as("min_nanos"),
          max(col("lm_nanos")).as("max_nanos"))
        .withColumn("kept", col("bucket") <= 2)
        .orderBy(col("lang"), col("bucket"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, lang, string_split_regex(text, '\s+') AS tl
        FROM documents),
      grams AS (
        SELECT doc_id, lang,
               unnest([array_to_string(tl[i:i+1], ' ')
                       FOR i IN generate_series(1, len(tl) - 1)]) AS bigram
        FROM toks WHERE len(tl) >= 2),
      bg AS (
        SELECT bigram, string_split(bigram, ' ')[1] AS w1,
               count(*) AS n_bigram
        FROM grams GROUP BY bigram),
      w1m AS (SELECT w1, CAST(sum(n_bigram) AS BIGINT) AS n_w1
              FROM bg GROUP BY w1),
      model AS (
        SELECT bigram, n_bigram * 1000000000 // n_w1 AS p_nanos
        FROM bg JOIN w1m USING (w1)),
      per_doc AS (
        SELECT doc_id, lang,
               CAST(sum(p_nanos) // count(*) AS BIGINT) AS lm_nanos
        FROM grams JOIN model USING (bigram)
        GROUP BY doc_id, lang),
      bucketed AS (
        SELECT lang, lm_nanos,
               ntile(3) OVER (PARTITION BY lang
                 ORDER BY lm_nanos DESC, doc_id) AS bucket
        FROM per_doc)
      SELECT lang, CAST(bucket AS INT) AS bucket,
             count(*) AS n_docs,
             CAST(sum(lm_nanos) // count(*) AS BIGINT) AS avg_nanos,
             min(lm_nanos) AS min_nanos, max(lm_nanos) AS max_nanos,
             bucket <= 2 AS kept
      FROM bucketed GROUP BY lang, bucket ORDER BY lang, bucket
    """.trim))

  /** PMI collocation mining: pointwise mutual information of adjacent
    * token pairs, ln(p(ab) / (p(a)·p(b))) over bigram/unigram corpus
    * frequencies — the classic phrase detector (a high-PMI bigram is a
    * unit, not a chance adjacency). All frequencies are exact integer
    * counts; the two corpus totals are one-row broadcasts; the log and
    * division run on doubles derived from those exact integers, so both
    * engines evaluate the identical IEEE tree. min-count 5 kills the
    * noise floor, top-50 by PMI. Three hash aggregates + one
    * vocab-sized join — nothing touches the corpus twice. */
  val qTextPmi: Q = Q(
    "q_text_pmi",
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      val uni = docs
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c_tok"))
      val uniTotal = broadcast(uni.agg(sum(col("c_tok")).as("n_uni")))
      val bg = docs
        .select(explode(TextAnalysis.shingles(col("text"), 2)).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 5)
        .select(col("bigram"), col("c_ab"),
          substring_index(col("bigram"), " ", 1).as("w1"),
          substring_index(col("bigram"), " ", -1).as("w2"))
      val bgTotal = broadcast(docs
        .select((TextAnalysis.tokenCount(col("text")) - 1).cast("long").as("nb"))
        .filter(col("nb") > 0).agg(sum(col("nb")).as("n_bg")))
      bg.join(uni.select(col("tok").as("w1"), col("c_tok").as("c_a")), Seq("w1"))
        .join(uni.select(col("tok").as("w2"), col("c_tok").as("c_b")), Seq("w2"))
        .crossJoin(uniTotal).crossJoin(bgTotal)
        .select(col("bigram"), col("c_ab"), col("c_a"), col("c_b"),
          round(log(
            (col("c_ab").cast("double") / col("n_bg")) /
              ((col("c_a").cast("double") / col("n_uni"))
                * (col("c_b").cast("double") / col("n_uni")))), 6).as("pmi"))
        .orderBy(col("pmi").desc, col("bigram"))
        .limit(50)
    },
    Some("""
      WITH toks AS (
        SELECT string_split_regex(text, '\s+') AS tl FROM documents),
      uni AS (
        SELECT unnest(tl) AS tok FROM toks),
      uc AS (SELECT tok, count(*) AS c_tok FROM uni GROUP BY tok),
      ut AS (SELECT CAST(sum(c_tok) AS BIGINT) AS n_uni FROM uc),
      grams AS (
        SELECT unnest([array_to_string(tl[i:i+1], ' ')
                       FOR i IN generate_series(1, len(tl) - 1)]) AS bigram
        FROM toks WHERE len(tl) >= 2),
      bt AS (SELECT CAST(count(*) AS BIGINT) AS n_bg FROM grams),
      bc AS (
        SELECT bigram, count(*) AS c_ab,
               string_split(bigram, ' ')[1] AS w1,
               string_split(bigram, ' ')[-1] AS w2
        FROM grams GROUP BY bigram HAVING count(*) >= 5)
      SELECT bigram, c_ab, a.c_tok AS c_a, b.c_tok AS c_b,
             round(ln((CAST(c_ab AS DOUBLE) / n_bg) /
               ((CAST(a.c_tok AS DOUBLE) / n_uni)
                * (CAST(b.c_tok AS DOUBLE) / n_uni))), 6) AS pmi
      FROM bc
      JOIN uc a ON bc.w1 = a.tok
      JOIN uc b ON bc.w2 = b.tok
      CROSS JOIN ut CROSS JOIN bt
      ORDER BY pmi DESC, bigram LIMIT 50
    """.trim))

  /** Tokenizer fertility audit: per language, how many BPE-ish tokens
    * the regex pre-tokenizer emits per whitespace word and how many
    * characters ride in each — the table that tells you which
    * languages your tokenizer taxes (CJK text fragments into many
    * more subword units per word than English). Pure in-row counting
    * expressions + one hash aggregate; ratios as exact integer
    * micro-units. */
  val qTokenizerFertility: Q = Q(
    "q_tokenizer_fertility",
    (spark, dir) => {
      import TextAnalysis._
      Tables.documents(spark, dir)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(tokenCount(col("text")).cast("long")).as("ws_tokens"),
          sum(bpeTokenCount(col("text"))).as("bpe_tokens"),
          sum(length(col("text")).cast("long")).as("n_chars"))
        .select(col("lang"), col("n_docs"), col("ws_tokens"), col("bpe_tokens"),
          col("n_chars"),
          expr("bpe_tokens * 1000000L DIV ws_tokens").as("fertility_micros"),
          expr("n_chars * 1000000L DIV bpe_tokens").as("chars_per_bpe_micros"))
        .orderBy(col("lang"))
    },
    Some("""
      SELECT lang, count(*) AS n_docs,
             CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT) AS ws_tokens,
             CAST(sum(len(regexp_extract_all(text,
               ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+'))) AS BIGINT) AS bpe_tokens,
             CAST(sum(length(text)) AS BIGINT) AS n_chars,
             CAST(sum(len(regexp_extract_all(text,
               ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+'))) AS BIGINT) * 1000000
               // CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT)
               AS fertility_micros,
             CAST(sum(length(text)) AS BIGINT) * 1000000
               // CAST(sum(len(regexp_extract_all(text,
                    ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+'))) AS BIGINT)
               AS chars_per_bpe_micros
      FROM documents GROUP BY lang ORDER BY lang
    """.trim))

  /** Per-source token entropy: Shannon entropy of the token
    * distribution, H = ln(N) - Σc·ln(c)/N — the lexical-diversity
    * gauge (low entropy = templated/boilerplate source). The c·ln(c)
    * terms are FLOORED TO INTEGER NANOS before the per-source sum
    * (double addition is order-dependent across partitions; integer
    * addition is exact and commutative — same pinning discipline as
    * the LM score), so both engines aggregate identical BIGINTs and
    * only the final one-row arithmetic runs in doubles. */
  val qSourceEntropy: Q = Q(
    "q_source_entropy",
    (spark, dir) => {
      val counts = Tables.documents(spark, dir)
        .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("c"))
      counts.groupBy(col("source"))
        .agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("vocab"),
          sum(floor(col("c").cast("double") * log(col("c").cast("double"))
            * 1e9).cast("long")).as("clogc_nanos"))
        .select(col("source"), col("n_tokens"), col("vocab"),
          round(log(col("n_tokens").cast("double"))
            - col("clogc_nanos").cast("double") / 1e9
              / col("n_tokens").cast("double"), 6).as("entropy_nats"))
        .orderBy(col("source"))
    },
    Some("""
      WITH toks AS (
        SELECT source, unnest(string_split_regex(text, '\s+')) AS tok
        FROM documents),
      counts AS (
        SELECT source, tok, count(*) AS c FROM toks GROUP BY source, tok),
      agg AS (
        SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
               count(*) AS vocab,
               CAST(sum(CAST(floor(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
                    * 1e9) AS BIGINT)) AS BIGINT) AS clogc_nanos
        FROM counts GROUP BY source)
      SELECT source, n_tokens, vocab,
             round(ln(CAST(n_tokens AS DOUBLE))
                   - CAST(clogc_nanos AS DOUBLE) / 1e9
                     / CAST(n_tokens AS DOUBLE), 6) AS entropy_nats
      FROM agg ORDER BY source
    """.trim))

  /** Flesch-style readability per source: words, sentence breaks and
    * vowel-group syllable proxies counted as exact integers in one
    * pass (regexp_count codegens into the scan), the classic
    * 206.835 − 1.015·(W/S) − 84.6·(Syl/W) score computed once per
    * source from those sums. A diagnostics gauge — the vowel-group
    * proxy is only meaningful for alphabetic scripts, which is itself
    * the signal (CJK sources pin near the ceiling and a mixture
    * planner weights them separately). */
  val qTextReadability: Q = Q(
    "q_text_readability",
    (spark, dir) => Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("n_words"),
        sum(greatest(expr("regexp_count(text, '[.!?]+')"), lit(1))
          .cast("long")).as("n_sentences"),
        sum(expr("regexp_count(lower(text), '[aeiouy]+')").cast("long"))
          .as("n_syllables"))
      .select(col("source"), col("n_docs"), col("n_words"),
        col("n_sentences"), col("n_syllables"),
        round(lit(206.835)
          - lit(1.015) * (col("n_words").cast("double") / col("n_sentences"))
          - lit(84.6) * (col("n_syllables").cast("double") / col("n_words")), 6)
          .as("flesch"))
      .orderBy(col("source")),
    Some("""
      WITH g AS (
        SELECT source, count(*) AS n_docs,
               CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT)
                 AS n_words,
               CAST(sum(greatest(len(regexp_extract_all(text, '[.!?]+')), 1))
                 AS BIGINT) AS n_sentences,
               CAST(sum(len(regexp_extract_all(lower(text), '[aeiouy]+')))
                 AS BIGINT) AS n_syllables
        FROM documents GROUP BY source)
      SELECT source, n_docs, n_words, n_sentences, n_syllables,
             round(206.835
                   - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                   - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 6)
               AS flesch
      FROM g ORDER BY source
    """.trim))

  /** Unsupervised topic discovery: spherical k-means over the tf-idf
    * posting index — the domain-mixture step a curation pipeline runs
    * when the corpus has no labels (what IS in this crawl?). One seed
    * doc per `lang` stratum (largest tf-idf norm in the stratum, ties
    * to the smaller id — strata only seed diversity, the clustering
    * itself never sees the label) anchors an assign → centroid →
    * re-assign Lloyd round; topics are labeled by their seed doc id
    * (the same label-by-representative convention as connected
    * components), and the report is each topic's doc count and top-5
    * centroid terms. Seeding-by-stratum is the deterministic stand-in
    * for k-means++: maximally-spread anchors without sampling.
    *
    * Determinism: centroid components are exact BIGINT sums of
    * integer tf-idf weights, dot products accumulate in 128-bit, and
    * the one double division (dot/√Σc²: the doc's own norm is
    * constant per doc and drops out of the argmax) runs on identical
    * expression trees in both engines; argmax ties break to the
    * smaller topic id and overlap-free docs take the smallest topic,
    * so the partition is engine-exact.
    *
    * Scale shape: one tokenize + tf aggregate over the corpus (the
    * persisted (doc, term, tf) table feeds norms, seeds, and both
    * assignment passes — one corpus scan); the seed side is k docs
    * (broadcast), centroids are bounded to k × 256 components by the
    * native bounded-top-k aggregate ([[graft.functions.TopKLongAgg]]
    * — map-side k-bounded, never a per-topic window sort), and both
    * assignment passes are broadcast joins against the tf table with
    * per-(doc, topic) integer aggregates. No window functions
    * anywhere in the plan. Deliberately NOT the df-capped
    * [[graft.operators.TermIndexArtifact]]: a retrieval stop-cut
    * drops the shared vocabulary that carries the topical signal. */
  /** DuckDB replay of the whole [[graft.operators.TopicArtifact]]
    * pipeline (tokenize → tf → stratum seeds → assign → bounded
    * centroids → re-assign), shared by the topic-family oracles the
    * way the dedup oracles share their recursive-CC chain. Ends at
    * `a2(doc_id, topic)` with `ranked(topic, term, c, rn)` (the
    * centroid order), `cent` (the 256-bounded centroid) and `kept`
    * (the per-doc tf table) available upstream. */
  private val topicsCte: String = """toks AS (
        SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS term
        FROM documents),
      kept AS (
        SELECT doc_id, term, count(*) AS w FROM toks
        WHERE length(term) > 0 GROUP BY 1, 2),
      norms AS (SELECT doc_id, sum(w * w) AS nrm FROM kept GROUP BY 1),
      seeds AS (
        SELECT seed_doc, snrm FROM (
          SELECT d.lang, n.doc_id AS seed_doc, n.nrm AS snrm,
                 row_number() OVER (PARTITION BY d.lang
                   ORDER BY n.nrm DESC, n.doc_id) AS rn
          FROM norms n JOIN documents d USING (doc_id))
        WHERE rn = 1),
      skept AS (
        SELECT se.seed_doc, k.term, k.w AS ws, se.snrm
        FROM kept k JOIN seeds se ON k.doc_id = se.seed_doc),
      fb AS (SELECT min(seed_doc) AS fbt FROM seeds),
      d1 AS (
        SELECT k.doc_id, sk.seed_doc, sk.snrm, sum(k.w * sk.ws) AS dot
        FROM kept k JOIN skept sk USING (term) GROUP BY 1, 2, 3),
      a1p AS (
        SELECT doc_id, seed_doc,
               row_number() OVER (PARTITION BY doc_id
                 ORDER BY CAST(dot AS DOUBLE) / sqrt(CAST(snrm AS DOUBLE))
                   DESC, seed_doc) AS rn
        FROM d1),
      a1 AS (
        SELECT n.doc_id,
               coalesce(p.seed_doc, (SELECT fbt FROM fb)) AS topic
        FROM norms n
        LEFT JOIN (SELECT doc_id, seed_doc FROM a1p WHERE rn = 1) p
          USING (doc_id)),
      centall AS (
        SELECT a.topic, k.term, CAST(sum(k.w) AS BIGINT) AS c
        FROM kept k JOIN a1 a USING (doc_id) GROUP BY 1, 2),
      ranked AS (
        SELECT topic, term, c,
               row_number() OVER (PARTITION BY topic
                 ORDER BY c DESC, term) AS rn
        FROM centall),
      cent AS (SELECT topic, term, c FROM ranked WHERE rn <= 256),
      s2 AS (SELECT topic, sum(CAST(c AS HUGEINT) * c) AS s2
             FROM cent GROUP BY 1),
      d2 AS (
        SELECT k.doc_id, c.topic, sum(CAST(k.w AS HUGEINT) * c.c) AS dot
        FROM kept k JOIN cent c USING (term) GROUP BY 1, 2),
      a2p AS (
        SELECT d.doc_id, d.topic,
               row_number() OVER (PARTITION BY d.doc_id
                 ORDER BY CAST(d.dot AS DOUBLE) / sqrt(CAST(s.s2 AS DOUBLE))
                   DESC, d.topic) AS rn
        FROM d2 d JOIN s2 s USING (topic)),
      a2 AS (
        SELECT n.doc_id,
               coalesce(p.topic, (SELECT fbt FROM fb)) AS topic
        FROM norms n
        LEFT JOIN (SELECT doc_id, topic FROM a2p WHERE rn = 1) p
          USING (doc_id))"""

  val qTextTopics: Q = {
    Q(
      "q_text_topics",
      (spark, dir) => {
        // Registered build step of the topic-model artifact
        // (operators/TopicArtifact.scala): the one-Lloyd-round
        // spherical k-means — full-vocabulary tf vectors from the
        // materialized tokenized corpus (NOT the df-capped retrieval
        // index: a stop-cut keeps only rare terms — right for lexical
        // search, degenerate for clustering, where the SHARED
        // vocabulary distribution is the signal; measured: the capped
        // index collapses this corpus to one topic, full tf yields
        // five populated clusters) — runs ONCE, writes the (doc,
        // topic) label table + bounded centroids, and q_topic_terms /
        // q_topic_purity consume the written labels.
        graft.operators.TopicArtifact.materialize(spark, dir)
        val counts = graft.operators.TopicArtifact.assign(spark, dir)
          .groupBy(col("topic")).agg(count(lit(1)).as("n_docs"))
        graft.operators.TopicArtifact.centroids(spark, dir)
          .filter(col("pos") < 5)
          .groupBy(col("topic"))
          .agg(array_join(
            expr("transform(array_sort(collect_list(struct(pos, term))), x -> x.term)"),
            " ").as("top_terms"))
          .join(counts, Seq("topic"), "left")
          .select(col("topic"), coalesce(col("n_docs"), lit(0L)).as("n_docs"),
            col("top_terms"))
          .orderBy(col("topic"))
      },
      Some(s"""
      WITH $topicsCte,
      counts AS (SELECT topic, count(*) AS n_docs FROM a2 GROUP BY topic),
      t5 AS (
        SELECT topic, string_agg(term, ' ' ORDER BY rn) AS top_terms
        FROM ranked WHERE rn <= 5 GROUP BY topic)
      SELECT t5.topic, coalesce(c.n_docs, 0) AS n_docs, t5.top_terms
      FROM t5 LEFT JOIN counts c USING (topic)
      ORDER BY t5.topic
    """.trim))
  }

  /** Distinctive terms per topic by Dunning log-likelihood ratio —
    * "what is this topic ABOUT, relative to the rest of the corpus"
    * (the same significance machinery as `q_text_collocations`, with
    * the contingency now term-in-topic vs term-elsewhere). Pure
    * artifact consumer: the (doc, topic) labels come from the
    * materialized topic model ([[graft.operators.TopicArtifact]]) and
    * the per-doc term counts from the materialized tokenized corpus —
    * the corpus text is never touched. Candidates are floored at
    * c12 ≥ 5 (the standard count prefilter; bounds the scored set to
    * the frequent tail), LLR is per-row double math over exact integer
    * contingency cells floored to micro-units, and the top-5 per topic
    * come from the native bounded-top-k aggregate (map-side k-bounded,
    * never a per-topic window sort), ties to the lexicographically
    * smaller term — engine-exact. */
  val qTopicTerms: Q = Q(
    "q_topic_terms",
    (spark, dir) => {
      val tt = graft.operators.TopicArtifact.tf(spark, dir)
        .join(graft.operators.TopicArtifact.assign(spark, dir), "doc_id")
        .groupBy(col("topic"), col("term"))
        .agg(sum(col("w")).as("c12"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val c1t = tt.groupBy(col("term")).agg(sum(col("c12")).as("c1"))
      val c2t = tt.groupBy(col("topic")).agg(sum(col("c12")).as("c2"))
      val total = tt.agg(sum(col("c12")).as("n_total"))
      def xlx(c: org.apache.spark.sql.Column) = {
        val d = c.cast("double")
        when(c > 0, d * log(d)).otherwise(lit(0.0d))
      }
      val k11 = col("c12")
      val k12 = col("c1") - col("c12")
      val k21 = col("c2") - col("c12")
      val k22 = col("n_total") - col("c1") - col("c2") + col("c12")
      val llr = (xlx(k11) + xlx(k12) + xlx(k21) + xlx(k22) + xlx(col("n_total"))
        - xlx(col("c1")) - xlx(col("n_total") - col("c1"))
        - xlx(col("c2")) - xlx(col("n_total") - col("c2"))) * lit(2.0d)
      tt.filter(col("c12") >= 5)
        .join(c1t, "term").join(c2t, "topic")
        .crossJoin(broadcast(total))
        .select(col("topic"), col("term"),
          floor(llr * lit(1e6)).cast("long").as("llr_micros"))
        .groupBy(col("topic"))
        .agg(graft.functions.TopKLongAgg(col("llr_micros"), col("term"), 5)
          .as("top"))
        .select(col("topic"), posexplode(col("top")).as(Seq("p", "e")))
        .select(col("topic"), (col("p") + 1).cast("int").as("rnk"),
          col("e.item").as("term"), col("e.score").as("llr_micros"))
        .orderBy(col("topic"), col("rnk"))
    },
    Some(s"""
      WITH $topicsCte,
      tt AS (
        SELECT a.topic, k.term, CAST(sum(k.w) AS BIGINT) AS c12
        FROM kept k JOIN a2 a USING (doc_id) GROUP BY 1, 2),
      c1t AS (SELECT term, CAST(sum(c12) AS BIGINT) AS c1 FROM tt GROUP BY term),
      c2t AS (SELECT topic, CAST(sum(c12) AS BIGINT) AS c2 FROM tt GROUP BY topic),
      tot AS (SELECT CAST(sum(c12) AS BIGINT) AS n_total FROM tt),
      cand AS (
        SELECT tt.topic, tt.term, tt.c12, c1t.c1, c2t.c2, tot.n_total,
               tt.c12 AS k11, c1t.c1 - tt.c12 AS k12, c2t.c2 - tt.c12 AS k21,
               tot.n_total - c1t.c1 - c2t.c2 + tt.c12 AS k22
        FROM tt JOIN c1t USING (term) JOIN c2t ON tt.topic = c2t.topic, tot
        WHERE tt.c12 >= 5),
      scored AS (
        SELECT topic, term,
               CAST(floor((
                 (CASE WHEN k11 > 0 THEN CAST(k11 AS DOUBLE) * ln(CAST(k11 AS DOUBLE)) ELSE 0.0 END
                  + CASE WHEN k12 > 0 THEN CAST(k12 AS DOUBLE) * ln(CAST(k12 AS DOUBLE)) ELSE 0.0 END
                  + CASE WHEN k21 > 0 THEN CAST(k21 AS DOUBLE) * ln(CAST(k21 AS DOUBLE)) ELSE 0.0 END
                  + CASE WHEN k22 > 0 THEN CAST(k22 AS DOUBLE) * ln(CAST(k22 AS DOUBLE)) ELSE 0.0 END
                  + CASE WHEN n_total > 0 THEN CAST(n_total AS DOUBLE) * ln(CAST(n_total AS DOUBLE)) ELSE 0.0 END
                  - CASE WHEN c1 > 0 THEN CAST(c1 AS DOUBLE) * ln(CAST(c1 AS DOUBLE)) ELSE 0.0 END
                  - CASE WHEN n_total - c1 > 0 THEN CAST(n_total - c1 AS DOUBLE) * ln(CAST(n_total - c1 AS DOUBLE)) ELSE 0.0 END
                  - CASE WHEN c2 > 0 THEN CAST(c2 AS DOUBLE) * ln(CAST(c2 AS DOUBLE)) ELSE 0.0 END
                  - CASE WHEN n_total - c2 > 0 THEN CAST(n_total - c2 AS DOUBLE) * ln(CAST(n_total - c2 AS DOUBLE)) ELSE 0.0 END
                 ) * 2.0) * 1e6) AS BIGINT) AS llr_micros
        FROM cand),
      r AS (
        SELECT topic, term, llr_micros,
               row_number() OVER (PARTITION BY topic
                 ORDER BY llr_micros DESC, term) AS rn
        FROM scored)
      SELECT topic, CAST(rn AS INT) AS rnk, term, llr_micros
      FROM r WHERE rn <= 5 ORDER BY topic, rnk
    """.trim))

  /** Topic ↔ metadata alignment: per topic, the majority `lang` and
    * its share (purity, exact ppm by integer division) — the external
    * validation a label-free clustering gets when SOME trusted
    * metadata exists, plus the corpus-level weighted purity as the
    * `-1` summary row. Pure artifact consumer (label table join, one
    * scan of `documents` for the metadata column); majority ties break
    * to the lexicographically smaller lang via min-of-struct, never a
    * window sort. */
  val qTopicPurity: Q = Q(
    "q_topic_purity",
    (spark, dir) => {
      val cont = graft.operators.TopicArtifact.assign(spark, dir)
        .join(Tables.documents(spark, dir).select(col("doc_id"), col("lang")),
          "doc_id")
        .groupBy(col("topic"), col("lang"))
        .agg(count(lit(1)).as("n"))
      val per = cont.groupBy(col("topic"))
        .agg(sum(col("n")).as("n_docs"),
          min(struct((-col("n")).as("negn"), col("lang"))).as("m"))
        .select(col("topic"), col("n_docs"),
          col("m.lang").as("top_lang"), (-col("m.negn")).as("top_n"))
      val overall = per.agg(sum(col("n_docs")).as("n_docs"),
          sum(col("top_n")).as("top_n"))
        .select(lit(-1L).as("topic"), col("n_docs"),
          lit("_ALL_").as("top_lang"), col("top_n"))
      per.unionByName(overall)
        .select(col("topic"), col("n_docs"), col("top_lang"), col("top_n"),
          expr("top_n * 1000000 div n_docs").as("purity_ppm"))
        .orderBy(col("topic"))
    },
    Some(s"""
      WITH $topicsCte,
      cont AS (
        SELECT a.topic, d.lang, count(*) AS n
        FROM a2 a JOIN documents d USING (doc_id)
        GROUP BY 1, 2),
      per AS (
        SELECT topic, CAST(sum(n) AS BIGINT) AS n_docs,
               min(struct_pack(negn := -n, lang := lang)).lang AS top_lang,
               CAST(-min(struct_pack(negn := -n, lang := lang)).negn AS BIGINT)
                 AS top_n
        FROM cont GROUP BY topic),
      allrows AS (
        SELECT topic, n_docs, top_lang, top_n FROM per
        UNION ALL
        SELECT -1 AS topic, CAST(sum(n_docs) AS BIGINT),
               '_ALL_', CAST(sum(top_n) AS BIGINT)
        FROM per)
      SELECT topic, n_docs, top_lang, top_n,
             top_n * 1000000 // n_docs AS purity_ppm
      FROM allrows ORDER BY topic
    """.trim))

  /** REAL audio decode — RIFF/WAVE PCM containers synthesized with
    * genuine 44-byte headers ([[graft.operators.Codecs.synthesizeWav]])
    * and decoded by a real chunk-walking parser
    * ([[graft.operators.Codecs.parseWav]]): magic validation,
    * little-endian chunk traversal, `fmt ` field checks, int16 sample
    * decode. Per-sample-rate rollup of the stats an audio-ingest QA
    * job reports: sample/duration mass, peak amplitude, absolute
    * loudness mass, near-clipping count, parse failures (must be 0 on
    * well-formed containers). The oracle recomputes every statistic
    * arithmetically from the synthesis recipe — a parser that misreads
    * an offset, an endianness, or the sign extension diverges.
    *
    * Scale: partition-batched `mapPartitions` decode (one codec
    * context per partition), metadata-sized output, the only shuffle
    * is the 3-row rollup. */
  val qMultimodalAudio: Q = Q(
    "q_multimodal_audio",
    (spark, dir) => graft.operators.Codecs
      .decodeWavBatch(media(spark, dir, "wav"))
      .toDF()
      .groupBy(col("sampleRate").as("sample_rate"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nSamples")).as("total_samples"),
        sum(col("durationMs")).as("total_ms"),
        max(col("peak")).as("max_peak"),
        sum(col("sumAbs")).as("sum_abs"),
        sum(col("nClipped")).as("n_clipped"),
        sum(when(col("ok"), 0L).otherwise(1L)).as("n_bad"))
      .orderBy(col("sample_rate")),
    Some("""
      WITH d AS (
        SELECT doc_id, 32 + octet_length(encode(text)) % 64 AS n,
               CAST(8000 * (1 + doc_id % 3) AS INT) AS sr
        FROM documents),
      s AS (SELECT doc_id, sr, n, unnest(range(0, n)) AS i FROM d),
      v AS (
        SELECT doc_id, sr, n,
               ((doc_id * 31 + i * 2654435761) % 65536) - 32768 AS smp
        FROM s),
      p AS (
        SELECT doc_id, sr, n, n * 1000 // sr AS ms,
               max(abs(smp)) AS peak,
               sum(abs(smp)) AS sum_abs,
               sum(CASE WHEN abs(smp) >= 32000 THEN 1 ELSE 0 END) AS n_clip
        FROM v GROUP BY 1, 2, 3, 4)
      SELECT sr AS sample_rate, count(*) AS n_docs,
             CAST(sum(n) AS BIGINT) AS total_samples,
             CAST(sum(ms) AS BIGINT) AS total_ms,
             CAST(max(peak) AS BIGINT) AS max_peak,
             CAST(sum(sum_abs) AS BIGINT) AS sum_abs,
             CAST(sum(n_clip) AS BIGINT) AS n_clipped,
             CAST(0 AS BIGINT) AS n_bad
      FROM p GROUP BY sr ORDER BY sr
    """.trim))

  /** REAL image decode — 24-bit uncompressed BMPs synthesized with
    * genuine headers ([[graft.operators.Codecs.synthesizeBmp]]) and
    * decoded by a real pixel parser
    * ([[graft.operators.Codecs.parseBmp]]) that must get BMP's three
    * famous quirks right: BGR byte order, 4-byte row padding, and
    * bottom-up row storage. Per-(width, height) rollup of per-channel
    * sums AND raster-order-weighted sums Σ v(x,y)·(y·W+x+1): the
    * plain sums are permutation-invariant, so the weighted ones are
    * what catch a parser that flips rows, slips a padding byte, or
    * swaps channels. The oracle replays the synthesis arithmetic over
    * a generated (x, y) grid. Partition-batched decode, 20-group
    * rollup, no other shuffle. */
  val qMultimodalPixels: Q = Q(
    "q_multimodal_pixels",
    (spark, dir) => graft.operators.Codecs
      .decodeBmpBatch(media(spark, dir, "bmp"))
      .toDF()
      .groupBy(col("width"), col("height"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("rSum")).as("r_sum"),
        sum(col("gSum")).as("g_sum"),
        sum(col("bSum")).as("b_sum"),
        sum(col("rWsum")).as("r_wsum"),
        sum(col("gWsum")).as("g_wsum"),
        sum(col("bWsum")).as("b_wsum"),
        sum(when(col("ok"), 0L).otherwise(1L)).as("n_bad"))
      .orderBy(col("width"), col("height")),
    Some("""
      WITH d AS (
        SELECT doc_id, CAST(4 + doc_id % 5 AS INT) AS w,
               CAST(3 + octet_length(encode(text)) % 4 AS INT) AS h
        FROM documents),
      px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) AS p FROM d),
      g AS (SELECT doc_id, w, h, p % w AS x, p // w AS y FROM px),
      c AS (
        SELECT doc_id, w, h,
               (doc_id + 7 * x + 13 * y) % 256 AS r,
               (doc_id + 7 * x + 13 * y + 37) % 256 AS gg,
               (doc_id + 7 * x + 13 * y + 74) % 256 AS b,
               y * w + x + 1 AS wgt
        FROM g),
      per AS (
        SELECT doc_id, w, h,
               sum(r) AS r_sum, sum(gg) AS g_sum, sum(b) AS b_sum,
               sum(r * wgt) AS r_wsum, sum(gg * wgt) AS g_wsum,
               sum(b * wgt) AS b_wsum
        FROM c GROUP BY 1, 2, 3)
      SELECT w AS width, h AS height, count(*) AS n_docs,
             CAST(sum(r_sum) AS BIGINT) AS r_sum,
             CAST(sum(g_sum) AS BIGINT) AS g_sum,
             CAST(sum(b_sum) AS BIGINT) AS b_sum,
             CAST(sum(r_wsum) AS BIGINT) AS r_wsum,
             CAST(sum(g_wsum) AS BIGINT) AS g_wsum,
             CAST(sum(b_wsum) AS BIGINT) AS b_wsum,
             CAST(0 AS BIGINT) AS n_bad
      FROM per GROUP BY w, h ORDER BY width, height
    """.trim))

  /** REAL PNG decode — zlib and CRC32 are JVM built-ins, so the full
    * 8-bit RGB non-interlaced profile is decoded genuinely
    * ([[graft.operators.Codecs.parsePng]]): chunk walk with per-chunk
    * CRC32 verification, multi-IDAT inflate, and scanline
    * reconstruction inverting all five PNG filters (None/Sub/Up/
    * Average/Paeth — the synthesized rows cycle through every type,
    * so a wrong predictor breaks parity). Same raster-weighted
    * channel-sum rollup as `q_multimodal_pixels`; the oracle replays
    * the pixel recipe arithmetically and never sees the compressed
    * bytes — the decoder's filter inversion has to be EXACT for the
    * sums to land. Partition-batched decode, ≤12-group rollup. */
  val qMultimodalPng: Q = Q(
    "q_multimodal_png",
    (spark, dir) => graft.operators.Codecs
      .decodePngBatch(media(spark, dir, "png"))
      .toDF()
      .groupBy(col("width"), col("height"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("rSum")).as("r_sum"),
        sum(col("gSum")).as("g_sum"),
        sum(col("bSum")).as("b_sum"),
        sum(col("rWsum")).as("r_wsum"),
        sum(col("gWsum")).as("g_wsum"),
        sum(col("bWsum")).as("b_wsum"),
        sum(when(col("ok"), 0L).otherwise(1L)).as("n_bad"))
      .orderBy(col("width"), col("height")),
    Some("""
      WITH d AS (
        SELECT doc_id, CAST(3 + doc_id % 4 AS INT) AS w,
               CAST(2 + octet_length(encode(text)) % 3 AS INT) AS h
        FROM documents),
      px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) AS p FROM d),
      g AS (SELECT doc_id, w, h, p % w AS x, p // w AS y FROM px),
      c AS (
        SELECT doc_id, w, h,
               (doc_id * 3 + 11 * x + 17 * y) % 256 AS r,
               (doc_id * 3 + 11 * x + 17 * y + 29) % 256 AS gg,
               (doc_id * 3 + 11 * x + 17 * y + 58) % 256 AS b,
               y * w + x + 1 AS wgt
        FROM g),
      per AS (
        SELECT doc_id, w, h,
               sum(r) AS r_sum, sum(gg) AS g_sum, sum(b) AS b_sum,
               sum(r * wgt) AS r_wsum, sum(gg * wgt) AS g_wsum,
               sum(b * wgt) AS b_wsum
        FROM c GROUP BY 1, 2, 3)
      SELECT w AS width, h AS height, count(*) AS n_docs,
             CAST(sum(r_sum) AS BIGINT) AS r_sum,
             CAST(sum(g_sum) AS BIGINT) AS g_sum,
             CAST(sum(b_sum) AS BIGINT) AS b_sum,
             CAST(sum(r_wsum) AS BIGINT) AS r_wsum,
             CAST(sum(g_wsum) AS BIGINT) AS g_wsum,
             CAST(sum(b_wsum) AS BIGINT) AS b_wsum,
             CAST(0 AS BIGINT) AS n_bad
      FROM per GROUP BY w, h ORDER BY width, height
    """.trim))

  /** Silence-run segmentation over decoded PCM — the order-SENSITIVE
    * audio statistic ([[graft.operators.Codecs.wavSilenceRuns]]):
    * maximal runs of samples with |s| < 8192, counted sequentially
    * inside the per-document decode pass (where PCM is already being
    * scanned in order — never a corpus-wide window). The oracle
    * replays the runs with a gaps-and-islands window over the
    * synthesized samples, so a decoder that reorders, drops, or
    * mis-signs samples diverges even when `q_multimodal_audio`'s
    * permutation-invariant sums would not. Per-sample-rate rollup. */
  val qMultimodalAudioRuns: Q = Q(
    "q_multimodal_audio_runs",
    (spark, dir) => graft.operators.Codecs
      .wavRunsBatch(media(spark, dir, "wav"), thr = 8192)
      .toDF()
      .groupBy(col("sampleRate").as("sample_rate"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nRuns")).as("n_runs"),
        max(col("longestRun")).as("longest_run"),
        sum(col("nSilent")).as("n_silent"),
        sum(when(col("ok"), 0L).otherwise(1L)).as("n_bad"))
      .orderBy(col("sample_rate")),
    Some("""
      WITH d AS (
        SELECT doc_id, 32 + octet_length(encode(text)) % 64 AS n,
               CAST(8000 * (1 + doc_id % 3) AS INT) AS sr
        FROM documents),
      s AS (SELECT doc_id, sr, unnest(range(0, n)) AS i FROM d),
      v AS (
        SELECT doc_id, sr, i,
               abs(((doc_id * 31 + i * 2654435761) % 65536) - 32768) < 8192
                 AS silent
        FROM s),
      isl AS (
        SELECT doc_id, sr,
               i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
        FROM v WHERE silent),
      runs AS (
        SELECT doc_id, sr, grp, count(*) AS run_len
        FROM isl GROUP BY 1, 2, 3),
      per AS (
        SELECT d.doc_id, d.sr,
               coalesce(r.n_runs, 0) AS n_runs,
               coalesce(r.longest, 0) AS longest,
               coalesce(r.n_silent, 0) AS n_silent
        FROM d LEFT JOIN (
          SELECT doc_id, count(*) AS n_runs, max(run_len) AS longest,
                 sum(run_len) AS n_silent
          FROM runs GROUP BY doc_id) r USING (doc_id))
      SELECT sr AS sample_rate, count(*) AS n_docs,
             CAST(sum(n_runs) AS BIGINT) AS n_runs,
             CAST(max(longest) AS BIGINT) AS longest_run,
             CAST(sum(n_silent) AS BIGINT) AS n_silent,
             CAST(0 AS BIGINT) AS n_bad
      FROM per GROUP BY sr ORDER BY sr
    """.trim))

  /** Cross-format CONTENT dedup — the "same image, different file"
    * problem a byte-hash dedup cannot see: every document's pixel
    * content exists twice, as a BMP and as a transcoded PNG
    * ([[graft.operators.Codecs.documentsAsTranscodedPng]] — the real
    * encoder: filters + zlib + CRC). Both containers are DECODED by
    * their real codecs and matched on the decoded-pixel signature
    * (dims + channel sums + raster-weighted sums) and, separately, on
    * the container md5. Pixel signatures must match for every doc
    * (the transcode preserved content) while zero container hashes
    * match (byte-level dedup finds nothing) — exactly why media dedup
    * must run AFTER decode. Per-dimension rollup; two partition-
    * batched decode passes and a doc-keyed join of metadata-sized
    * tables. */
  val qMultimodalTranscode: Q = Q(
    "q_multimodal_transcode",
    (spark, dir) => {
      val sig = Seq("width", "height", "rSum", "gSum", "bSum",
        "rWsum", "gWsum", "bWsum")
      val bmpRecs = media(spark, dir, "bmp")
      val pngRecs = media(spark, dir, "png_from_bmp")
      val bmpHash = bmpRecs.toDF()
        .select(col("id"), md5(col("media")).as("bmp_md5"))
      val pngHash = pngRecs.toDF()
        .select(col("id"), md5(col("media")).as("png_md5"))
      val a = graft.operators.Codecs.decodeBmpBatch(bmpRecs).toDF()
        .select((col("id") +: sig.map(c => col(c).as(s"a_$c"))): _*)
      val b = graft.operators.Codecs.decodePngBatch(pngRecs).toDF()
        .select((col("id") +: sig.map(c => col(c).as(s"b_$c"))): _*)
      a.join(b, "id").join(bmpHash, "id").join(pngHash, "id")
        .select(col("a_width").as("width"), col("a_height").as("height"),
          sig.map(c => (col(s"a_$c") === col(s"b_$c")).cast("long"))
            .reduce(_ * _).as("pixel_match"),
          (col("bmp_md5") === col("png_md5")).cast("long")
            .as("container_match"))
        .groupBy(col("width"), col("height"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("pixel_match")).as("n_pixel_match"),
          sum(col("container_match")).as("n_container_match"))
        .orderBy(col("width"), col("height"))
    },
    Some("""
      SELECT CAST(4 + doc_id % 5 AS INT) AS width,
             CAST(3 + octet_length(encode(text)) % 4 AS INT) AS height,
             count(*) AS n_docs,
             count(*) AS n_pixel_match,
             CAST(0 AS BIGINT) AS n_container_match
      FROM documents GROUP BY 1, 2 ORDER BY width, height
    """.trim))

  /** REAL µ-law (G.711) decode — the telephony companding standard
    * expanded by exact integer segment/mantissa arithmetic
    * ([[graft.operators.Codecs.ulawToLinear]]): `u = ~b`, magnitude
    * `((u&15)·8+132) << ((u>>4)&7)`, bias 132, sign from the top bit.
    * The oracle replays the expansion with mod/shift SQL over the
    * synthesized byte recipe; `sum_signed` is the sign-sensitive
    * check (an expansion that loses the sign bit still lands near the
    * right `sum_abs`, never the right signed sum). Same
    * partition-batched seam and 3-row rollup as the PCM family. */
  val qMultimodalUlaw: Q = Q(
    "q_multimodal_ulaw",
    (spark, dir) => graft.operators.Codecs
      .decodeUlawBatch(media(spark, dir, "ulaw"))
      .toDF()
      .groupBy(col("sampleRate").as("sample_rate"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nSamples")).as("total_samples"),
        max(col("peak")).as("max_peak"),
        sum(col("sumAbs")).as("sum_abs"),
        sum(col("sumSigned")).as("sum_signed"),
        sum(col("nLoud")).as("n_loud"),
        sum(when(col("ok"), 0L).otherwise(1L)).as("n_bad"))
      .orderBy(col("sample_rate")),
    Some("""
      WITH d AS (
        SELECT doc_id, 24 + octet_length(encode(text)) % 40 AS n,
               CAST(8000 * (1 + doc_id % 3) AS INT) AS sr
        FROM documents),
      s AS (SELECT doc_id, sr, unnest(range(0, n)) AS i FROM d),
      e AS (
        SELECT doc_id, sr, 255 - ((doc_id * 7 + i * 131) % 256) AS u
        FROM s),
      v AS (
        SELECT doc_id, sr,
               CASE WHEN u // 128 = 1
                 THEN 132 - (((u % 16) * 8 + 132) << ((u // 16) % 8))
                 ELSE (((u % 16) * 8 + 132) << ((u // 16) % 8)) - 132
               END AS smp
        FROM e),
      p AS (
        SELECT doc_id, sr, count(*) AS n,
               max(abs(smp)) AS peak, sum(abs(smp)) AS sum_abs,
               sum(smp) AS sum_signed,
               sum(CASE WHEN abs(smp) >= 4096 THEN 1 ELSE 0 END) AS n_loud
        FROM v GROUP BY 1, 2)
      SELECT sr AS sample_rate, count(*) AS n_docs,
             CAST(sum(n) AS BIGINT) AS total_samples,
             CAST(max(peak) AS BIGINT) AS max_peak,
             CAST(sum(sum_abs) AS BIGINT) AS sum_abs,
             CAST(sum(sum_signed) AS BIGINT) AS sum_signed,
             CAST(sum(n_loud) AS BIGINT) AS n_loud,
             CAST(0 AS BIGINT) AS n_bad
      FROM p GROUP BY sr ORDER BY sr
    """.trim))

  /** REAL GIF89a decode — a genuine LZW dictionary decompressor
    * ([[graft.operators.Codecs.lzwDecompress]]): variable-width codes
    * growing 5→12 bits under the classic sync rule (the decoder's
    * dictionary trails the encoder's by one entry, so it widens at
    * 2ⁿ−1 where the encoder widens at 2ⁿ), CLEAR/EOI handling, the
    * KwKwK self-referential case, LSB-first bit unpacking, sub-block
    * reassembly, and palette indirection through the 16-entry global
    * color table. The oracle replays the palette and index recipes
    * arithmetically — it never sees the compressed bits, so the sums
    * only land if the dictionary reconstruction is exact. Same
    * raster-weighted signature and rollup as the BMP/PNG decoders. */
  val qMultimodalGif: Q = Q(
    "q_multimodal_gif",
    (spark, dir) => graft.operators.Codecs
      .decodeGifBatch(media(spark, dir, "gif"))
      .toDF()
      .groupBy(col("width"), col("height"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("rSum")).as("r_sum"),
        sum(col("gSum")).as("g_sum"),
        sum(col("bSum")).as("b_sum"),
        sum(col("rWsum")).as("r_wsum"),
        sum(col("gWsum")).as("g_wsum"),
        sum(col("bWsum")).as("b_wsum"),
        sum(when(col("ok"), 0L).otherwise(1L)).as("n_bad"))
      .orderBy(col("width"), col("height")),
    Some("""
      WITH d AS (
        SELECT doc_id, CAST(5 + doc_id % 4 AS INT) AS w,
               CAST(4 + octet_length(encode(text)) % 3 AS INT) AS h
        FROM documents),
      px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) AS p FROM d),
      g AS (
        SELECT doc_id, w, h, p,
               (doc_id + 3 * (p % w) + 5 * (p // w)) % 16 AS j
        FROM px),
      c AS (
        SELECT doc_id, w, h,
               (doc_id * 5 + 17 * j) % 256 AS r,
               (doc_id * 5 + 17 * j + 41) % 256 AS gg,
               (doc_id * 5 + 17 * j + 82) % 256 AS b,
               p + 1 AS wgt
        FROM g),
      per AS (
        SELECT doc_id, w, h,
               sum(r) AS r_sum, sum(gg) AS g_sum, sum(b) AS b_sum,
               sum(r * wgt) AS r_wsum, sum(gg * wgt) AS g_wsum,
               sum(b * wgt) AS b_wsum
        FROM c GROUP BY 1, 2, 3)
      SELECT w AS width, h AS height, count(*) AS n_docs,
             CAST(sum(r_sum) AS BIGINT) AS r_sum,
             CAST(sum(g_sum) AS BIGINT) AS g_sum,
             CAST(sum(b_sum) AS BIGINT) AS b_sum,
             CAST(sum(r_wsum) AS BIGINT) AS r_wsum,
             CAST(sum(g_wsum) AS BIGINT) AS g_wsum,
             CAST(sum(b_wsum) AS BIGINT) AS b_wsum,
             CAST(0 AS BIGINT) AS n_bad
      FROM per GROUP BY w, h ORDER BY width, height
    """.trim))

  /** Perceptual near-duplicate detection over DECODED pixels — the
    * media twin of the text near-dup family: every document's image
    * exists as the original GIF and a one-pixel-edited variant
    * (byte-identical nowhere after LZW recompression), both are
    * decoded by the real codec and difference-hashed at decode time
    * ([[graft.operators.Codecs.gifDHash]]: bit k = adjacent-luminance
    * comparison, exact integer r+2g+b), and the variants are matched
    * by Hamming distance. A one-pixel edit flips AT MOST one dHash
    * bit, so every pair lands at Hamming ≤ 1 — the property that
    * makes dHash a dedup key where the container md5 is useless. The
    * oracle replays luminance and bit packing arithmetically (lead()
    * over the generated grid) without seeing any container bytes.
    * Histogram over Hamming distances; decode failures would surface
    * as a -1 row the oracle never produces. */
  val qMultimodalPhash: Q = Q(
    "q_multimodal_phash",
    (spark, dir) => {
      // both variants come from STORED containers (the artifact's gif
      // and gif_variant partitions — each side prunes to its own
      // partition directory), dHashed at decode time
      val a = graft.operators.Codecs
        .dHashBatch(media(spark, dir, "gif"), 0).toDF()
        .select(col("id"), col("hash").as("h0"), col("ok").as("ok0"))
      val b = graft.operators.Codecs
        .dHashBatch(media(spark, dir, "gif_variant"), 1).toDF()
        .select(col("id"), col("hash").as("h1"), col("ok").as("ok1"))
      a.join(b, "id")
        .select(when(col("ok0") && col("ok1"),
          bit_count(expr("h0 ^ h1"))).otherwise(-1).as("hamming"))
        .groupBy(col("hamming"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("hamming"))
    },
    Some("""
      WITH d AS (
        SELECT doc_id, CAST(5 + doc_id % 4 AS INT) AS w,
               CAST(4 + octet_length(encode(text)) % 3 AS INT) AS h
        FROM documents),
      px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) AS p FROM d),
      g AS (
        SELECT doc_id, w, p,
               (doc_id + 3 * (p % w) + 5 * (p // w)) % 16 AS j0
        FROM px),
      j AS (
        SELECT doc_id, w, p, j0,
               CASE WHEN p = 0 THEN (j0 + 1) % 16 ELSE j0 END AS j1
        FROM g),
      l AS (
        SELECT doc_id, w, p,
               ((doc_id*5 + 17*j0) % 256) + 2*((doc_id*5 + 17*j0 + 41) % 256)
                 + ((doc_id*5 + 17*j0 + 82) % 256) AS lum0,
               ((doc_id*5 + 17*j1) % 256) + 2*((doc_id*5 + 17*j1 + 41) % 256)
                 + ((doc_id*5 + 17*j1 + 82) % 256) AS lum1
        FROM j),
      n AS (
        SELECT doc_id, w, p, lum0, lum1,
               lead(lum0) OVER (PARTITION BY doc_id ORDER BY p) AS nl0,
               lead(lum1) OVER (PARTITION BY doc_id ORDER BY p) AS nl1
        FROM l),
      hs AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN p % w < w - 1 AND lum0 > nl0
                 THEN CAST(1 AS BIGINT) << ((p // w) * (w - 1) + (p % w))
                 ELSE 0 END) AS BIGINT) AS h0,
               CAST(sum(CASE WHEN p % w < w - 1 AND lum1 > nl1
                 THEN CAST(1 AS BIGINT) << ((p // w) * (w - 1) + (p % w))
                 ELSE 0 END) AS BIGINT) AS h1
        FROM n GROUP BY doc_id)
      SELECT CAST(bit_count(xor(h0, h1)) AS INT) AS hamming,
             count(*) AS n_docs
      FROM hs GROUP BY 1 ORDER BY hamming
    """.trim))

  /** Scene-cut detection over REAL multi-frame decode — the video
    * frame-sampling shape done genuinely: every document becomes an
    * ANIMATED GIF (per-frame Graphic Control Extensions + image
    * descriptors, each frame its own LZW stream), the decoder
    * ([[graft.operators.Codecs.parseAnimatedGif]]) LZW-decodes every
    * frame and dHashes it in-pass, and consecutive-frame Hamming
    * distance recovers the one hard cut each clip contains (frames
    * within a scene are pixel-identical → Hamming 0; across the cut
    * the recipe shifts everywhere). The oracle rebuilds the two scene
    * hashes arithmetically and scores the same >4-bit threshold —
    * including the coincidence case where two scenes happen to hash
    * alike. Per-frame fan-out happens inside the decode partition
    * (1→N with no shuffle); the only exchanges are the ≤3-row per-doc
    * window and the 3-group rollup. */
  val qMultimodalScenes: Q = Q(
    "q_multimodal_scenes",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      // persisted: the per-frame hash table feeds both the pair window
      // and the per-doc frame count, each otherwise re-running the
      // full multi-frame decode over the stored containers
      val fh = graft.operators.Codecs
        .frameHashBatch(media(spark, dir, "gif_anim")).toDF()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val w = Window.partitionBy(col("id")).orderBy(col("frame"))
      val pairs = fh
        .withColumn("nh", lead(col("hash"), 1).over(w))
        .filter(col("nh").isNotNull)
        .select(col("id"), bit_count(expr("hash ^ nh")).as("hamming"))
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("hamming") > 4, 1L).otherwise(0L)).as("n_cuts"),
          sum(when(col("hamming") === 0, 1L).otherwise(0L)).as("n_static"))
      // shared rollup — LEFT-joins pairs so a degraded clip (single
      // ok=false row, no pairs) surfaces with bad > 0 instead of being
      // dropped (see [[graft.operators.Video.frameSceneRollup]])
      graft.operators.Video.frameSceneRollup(fh, pairs)
    },
    Some("""
      WITH d AS (
        SELECT doc_id, CAST(5 + doc_id % 4 AS INT) AS w,
               CAST(4 + octet_length(encode(text)) % 3 AS INT) AS h,
               CAST(2 + doc_id % 3 AS INT) AS k
        FROM documents),
      px AS (SELECT doc_id, w, h, k, unnest(range(0, w * h)) AS p FROM d),
      g AS (
        SELECT doc_id, w, k, p,
               (doc_id + 3 * (p % w) + 5 * (p // w)) % 16 AS j0,
               (doc_id + 100 + 3 * (p % w) + 5 * (p // w)) % 16 AS j1
        FROM px),
      l AS (
        SELECT doc_id, w, k, p,
               ((doc_id*5 + 17*j0) % 256) + 2*((doc_id*5 + 17*j0 + 41) % 256)
                 + ((doc_id*5 + 17*j0 + 82) % 256) AS lum0,
               ((doc_id*5 + 17*j1) % 256) + 2*((doc_id*5 + 17*j1 + 41) % 256)
                 + ((doc_id*5 + 17*j1 + 82) % 256) AS lum1
        FROM g),
      n AS (
        SELECT doc_id, w, k, p, lum0, lum1,
               lead(lum0) OVER (PARTITION BY doc_id ORDER BY p) AS nl0,
               lead(lum1) OVER (PARTITION BY doc_id ORDER BY p) AS nl1
        FROM l),
      hs AS (
        SELECT doc_id, any_value(k) AS k,
               CAST(sum(CASE WHEN p % w < w - 1 AND lum0 > nl0
                 THEN CAST(1 AS BIGINT) << ((p // w) * (w - 1) + (p % w))
                 ELSE 0 END) AS BIGINT) AS h0,
               CAST(sum(CASE WHEN p % w < w - 1 AND lum1 > nl1
                 THEN CAST(1 AS BIGINT) << ((p // w) * (w - 1) + (p % w))
                 ELSE 0 END) AS BIGINT) AS h1
        FROM n GROUP BY doc_id),
      per AS (
        SELECT doc_id, k,
               CAST(bit_count(xor(h0, h1)) AS INT) AS ham
        FROM hs)
      SELECT CAST(k AS BIGINT) AS n_frames, count(*) AS n_docs,
             CAST(sum(k - 1) AS BIGINT) AS n_pairs,
             CAST(sum(CASE WHEN ham > 4 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_cuts,
             CAST(sum(k - 2 + CASE WHEN ham = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_static,
             CAST(0 AS BIGINT) AS n_bad
      FROM per GROUP BY k ORDER BY n_frames
    """.trim))

  /** REAL INTER-FRAME video decode — MS-RLE8 in AVI
    * ([[graft.operators.Video.decodeRleFrames]], `biCompression = 1`):
    * the keyframe paints the bitmap, every later frame delta-jumps to
    * one 4-line band and repaints ONLY it, so frame N's pixels outside
    * the band are frame N−1's — the decoder must carry state across
    * frames (the dependency class the H.264 stub used to hide). Runs,
    * absolute-mode literals, EOL/EOF/delta escapes and the strf
    * palette are all read from the stored container; the oracle
    * replays the last-patch-wins closed form per pixel. Partition-
    * pruned `avi_rle` scan, in-partition sequential decode, ≤6-group
    * rollup. RleCodecSpec pins the inter-frame dependency and
    * CodecFuzzSpec hardens the opcode walk. */
  val qVideoRleFrames: Q = Q(
    "q_video_rle_frames",
    (spark, dir) => graft.operators.Video
      .decodeRleFramesBatch(media(spark, dir, "avi_rle"))
      .toDF()
      .groupBy(col("width"), col("height"))
      .agg(countDistinct(col("id")).as("n_docs"),
        count(lit(1)).as("n_frames"),
        sum(col("ySum")).as("y_sum"),
        sum(col("yWsum")).as("y_wsum"),
        sum(when(col("ok"), 0L).otherwise(1L)).as("n_bad"))
      .orderBy(col("width"), col("height")),
    Some("""
      WITH d AS (
        SELECT doc_id, CAST(8 + (doc_id % 3) * 4 AS INT) AS w,
               CAST(8 + (octet_length(encode(text)) % 2) * 4 AS INT) AS h,
               CAST(3 + doc_id % 3 AS INT) AS k
        FROM documents),
      fr AS (SELECT doc_id, w, h, h // 4 AS bands, unnest(range(0, k)) AS f
             FROM d),
      px AS (SELECT doc_id, w, h, bands, f, unnest(range(0, w * h)) AS p
             FROM fr),
      c AS (
        SELECT doc_id, w, h, bands, f,
               p % w AS x, p // w AS l, (p // w) // 4 AS b
        FROM px),
      v AS (
        SELECT doc_id, w, h, f, x, l,
               f - (((f - b) % bands + bands) % bands) AS m
        FROM c),
      idx AS (
        SELECT doc_id, w, h, f,
               CASE WHEN m >= 1
                 THEN (doc_id * 3 + 7 * m + 5 * (x // 4) + 11 * l + 31) % 200
                 ELSE (doc_id * 3 + 5 * (x // 4) + 11 * l) % 200
               END AS iv,
               ((h - 1 - l) * w + x + 1) AS wgt
        FROM v),
      per AS (
        SELECT doc_id, w, h, f,
               sum((3 * iv + 7) % 256) AS s,
               sum(((3 * iv + 7) % 256) * wgt) AS sw
        FROM idx GROUP BY 1, 2, 3, 4)
      SELECT w AS width, h AS height,
             count(DISTINCT doc_id) AS n_docs, count(*) AS n_frames,
             CAST(sum(s) AS BIGINT) AS y_sum,
             CAST(sum(sw) AS BIGINT) AS y_wsum,
             CAST(0 AS BIGINT) AS n_bad
      FROM per GROUP BY w, h ORDER BY width, height
    """.trim))

  /** MPEG-1 VIDEO I-frame decode ([[graft.operators.Mpeg1]]) — the
    * last codec stub class retired: start-code walk, sequence/GOP/
    * picture headers, slice + macroblock + block layers (address and
    * DC-size VLCs, AC subset + escape), the PUBLISHED default intra
    * quantizer matrix, and a full 8×8 IDCT, over stored `mpg`
    * elementary streams. I-pictures decode to real pixels (flat
    * DC-only blocks — the lossless configuration, so the oracle
    * replays decoded luma arithmetically); P-pictures are counted
    * from their headers and skipped — inter-frame motion
    * reconstruction is the one surface still behind the stub.
    * `y_wsum` weights each block's pixel sum by its raster index, so
    * a misplaced macroblock can never cancel. Partition-pruned `mpg`
    * scan, in-partition decode, ≤2-group rollup; Mpeg1CodecSpec pins
    * golden bits + AC/IDCT behavior, CodecFuzzSpec hardens the
    * walk. */
  val qVideoMpeg1: Q = Q(
    "q_video_mpeg1_iframes",
    (spark, dir) => graft.operators.Mpeg1
      .decodeMpeg1Batch(media(spark, dir, "mpg"))
      .toDF()
      .groupBy(col("width"), col("height"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nFrames").cast("long")).as("n_frames"),
        sum(col("nIFrames").cast("long")).as("n_iframes"),
        sum(col("nPFrames").cast("long")).as("n_pframes"),
        sum(col("lumSum")).as("y_sum"),
        sum(col("lumWsum")).as("y_wsum"),
        sum(when(col("ok"), 0L).otherwise(1L)).as("n_bad"))
      .orderBy(col("width"), col("height")),
    Some("""
      WITH d AS (
        SELECT doc_id, CAST(16 * (1 + doc_id % 2) AS INT) AS w,
               CAST(16 AS INT) AS h,
               CAST(3 + octet_length(encode(text)) % 4 AS INT) AS k
        FROM documents),
      fr AS (SELECT doc_id, w, h, unnest(range(0, k)) AS f FROM d),
      ifr AS (SELECT * FROM fr WHERE f % 3 = 0),
      blk AS (
        SELECT doc_id, w, h, f, unnest(range(0, (w // 8) * 2)) AS b
        FROM ifr),
      v AS (
        SELECT doc_id, w, h, f, b % (w // 8) AS bx, b // (w // 8) AS by,
               16 + (doc_id * 7 + f * 13 + (b % (w // 8)) * 5
                     + (b // (w // 8)) * 11) % 200 AS lum
        FROM blk),
      per AS (
        SELECT doc_id, w, h, sum(64 * lum) AS s,
               sum(64 * lum * (by * (w // 8) + bx + 1)) AS sw
        FROM v GROUP BY 1, 2, 3),
      cnt AS (
        SELECT doc_id, w, h, k AS nf, (k + 2) // 3 AS ni FROM d)
      SELECT c.w AS width, c.h AS height, count(*) AS n_docs,
             CAST(sum(c.nf) AS BIGINT) AS n_frames,
             CAST(sum(c.ni) AS BIGINT) AS n_iframes,
             CAST(sum(c.nf - c.ni) AS BIGINT) AS n_pframes,
             CAST(sum(p.s) AS BIGINT) AS y_sum,
             CAST(sum(p.sw) AS BIGINT) AS y_wsum,
             CAST(0 AS BIGINT) AS n_bad
      FROM cnt c JOIN per p USING (doc_id)
      GROUP BY c.w, c.h ORDER BY width, height
    """.trim))

  /** REAL JPEG decode — a from-scratch T.81 baseline codec
    * ([[graft.operators.Jpeg]]): marker walk, canonical Huffman
    * decoding from the DHT bit-length counts, DC prediction, zigzag
    * run/size AC expansion, dequantization, and a full 8×8 IDCT.
    * The stored containers ([[graft.operators.MediaArtifact]] format
    * `jpeg`) are grayscale images of even-valued FLAT 8×8 blocks —
    * the one configuration a lossy codec reproduces exactly (DC-only
    * blocks, Q(0,0) = 16, even level-shifted values; see the Jpeg
    * Scaladoc) — so the DuckDB oracle replays the DECODED pixels
    * arithmetically while the decode exercises the real entropy and
    * transform path. `n_nongray` pins the grayscale contract
    * (r = g = b on every pixel); textured/color behavior is pinned in
    * JpegCodecSpec against the JDK's independent ImageIO codec.
    * Partition-batched decode over the pruned `jpeg` partition,
    * ≤6-group rollup. */
  val qMultimodalJpeg: Q = Q(
    "q_multimodal_jpeg",
    (spark, dir) => graft.operators.Jpeg
      .decodeJpegBatch(media(spark, dir, "jpeg"))
      .toDF()
      .groupBy(col("width"), col("height"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("rSum")).as("y_sum"),
        sum(col("rWsum")).as("y_wsum"),
        sum(when(col("rSum") === col("gSum") &&
          col("gSum") === col("bSum"), 0L).otherwise(1L)).as("n_nongray"),
        sum(when(col("ok"), 0L).otherwise(1L)).as("n_bad"))
      .orderBy(col("width"), col("height")),
    Some("""
      WITH d AS (
        SELECT doc_id, CAST(8 * (1 + doc_id % 3) AS INT) AS w,
               CAST(8 * (1 + octet_length(encode(text)) % 2) AS INT) AS h
        FROM documents),
      px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) AS p FROM d),
      c AS (
        SELECT doc_id, w, h,
               2 * ((doc_id * 5 + 11 * ((p % w) // 8)
                 + 23 * ((p // w) // 8)) % 128) AS v,
               p + 1 AS wgt
        FROM px),
      per AS (
        SELECT doc_id, w, h, sum(v) AS s, sum(v * wgt) AS sw
        FROM c GROUP BY 1, 2, 3)
      SELECT w AS width, h AS height, count(*) AS n_docs,
             CAST(sum(s) AS BIGINT) AS y_sum,
             CAST(sum(sw) AS BIGINT) AS y_wsum,
             CAST(0 AS BIGINT) AS n_nongray,
             CAST(0 AS BIGINT) AS n_bad
      FROM per GROUP BY w, h ORDER BY width, height
    """.trim))

  /** Media-lake catalog — the metadata-only rollup every blob store
    * serves without touching a single media page: per-(format, mime)
    * document counts plus byte mass for the formats whose container
    * size is an arithmetic function of the source (the compressed
    * formats report 0 — their size depends on deflate/LZW/Huffman
    * output, which the oracle cannot replay). `format` is the
    * artifact's PARTITION column and `n_bytes` is stored beside the
    * blob, so the scan reads no `media` bytes at all —
    * MediaArtifactSpec pins the pruned ReadSchema in the plan. */
  val qMediaCatalog: Q = Q(
    "q_media_catalog",
    (spark, dir) => graft.operators.MediaArtifact.table(spark, dir)
      .groupBy(col("format"), col("mime"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("format").isin(
          "plain", "container", "wav", "ulaw", "bmp", "tiff"),
          col("n_bytes")).otherwise(0L)).as("known_bytes"))
      .orderBy(col("format"), col("mime")),
    Some("""
      WITH d AS (
        SELECT doc_id AS id, octet_length(encode(text)) AS len
        FROM documents),
      rows AS (
        SELECT 'plain' AS format, 'text/plain' AS mime,
               CAST(len AS BIGINT) AS kb FROM d
        UNION ALL
        SELECT 'container',
               CASE WHEN id % 7 = 0 THEN 'image/png'
                 ELSE CASE id % 3 WHEN 0 THEN 'image/png'
                   WHEN 1 THEN 'image/gif' ELSE 'image/jpeg' END END,
               CAST(len + CASE id % 3 WHEN 0 THEN 24 WHEN 1 THEN 10
                 ELSE 11 END AS BIGINT) FROM d
        UNION ALL
        SELECT 'wav', 'audio/wav',
               CAST(44 + 2 * (32 + len % 64) AS BIGINT) FROM d
        UNION ALL
        SELECT 'ulaw', 'audio/basic',
               CAST(44 + 24 + len % 40 AS BIGINT) FROM d
        UNION ALL
        SELECT 'bmp', 'image/bmp',
               CAST(54 + ((4 + id % 5) * 3 + 3) // 4 * 4
                 * (3 + len % 4) AS BIGINT) FROM d
        UNION ALL SELECT 'png', 'image/png', CAST(0 AS BIGINT) FROM d
        UNION ALL SELECT 'png_from_bmp', 'image/png', CAST(0 AS BIGINT) FROM d
        UNION ALL SELECT 'gif', 'image/gif', CAST(0 AS BIGINT) FROM d
        UNION ALL SELECT 'gif_variant', 'image/gif', CAST(0 AS BIGINT) FROM d
        UNION ALL SELECT 'gif_anim', 'image/gif', CAST(0 AS BIGINT) FROM d
        UNION ALL SELECT 'jpeg', 'image/jpeg', CAST(0 AS BIGINT) FROM d
        UNION ALL SELECT 'avi', 'video/x-msvideo', CAST(0 AS BIGINT) FROM d
        UNION ALL SELECT 'avi_rle', 'video/x-msvideo', CAST(0 AS BIGINT) FROM d
        UNION ALL SELECT 'mp3', 'audio/mpeg', CAST(0 AS BIGINT) FROM d
        UNION ALL
        SELECT 'tiff', 'image/tiff',
               CAST(128 + 3 * (5 + id % 4) * (3 + len % 5) AS BIGINT) FROM d
        UNION ALL SELECT 'mpg', 'video/mpeg', CAST(0 AS BIGINT) FROM d)
      SELECT format, mime, count(*) AS n_docs,
             CAST(sum(kb) AS BIGINT) AS known_bytes
      FROM rows GROUP BY 1, 2 ORDER BY format, mime
    """.trim))

  /** REAL TIFF decode — baseline little-endian uncompressed RGB8
    * ([[graft.operators.Codecs.parseTiff]]): the tag-DIRECTORY
    * container (an IFD of typed entries) the fixed-header formats
    * don't exercise — the parser must walk entries by their 12-byte
    * layout, honor value-vs-offset packing (BitsPerSample SHORT[3]
    * lives behind an offset), and address the pixel strip by tag.
    * Same raster-weighted channel-sum rollup as `q_multimodal_pixels`
    * (unpadded rows and top-down order are TIFF's quirks vs BMP's
    * padded bottom-up BGR); the oracle replays the synthesis
    * arithmetic over a generated grid. */
  val qMultimodalTiff: Q = Q(
    "q_multimodal_tiff",
    (spark, dir) => graft.operators.Codecs
      .decodeTiffBatch(media(spark, dir, "tiff"))
      .toDF()
      .groupBy(col("width"), col("height"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("rSum")).as("r_sum"),
        sum(col("gSum")).as("g_sum"),
        sum(col("bSum")).as("b_sum"),
        sum(col("rWsum")).as("r_wsum"),
        sum(col("gWsum")).as("g_wsum"),
        sum(col("bWsum")).as("b_wsum"),
        sum(when(col("ok"), 0L).otherwise(1L)).as("n_bad"))
      .orderBy(col("width"), col("height")),
    Some("""
      WITH d AS (
        SELECT doc_id, CAST(5 + doc_id % 4 AS INT) AS w,
               CAST(3 + octet_length(encode(text)) % 5 AS INT) AS h
        FROM documents),
      px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) AS p FROM d),
      g AS (SELECT doc_id, w, h, p % w AS x, p // w AS y FROM px),
      c AS (
        SELECT doc_id, w, h,
               (doc_id * 3 + 11 * x + 5 * y) % 256 AS r,
               (doc_id * 3 + 11 * x + 5 * y + 41) % 256 AS gg,
               (doc_id * 3 + 11 * x + 5 * y + 82) % 256 AS b,
               y * w + x + 1 AS wgt
        FROM g),
      per AS (
        SELECT doc_id, w, h,
               sum(r) AS r_sum, sum(gg) AS g_sum, sum(b) AS b_sum,
               sum(r * wgt) AS r_wsum, sum(gg * wgt) AS g_wsum,
               sum(b * wgt) AS b_wsum
        FROM c GROUP BY 1, 2, 3)
      SELECT w AS width, h AS height, count(*) AS n_docs,
             CAST(sum(r_sum) AS BIGINT) AS r_sum,
             CAST(sum(g_sum) AS BIGINT) AS g_sum,
             CAST(sum(b_sum) AS BIGINT) AS b_sum,
             CAST(sum(r_wsum) AS BIGINT) AS r_wsum,
             CAST(sum(g_wsum) AS BIGINT) AS g_wsum,
             CAST(sum(b_wsum) AS BIGINT) AS b_wsum,
             CAST(0 AS BIGINT) AS n_bad
      FROM per GROUP BY w, h ORDER BY width, height
    """.trim))

  /** MP3 duration/bitrate audit — a REAL MPEG-1 Layer III FRAME-HEADER
    * walk ([[graft.operators.Codecs.parseMp3]]) over stored blobs: the
    * stream self-describes through its 4-byte headers (sync word,
    * version/layer bits, bitrate/samplerate table indices, padding
    * bit), and frame length = 144·bitrate/samplerate + padding, so
    * frame count, CBR/VBR, duration and bitrate stats need no audio
    * decode at all — the `q_media_catalog` metadata-only pattern
    * applied INSIDE the container. A walk that misreads the bitrate
    * table, the padding bit, or a frame length loses sync and
    * surfaces in `n_bad`; the oracle replays the synthesis recipe's
    * bitrate arithmetic (never the byte walk — that asymmetry is the
    * point). Corruption behavior fuzz-pinned in CodecFuzzSpec. */
  val qAudioMp3Meta: Q = Q(
    "q_audio_mp3_meta",
    (spark, dir) => graft.operators.Codecs
      .decodeMp3Batch(media(spark, dir, "mp3"))
      .toDF()
      .groupBy(col("sampleRate").as("sample_rate"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nFrames")).as("n_frames"),
        sum(col("durationMs")).as("total_ms"),
        sum(when(col("isCbr"), 1L).otherwise(0L)).as("n_cbr"),
        min(col("minKbps")).as("min_kbps"),
        max(col("maxKbps")).as("max_kbps"),
        sum(when(col("ok"), 0L).otherwise(1L)).as("n_bad"))
      .orderBy(col("sample_rate")),
    Some("""
      WITH d AS (
        SELECT doc_id AS id, octet_length(encode(text)) AS len
        FROM documents),
      base AS (
        SELECT id, 4 + len % 8 AS f_cnt,
               CASE id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                 ELSE 32000 END AS sr,
               id % 2 = 1 AS vbr
        FROM d),
      fr AS (
        SELECT id, sr, vbr, f_cnt, unnest(range(0, f_cnt)) AS f
        FROM base),
      kb AS (
        SELECT id, sr, f_cnt,
               [32,40,48,56,64,80,96,112,128,160,192,224,256,320]
                 [CASE WHEN vbr THEN 1 + (id + 7*f) % 14
                       ELSE 1 + id % 14 END] AS kbps
        FROM fr),
      per AS (
        SELECT id, sr, any_value(f_cnt) AS nf,
               min(kbps) AS mn, max(kbps) AS mx
        FROM kb GROUP BY id, sr)
      SELECT CAST(sr AS INT) AS sample_rate, count(*) AS n_docs,
             CAST(sum(nf) AS BIGINT) AS n_frames,
             CAST(sum(nf * 1152 * 1000 // sr) AS BIGINT) AS total_ms,
             CAST(sum(CASE WHEN mn = mx THEN 1 ELSE 0 END) AS BIGINT)
               AS n_cbr,
             CAST(min(mn) AS INT) AS min_kbps,
             CAST(max(mx) AS INT) AS max_kbps,
             CAST(0 AS BIGINT) AS n_bad
      FROM per GROUP BY sr ORDER BY sample_rate
    """.trim))

  /** REAL video frame decode — a from-scratch AVI (RIFF) demuxer over
    * Motion-JPEG frames ([[graft.operators.Video]]): the stored
    * containers carry genuine AVI structure (`avih`/`strh`/`strf`
    * headers, `LIST('movi')` with one `00dc` chunk per frame), the
    * demuxer walks it by little-endian declared sizes, and every
    * frame's bytes go through the real T.81 JPEG decoder. Per-
    * dimension rollup of decoded per-frame pixel sums and raster-
    * weighted sums; frames are grayscale even-valued flat blocks (the
    * exact-decode profile) so the oracle replays the DECODED pixels
    * arithmetically. Demux + decode happen once per clip inside the
    * partition; frame rows fan out 1→N with no shuffle. */
  val qVideoFrames: Q = Q(
    "q_video_frames",
    (spark, dir) => graft.operators.Video
      .decodeFramesBatch(media(spark, dir, "avi"))
      .toDF()
      .groupBy(col("width"), col("height"))
      .agg(countDistinct(col("id")).as("n_docs"),
        count(lit(1)).as("n_frames"),
        sum(col("ySum")).as("y_sum"),
        sum(col("yWsum")).as("y_wsum"),
        sum(when(col("ok"), 0L).otherwise(1L)).as("n_bad"))
      .orderBy(col("width"), col("height")),
    Some("""
      WITH d AS (
        SELECT doc_id, CAST(8 * (1 + doc_id % 3) AS INT) AS w,
               CAST(8 * (1 + octet_length(encode(text)) % 2) AS INT) AS h,
               CAST(2 + doc_id % 3 AS INT) AS k
        FROM documents),
      fr AS (SELECT doc_id, w, h, k, unnest(range(0, k)) AS f FROM d),
      sc AS (
        SELECT doc_id, w, h, f,
               CASE WHEN f < 1 + doc_id % (k - 1) THEN 0 ELSE 1 END AS scene
        FROM fr),
      px AS (SELECT doc_id, w, h, f, scene, unnest(range(0, w * h)) AS p
             FROM sc),
      c AS (
        SELECT doc_id, w, h, f,
               2 * ((doc_id * 5 + 100 * scene + 11 * ((p % w) // 8)
                 + 23 * ((p // w) // 8)) % 128) AS v,
               p + 1 AS wgt
        FROM px),
      per AS (
        SELECT doc_id, w, h, f, sum(v) AS s, sum(v * wgt) AS sw
        FROM c GROUP BY 1, 2, 3, 4)
      SELECT w AS width, h AS height,
             count(DISTINCT doc_id) AS n_docs, count(*) AS n_frames,
             CAST(sum(s) AS BIGINT) AS y_sum,
             CAST(sum(sw) AS BIGINT) AS y_wsum,
             CAST(0 AS BIGINT) AS n_bad
      FROM per GROUP BY w, h ORDER BY width, height
    """.trim))

  /** Scene-cut detection over REAL video — the multi-frame curation
    * job done genuinely end to end: demux the stored AVI, JPEG-decode
    * every frame, compare consecutive frames' decoded-pixel
    * signatures (plain + raster-weighted sums), and recover the one
    * hard cut each clip contains. Frames within a scene are
    * pixel-identical → both signatures equal; across the cut the
    * recipe shifts everywhere. The oracle rebuilds the per-frame
    * signatures arithmetically and scores the same comparison. The
    * only exchanges are the ≤3-row per-clip window and the rollup. */
  val qVideoScenes: Q = Q(
    "q_video_scenes",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      // persisted: the frame table feeds both the pair window and the
      // per-clip frame count, each otherwise re-running demux + decode
      val fh = graft.operators.Video
        .decodeFramesBatch(media(spark, dir, "avi")).toDF()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val w = Window.partitionBy(col("id")).orderBy(col("frame"))
      val pairs = fh
        .withColumn("ns", lead(col("ySum"), 1).over(w))
        .withColumn("nw", lead(col("yWsum"), 1).over(w))
        .filter(col("ns").isNotNull)
        .select(col("id"),
          (col("ySum") =!= col("ns") || col("yWsum") =!= col("nw")).as("cut"))
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("cut"), 1L).otherwise(0L)).as("n_cuts"),
          sum(when(col("cut"), 0L).otherwise(1L)).as("n_static"))
      // shared rollup — LEFT-joins pairs so a degraded clip (single
      // ok=false row, no pairs) surfaces with bad > 0 instead of being
      // dropped (see [[graft.operators.Video.frameSceneRollup]])
      graft.operators.Video.frameSceneRollup(fh, pairs)
    },
    Some("""
      WITH d AS (
        SELECT doc_id, CAST(8 * (1 + doc_id % 3) AS INT) AS w,
               CAST(8 * (1 + octet_length(encode(text)) % 2) AS INT) AS h,
               CAST(2 + doc_id % 3 AS INT) AS k
        FROM documents),
      fr AS (SELECT doc_id, w, h, k, unnest(range(0, k)) AS f FROM d),
      sc AS (
        SELECT doc_id, w, h, k, f,
               CASE WHEN f < 1 + doc_id % (k - 1) THEN 0 ELSE 1 END AS scene
        FROM fr),
      px AS (SELECT doc_id, w, h, k, f, scene, unnest(range(0, w * h)) AS p
             FROM sc),
      c AS (
        SELECT doc_id, k, f,
               2 * ((doc_id * 5 + 100 * scene + 11 * ((p % w) // 8)
                 + 23 * ((p // w) // 8)) % 128) AS v,
               p + 1 AS wgt
        FROM px),
      per AS (
        SELECT doc_id, any_value(k) AS k, f,
               sum(v) AS s, sum(v * wgt) AS sw
        FROM c GROUP BY doc_id, f),
      pairs AS (
        SELECT doc_id, k, s, sw,
               lead(s) OVER (PARTITION BY doc_id ORDER BY f) AS ns,
               lead(sw) OVER (PARTITION BY doc_id ORDER BY f) AS nsw
        FROM per),
      agg AS (
        SELECT doc_id, any_value(k) AS k, count(*) AS n_pairs,
               sum(CASE WHEN s <> ns OR sw <> nsw THEN 1 ELSE 0 END) AS n_cuts,
               sum(CASE WHEN s = ns AND sw = nsw THEN 1 ELSE 0 END) AS n_static
        FROM pairs WHERE ns IS NOT NULL GROUP BY doc_id)
      SELECT CAST(k AS BIGINT) AS n_frames, count(*) AS n_docs,
             CAST(sum(n_pairs) AS BIGINT) AS n_pairs,
             CAST(sum(n_cuts) AS BIGINT) AS n_cuts,
             CAST(sum(n_static) AS BIGINT) AS n_static,
             CAST(0 AS BIGINT) AS n_bad
      FROM agg GROUP BY k ORDER BY n_frames
    """.trim))

  def all: Seq[Q] = Seq(
    qMultimodalAudio, qMultimodalPixels, qMultimodalPng, qMultimodalAudioRuns,
    qMultimodalTranscode, qMultimodalUlaw, qMultimodalGif, qMultimodalPhash,
    qMultimodalScenes, qMultimodalJpeg, qMediaCatalog, qVideoFrames,
    qVideoScenes, qVideoRleFrames, qVideoMpeg1, qAudioMp3Meta, qMultimodalTiff,
    qTextTokens, qTextQuality, qTextLangid, qTextFingerprint, qMultimodalDecode, qMultimodalSniff, qFeatureHash,
    qTextBpeTokens, qTextRedact, qTextRepetition,
    qMultimodalFeatures, qMultimodalFrames, qCorpusMixture,
    qTextRollingFp, qMultimodalResize, qSeqlenHistogram, qPackChunks,
    qTextTfidf, qTextBm25, qCorpusPrep, qTextGates, qTextBigrams,
    qChunkBoundaries, qTextLmScore, qCcnetBuckets, qTextPmi, qTokenizerFertility,
    qSourceEntropy, qTextReadability, qTextTopics, qTopicTerms,
    qTopicPurity)
}
