package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID-style profile
  * classification, document fingerprinting, and shingling (the input to
  * MinHash/Jaccard dedup in [[Dedup]]).
  *
  * Everything is a pure `Column` expression (codegen'd, no UDFs), so
  * the operators run inside whole-stage codegen and scale linearly with
  * the corpus — no shuffle is introduced by any function here.
  */
object TextAnalysis {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(text, "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** High-frequency function words used for quality/profile scoring. */
  val stopwords: Seq[String] = Seq("the", "a")

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isin(stopwords.map(x => x: Any): _*)))

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** Mean token length (codepoints), computed as sum(len)/n in double. */
  def avgTokenLen(text: Column): Column = {
    val toks = tokens(text)
    aggregate(transform(toks, t => length(t)), lit(0), (acc, x) => acc + x)
      .cast("double") / size(toks)
  }

  /** Composite quality score in [0,1] — the standard shape of corpus
    * quality heuristics (length saturation + low stopword mass + lexical
    * diversity). Deterministic, order-fixed double arithmetic. */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    val stop = stopwordCount(text).cast("double")
    val uniq = distinctTokenCount(text).cast("double")
    round(
      least(n / 100.0, lit(1.0)) * 0.3 +
        (lit(1.0) - stop / n) * 0.3 +
        (uniq / n) * 0.4,
      6)
  }

  /** Token-profile classifier — the language-ID operator shape
    * (profile scores + argmax with deterministic tie-break). The
    * synthetic corpus has no natural-language function words, so the
    * profiles are domain-term sets; with real corpora these would be
    * per-language character n-gram / stopword profiles. */
  val profiles: Seq[(String, Seq[String])] = Seq(
    "olap" -> Seq("join", "query", "table", "scan", "agg"),
    "stream" -> Seq("stream", "batch", "window", "merge"),
    "storage" -> Seq("row", "column", "data", "key"))

  def profileScore(text: Column, terms: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(terms.map(x => x: Any): _*)))

  /** Argmax over profile scores; ties break toward the earlier profile
    * in the declared order. */
  def predictedProfile(text: Column): Column = {
    val scored = profiles.map { case (name, terms) => (name, profileScore(text, terms)) }
    scored.tail.foldLeft((scored.head._2, lit(scored.head._1))) {
      case ((bestScore, bestName), (name, score)) =>
        (when(score > bestScore, score).otherwise(bestScore),
          when(score > bestScore, lit(name)).otherwise(bestName))
    }._2
  }

  /** Canonical-form document fingerprint: lowercase, strip
    * non-alphanumerics, collapse whitespace, md5. Identical fingerprints
    * = dups up to formatting (the exact-dedup key at scale). */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", ""), "\\s+", " ")))

  /** Word n-gram shingles (default 5) — MinHash/Jaccard input. Returns
    * an empty array for docs shorter than n tokens. Native codegen'd
    * expression ([[graft.functions.WordShingles]]): one split + one
    * loop per row. */
  def shingles(text: Column, n: Int = 5): Column =
    graft.functions.TextExpressions.wordShingles(text, n)

  /** Built-in-only formulation of [[shingles]] (n shifted slices zipped
    * pairwise — NOT a `transform(sequence, i => slice(toks, ...))`
    * index loop, which re-evaluates the regex split once per output
    * gram because outer expressions inside HOF lambdas re-evaluate on
    * every lambda call). Kept as the differential-test twin of the
    * native expression. */
  def shinglesHof(text: Column, n: Int = 5): Column = {
    val toks = tokens(text)
    val gramCount = size(toks) - (n - 1)
    val joined = (1 until n).foldLeft(slice(toks, lit(1), gramCount)) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k + 1), gramCount),
        (a, b) => concat(a, lit(" "), b))
    }
    when(size(toks) >= n, joined).otherwise(array().cast("array<string>"))
  }

  /** BPE-style pre-tokenizer classes (GPT-2-shaped: a token is an
    * optionally-space-prefixed maximal run of letters, digits, or other
    * non-space symbols). The classes are disjoint, so per-class match
    * counts sum to the combined count. Restricted to the RE2 ∩ Java
    * common dialect (checked below via the same [[graft.streaming
    * .Re2Dialect]] guard the P5 filter uses) so the identical pattern
    * runs under java.util.regex here and RE2 in the DuckDB oracle. */
  val BpeAlpha: String = " ?[a-zA-Z]+"
  val BpeNum: String = " ?[0-9]+"
  val BpeOther: String = " ?[^a-zA-Z0-9\\s]+"
  val BpeToken: String = s"$BpeAlpha|$BpeNum|$BpeOther"
  Seq(BpeAlpha, BpeNum, BpeOther, BpeToken).foreach { p =>
    graft.streaming.Re2Dialect.check(p).foreach(reason =>
      throw new IllegalStateException(s"BPE pattern '$p' not portable: $reason"))
  }

  /** Karp-Rabin rolling-hash parameters (Horner with a mod per step:
    * intermediates stay ≤ P·B + 2³² — inside BIGINT for both
    * engines). */
  val RollB: Long = 1000003L
  val RollP: Long = 2147483647L
  val RollK: Int = 4

  /** 32-bit integer per token: first md5 chunk — the same
    * engine-portable token hashing the dedup family uses. */
  def tokenInts(text: Column): Column =
    transform(tokens(text), t =>
      conv(substring(md5(t), 1, 8), 16, 10).cast("long"))

  /** Rolling k-gram hashes over the token stream (Karp-Rabin /
    * winnowing style): h(i) = Horner(tint[i..i+k-1]) mod P. Native
    * codegen'd expression ([[graft.functions.RollingTokenHashes]]):
    * one split, one md5 per token, one Horner pass per row. */
  def rollingHashes(text: Column, k: Int = RollK): Column =
    graft.functions.TextExpressions.rollingTokenHashes(text, k, RollB, RollP)

  /** Built-in-only formulation of [[rollingHashes]] (k shifted slices
    * folded with zip_with — the shingle lesson: no computed expression
    * inside an index-loop lambda). Kept as the differential-test twin
    * of the native expression. */
  def rollingHashesHof(text: Column, k: Int = RollK): Column = {
    val tints = tokenInts(text)
    val cnt = size(tints) - (k - 1)
    val first = transform(slice(tints, lit(1), cnt), x => x % lit(RollP))
    val rolled = (1 until k).foldLeft(first) { (acc, j) =>
      zip_with(acc, slice(tints, lit(j + 1), cnt),
        (h, t) => (h * lit(RollB) + t) % lit(RollP))
    }
    when(size(tints) >= k, rolled).otherwise(array().cast("array<bigint>"))
  }

  /** Occurrence count of the most frequent element of an array,
    * computed entirely in-row: sort, then the longest run of equal
    * neighbours. Keeps per-document statistics (like repetition
    * scoring) a map-only pass — a corpus-scale groupBy(doc, gram)
    * shuffle for a per-doc answer is wasted movement. */
  def maxRunCount(arr: Column): Column =
    aggregate(array_sort(arr),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, g) => {
        val run = when(g === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1L))
        struct(g.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Count of BPE-ish pre-tokens matching `pattern`. */
  def bpeTokenCount(text: Column, pattern: String = BpeToken): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Total codepoints across matches of `pattern` — the per-class
    * "character mass" (space prefixes included), exact BIGINT. */
  def bpeCharMass(text: Column, pattern: String): Column =
    aggregate(regexp_extract_all(text, lit(pattern), lit(0)),
      lit(0L), (acc, m) => acc + length(m).cast("long"))
}
