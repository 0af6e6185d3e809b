package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines:
  * normalization, content fingerprinting, token counting, quality scoring,
  * language ID. All pure `functions._` composition — codegen'd, no UDFs —
  * so they run at scan speed over 100 TB of documents.
  */
object TextFunctions {

  /** Canonical normalization used by fingerprinting/dedup: lowercase, strip
    * non-alphanumerics to spaces, collapse runs, trim.
    */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  /** Content-defined document fingerprint (md5 of normalized text): the
    * exact-dedup key. Stable across engines — md5 is md5 everywhere.
    */
  def fingerprintMd5(c: Column): Column = md5(normalizeText(c))

  /** Whitespace tokens of the normalized text (empty text → empty array,
    * not [""]).
    */
  def tokens(c: Column): Column =
    // native single-pass twin of split(normalizeText(c)) — identical
    // output (t03's oracle proves the kernel against string_split), one
    // fused pass instead of two regex rewrites + a split
    graft.plans.NativeFunctions.normTokens(c)

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish token estimate: letter runs, digit runs, and single
    * punctuation marks each count as one token (a cheap proxy for subword
    * tokenizer counts).
    */
  def bpeishTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))

  /** Word n-grams (as joined strings) of the normalized text. n >= 1;
    * n == 1 is the distinct word set.
    */
  def wordNgrams(c: Column, n: Int): Column = {
    if (n == 1) tokens(c)
    else {
      // slide a window of n over the token array with transform+slice;
      // guard short docs — sequence(1, 0) would run DESCENDING in Spark.
      // CRITICAL: the token array is BOUND ONCE as a lambda variable via
      // transform(array(tokens), ts -> ...). Referencing the tokens(c)
      // EXPRESSION inside the window lambda instead would re-run the
      // normalize-regex + split for every window position — O(n²) per row.
      element_at(transform(array(tokens(c)), ts => {
        val count = size(ts) - (n - 1)
        when(count < 1, array().cast(ArrayType(StringType)))
          .otherwise(transform(sequence(lit(1), count),
            i => array_join(slice(ts, i, lit(n)), " ")))
      }), 1)
    }
  }

  def distinctWordNgrams(c: Column, n: Int): Column = array_distinct(wordNgrams(c, n))

  /** Winnowing document fingerprint (the MOSS scheme): hash every word
    * k-gram, slide a window of `w` hashes, keep each window's minimum,
    * dedup + sort. Guarantees any shared run of ≥ w+k-1 tokens between two
    * documents shares a fingerprint, at ~1/w the storage of full shingling
    * — the scale-friendly containment/fingerprint index.
    *
    * The k-gram hash is the first 8 md5 hex digits as an integer, chosen
    * because it is engine-portable (bit-identical in any SQL engine with
    * md5 — the DuckDB oracle reproduces it), unlike engine-internal hashes.
    */
  def winnowingFingerprint(c: Column, k: Int = 3, w: Int = 4): Column =
    // fused native kernel (normalize → byte-range md5 k-gram hashes →
    // O(n) monotonic-deque window minima → sorted distinct); same
    // semantics and oracle hash-parity as the former transform/slice/
    // md5/conv column pipeline, without its O(n·w) slice allocations
    graft.plans.NativeFunctions.winnowFp(c, k, w)

  // ---- quality scoring: cheap, deterministic per-document features

  val DefaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "by", "at", "this", "that")

  def stopwordCount(c: Column, stopwords: Seq[String] = DefaultStopwords): Column = {
    val sw = array(stopwords.map(lit): _*)
    size(filter(tokens(c), t => array_contains(sw, t)))
  }

  def alphaRatio(c: Column): Column = {
    val alpha = length(regexp_replace(c, "[^a-zA-Z]", ""))
    (alpha.cast(DoubleType) / greatest(length(c), lit(1)).cast(DoubleType))
  }

  /** Mean token length, stopword ratio, alpha ratio — the length/punct/
    * stopword family of quality heuristics.
    */
  def qualityScore(c: Column): Column = {
    // token array bound ONCE (the tokenCount + stopwordCount spelling
    // evaluates the normalize kernel twice per row)
    val sw = array(DefaultStopwords.map(lit): _*)
    element_at(transform(array(tokens(c)), ts => {
      val nTok = size(ts).cast(DoubleType)
      val stopRatio = size(filter(ts, t => array_contains(sw, t)))
        .cast(DoubleType) / greatest(nTok, lit(1.0))
      val lenOk = when(nTok >= 5 && nTok <= 100000, lit(1.0)).otherwise(lit(0.0))
      // weights: presence of stopwords and alphabetic content signal prose
      lenOk * (lit(0.5) * stopRatio + lit(0.5) * alphaRatio(c))
    }), 1)
  }

  /** The Gopher rule stopword list (Rae et al. 2021, Appendix A): a doc
    * must contain at least two of these to look like running prose.
    */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style quality-rule metrics (Rae et al. 2021, Appendix A) as
    * ONE struct column — token array bound once (same trick as
    * [[qualityScore]]), every field a scalar the caller projects out:
    * word count, mean word length, symbol-to-word ratio (# and ...),
    * bullet-start and ellipsis-end line fractions, alphabetic-word
    * fraction, distinct-stopword count, and the composed `keep` flag
    * (all rules pass). Thresholds are the published ones: 50..100000
    * words, mean length 3..10, symbols <= 0.1, bullets <= 0.9, ellipsis
    * <= 0.3, alpha-words >= 0.8, >= 2 stopwords.
    */
  def gopherMetrics(text: Column): Column = {
    val sw = array(GopherStopwords.map(lit): _*)
    val lines = split(text, "\n")
    val nLines = greatest(size(lines), lit(1)).cast(DoubleType)
    val hashCnt = (length(text) - length(translate(text, "#", "")))
      .cast(DoubleType)
    val ellCnt = ((length(text) -
      length(regexp_replace(text, "\\.\\.\\.", ""))) / lit(3.0))
    val bulletLines = size(filter(lines, l =>
      ltrim(l).startsWith("-") || ltrim(l).startsWith("*") ||
        ltrim(l).startsWith("•"))).cast(DoubleType)
    val ellLines = size(filter(lines, l =>
      rtrim(l).endsWith("...") || rtrim(l).endsWith("…"))).cast(DoubleType)
    element_at(transform(array(tokens(text)), ts => {
      val n = size(ts)
      val nD = n.cast(DoubleType)
      val meanLen = when(n > 0,
        aggregate(ts, lit(0L), (a, x) => a + length(x)).cast(DoubleType) / nD)
        .otherwise(lit(0.0))
      val alphaFrac = when(n > 0,
        size(filter(ts, t => t.rlike("[a-z]"))).cast(DoubleType) / nD)
        .otherwise(lit(0.0))
      val symbolRatio = when(n > 0, (hashCnt + ellCnt) / nD).otherwise(lit(0.0))
      val bulletFrac = bulletLines / nLines
      val ellipsisFrac = ellLines / nLines
      val stopDistinct = size(array_intersect(ts, sw))
      val keep = (n >= 50) && (n <= 100000) &&
        (meanLen >= 3.0) && (meanLen <= 10.0) &&
        (symbolRatio <= 0.1) && (bulletFrac <= 0.9) &&
        (ellipsisFrac <= 0.3) && (alphaFrac >= 0.8) && (stopDistinct >= 2)
      struct(
        n.cast("long").as("n_words"), meanLen.as("mean_word_len"),
        symbolRatio.as("symbol_ratio"), bulletFrac.as("bullet_frac"),
        ellipsisFrac.as("ellipsis_frac"), alphaFrac.as("alpha_frac"),
        stopDistinct.cast("long").as("stop_distinct"),
        keep.cast("int").as("keep"))
    }), 1)
  }

  // ---- PII scrubbing (C4-style corpus hygiene): regex redaction of
  // emails / phone numbers / IPv4 addresses. Patterns restricted to
  // syntax shared by Java regex and RE2 (\b, \d, bounded repeats) so a
  // SQL-engine oracle reproduces them byte-for-byte.

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}[- ]\\d{4}\\b"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Count of matches for one PII pattern (pre-scrub). */
  def piiCount(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0)))

  /** Redact emails → [EMAIL], IPv4 → [IP], then phones → [PHONE].
    * Email first (its local part may contain digits a later pass would
    * chew on), IP before phone (phone's \d{3} must not fire inside a
    * dotted quad — after IP redaction no dotted quads remain).
    */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      PhoneRe, "[PHONE]")

  // ---- blocklist filtering: exact-token wordlist hit count (the
  // NSFW/spam wordlist gate every corpus pipeline runs)

  /** Number of DISTINCT blocklist terms present as whole tokens. Exact
    * token equality on normalized tokens — not substring matching, so
    * "grass" never trips a block on "ass".
    */
  def blocklistHits(c: Column, blocklist: Seq[String]): Column = {
    val bl = array(blocklist.map(w => lit(w.toLowerCase)): _*)
    size(array_intersect(array_distinct(tokens(c)), bl))
  }

  // ---- repetition (Gopher-style quality signal): fraction of word
  // n-grams that are repeats — high values mark boilerplate/spam

  /** 1 - distinct/total over word n-grams; 0.0 for docs too short to have
    * any n-gram. Same lambda-binding discipline as [[wordNgrams]]: the
    * n-gram array is computed once per row.
    */
  def duplicateNgramFraction(c: Column, n: Int): Column =
    element_at(transform(array(wordNgrams(c, n)), gs => {
      val total = size(gs)
      when(total === 0, lit(0.0))
        .otherwise(lit(1.0) -
          size(array_distinct(gs)).cast(DoubleType) / total.cast(DoubleType))
    }), 1)

  // ---- language ID: marker-token voting (n-gram heuristic family)

  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "en", "un"),
    "de" -> Seq("der", "die", "und", "ist", "das", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une", "dans"),
    "ru" -> Seq("i", "v", "ne", "na", "chto", "eto", "kak", "po"))

  def langMarkerCount(c: Column, markers: Seq[String]): Column = {
    val mk = array(markers.map(lit): _*)
    size(filter(tokens(c), t => array_contains(mk, t)))
  }

  /** Predicted language: the marker set with the most token hits;
    * ties break in LangMarkers order; zero hits everywhere → "und".
    *
    * This composed-functions spelling re-tokenizes once per language; the
    * hot path is the one-pass native kernel
    * `graft.plans.NativeFunctions.langId(tokens(c))` (same definition —
    * equivalence is spec-asserted).
    */
  /** Extract readable text from HTML/markup — the first step of a web-
    * crawl curation pipeline (strip script/style/comments, drop tags,
    * decode the common entities, collapse whitespace). Every pass is a
    * codegen'd regexp/replace over RE2-PORTABLE patterns (no
    * backreferences, no lookaround): script and style get separate passes
    * instead of a `</\1>` backreference, so any engine — including the
    * DuckDB oracle — reproduces the extraction byte-for-byte.
    */
  def extractHtmlText(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    // decode &amp; LAST so "&amp;lt;" yields the literal "&lt;"
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ")
      .foldLeft(noTags) { case (acc, (e, v)) => replace(acc, lit(e), lit(v)) }
    val amp = replace(decoded, lit("&amp;"), lit("&"))
    trim(regexp_replace(amp, "\\s+", " "))
  }

  def langId(c: Column): Column = {
    val counts = LangMarkers.map { case (lang, mk) => lang -> langMarkerCount(c, mk) }
    val maxCnt = greatest(counts.map(_._2): _*)
    // nested whens evaluate top-down; foldRight puts the FIRST language
    // outermost, so ties resolve in LangMarkers order
    counts.foldRight(lit("und"): Column) { case ((lang, cnt), acc) =>
      when(cnt === maxCnt && maxCnt > 0, lit(lang)).otherwise(acc)
    }
  }
}
