package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the large-scale training-data pipeline:
  * token counting, quality signals, language ID, fingerprinting. All
  * pure `functions._` chains (codegen'd, pushdown-friendly); the
  * heuristics are deterministic so an ANSI-SQL oracle can replay them.
  */
object TextFunctions {

  /** Whitespace tokens (duplicates kept). */
  def tokens(c: Column): Column = HashFunctions.tokens(c)

  /** Distinct token set — the unit for Jaccard/MinHash dedup. */
  def tokenSet(c: Column): Column = array_distinct(tokens(c))

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword count: alpha runs, digit runs, and single
    * punctuation marks each count as one token — a cheap, stable proxy
    * for LLM tokenizer counts.
    */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  def punctCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[^A-Za-z0-9\\s]"), lit(0)))

  def digitCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[0-9]"), lit(0)))

  val stopwordsEn: Seq[String] = Seq("the", "and", "of", "to", "a", "in", "is", "it")
  private val stopwordsEs = Seq("el", "la", "de", "los", "que", "y")

  /** Stopword token occurrences (duplicates counted). */
  def stopwordCount(c: Column): Column = {
    val stop = array(stopwordsEn.map(lit): _*)
    size(filter(tokens(c), t => array_contains(stop, t)))
  }

  /** Quality gate on integer signals only (threshold math stays exact
    * across engines): enough tokens, limited punctuation density,
    * limited digit density.
    */
  def qualitySignals(c: Column, nChars: Column): Seq[(String, Column)] = Seq(
    "n_tokens" -> tokenCount(c),
    "n_bpe_tokens" -> bpeTokenCount(c),
    "n_punct" -> punctCount(c),
    "n_digits" -> digitCount(c),
    "n_stopwords" -> stopwordCount(c),
    "is_quality" -> (tokenCount(c) >= 5 &&
      punctCount(c) * 5 <= nChars &&
      digitCount(c) * 4 <= nChars))

  /** The Gopher/MassiveText document-quality rule set (Rae et al.
    * 2021, "Scaling Language Models: ... Gopher", Appendix A.1.1) —
    * the published filter battery production LLM corpora actually run,
    * complementing [[qualitySignals]]' generic ratios:
    *
    *   1. 50 <= word count <= 100,000
    *   2. 3 <= mean word length <= 10
    *   3. symbol-to-word ratio ('#' or '...') <= 0.1
    *   4. < 90% of lines start with a bullet ('-', '*', '•')
    *   5. < 30% of lines end with an ellipsis ('...' or '…')
    *   6. >= 80% of words contain an alphabetic character
    *   7. >= 2 distinct members of {the,be,to,of,and,that,have,with}
    *
    * Every ratio threshold is applied as a cross-multiplied INTEGER
    * comparison (e.g. rule 2 as `3·n <= Σlen <= 10·n`), so no float
    * ever decides a rule and an external SQL engine replays each
    * boolean exactly. Words are the corpus-wide whitespace-token
    * convention; lines split on '\n' (a single-line document has one
    * line — the line rules still evaluate, faithfully vacuous).
    * Pure per-row codegen'd expressions: zero shuffle at any scale.
    */
  def gopherSignals(c: Column): Seq[(String, Column)] = {
    val toks = tokens(c)
    val nWords = size(toks)
    val sumLen = aggregate(transform(toks, t => length(t)), lit(0),
      (acc, x) => acc + x)
    val nAlpha = size(filter(toks, t => t.rlike("[A-Za-z]")))
    val nSymbols = size(regexp_extract_all(c, lit("#|\\.\\.\\."), lit(0)))
    val lines = split(c, "\n")
    val nLines = size(lines)
    val nBullet = size(filter(lines, l => trim(l).rlike("^[-*•]")))
    val nEllEnd = size(filter(lines, l => trim(l).rlike("(\\.\\.\\.|…)$")))
    val gopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val nStop = size(filter(array(gopherStops.map(lit): _*),
      w => array_contains(toks, w)))
    val rules = Seq(
      "r_word_count" -> (nWords >= 50 && nWords <= 100000),
      "r_word_length" -> (lit(3) * nWords <= sumLen && sumLen <= lit(10) * nWords),
      "r_symbol_ratio" -> (lit(10) * nSymbols <= nWords),
      "r_bullet_lines" -> (lit(10) * nBullet < lit(9) * nLines),
      "r_ellipsis_lines" -> (lit(10) * nEllEnd < lit(3) * nLines),
      "r_alpha_words" -> (lit(5) * nAlpha >= lit(4) * nWords),
      "r_stop_words" -> (nStop >= 2))
    Seq("n_words" -> nWords, "sum_word_len" -> sumLen,
      "n_alpha_words" -> nAlpha, "n_stop_hits" -> nStop) ++ rules ++
      Seq("gopher_pass" -> rules.map(_._2).reduce(_ && _))
  }

  /** Language ID by stopword/script hits — the classic cheap n-gram
    * heuristic. CJK codepoints trump Latin stopword scores.
    */
  def langId(c: Column): Column = {
    def hits(words: Seq[String]): Column = {
      val stop = array(words.map(lit): _*)
      size(filter(tokens(c), t => array_contains(stop, t)))
    }
    val enScore = hits(stopwordsEn)
    val esScore = hits(stopwordsEs)
    val cjk = size(regexp_extract_all(c, lit("[\\x{4e00}-\\x{9fff}]"), lit(0)))
    when(cjk > 0, lit("zh"))
      .when(enScore >= esScore && enScore > 0, lit("en"))
      .when(esScore > enScore, lit("es"))
      .otherwise(lit("unknown"))
  }

  /** Normalized document fingerprint (md5 of lower-cased,
    * whitespace-collapsed text) — survives trivial edits.
    */
  def fingerprint(c: Column): Column = HashFunctions.normalizedFingerprint(c)

  /** Positional character k-gram hashes (md5-derived, duplicates and
    * order kept) — the input to winnowing fingerprint selection
    * ([[graft.operators.Dedup.winnowFingerprints]]).
    */
  def gramHashes(c: Column, k: Int): Column =
    when(length(c) >= k,
      transform(sequence(lit(1), length(c) - (k - 1)),
        i => HashFunctions.stableHash56(c.substr(i, lit(k)))))
      .otherwise(array().cast("array<bigint>"))

  // PII patterns kept RE2-compatible (no lookarounds/backrefs) so the
  // DuckDB oracle replays them verbatim. Order matters: emails before
  // phones (an email's digits must not half-match the phone pattern),
  // IPs before phones (dotted quads contain phone-length digit runs).
  val piiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val piiIpRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val piiPhoneRe = "\\+?[0-9][0-9() -]{6,}[0-9]"

  /** PII scrubbing for training corpora: emails, IPv4 addresses, and
    * phone-like digit runs replaced with typed placeholder tokens.
    * Pure codegen'd regexp_replace chain — one pass per pattern, no
    * UDF, trivially distributed.
    */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, lit(piiEmailRe), lit("<EMAIL>")),
        lit(piiIpRe), lit("<IP>")),
      lit(piiPhoneRe), lit("<PHONE>"))

  /** Count of PII placeholders a scrub would insert. */
  def piiCount(c: Column): Column =
    size(regexp_extract_all(scrubPii(c), lit("<EMAIL>|<IP>|<PHONE>"), lit(0)))

  /** Repetition signals (Gopher-style quality rules): how much of the
    * document is the same thing said again.
    *
    * - `top_token_cnt`  — occurrences of the most frequent token
    *   (divide by n_tokens for the "fraction in most common word" rule)
    * - `dup_bigram_cnt` — bigram occurrences beyond the first
    *   (n_bigrams - distinct_bigrams; /n_bigrams = duplicate-bigram
    *   fraction)
    *
    * `toks` must be a MATERIALIZED token-array column (a prior
    * `withColumn` of [[tokens]]), not an inline tokenize expression:
    * the lambdas capture it, and a captured non-attribute expression
    * re-evaluates per array element — re-tokenizing the document once
    * per token. With an attribute it's per-document array math only
    * (the top-token scan is O(distinct·n) per doc, embarrassingly
    * parallel, no shuffle).
    */
  def repetitionSignals(toks: Column): Seq[(String, Column)] = {
    val bigrams = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
    Seq(
      "n_tokens" -> size(toks),
      "top_token_cnt" -> coalesce(array_max(transform(array_distinct(toks),
        w => size(filter(toks, t => t === w)))), lit(0)),
      "dup_bigram_cnt" -> (size(bigrams) - size(array_distinct(bigrams))))
  }

  /** Distinct character k-shingles — the n-gram unit for shingle-based
    * near-dup detection (robust to word-boundary edits where word sets
    * are not). Empty result for texts shorter than k (guarded: Spark's
    * `sequence(1, 0)` would count DOWN, not produce an empty range).
    */
  /** ALL overlapping character k-grams — the MULTISET companion to
    * [[charShingles]] (which dedups for Jaccard): positional repeats
    * are kept, so frequency statistics (entropy, burstiness) see the
    * true counts.
    */
  def charGrams(c: Column, k: Int): Column =
    when(length(c) >= k,
      transform(sequence(lit(1), length(c) - (k - 1)),
        i => c.substr(i, lit(k))))
      .otherwise(array().cast("array<string>"))

  def charShingles(c: Column, k: Int): Column =
    when(length(c) >= k,
      array_distinct(transform(sequence(lit(1), length(c) - (k - 1)),
        i => c.substr(i, lit(k)))))
      .otherwise(array().cast("array<string>"))

  /** HTML tag strip — the crawl boilerplate-removal first pass: every
    * `<...>` run becomes one space (tags NEVER splice adjacent words
    * together), then whitespace collapses and trims. Pure
    * regexp_replace — identical semantics on any ANSI engine (the
    * oracle adds the 'g' flag DuckDB needs where Spark is global by
    * default). Script/style CONTENT is out of scope for the regex
    * pass (a real extractor pairs this with a tag-aware fence);
    * documented, not pretended.
    */
  def stripHtmlTags(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, "<[^>]*>", " "), "\\s+", " "))

  /** Mojibake marker count — the double-encoding detector (UTF-8 read
    * as Latin-1 re-encoded as UTF-8 leaves 'Ã', 'â€¦'-class artifacts
    * that virtually never occur in clean text): occurrences of the
    * classic marker prefixes. An exact integer count per document —
    * the per-source rollup is the encoding-health dashboard a crawl
    * pipeline watches.
    */
  def mojibakeCount(c: Column): Column =
    when(c.isNotNull,
      size(split(c, "Ã|â€|Â")) - 1)

  /** Soundex phonetic key (the vowel-separator variant: standard
    * American Soundex WITHOUT the H/W-transparency refinement —
    * adjacent equal codes merge, a vowel between equal codes keeps
    * both, exactly the rule set every engine's builtin family
    * implements identically when spelled out): uppercase letters only,
    * per-letter digit classes via one `translate`, adjacent-run
    * collapse per digit, first LETTER + first three surviving non-zero
    * codes zero-padded. Non-letter-bearing or NULL input → NULL.
    * Every step is upper/translate/regexp_replace/substr/rpad —
    * identical builtins on any ANSI engine, so blocking keys replay
    * exactly.
    */
  def soundexKey(c: Column): Column = {
    val letters = regexp_replace(upper(c), "[^A-Z]", "")
    val codes = translate(letters,
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "01230120022455012623010202")
    val collapsed = (1 to 6).foldLeft(codes)((acc, d) =>
      regexp_replace(acc, s"$d$d+", s"$d"))
    val rest = regexp_replace(collapsed.substr(lit(2), length(collapsed)), "0", "")
    when(length(letters) >= 1,
      concat(substring(letters, 1, 1), rpad(substring(rest, 1, 3), 3, "0")))
  }
}
