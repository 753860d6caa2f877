package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the LLM-training-data pipeline
  * (SURVEY.md §2 #36-39). Everything is a codegen'd Column expression —
  * no UDFs — so these run inside whole-stage codegen at any scale.
  */
object TextFunctions {

  /** Whitespace-normalized lower-cased text. */
  def normText(c: Column): Column = trim(regexp_replace(lower(c), "\\s+", " "))

  /** Unicode NFC canonical composition (native codegen'd expression —
    * Spark ships none and a UDF would break whole-stage codegen).
    */
  def nfcNorm(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.NfcNormalize(org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** Jaro–Winkler similarity (native codegen'd expression — Spark
    * ships levenshtein only, and JW is the standard name-matching
    * comparator for record linkage). Semantics pinned to the
    * DuckDB/rapidfuzz de-facto standard; see
    * [[graft.plans.JaroWinklerSim]] for the exact contract.
    */
  def jaroWinkler(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.JaroWinklerSim(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** Full text-normalization pass (the pre-dedup canonicalizer): NFC
    * composition (byte-distinct spellings of identical text unify —
    * without this every dedup pass silently under-merges), control
    * characters stripped, whitespace collapsed, edges trimmed. Pure
    * map-only codegen chain; RE2-compatible so the identical chain
    * runs as the oracle.
    */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(nfcNorm(c), "[\\x00-\\x1f\\x7f]", " "), "\\s+", " "))

  /** Whitespace tokens of the normalized text. Mirrors DuckDB's
    * `string_split_regex(lower(trim(text)), '\s+')` for oracle parity.
    */
  def tokens(c: Column): Column = split(trim(lower(c)), "\\s+")

  /** Sliding word n-grams joined by single spaces. Rows with fewer than
    * `n` tokens produce an empty array (callers filter).
    *
    * Built from n unrolled O(1) `element_at` lookups per position, not
    * `slice` — slicing allocates an n-element subarray per position,
    * O(L·n) copies per document, which dominates on the long documents
    * a 100 TB corpus actually contains.
    */
  def wordNGrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - n + 1),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array().cast("array<string>"))

  /** [[wordNGrams]] over [[tokens]] with the token array bound ONCE per
    * row (single-element-array lambda binding): for call sites with no
    * exchange to materialize the tokens across — an inlined tokens
    * expression re-splits the text at every element_at reference
    * because HOF lambdas are interpreted (no codegen CSE).
    */
  def boundNGrams(text: Column, n: Int): Column =
    element_at(transform(array(tokens(text)), w => wordNGrams(w, n)), 1)

  /** Language marker dictionaries. The synthetic corpus shares one
    * vocabulary across langs, so this is the standard stopword-count
    * HEURISTIC shape (what a real pipeline runs with real dictionaries),
    * deterministic and oracle-mirrored rather than accurate here.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "big"),
    "fr" -> Seq("query", "data", "line"),
    "es" -> Seq("slow", "agg", "vector"),
    "de" -> Seq("customer", "hash", "column"),
    "zh" -> Seq("join", "small", "scan"))

  /** Occurrences of any marker word in the token array (with
    * multiplicity, like a real stopword counter).
    */
  def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers)))

  /** Deterministic arg-max over the per-language scores, ties broken in
    * `langMarkers` declaration order. `scores` must align with
    * `langMarkers`.
    */
  def argmaxLang(scores: Seq[Column]): Column = {
    val langs = langMarkers.map(_._1)
    langs.zipWithIndex.init.foldRight(lit(langs.last)) { case ((lang, i), rest) =>
      val geAll = scores.drop(i + 1).map(s => scores(i) >= s).reduce(_ && _)
      when(geAll, lit(lang)).otherwise(rest)
    }
  }

  /** PII redaction: URLs, then emails, then phone numbers, then IPv6,
    * then IPv4 literals replaced by typed placeholder tags (URL first —
    * emails and IPs can appear inside one; IPv6 before IPv4 so the
    * hex-colon body is consumed whole). Pure regexp_replace chain:
    * codegen'd, no UDF, and the patterns are RE2-compatible (no
    * lookaround, no \Q\E) so the exact same chain runs as the SQL
    * oracle. At 100 TB this is a map-only pass — no shuffle, pipelined
    * with whatever scan feeds it.
    *
    * Phone coverage is deliberately conservative (optional +CC, 3-3-4
    * groups with space/dash separators, optional area parens): dot
    * separators would collide with IPv4/dates. IPv6 covers the full
    * 8-group form and ::-compressed forms — a bare hex-word pair like
    * "ab::cd" is matched by design (it IS valid IPv6).
    */
  val PhonePattern = "(\\+\\d{1,3}[ -]?)?\\(?\\d{3}\\)?[ -]\\d{3}[ -]\\d{4}\\b"
  val Ipv6Pattern =
    "(([0-9a-fA-F]{1,4}:){7}[0-9a-fA-F]{1,4}" +
    "|([0-9a-fA-F]{1,4}:)+:([0-9a-fA-F]{1,4}(:[0-9a-fA-F]{1,4})*)?" +
    "|::([0-9a-fA-F]{1,4}(:[0-9a-fA-F]{1,4})*))"
  def scrubPii(c: Column): Column = {
    val noUrl = regexp_replace(c, "https?://\\S+", "<URL>")
    val noEmail = regexp_replace(noUrl,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val noPhone = regexp_replace(noEmail, PhonePattern, "<PHONE>")
    val noV6 = regexp_replace(noPhone, Ipv6Pattern, "<IPV6>")
    regexp_replace(noV6, "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b", "<IP>")
  }

  /** HTML → text extraction (the WET-extraction pass of a web-corpus
    * pipeline): drop script/style blocks wholesale, strip remaining
    * tags, decode the common entities, collapse whitespace. A pure
    * regexp_replace/replace chain — codegen'd, map-only, RE2-compatible
    * so the identical chain runs as the SQL oracle. The non-greedy
    * block patterns use (?is): case-insensitive and dot-matches-newline
    * across multi-line script bodies.
    */
  def extractHtmlText(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]+>", " ")
    // entity names are regex-safe literals in BOTH engines (no \Q\E,
    // which RE2 lacks)
    val decoded = Seq("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&nbsp;" -> " ").foldLeft(noTags) {
      case (col0, (ent, ch)) => regexp_replace(col0, ent, ch)
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Rolling polynomial hash over the token stream (reference-style
    * document fingerprint, SURVEY.md §2 #39). The per-token hash is the
    * portable md5-prefix family ([[Hashing.portableHash]]), so DuckDB
    * computes the identical fingerprint (`list_reduce` over
    * `('0x'||substr(md5(t),1,8))::BIGINT % P`) — a full hash-matched
    * oracle, not a rows-only check. Arithmetic stays below 2^36 so it
    * is safe under ANSI overflow checking.
    */
  def fingerprint(toks: Column): Column = {
    val p = lit(Hashing.PortableP)
    aggregate(toks, lit(0L), (acc, t) => pmod(acc * lit(31L) + Hashing.portableHash(t), p))
  }

  /** Winnowing fingerprint selection (the MOSS algorithm, Schleimer/
    * Wilkerson/Aho SIGMOD'03): hash every token k-gram, slide a window
    * of `w` consecutive hashes, select the minimum of each window —
    * rightmost occurrence on ties, the paper's choice that makes
    * selections position-robust. Guarantees at least one shared
    * fingerprint for any match of length ≥ w + k − 1 tokens while
    * storing only ~2/(w+1) of all gram hashes — THE sub-linear sketch
    * for copy detection over a 100 TB corpus (full gram inversion
    * indexes every position).
    *
    * Entirely map-side array arithmetic — no explode, no shuffle: each
    * window's rightmost-argmin is one `array_min` over packed longs
    * `hash·2²⁰ + (2²⁰−1−pos)` (complementing the position makes the
    * LARGEST position win among equal hashes while plain min picks the
    * smallest hash; decode = shift/mask). Hash < 2³⁰ (portable md5
    * family) and pos < 2²⁰ keep the pack exact in a long — and in
    * DuckDB's BIGINT, so the identical selection runs as the oracle.
    * Returns the DISTINCT packed selections (winnowing's fingerprint
    * set); callers explode and decode.
    */
  def winnow(toks: Column, k: Int, w: Int): Column = {
    require(k >= 1 && w >= 1, s"winnow: k=$k, w=$w must be >= 1")
    val hsExpr = transform(wordNGrams(toks, k), g => Hashing.portableHash(g))
    // Bind the hash array ONCE as a lambda variable (single-element
    // array + transform). Naming it a plain Scala val instead would
    // splice the whole tokenize→gram→md5 subtree into every reference
    // (higher-order functions are interpreted — no codegen CSE), and
    // the size()/bound references here would re-hash the document ~4×.
    element_at(transform(array(hsExpr), hs => {
      val m = size(hs)
      val nw = greatest(m - lit(w) + 1, lit(1))
      when(m >= 1,
        array_distinct(transform(sequence(lit(1), nw), j =>
          array_min(transform(sequence(j, least(j + lit(w - 1), m)), p =>
            element_at(hs, p) * lit(1048576L) + (lit(1048575) - p).cast("long"))))))
        .otherwise(array().cast("array<bigint>"))
    }), 1)
  }

  /** Canonical URL normalization — the key-maker for URL-level dedup of
    * a web corpus (the same page arrives as `HTTP://WWW.Site.COM:80/p/`
    * and `http://site.com/p?utm_source=x`; raw-string dedup keeps
    * both). Normalizations, each one deliberate:
    * scheme + host lowercase (case-insensitive per RFC 3986) while the
    * PATH case is preserved (it is not); fragment dropped (client-side
    * only); leading `www.` and the scheme's default port stripped;
    * trailing path slashes trimmed; tracking parameters (`utm_*`,
    * `fbclid`, `gclid`, `ref`) removed and the surviving query
    * parameters SORTED so parameter order cannot split a group.
    *
    * A pure codegen'd Column chain (regexp + array HOFs), map-only at
    * any scale, RE2-compatible so the identical chain is the oracle.
    */
  def canonicalUrl(c: Column): Column = {
    val noFrag = regexp_replace(c, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostRaw = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val noWww = regexp_replace(hostRaw, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
    val path = regexp_replace(
      regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1),
      "/+$", "")
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    val params = filter(split(query, "&"), p =>
      !p.rlike("^(utm_[^=]*|fbclid|gclid|ref)=") && p =!= lit(""))
    val q = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, path,
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** Blocklist term census: per (doc, term) occurrence counts for a
    * bounded term list — the "count contaminant / policy phrases before
    * deciding to drop or redact" pass of a corpus audit. SUBSTRING
    * semantics (multi-word phrases allowed), case-insensitive.
    *
    * Spark design: the term list is a plan-time literal array of
    * (term, count) structs — one codegen'd projection per row computes
    * every term's count via the length-difference identity
    * `(len(text) - len(remove(text, term))) / len(term)` (exact, no
    * regex, so no escaping pitfalls and the identical arithmetic runs
    * as the SQL oracle), then one explode + filter keeps the hits.
    * Map-only at any scale: no shuffle, no join — the census pipelines
    * with the scan like [[scrubPii]]. Term list size is a plan-size
    * concern, not a data concern (hundreds are fine; tens of thousands
    * belong in a broadcast-join variant instead).
    */
  def blocklistCensus(docs: DataFrame, terms: Seq[String],
                      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(terms.nonEmpty && terms.forall(_.nonEmpty), "blocklistCensus: empty term")
    val lowered = lower(col(textCol))
    val counts = array(terms.map { t =>
      val tl = t.toLowerCase
      struct(lit(tl).as("term"),
        ((length(lowered) - length(call_function("replace", lowered, lit(tl), lit(""))))
          .cast("long") / lit(tl.length.toLong)).cast("int").as("n_occ"))
    }: _*)
    docs.select(col(idCol), explode(counts).as("m"))
      .select(col(idCol), col("m.term").as("term"), col("m.n_occ").as("n_occ"))
      .filter(col("n_occ") > 0)
  }

  /** Flesch reading ease + Flesch–Kincaid grade per group, from
    * corpus-total counts (micro-averaged — the per-LANG/per-SOURCE
    * quality dial beside the Gopher signals): words = whitespace
    * tokens, sentences = [.!?]+ runs (floor 1 per non-empty doc),
    * syllables = vowel-group count per word with the standard floor
    * of 1. The alphabet is ASCII-PINNED (lowercase, non-ASCII
    * stripped — the charErrorRate contract) so both engines count
    * identical classes.
    *
    * Exactness: per-doc counts are exact integers summed as longs;
    * the two formulas evaluate once per group in a mirrored double
    * op order, rounded 1e-6. Groups with zero words emit NULL.
    *
    * Scale shape: one map-side pass per document (the per-word
    * vowel-group scan is HOF-interpreted over the MATERIALIZED token
    * array — §5 lambda rule), ONE partial agg per group. The
    * heuristic is the standard approximation — syllable dictionaries
    * don't exist at corpus scale.
    */
  def readability(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val ascii = lower(regexp_replace(col(textCol), "[^\\x20-\\x7e]", ""))
    val words = filter(split(trim(ascii), "\\s+"), w => length(w) > 0)
    val nw = size(words).cast("long")
    val ns = when(nw > 0, greatest(lit(1L),
      size(regexp_extract_all(ascii, lit("[.!?]+"), lit(0))).cast("long")))
      .otherwise(lit(0L))
    val ny = when(nw > 0, aggregate(words, lit(0L), (acc, w) =>
      acc + greatest(lit(1L),
        size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0))).cast("long"))))
      .otherwise(lit(0L))
    def dbl(c: Column) = c.cast("double")
    val agged = df.select(col(groupCol).as("_g"), nw.as("_w"), ns.as("_s"), ny.as("_y"))
      .groupBy(col("_g").as(groupCol))
      .agg(count(lit(1)).as("n_docs"), sum("_w").as("n_words"),
        sum("_s").as("n_sentences"), sum("_y").as("n_syllables"))
    val ws = dbl(col("n_words")) / dbl(col("n_sentences"))
    val sw = dbl(col("n_syllables")) / dbl(col("n_words"))
    agged.select(col(groupCol), col("n_docs"), col("n_words"),
      col("n_sentences"), col("n_syllables"),
      when(col("n_words") > 0,
        round(lit(206.835) - lit(1.015) * ws - lit(84.6) * sw, 6)).as("flesch"),
      when(col("n_words") > 0,
        round(lit(0.39) * ws + lit(11.8) * sw - lit(15.59), 6)).as("fk_grade"))
  }

  /** Character-level Shannon entropy per group (nats) over the
    * ASCII-pinned alphabet — the encoding-anomaly dial: mojibake,
    * base64 blobs, and template spam all shift a language's character
    * distribution before a human reads a single document; healthy
    * natural-language groups sit in a narrow entropy band.
    *
    * Exactness: the (group, char) histogram is exact counts; each
    * p·ln(p) term is a double of two exact longs in the q250 op order
    * quantized DECIMAL(20,9) pre-sum; entropy rounds 1e-6.
    *
    * Scale shape: per-char rows collapse map-side into ≤ 95 cells per
    * group in ONE partial agg; everything after is vocabulary-sized.
    */
  def charEntropy(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val ascii = lower(regexp_replace(col(textCol), "[^\\x20-\\x7e]", ""))
    val cells = df
      .select(col(groupCol).as("_g"),
        explode(regexp_extract_all(ascii, lit("."), lit(0))).as("_ch"))
      .groupBy("_g", "_ch").agg(count(lit(1)).as("_c"))
    val tot = cells.groupBy("_g").agg(sum("_c").as("_n"), count(lit(1)).as("_k"))
    def dbl(c: Column) = c.cast("double")
    cells.join(broadcast(tot), Seq("_g"))
      .withColumn("_t",
        ((dbl(col("_c")) / dbl(col("_n"))) * log(dbl(col("_c")) / dbl(col("_n"))))
          .cast("decimal(20,9)"))
      .groupBy(col("_g").as(groupCol))
      .agg(max(col("_n")).as("n_chars"), max(col("_k")).as("n_distinct"),
        round(-sum(col("_t")).cast("double"), 6).as("entropy_nats"))
  }
}
