package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for large-scale corpus pipelines.
  *
  * Everything here is composed from `org.apache.spark.sql.functions._`
  * (codegen'd Catalyst expressions, no UDFs), so these run inside
  * WholeStageCodegen and survive a 100 TB scan: each is a per-row scalar with
  * no shuffle and no driver involvement.
  *
  * All heuristics are deterministic on purpose — the DuckDB oracle re-derives
  * them with the same arithmetic.
  */
object TextFunctions {

  /** Whitespace-collapsed, trimmed, lower-cased text. */
  def normText(text: Column): Column =
    regexp_replace(lower(trim(text)), """\s+""", " ")

  /** Words of the normalized text. */
  def words(text: Column): Column = split(normText(text), " ")

  /** Whitespace token count (long). */
  def wordCount(text: Column): Column = size(words(text)).cast("long")

  /** Count of alphabetic characters. */
  def alphaChars(text: Column): Column =
    length(regexp_replace(text, """[^a-zA-Z]""", "")).cast("long")

  /** Count of punctuation (non-alphanumeric, non-space) characters. */
  def punctChars(text: Column): Column =
    (length(text) -
      length(regexp_replace(text, """[^a-zA-Z0-9 ]""", ""))).cast("long")

  /** Occurrences of a ` word `-style marker in `' '||lower(text)||' '`,
    * counted via replace-shrinkage: replacing the marker with a single space
    * shortens the string by `len(marker)-1` per occurrence. Single-pass
    * non-overlapping semantics (immediately repeated words count once per
    * pair) — identical in Spark and DuckDB, which is what oracle parity
    * requires.
    */
  def markerCount(text: Column, marker: String): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    (length(padded) - length(replace(padded, lit(marker), lit(" ")))) /
      lit(marker.length - 1)
  }

  /** Stopword-marker hit count (English analytical stopwords). */
  def stopwordCount(text: Column): Column =
    Seq(" the ", " a ", " and ", " of ")
      .map(markerCount(text, _))
      .reduce(_ + _)

  /** Composite quality score in [0,1]-ish: rational arithmetic only (no
    * transcendental libm calls — those are not bit-reproducible across
    * engines).
    */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val alphaRatio = alphaChars(text).cast("double") / len
    val stopRatio = stopwordCount(text) / wordCount(text).cast("double")
    alphaRatio * lit(0.5) + stopRatio * lit(0.5)
  }

  /** Language-marker scores. Ordered map: language -> markers. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " a "),
    "de" -> Seq(" der ", " und "),
    "es" -> Seq(" el ", " los "),
    "fr" -> Seq(" le ", " et "))

  def langScore(text: Column, lang: String): Column =
    langMarkers.toMap.apply(lang).map(markerCount(text, _)).reduce(_ + _)

  /** Deterministic n-gram/stopword language ID: highest score wins, ties
    * break in `langMarkers` declaration order, zero-score => 'unknown'.
    */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (l, _) => l -> langScore(text, l) }
    val best = scores
      .map { case (l, s) =>
        val beatsAll = scores
          .filter(_._1 != l)
          .map { case (l2, s2) =>
            val idx = langMarkers.indexWhere(_._1 == l)
            val idx2 = langMarkers.indexWhere(_._1 == l2)
            if (idx < idx2) s >= s2 else s > s2
          }
          .reduce(_ && _)
        (l, s, beatsAll)
      }
    best.foldRight(lit("unknown")) { case ((l, s, beats), els) =>
      when(beats && s > lit(0.0), lit(l)).otherwise(els)
    }
  }

  /** Stable document fingerprint: md5 of normalized text (hex string). */
  def fingerprint(text: Column): Column = md5(normText(text).cast("binary"))

  /** 64-bit numeric fingerprint (xxhash64 of normalized text). */
  def fingerprint64(text: Column): Column = xxhash64(normText(text))

  /** BPE-ish token count: runs of letters, runs of digits, or single
    * punctuation marks — the classic pre-tokenizer shape.
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("""[a-z]+|[0-9]+|[^a-z0-9\s]"""),
      lit(0))).cast("long")

  /** Canonical URL form for web-corpus curation (the Common-Crawl-style
    * dedup/grouping key): lower-cases scheme and authority, strips the
    * fragment, tracking (`utm_*`) query params, default ports (`:443` for
    * https, `:80` for http), a leading `www.`/`m.` host label, and any
    * trailing slash. Every pattern stays in the lookaround-free subset
    * Java regex and RE2-family engines interpret identically, so the
    * oracle replays the chain verbatim.
    */
  def normalizeUrl(url: Column): Column = {
    // 1. lower-case `scheme://authority` only — the path stays untouched
    val pre = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    val lowered = concat(lower(pre), url.substr(length(pre) + lit(1), lit(1 << 30)))
    // 2. drop the fragment
    val noFrag = regexp_replace(lowered, "#.*$", "")
    // 3. drop utm_* tracking params, then repair the delimiter chain:
    //    a query now starting at '&' gets its '?' back; a dangling '?'
    //    (all params removed) disappears
    val noUtm = regexp_replace(noFrag, "[?&]utm_[A-Za-z_]+=[^&#]*", "")
    val fixedDelim =
      regexp_replace(regexp_replace(noUtm, "^([^?&]*)&", "$1?"), "\\?$", "")
    // 4. default ports are noise: strip them (non-default ports survive)
    val noPort = regexp_replace(
      regexp_replace(fixedDelim, "^(https://[^/:?#]+):443([/?#].*)?$", "$1$2"),
      "^(http://[^/:?#]+):80([/?#].*)?$", "$1$2")
    // 5. mobile/www host aliases collapse onto the bare registrable host
    val noAlias = regexp_replace(noPort, "^(https?://)(www\\.|m\\.)", "$1")
    // 6. trailing slash
    regexp_replace(noAlias, "/$", "")
  }

  /** Host of a (normalized) URL. */
  def urlHost(url: Column): Column =
    regexp_extract(url, "^[a-z]+://([^/:?#]+)", 1)
}
