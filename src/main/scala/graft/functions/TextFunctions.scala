package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the training-data pipeline, all as
  * composable Column expressions (codegen-friendly, no UDFs). Each helper has
  * a deterministic DuckDB-SQL twin used by the oracle queries — integer
  * arithmetic and left-fold orders are chosen so both engines agree
  * bit-for-bit.
  */
object TextFunctions {

  /** Expression-level let-binding: evaluate `e` ONCE per row and feed the
    * result to `f`. Catalyst's CollapseProject re-inlines sub-expressions
    * across projections, so an expensive array expression referenced k times
    * is otherwise evaluated k times (higher-order functions never reach
    * codegen/CSE). Wrapping in a 1-element array + transform introduces a
    * lambda variable — a real binding — at the cost of one tiny array
    * allocation. Measured on the MinHash pipeline this is a >30× win. */
  def bindOnce(e: Column)(f: Column => Column): Column =
    element_at(transform(array(e), x => f(x)), 1)

  /** Whitespace tokens with empties dropped (leading/trailing whitespace
    * safe). DuckDB twin: list_filter(regexp_split_to_array(trim(x),'\s+'),
    * t -> t <> ''). */
  def tokens(c: Column): Column =
    filter(split(trim(c), "\\s+"), t => t =!= "")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-style subword pre-tokenization: letter runs, digit runs, and
    * single non-alphanumeric marks — the classic pre-split a byte-pair
    * tokenizer starts from. The whitespace class is spelled out EXPLICITLY
    * (space, tab, LF, VT, FF, CR) rather than `\s`, because Java's \s
    * includes vertical tab while RE2's does not — an explicit class is the
    * only spelling on which both engines agree for every input. The q48
    * oracle interpolates this same constant. */
  val subtokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]"
  def subtokens(c: Column): Column = regexp_extract_all(c, lit(subtokenPattern), lit(0))

  /** Exact mean token length: integer length sum folded exactly, then one
    * double division. */
  def avgTokenLen(toksExpr: Column): Column =
    bindOnce(toksExpr) { toks =>
      aggregate(transform(toks, t => length(t).cast("long")), lit(0L), (acc, x) => acc + x)
        .cast("double") / size(toks)
    }

  /** Word n-grams joined by single spaces; empty array when there are fewer
    * than n tokens (DuckDB's range() yields empty on negative bounds, Spark's
    * sequence() would count backwards — hence the guard). */
  def wordNgrams(toksExpr: Column, n: Int): Column =
    // bindOnce is load-bearing: the n element_at references per ngram would
    // otherwise each re-evaluate the tokenizer expression (measured ~180
    // re-splits per document before binding)
    bindOnce(toksExpr) { toks =>
      when(size(toks) < n, array().cast("array<string>"))
        .otherwise(
          transform(sequence(lit(0), size(toks) - n), i =>
            concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
    }

  /** Jaccard similarity of the distinct n-gram sets of two token arrays.
    * NULL when the union is empty. Exact: int/int division. */
  def ngramJaccard(toksA: Column, toksB: Column, n: Int): Column =
    bindOnce(array_distinct(wordNgrams(toksA, n))) { a =>
      bindOnce(array_distinct(wordNgrams(toksB, n))) { b =>
        val inter = size(array_intersect(a, b)).cast("double")
        val union = size(array_union(a, b))
        inter / nullif(union.cast("double"), lit(0.0))
      }
    }

  private def nullif(c: Column, v: Column): Column = when(c === v, lit(null)).otherwise(c)

  /** Ratio of characters in `charClass` (a regex character class, e.g.
    * "[0-9]") to total characters. DuckDB twin uses regexp_replace(...,'g'). */
  def charClassRatio(c: Column, charClass: String): Column =
    (length(c) - length(regexp_replace(c, charClass, ""))).cast("double") /
      nullif(length(c).cast("double"), lit(0.0))

  /** Count of tokens found in `words`. */
  def wordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit(_)): _*)))

  /** Small language-marker stopword profiles (public, common function-word
    * lists) for the heuristic language ID. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por"),
    "fr" -> Seq("le", "la", "de", "et", "un", "une", "est", "pour"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "ein", "zu"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "不"))

  /** Heuristic language ID: argmax of stopword hits, ties broken by the
    * fixed language order en > es > fr > de > zh (a deterministic CASE
    * cascade — mirrors the DuckDB oracle exactly). */
  def langId(toksExpr: Column): Column = bindOnce(toksExpr) { toks =>
    val order = Seq("en", "es", "fr", "de", "zh")
    val hits = order.map(l => wordHits(toks, stopwords(l)))
    order.zip(hits).foldRight(lit("und")) { case ((lang, h), rest) =>
      // lang wins if its hits > 0 and >= all later languages' hits
      val laterMax = order.zip(hits).dropWhile(_._1 != lang).drop(1).map(_._2)
      val isMax = laterMax.foldLeft(h > 0) { (acc, other) => acc && h >= other }
      when(isMax, lit(lang)).otherwise(rest)
    }
  }

  /** Simple quality score: stopword density minus punctuation and digit
    * noise (each term exact, so the combination is reproducible). */
  def qualityScore(c: Column): Column =
    bindOnce(tokens(c)) { toks =>
      val stopRatio = wordHits(toks, stopwords("en")).cast("double") /
        nullif(size(toks).cast("double"), lit(0.0))
      stopRatio - charClassRatio(c, "[.,!?;:]") - charClassRatio(c, "[0-9]")
    }

  /** Redaction: replace every match of `pattern` with `replacement`.
    * Spark's regexp_replace is replace-all by default (DuckDB needs the 'g'
    * flag — oracle SQL must carry it). Patterns must avoid Java/RE2
    * divergent classes (\d, \s — use explicit [0-9], [ \t\n…]). */
  def maskAll(c: Column, pattern: String, replacement: String): Column =
    regexp_replace(c, pattern, replacement)

  /** Number of masked runs — the redaction audit counter. */
  def maskCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0))).cast("long")

  /** Rolling polynomial fingerprint of the first `prefixLen` characters:
    * fold (acc*31 + codepoint) mod 1e9+7 — the same left fold DuckDB's
    * list_reduce computes, exact in integer arithmetic. Dispatches to the
    * codegen expression ([[graft.expressions.PolyFingerprint]]); the
    * composable form below is kept as the equivalence-test witness. */
  def fingerprint(c: Column, prefixLen: Int = 64): Column =
    graft.expressions.PolyFingerprint.fingerprint(c, prefixLen)

  /** The pre-round-4 composable spelling of [[fingerprint]] (split +
    * boxed lambda fold per character) — semantics witness for the codegen
    * expression, asserted equal on random Unicode input in PropertySpec. */
  def fingerprintComposable(c: Column, prefixLen: Int = 64): Column =
    aggregate(
      filter(split(substring(c, 1, prefixLen), ""), ch => ch =!= ""),
      lit(0L),
      (acc, ch) => (acc * 31L + ascii(ch)) % 1000000007L)

  /** 31-bit polynomial hash of one token: fold (acc*31 + codepoint) mod
    * (2^31 - 1), acc₀ = 17. Stays far below BIGINT overflow, so DuckDB's
    * list_reduce computes the identical value — the cross-engine-verifiable
    * token hash (same family as `fingerprint`). */
  def polyTokenHash(tok: Column): Column =
    aggregate(
      filter(split(tok, ""), ch => ch =!= ""),
      lit(17L),
      (acc, ch) => (acc * 31L + ascii(ch)) % 2147483647L)

  /** SimHash over the 31-bit polynomial token hash: per bit position a
    * majority vote across the document's token hashes, packed little-endian
    * (bit j contributes 2^j). Same construct as simhash64 but every step is
    * exact integer arithmetic both engines reproduce — the oracle-able
    * variant used by the q27 gate entry. */
  def simhashPoly(c: Column, bits: Int = 31): Column =
    bindOnce(transform(tokens(c), t => polyTokenHash(t))) { hs =>
      val terms: Seq[Column] = (0 until bits).map { j =>
        when(size(filter(hs, h => shiftright(h, j).bitwiseAND(lit(1L)) === 1L)) * 2 >= size(hs)
          && size(hs) > 0, lit(1L << j)).otherwise(lit(0L))
      }
      terms.reduce(_ + _)
    }

  /** 64-bit SimHash over whitespace tokens (xxhash64 per token, majority
    * vote per bit). Expression-only; hash values are engine-specific so
    * SimHash outputs are validated by ScalaTest properties, not DuckDB. */
  def simhash64(c: Column): Column =
    bindOnce(transform(tokens(c), t => xxhash64(t))) { hs =>
      // shiftright needs a literal shift amount, so unroll the 64 bit positions
      val bits: Seq[Column] = (0 until 64).map { j =>
        when(size(filter(hs, h => shiftright(h, j).bitwiseAND(lit(1L)) === 1L)) * 2 >= size(hs)
          && size(hs) > 0, lit(1L)).otherwise(lit(0L))
      }
      // pack via shift+or: bit ops wrap (no ANSI overflow check on the sign bit)
      bits.foldLeft(lit(0L))((acc, b) => shiftleft(acc, 1).bitwiseOR(b))
    }

  /** Hamming distance between two packed 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
