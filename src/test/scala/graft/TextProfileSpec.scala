package graft

import java.util.regex.Pattern

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TextProfiler

/** Pins the compiled text-profile kernels to their `java.util.regex`
  * specifications (the DuckDB oracle replays those regexes), on
  * adversarial literals and randomized strings — the same equivalence
  * discipline as `PiiScrubberSpec`. */
class TextProfileSpec extends AnyFunSuite {

  private val wsTok = Pattern.compile("\\S+")
  private val punct = Pattern.compile("[\\p{Punct}]")
  private val symbols = Pattern.compile("#|\\.\\.\\.|…")
  private val alphaTok = Pattern.compile("\\S*[a-z]\\S*")
  private val lists = graft.ext.TextAnalysis.stopwordLists
  private val swPats = lists.map(ws =>
    Pattern.compile(ws.mkString("\\b(", "|", ")\\b")))
  private val lookup = new TextProfiler.StopwordLookup(lists)

  private def countMatches(p: Pattern, s: String): Long = {
    val m = p.matcher(s)
    var n = 0L
    while (m.find()) n += 1
    n
  }

  private def check(s: String): Unit = {
    val c = TextProfiler.counts(UTF8String.fromString(s))
    assert(c(0) === countMatches(wsTok, s), s"n_tokens on: [$s]")
    assert(c(1) === countMatches(punct, s), s"n_punct on: [$s]")
    assert(c(2) === countMatches(symbols, s), s"n_symbols on: [$s]")
    val low = s.toLowerCase(java.util.Locale.ROOT)
    val p = TextProfiler.profileLower(UTF8String.fromString(low), lookup)
    assert(p(0) === countMatches(wsTok, low), s"lower n_tokens on: [$s]")
    // n_nonws = code points across all \S+ matches
    val m = wsTok.matcher(low)
    var nonws = 0L
    while (m.find()) nonws += m.group().codePointCount(0, m.group().length)
    assert(p(1) === nonws, s"n_nonws on: [$s]")
    assert(p(2) === countMatches(alphaTok, low), s"n_alpha on: [$s]")
    swPats.zipWithIndex.foreach { case (sp, i) =>
      assert(p(3 + i) === countMatches(sp, low), s"sw_$i on: [$s]")
    }
  }

  test("adversarial literals match the regex specifications") {
    Seq(
      "", " ", "  a  b  ", "the", "The AND of", "the.and,of", "theand",
      "the_and", "the1 and2", "#", "##", "...", "....", ".....", "..",
      "#...", "a...b", "…", "….…", "hash#tag", "!@#$%^&*()",
      "a\tb\ncd\fe\rf", "9 lives", "_underscore_", "der die das",
      "le les de du", "el de que y", "mixed der of le el", "thé and",
      "theé", "cafe… touché...", "ALL CAPS TEXT", "MiXeD cAsE tHe",
      "пример текст the", "中文 the 中文", "emoji 😀 the 😀",
      "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 the", "tab\tthe\ttab", "dots... the ...dots",
      "a#b...c…d", "1.2.3", "version...", "e.g. i.e. etc.",
      "the  the   the", " the ", "the\n", "\nthe")
      .foreach(check)
  }

  test("randomized strings match the regex specifications (3000 trials)") {
    val rnd = new scala.util.Random(20260813L)
    val alpha = "the and der die le el of to #.… \t\n_019éTHEAND"
    val tokens = Seq("the", "and", "der", "que", "de", "...", "#", "…",
      " ", "\t", "_", "é", "Σ", "😀", "word", "W9")
    (1 to 3000).foreach { _ =>
      val sb = new StringBuilder
      val parts = rnd.nextInt(16)
      (0 until parts).foreach { _ =>
        if (rnd.nextInt(3) == 0) sb.append(tokens(rnd.nextInt(tokens.length)))
        else sb.append(alpha.charAt(rnd.nextInt(alpha.length)))
      }
      check(sb.toString)
    }
  }
}
