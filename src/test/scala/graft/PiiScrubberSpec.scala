package graft

import java.util.regex.Pattern

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.TextAnalysis
import graft.functions.PiiScrubber

/** Pins [[PiiScrubber]]'s equivalence contract: every scanner pass must
  * be byte-identical to `java.util.regex.replaceAll` on its pattern
  * (the DuckDB oracle replays that chain), across adversarial literals
  * and randomized PII-shaped strings. */
class PiiScrubberSpec extends AnyFunSuite {

  private val Seq(emailPat, ipPat, phonePat) =
    TextAnalysis.piiPatterns.map { case (p, _) => Pattern.compile(p) }

  private def refEmails(s: String) = emailPat.matcher(s).replaceAll("<EMAIL>")
  private def refIps(s: String) = ipPat.matcher(s).replaceAll("<IP>")
  private def refPhones(s: String) = phonePat.matcher(s).replaceAll("<PHONE>")
  private def refChain(s: String) = refPhones(refIps(refEmails(s)))

  private def checkAll(s: String): Unit = {
    assert(PiiScrubber.scrubEmails(s) === refEmails(s), s"emails on: [$s]")
    assert(PiiScrubber.scrubIps(s) === refIps(s), s"ips on: [$s]")
    assert(PiiScrubber.scrubPhones(s) === refPhones(s), s"phones on: [$s]")
    assert(PiiScrubber.scrub(s) === refChain(s), s"chain on: [$s]")
  }

  test("adversarial literals match java.util.regex byte-for-byte") {
    val cases = Seq(
      "", "@", "a@", "@b.cd", "a@b", "a@b.c", "a@b.cd", "a@b.cd!",
      "a@b.cd2", "a@b.c2d.ef", "a@b.cde@f.gh", "a@@b.cd", ".a@b.cd",
      "x+y_z%w@mail.example-host.co.uk rest", "user@mail.example.com!!!",
      "a@b.cd@e.fg", "pre a@b-._cd post", "a@-.cd", "a@b...cd", "a@b.-cd",
      "1.2.3.4", "a1.2.3.4", "_1.2.3.4", "1.2.3.4a", "1.2.3.4_",
      "1234.5.6.7", "1.2.3.4567", "1.2.3.4.5", "1.2.3.4.5.6.7.8",
      " 10.0.200.1 ", "0.0.0.0", "999.999.999.999", "1.2.3", "1..2.3.4",
      "v1.2.3.4-rc", "x 1.2.3.4, y", "10.12.2023", "2026-08-12",
      "+1 555-014-2222", "+49 30 1234", "+358-40-123-4567",
      "call +1 555-014-2222 now", "555-014-2222", "555 014 2222",
      "555-014-22223", "+1 23 45-67890", "+1 22 33-44a", "+1 22 33a",
      "x+1 22 33", "1+2 33 44", "+123-456-7890", "+123-456-7890x",
      "123-456-7890x", "a123-456-7890", "_555-014-2222", "+1 2 3",
      "+12345 67 89", "+1 555 0142222", "version 1.2.3 and 4.5.6.7.8",
      "ip 1.2.3.4 mail a@b.cd tel +1 555-014-2222 mixed",
      "1.2.3.4a@b.cd5.6.7.8", "e@1.2.3.4", "a@1.2.3.4com",
      "+1 555-014-2222@x.yz", "tel:+1-555-014-2222",
      "+1-555-014-2222-99", "+1-555-014-2222-999999",
      "ünïcode a@b.cd ünïcode 1.2.3.4 ünïcode",
      "emoji 😀 a@b.cd 😀")
    cases.foreach(checkAll)
  }

  test("randomized PII-shaped strings match java.util.regex (5000 trials)") {
    val rnd = new scala.util.Random(20260813L)
    // alphabet weighted toward pattern-relevant chars
    val alpha = "ab9810. .-+_@%:/, \tco" + "用е"
    val tokens = Seq("a@b.cd", "1.2.3.4", "+1 22-33", "555-014-2222",
      "@", "..", "999", "x", " ", "-", "+", "co.uk", "%20", "_")
    (1 to 5000).foreach { _ =>
      val sb = new StringBuilder
      val parts = rnd.nextInt(12)
      (0 until parts).foreach { _ =>
        if (rnd.nextInt(4) == 0) sb.append(tokens(rnd.nextInt(tokens.length)))
        else sb.append(alpha.charAt(rnd.nextInt(alpha.length)))
      }
      checkAll(sb.toString)
    }
  }

  test("unchanged inputs return the same reference (no allocation)") {
    val clean = "no personal data here at all"
    assert(PiiScrubber.scrub(clean) eq clean)
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(
      "letters only, no at-sign, no digits")
    assert(PiiScrubber.scrubUTF8(u) eq u)
  }
}
