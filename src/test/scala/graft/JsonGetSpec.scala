package graft

import org.apache.spark.sql.functions._

/** Pins [[graft.functions.JsonGetTop]] byte-equal to the builtin
  * `get_json_object(json, "$.key")` — the PiiScrubber equivalence
  * discipline: adversarial literals plus randomized generated JSON and
  * randomized garbage, compared row-for-row against the builtin. */
class JsonGetSpec extends SparkSpec {

  private def compare(inputs: Seq[String], key: String = "k"): Unit = {
    val s = spark; import s.implicits._
    val df = inputs.toDF("j")
    val rows = df.select(col("j"),
        get_json_object(col("j"), "$." + key).alias("ref"),
        graft.functions.GraftFunctions.jsonGetTop(s, col("j"), key).alias("got"))
      .collect()
    rows.foreach { r =>
      assert(Option(r.getString(2)) === Option(r.getString(1)),
        s"divergence on [${r.getString(0)}]: builtin=${Option(r.getString(1))} kernel=${Option(r.getString(2))}")
    }
  }

  test("adversarial literals match the builtin") {
    compare(Seq(
      """{"k":1}""", """{"k":null}""", """{"k":"a\"b\nc"}""", """{"k":"A😀"}""",
      """{"x":{"k":9},"k":2}""", """{"k":1,"k":2}""", """{"k":[1,2]}""",
      """{"k":{"a":1, "b":[2,3]}}""", """ { "k" : 7 } """, """{"k":1.5e3}""",
      """{"k":true}""", """{"k":false}""", """{"k":012}""", """{"k":-012}""",
      """{"k":1}garbage""", """[{"k":1}]""", """"k"""", """{"k":}""",
      """{"notk":1}""", """{"k" 1}""", """{"k":5}""", """{"k":"tab\tend"}""",
      """{}""", "", "null", """{"k":-0.5}""", """{"k":"", "j":3}""",
      """{"k":-0}""", """{"k":0}""", """{"k":1.50}""", """{"k":1e5}""",
      """{"k":1E+2}""", """{"k":1e-2}""", """{"k":123456789012345678901234567890}""",
      """{"k":9223372036854775807}""", """{"k":-9223372036854775808}""",
      """{"k":.5}""", """{"k":5.}""", """{"k":+5}""", """{"k":1e}""",
      """{"k":"Aé😀"}""", """{"k":"\q"}""", "{\"k\":\"\\" + "u00g1\"}",
      "{\"k\":\"\\" + "u0041ok\"}", "{\"k\":\"\\" + "ud83d\\" + "ude00\"}",
      """{"k":"unterminated""", """{"k":'single'}""", """{'k':1}""",
      """{"a":01,"k":1}""", """{"a":"x","k":2}""", """{"a":[{"k":9}],"k":3}""",
      """{"k":42}""", """{"k":[]}""", """{"k":{}}""",
      """{"k":[1,"two",null,true,{"x":[1.50]}]}""",
      """{"k":"line1
line2"}""",
      """{"k":NaN}""", """{"k":Infinity}""", """{"k":undefined}""",
      "{\"k\":\t5}", "{\"k\":\n6}", """{  "k"  :  [ 1 , 2 ]  }""",
      """{"a":1,"b":{"c":[{"k":0}]},"k":{"deep":{"er":"v"}}}""",
      """{"k":"\/slash"}""", """{"k":"back\\slash"}"""))
  }

  test("randomized generated JSON matches the builtin") {
    val rnd = new scala.util.Random(20260814L)
    def value(depth: Int): String = rnd.nextInt(if (depth > 2) 6 else 8) match {
      case 0 => rnd.nextInt(2000).toString
      case 1 => (rnd.nextDouble() * 100 - 50).toString
      case 2 => "\"" + ("s" * rnd.nextInt(3)) + (if (rnd.nextBoolean()) "\\n" else "") + "\""
      case 3 => "true"
      case 4 => "false"
      case 5 => "null"
      case 6 => "[" + Seq.fill(rnd.nextInt(3))(value(depth + 1)).mkString(",") + "]"
      case _ => "{" + Seq.fill(rnd.nextInt(3))(
        "\"" + ('a' + rnd.nextInt(4)).toChar + "\":" + value(depth + 1)).mkString(",") + "}"
    }
    val keys = Vector("k", "a", "b", "zz")
    val docs = (1 to 1500).map { _ =>
      "{" + Seq.fill(rnd.nextInt(5))(
        "\"" + keys(rnd.nextInt(keys.size)) + "\":" + value(0)).mkString(",") + "}"
    }
    compare(docs)
    compare(docs, key = "a")
  }

  test("randomized garbage never diverges from the builtin") {
    val rnd = new scala.util.Random(99L)
    val alphabet = "{}[]\",:\\ \t\nk10.e-+truefalsnuA😀"
    val docs = (1 to 3000).map { _ =>
      (0 until rnd.nextInt(30)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    compare(docs)
  }
}
