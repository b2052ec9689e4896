package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

class Round10hSpec extends SparkSpecBase {

  test("html strip: tags become spaces, whitespace collapses, words never splice") {
    import spark.implicits._
    val in = Seq(
      "<html><body><p>hello</p><p>world</p></body></html>",
      "a<br>b",
      "no tags here",
      "<div class=\"x\" data-y='1'>inner</div>",
      "").toDF("h")
    val out = in.select(TextFunctions.stripHtmlTags(col("h")).as("t"))
      .collect().map(_.getString(0)).toList
    assert(out(0) === "hello world", "adjacent block contents separated")
    assert(out(1) === "a b", "a tag never splices words")
    assert(out(2) === "no tags here")
    assert(out(3) === "inner", "attributes with quotes strip with the tag")
    assert(out(4) === "")
  }

  test("mojibake count: marker occurrences, trailing markers, clean zero, NULL") {
    import spark.implicits._
    val in = Seq("clean text", "caffÃ©", "xÃ", "â€™ quote â€œ", null).toDF("t")
    val out = in.select(TextFunctions.mojibakeCount(col("t")).as("m"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getInt(0)).toList
    assert(out(0) === 0, "clean text has zero markers")
    assert(out(1) === 1, "one corrupted character")
    assert(out(2) === 1, "a TRAILING marker still counts (split keeps empties)")
    assert(out(3) === 2, "both smart-quote artifacts")
    assert(out(4) === null, "NULL in, NULL out")
  }
}
