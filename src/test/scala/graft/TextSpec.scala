package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpecBase {

  private def one(text: String) = {
    import spark.implicits._
    Seq(text).toDF("text")
  }

  private def evalInt(text: String, c: org.apache.spark.sql.Column): Int =
    one(text).select(c.cast("int")).head().getInt(0)

  test("token counts") {
    assert(evalInt("the quick  brown fox", tokenCount(col("text"))) === 4)
    assert(evalInt("hello, world! 42", bpeTokenCount(col("text"))) === 5)
    assert(evalInt("a.b,c", punctCount(col("text"))) === 2)
    assert(evalInt("x1y22", digitCount(col("text"))) === 3)
    assert(evalInt("the cat and the dog", stopwordCount(col("text"))) === 3)
  }

  test("langid heuristic picks dominant stopword family") {
    def lid(t: String) = one(t).select(langId(col("text"))).head().getString(0)
    assert(lid("the cat and the dog is here") === "en")
    assert(lid("el perro de la casa que ladra") === "es")
    assert(lid("你好世界") === "zh")
    assert(lid("xyzzy plugh") === "unknown")
  }

  test("fingerprint is invariant to case and whitespace runs") {
    def fp(t: String) = one(t).select(fingerprint(col("text"))).head().getString(0)
    assert(fp("Hello  World") === fp("hello world"))
    assert(fp("hello world") !== fp("hello worlds"))
  }
}
