package graft

import graft.operators.Compact
import java.nio.file.Files

class CompactSpec extends SparkSpecBase {

  test("writeSized bounds rows per file and clusters on the sort column") {
    val tmp = Files.createTempDirectory("graft-compact").toString
    val li = Tables.load(spark, sf(), "lineitem") // ~6k rows at sf0.001
    Compact.writeSized(li, s"$tmp/out", rowsPerFile = 1000, sortCols = Seq("l_orderkey"))
    val files = new java.io.File(s"$tmp/out").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 6, s"expected ~rows/1000 files, got ${files.length}")
    val back = spark.read.parquet(s"$tmp/out")
    assert(back.count() === li.count())
    // each file covers a narrow key range → min/max pruning works
    val one = spark.read.parquet(files.head.getAbsolutePath)
      .agg(org.apache.spark.sql.functions.countDistinct("l_orderkey")).head().getLong(0)
    val all = li.agg(org.apache.spark.sql.functions.countDistinct("l_orderkey")).head().getLong(0)
    assert(one < all, "a single file must not span the whole key range")
  }
}
