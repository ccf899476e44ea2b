package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The codegen'd register kernel must be BIT-IDENTICAL to the composed
  * built-in spelling (`conv(substring(md5(..),1,15),16,10)` +
  * `length(bin(w))`) — that spelling is what every DuckDB oracle mirrors,
  * so any divergence here is a silent cross-engine hash break.
  */
class HllRegisterSpec extends SparkSpec {
  import spark.implicits._

  private def stringSpelling(c: org.apache.spark.sql.Column, p: Int) = {
    val wBits = 60 - p
    val h = conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")
    val bucket = shiftrightunsigned(h, wBits)
    val w = h.bitwiseAND(lit((1L << wBits) - 1))
    val rank = when(w === 0L, lit(wBits + 1))
      .otherwise(lit(wBits + 1) - length(bin(w)))
    (bucket.cast("int"), rank.cast("int"))
  }

  test("packed (bucket, rank) equals the md5-string spelling for varied values and p") {
    // varied shapes: empty, unicode, long strings, numeric renderings —
    // plus enough random values that every rank band from the geometric
    // tail shows up
    val rnd = new scala.util.Random(42)
    val values = Seq("", "a", "0", "-1", "中文", "emoji 😀",
      "x" * 1000, "1969-12-31 23:59:59") ++
      (1 to 20000).map(_ => rnd.alphanumeric.take(rnd.nextInt(24) + 1).mkString)
    val df = values.toDF("v")
    for (p <- Seq(4, 6, 12)) {
      val (b0, r0) = stringSpelling(col("v"), p)
      val packed = HllRegister.hllRegister(col("v").cast("binary"), p)
      val diff = df.select(
          b0.as("b_ref"), r0.as("r_ref"),
          shiftrightunsigned(packed, 8).cast("int").as("b_new"),
          packed.bitwiseAND(lit(255L)).cast("int").as("r_new"))
        .filter(col("b_ref") =!= col("b_new") || col("r_ref") =!= col("r_new"))
        .count()
      assert(diff === 0L, s"divergence at p=$p")
    }
  }

  test("null in, null out (same as md5 of a null column)") {
    val df = Seq(Some("a"), None).toDF("v")
    val rows = df.select(
        HllRegister.hllRegister(col("v").cast("binary"), 6).as("pk"))
      .collect()
    assert(rows.count(_.isNullAt(0)) === 1)
  }

  test("non-binary input is a loud analysis error") {
    val df = Seq(1L).toDF("v")
    val e = intercept[Exception] {
      df.select(HllRegister.hllRegister(col("v"), 6)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("binary"))
  }
}
