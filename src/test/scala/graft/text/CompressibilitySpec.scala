package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CompressibilitySpec extends SparkSpec {

  import spark.implicits._

  private def sizes(texts: (Long, String)*): Map[Long, (Long, Long, Long)] =
    Compressibility.deflateSizes(texts.toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, r, c, c2) => id -> (r, c, c2) }.toMap

  test("repetitive text compresses harder than varied text") {
    val rep = "spam ham " * 200
    val varied = (1 to 400).map(i => s"w${i * 7919}").mkString(" ")
    val m = sizes(1L -> rep, 2L -> varied)
    val (rRaw, rComp, _) = m(1L)
    val (vRaw, vComp, _) = m(2L)
    assert(rComp.toDouble / rRaw < vComp.toDouble / vRaw / 2)
    assert(rComp > 0 && vComp > 0 && rComp < rRaw && vComp < vRaw)
  }

  test("doubled input exposes the long-range repeat") {
    val text = (1 to 300).map(i => s"tok${i * 31}").mkString(" ")
    val (_, comp, comp2) = sizes(1L -> text)(1L)
    // the second copy is one back-reference, not a second payload
    assert(comp2 < comp + comp / 4)
  }

  test("null and empty text degrade to zero-length raw, nonzero deflate") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, ""))
      .toDF("doc_id", "text")
    val m = Compressibility.deflateSizes(df, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, r, c, c2) => id -> (r, c, c2) }.toMap
    assert(m(1L)._1 === 0L && m(2L)._1 === 0L)
    // deflate of empty input still emits the stream trailer
    assert(m(1L)._2 > 0L && m(2L)._2 > 0L)
  }
}
