package graft.text

import java.util.zip.Deflater

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Compression-ratio quality signal (the Gopher/C4 "repetitiousness"
  * filter SQL cannot express): deflate each document once and report
  * compressed/raw sizes. Heavily templated or looping text compresses
  * far below natural prose, so the ratio is a cheap single-scan proxy
  * for boilerplate — the standard companion to the token-level
  * repetition metrics in `TextStats`.
  *
  * Runs as `mapPartitions` with ONE reused `Deflater` per partition
  * (reset between docs) — the same batched-imperative shape as
  * `multimodal/Multimodal.decodeBatched`: per-partition setup amortized,
  * streaming output, nothing materialized. Map-only; at 100 TB this
  * rides the corpus scan. Deflate output length for a fixed level and
  * strategy is deterministic for a given zlib implementation, and the
  * cross-engine gate only crosses booleans/raw byte counts, so JVM zlib
  * versioning can never break the oracle.
  */
object Compressibility {

  final case class CompRow(doc_id: Long, raw_len: Long, comp_len: Long,
      comp2_len: Long)

  /** (idCol, textCol) → (doc_id, raw_len, comp_len, comp2_len) where
    * comp2_len = deflate(text ⧺ text) — the doubled-input size that
    * exposes long-range repetition (a compressor that "noticed" the
    * repeat keeps comp2 well under 2×comp).
    */
  def deflateSizes(df: DataFrame, idCol: String, textCol: String,
      level: Int = 6): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val deflater = new Deflater(level)
        val buf = new Array[Byte](1 << 16)
        def sizeOf(bytes: Array[Byte]): Long = {
          deflater.reset()
          deflater.setInput(bytes)
          deflater.finish()
          var total = 0L
          while (!deflater.finished())
            total += deflater.deflate(buf)
          total
        }
        rows.map { case (id, text) =>
          val raw = if (text == null) Array.emptyByteArray
            else text.getBytes("UTF-8")
          CompRow(id, raw.length.toLong, sizeOf(raw),
            sizeOf(raw ++ raw))
        }
      }
      .toDF()
  }
}
