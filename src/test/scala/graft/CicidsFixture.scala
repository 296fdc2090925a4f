package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** CICIDS2017-shaped fixture generator (FIXTURES.md §1): leading-space
  * headers, latin1-writable content, ±inf rate columns, nulls, duplicate
  * rows, BENIGN/attack imbalance. Deterministic (seed 42).
  */
object CicidsFixture {

  val stringCols: Seq[String] = Seq("Flow ID", " Source IP",
    " Destination IP", " Timestamp", " Label")

  /** Representative subset of the 80 double feature columns. */
  val doubleCols: Seq[String] = Seq(" Source Port", " Destination Port",
    " Protocol", " Flow Duration", " Total Fwd Packets",
    "Total Length of Fwd Packets", "Flow Bytes/s", " Flow Packets/s",
    " Fwd Packet Length Max", " Fwd Packet Length Mean",
    " Flow IAT Mean", " SYN Flag Count", " ACK Flag Count",
    " Down/Up Ratio", "Init_Win_bytes_forward", " Active Mean")

  val schema: StructType = StructType(
    stringCols.map(c => StructField(c, StringType)) ++
      doubleCols.map(c => StructField(c, DoubleType)))

  val attackLabels: Seq[String] = Seq("DDoS", "PortScan", "DoS Hulk",
    "FTP-Patator", "Web Attack – Brute Force")

  /** n rows, ~85% BENIGN, with ±inf in the rate columns, scattered nulls
    * and a handful of exact duplicate rows.
    */
  def generate(spark: SparkSession, n: Int = 400): DataFrame = {
    val rng = new scala.util.Random(42)
    def label(i: Int): String =
      if (rng.nextDouble() < 0.85) "BENIGN"
      else attackLabels(rng.nextInt(attackLabels.length))
    def rate(): Any = rng.nextInt(20) match {
      case 0 => Double.PositiveInfinity
      case 1 => Double.NegativeInfinity
      case 2 => null
      case _ => rng.nextDouble() * 1e6
    }
    val base = (0 until n).map { i =>
      val strs: Seq[Any] = Seq(
        s"flow-$i", s"192.168.0.${i % 250}", s"10.0.0.${i % 250}",
        f"03/07/2017 ${8 + i % 12}%02d:${i % 60}%02d:${i % 60}%02d",
        label(i))
      val dbls: Seq[Any] = Seq[Any](
        (1024 + i % 50000).toDouble, Seq(80.0, 443.0, 22.0)(i % 3),
        Seq(6.0, 17.0, 0.0)(i % 3), rng.nextDouble() * 1e7,
        (1 + rng.nextInt(100)).toDouble, rng.nextDouble() * 1e5,
        rate(), rate(),
        rng.nextDouble() * 1500, rng.nextDouble() * 800,
        if (rng.nextInt(30) == 0) null else rng.nextDouble() * 1e5,
        rng.nextInt(2).toDouble, rng.nextInt(2).toDouble,
        rng.nextDouble() * 4,
        (rng.nextInt(65536)).toDouble,
        if (rng.nextInt(25) == 0) null else rng.nextDouble() * 1e6)
      Row.fromSeq(strs ++ dbls)
    }
    // exact duplicates of the first 5 rows (U3 requirement)
    val rows = base ++ base.take(5)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 4), schema)
  }
}
