package graft.tools

import org.apache.spark.sql.SparkSession

/** Regenerates [[graft.queries.JpegDecodePins]] from the live JDK codec:
  * prints the `pins` body to stdout — paste into JpegDecodePins.scala.
  * (The q161 pin-maintenance workflow, JPEG edition.) */
object GenJpegPins {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = graft.queries.Extensions.jpegDecode(spark, "")
      .orderBy("doc_id", "dim").collect()
    val body = rows.grouped(2).map(_.map { r =>
      s"(${r.getLong(0)}L, \"${r.getString(1)}\", ${r.getInt(2)}, " +
        s"${r.getInt(3)}, ${r.getInt(4)}, ${r.getInt(5)}, ${r.getLong(6)}L)"
    }.mkString(", ")).mkString(",\n    ")
    println("PINS_BEGIN")
    println("    " + body)
    println("PINS_END")
    spark.stop()
  }
}
