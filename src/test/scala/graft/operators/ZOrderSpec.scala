package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  // reference Morton code, bit by bit
  private def mortonRef(x: Int, y: Int): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc |
        (((x >> i) & 1).toLong << (2 * i)) |
        (((y >> i) & 1).toLong << (2 * i + 1))
    }

  test("zvalue matches the bit-by-bit Morton reference") {
    val pts = Seq((0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321),
      (255, 256), (32768, 1))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zvalue(col("x"), col("y")).as("zv"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) === mortonRef(x, y), s"($x,$y)")
    }
  }

  test("z layout skips files on BOTH dimensions; linear layout only on one") {
    // 64x64 grid; 16 write partitions. A y-selective box query can prune
    // a partition iff the partition's y min/max range misses the box.
    val n = 64
    val grid = (for { x <- 0 until n; y <- 0 until n } yield (x, y))
      .toDF("x", "y").repartition(8)

    def touchedFraction(df: org.apache.spark.sql.DataFrame,
        lo: Int, hi: Int): Double = {
      val stats = df
        .select(spark_partition_id().as("pid"), col("x"), col("y"))
        .groupBy("pid")
        .agg(min("y").as("ymin"), max("y").as("ymax"))
        .collect()
      val touched = stats.count(r => r.getAs[Int]("ymax") >= lo && r.getAs[Int]("ymin") <= hi)
      touched.toDouble / stats.length
    }

    val zLaid = ZOrder.layout(grid, col("x"), col("y"), 16)
    val linear = grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")

    // y in [0, 7]: an eighth of the value space
    val zTouched = touchedFraction(zLaid, 0, 7)
    val linTouched = touchedFraction(linear, 0, 7)
    assert(linTouched === 1.0,
      s"x-linear layout cannot prune a y predicate, got $linTouched")
    assert(zTouched <= 0.5,
      s"z layout should skip most partitions for a y box, touched $zTouched")

    // and the z layout still prunes x predicates too (x in [0, 7])
    val statsX = zLaid
      .select(spark_partition_id().as("pid"), col("x"))
      .groupBy("pid").agg(min("x").as("xmin"), max("x").as("xmax"))
      .collect()
    val xTouched = statsX.count(r => r.getAs[Int]("xmax") >= 0 && r.getAs[Int]("xmin") <= 7)
    assert(xTouched.toDouble / statsX.length <= 0.5,
      s"z layout should also skip for an x box, touched $xTouched/${statsX.length}")
  }
}
