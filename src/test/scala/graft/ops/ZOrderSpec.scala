package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ZOrderSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Bit-by-bit Morton reference: z bit 2i = x bit i, z bit 2i+1 = y bit i. */
  private def mortonRef(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (z, i) =>
      z | ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
    }

  test("zValue16 matches the bit-by-bit Morton reference") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (255L, 256L), (32768L, 1L))
    val got = pts.toDF("x", "y")
      .select($"x", $"y", ZOrder.zValue16($"x", $"y").as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == mortonRef(x, y), s"($x,$y): got $z want ${mortonRef(x, y)}")
    }
  }

  test("adjacent cells differ in low bits: z is monotone on each dimension slice") {
    // fixing y, z must be strictly increasing in x (interleave preserves order
    // within a dimension)
    val zs = (0L to 300L).map(x => mortonRef(x, 77L))
    assert(zs == zs.sorted)
    val got = (0L to 300L).map(Tuple1(_)).toDF("x")
      .select(ZOrder.zValue16($"x", lit(77L)).as("z"))
      .orderBy("z").as[Long].collect().toSeq
    assert(got == zs.sorted)
  }

  test("the generated SQL text computes the same z-values (evaluated by Spark SQL)") {
    // Spark 4 parses <<, & and | natively, so the DuckDB-oracle text can be
    // cross-checked in-engine against the Column implementation
    val df = Seq((3L, 5L), (100L, 200L), (65535L, 0L)).toDF("x", "y")
    df.createOrReplaceTempView("zorder_vals")
    val sqlZ = spark.sql(
      s"SELECT ${ZOrder.zValue16Sql("x", "y")} AS z FROM zorder_vals ORDER BY z")
      .as[Long].collect().toSeq
    val colZ = df.select(ZOrder.zValue16($"x", $"y").as("z"))
      .orderBy("z").as[Long].collect().toSeq
    assert(sqlZ == colZ)
  }

  test("cluster range-partitions into non-overlapping z-ranges") {
    val df = (1L to 4000L).map(i => (i, i % 997, (i * 31) % 911)).toDF("id", "a", "b")
    val clustered = ZOrder.cluster(df, $"a", $"b", numPartitions = 8)
    val ranges = clustered
      .select(spark_partition_id().as("p"), $"zval")
      .groupBy("p").agg(min("zval").as("lo"), max("zval").as("hi"))
      .orderBy("p").as[(Int, Long, Long)].collect().toSeq
    assert(ranges.size > 1)
    ranges.sliding(2).foreach {
      case Seq((_, _, hi1), (_, lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }

  test("rejects non-positive partition counts") {
    intercept[IllegalArgumentException] {
      ZOrder.cluster(Seq((1L, 2L)).toDF("a", "b"), $"a", $"b", 0)
    }
  }
}
