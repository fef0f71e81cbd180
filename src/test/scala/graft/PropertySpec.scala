package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Algebraic laws over randomized inputs (SURVEY.md §5.3), run through
  * plain scalacheck (no scalatest bridge in the offline cache). */
class PropertySpec extends SparkTestBase {

  import spark.implicits._

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15).withWorkers(1),
      prop
    )
    assert(res.passed, res.status.toString)
  }

  private val rows: Gen[List[(Int, Int)]] =
    Gen.listOfN(40, Gen.zip(Gen.chooseNum(0, 5), Gen.chooseNum(-100, 100)))

  test("filter/projection commute (pushdown invariance)") {
    check(Prop.forAll(rows) { xs =>
      val df = xs.toDF("k", "v")
      val a = df.filter($"v" > 0).select($"k", ($"v" * 2).as("d")).groupBy("k").sum("d").collect().map(r => (r.getInt(0), r.getLong(1))).toSet
      val b = df.select($"k", ($"v" * 2).as("d"), $"v").filter($"v" > 0).groupBy("k").sum("d").collect().map(r => (r.getInt(0), r.getLong(1))).toSet
      a == b
    })
  }

  test("union+distinct is commutative") {
    check(Prop.forAll(rows, rows) { (xs, ys) =>
      val a = xs.toDF("k", "v").union(ys.toDF("k", "v")).distinct().collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      val b = ys.toDF("k", "v").union(xs.toDF("k", "v")).distinct().collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      a == b
    })
  }

  test("z-order interleave is a bijection: de-interleave recovers (x, y)") {
    val xy: Gen[List[(Int, Int)]] =
      Gen.listOfN(40, Gen.zip(Gen.chooseNum(0, 255), Gen.chooseNum(0, 255)))
    // scala mirror of SetOps.zExpr (same bit placement)
    def interleave(x: Int, y: Int): Long =
      (0 until 8).foldLeft(0L) { (z, b) =>
        z | (((x >> b) & 1).toLong << (2 * b)) | (((y >> b) & 1).toLong << (2 * b + 1))
      }
    def deinterleave(z: Long): (Int, Int) = {
      var x = 0; var y = 0
      for (b <- 0 until 8) {
        x |= (((z >> (2 * b)) & 1L) << b).toInt
        y |= (((z >> (2 * b + 1)) & 1L) << b).toInt
      }
      (x, y)
    }
    check(Prop.forAll(xy) { xs =>
      // the SQL fragment and the scala mirror agree, and the code is invertible
      val df = xs.toDF("zx", "zy")
      val viaSql = df
        .withColumn("z", expr(operators.SetOps.zExprSql).cast("long"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2)))
      viaSql.forall { case ((x, y), z) =>
        z == interleave(x, y) && deinterleave(z) == ((x, y))
      }
    })
  }

  test("windowed running sum equals per-key prefix sum") {
    check(Prop.forAll(rows) { xs =>
      val indexed = xs.zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
      val df = indexed.toDF("k", "v", "seq")
      val w = Window.partitionBy("k").orderBy("seq").rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val got = df
        .withColumn("rs", sum($"v").over(w))
        .collect()
        .map(r => (r.getInt(0), r.getLong(2)) -> r.getLong(3))
        .toMap
      val want = indexed
        .groupBy(_._1)
        .flatMap { case (k, g) =>
          val sorted = g.sortBy(_._3)
          sorted.zip(sorted.scanLeft(0L)(_ + _._2.toLong).tail).map { case ((_, _, seq), rs) => (k, seq) -> rs }
        }
      got == want
    })
  }
}
