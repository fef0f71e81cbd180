package graft

import org.apache.spark.sql.functions._

/** Semantic checks for the round-7 additions beyond the DuckDB parity
  * gate: identities against sequential reference implementations,
  * brute-force twins for the bin-join, and the privacy/repetition
  * invariants.
  */
class Round7Spec extends SparkTestBase {

  import spark.implicits._

  test("ts_cusum equals the sequential max(0, S+dev) recursion per type") {
    val out = operators.EventAnalytics
      .tsCusum(spark, sf0001)
      .collect()
      .map(r =>
        (r.getAs[String]("event_type"), r.getAs[java.sql.Date]("day").toString,
          r.getAs[Double]("x"), r.getAs[Double]("cusum"))
      )
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (_, rows) =>
      val series = rows.sortBy(_._2)
      val mu = series.map(_._3).sum / series.length
      var s = 0.0
      series.foreach { case (_, _, x, cusum) =>
        s = math.max(0.0, s + (x - mu))
        // cusum ships rounded to 4dp — compare on that grid
        assert(
          math.abs(s - cusum) < 5.1e-5,
          s"prefix-min identity diverged from the recursion: $s vs $cusum"
        )
      }
    }
  }

  test("ts_ewma equals the finite-horizon weighted mean computed directly") {
    val out = operators.EventAnalytics
      .tsEwma(spark, sf0001)
      .collect()
      .map(r =>
        (r.getAs[String]("prio"), r.getAs[java.sql.Date]("day").toLocalDate,
          r.getAs[Double]("rev"), r.getAs[Double]("ewma"))
      )
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (_, rows) =>
      val byDay = rows.map(r => r._2 -> r._3).toMap
      rows.foreach { case (_, d, _, ewma) =>
        val terms = (0 to 7).flatMap { j =>
          byDay.get(d.minusDays(j.toLong)).map(x => (math.pow(0.5, j) * x, math.pow(0.5, j)))
        }
        val expect = terms.map(_._1).sum / terms.map(_._2).sum
        assert(math.abs(expect - ewma) < 1e-3, s"closed form diverged: $expect vs $ewma")
      }
    }
  }

  test("join_interval_overlap bin-join equals the brute overlap predicate") {
    val ev = Tables.events(spark, sf0001)
    val spans = ev
      .groupBy(col("user_id"), to_date(col("ts")).as("sday"))
      .agg(min("ts").as("s"), max("ts").as("e"))
    val wins = spans
      .select(col("sday").as("day"))
      .distinct()
      .select(
        col("day"),
        (col("day").cast("timestamp") + expr("INTERVAL '10:30' HOUR TO MINUTE")).as("ws"),
        (col("day").cast("timestamp") + expr("INTERVAL '14:45' HOUR TO MINUTE")).as("we")
      )
    val brute = wins
      .join(spans, col("s") < col("we") && col("e") >= col("ws"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_overlap"))
      .collect()
      .map(r => r.getAs[java.sql.Date]("day").toString -> r.getAs[Long]("n_overlap"))
      .toMap
    val binned = operators.Joins
      .joinIntervalOverlap(spark, sf0001)
      .collect()
      .map(r => r.getAs[java.sql.Date]("day").toString -> r.getAs[Long]("n_overlap"))
      .toMap
    assert(binned == brute, s"bin-join diverged from brute overlap: $binned vs $brute")
  }

  test("etl_kanonymity: unsuppressed groups have >= k members, suppressed rows mask both QIs") {
    val rows = operators.Etl.etlKanonymity(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nq, sq, n, sup) = (
        r.getAs[String]("nation_q"),
        r.getAs[String]("segment_q"),
        r.getAs[Long]("grp_n"),
        r.getAs[Boolean]("suppressed")
      )
      if (sup) {
        assert(n < 5 && nq == "*" && sq == "*", s"suppressed row leaks a QI: $r")
      } else {
        assert(n >= 5 && nq != "*" && sq != "*", s"unsuppressed small group: $r")
      }
    }
    // masked rows must still be re-aggregatable: every surviving
    // (nation, segment) pair identifies at least k customers
    val survivors = rows.filterNot(_.getAs[Boolean]("suppressed"))
    survivors
      .groupBy(r => (r.getAs[String]("nation_q"), r.getAs[String]("segment_q")))
      .foreach { case (_, g) => assert(g.length >= 5) }
  }

  test("text_repetition matches a direct per-document computation") {
    val docs = Tables
      .documents(spark, sf0001)
      .select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    val out = text.TextOps.textRepetition(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.take(50).foreach { r =>
      val toks = docs(r.getAs[Long]("doc_id")).split(" ")
      val grams = toks.sliding(2).map(_.mkString(" ")).toSeq
      val counts = grams.groupBy(identity).map { case (_, v) => v.size }
      val total = counts.sum
      val dup = counts.filter(_ > 1).sum
      assert(r.getAs[Long]("n_grams") == total.toLong)
      assert(math.abs(r.getAs[Double]("dup_frac") - dup.toDouble / total) < 1e-5)
      assert(math.abs(r.getAs[Double]("top_frac") - counts.max.toDouble / total) < 1e-5)
    }
  }

  test("graph_jaccard pairs all share at least one neighbor and stay in (0, 1]") {
    val rows = text.Dedup.graphJaccard(spark, sf001).collect()
    rows.foreach { r =>
      val (common, du, dv, j) = (
        r.getAs[Long]("common"),
        r.getAs[Long]("deg_u"),
        r.getAs[Long]("deg_v"),
        r.getAs[Double]("nbr_jac")
      )
      assert(common >= 1 && common <= math.min(du, dv))
      assert(j > 0.0 && j <= 1.0)
    }
  }
}
