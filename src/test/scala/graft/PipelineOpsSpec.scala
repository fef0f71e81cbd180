package graft

import org.apache.spark.sql.functions._

/** Semantic properties of the round-2 pipeline operators — invariants
  * the oracle hash can't express: chunk reassembly, normalization
  * idempotence, quantization error bounds, SCD2 interval laws, and
  * hash-sample stratum rates. */
class PipelineOpsSpec extends SparkTestBase {

  test("mm_shard_pack: shards partition the corpus, sizes bound, ranges disjoint") {
    val target = 64L * 1024
    val manifest = SparkEntry.queries("mm_shard_pack")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val total = Tables.documents(spark, sf0001).count()
    assert(manifest.map(_._2).sum == total, "every sample in exactly one shard")
    // shard ids contiguous from 0; doc ranges disjoint and ordered
    assert(manifest.map(_._1).toSeq == manifest.indices.map(_.toLong))
    manifest.sliding(2).foreach {
      case Array(a, b) => assert(a._5 < b._4, "shard id ranges must be ordered")
      case _           => ()
    }
    // atomic placement: a shard holds at least the bytes before its
    // boundary minus one sample, and overflows by at most one sample
    val maxDoc = Tables.documents(spark, sf0001)
      .agg(max(length(col("text")))).head.getInt(0).toLong
    manifest.dropRight(1).foreach { case (s, _, bytes, _, _) =>
      assert(bytes <= target + maxDoc, s"shard $s exceeds target + one sample")
      assert(bytes >= target - maxDoc, s"shard $s underfull: $bytes")
    }
  }

  test("mm_chunk: chunks reassemble to the original text, ids dense from 0") {
    val docs = Tables
      .documents(spark, sf0001)
      .select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    val chunks = Tables
      .documents(spark, sf0001)
      .select(
        col("doc_id"),
        posexplode(
          expr("transform(sequence(1, length(text), 256), i -> substring(text, i, 256))")
        )
      )
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .groupBy(_._1)
    chunks.foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == sorted.indices.toSeq, s"doc $id ids not dense")
      assert(sorted.map(_._3).mkString == docs(id), s"doc $id reassembly mismatch")
      sorted.dropRight(1).foreach { case (_, k, c) =>
        assert(c.length == 256, s"doc $id chunk $k not full-size")
      }
    }
  }

  test("text_normalize is idempotent and emits only [a-z0-9 ] singly-spaced") {
    val once = text.TextOps
      .textNormalize(spark, sf0001)
      .select("doc_id", "norm")
      .withColumnRenamed("norm", "text")
    val twice = once
      .withColumn(
        "norm2",
        regexp_replace(
          trim(regexp_replace(lower(col("text")), "[^a-z0-9 ]", " ")),
          " +",
          " "
        )
      )
      .filter(col("norm2") =!= col("text"))
    assert(twice.count() == 0, "normalization not idempotent")
    val bad = once.filter(col("text").rlike("[^a-z0-9 ]") || col("text").contains("  "))
    assert(bad.count() == 0, "residual junk characters or double spaces")
  }

  test("sim_quantize_int8: codes in [-127,127], dequantization error ≤ scale/254 + rounding slack") {
    val rows = sim.Similarity
      .simQuantizeInt8(spark, sf0001)
      .collect()
      .map(r =>
        (
          r.getAs[Long]("vec_id"),
          r.getAs[Double]("scale_r"),
          r.getAs[String]("q8").split(",").map(_.toInt)
        )
      )
    val emb = Tables
      .embeddings(spark, sf0001)
      .select("vec_id", "embedding")
      .collect()
      .map(r => r.getAs[Long](0) -> r.getSeq[Float](1).toArray)
      .toMap
    rows.foreach { case (id, scale, codes) =>
      assert(codes.forall(c => c >= -127 && c <= 127), s"vec $id code out of range")
      val orig = emb(id)
      assert(codes.length == orig.length, s"vec $id length mismatch")
      // scale_r is rounded to 6dp for the oracle; allow that slack too
      val tol = scale / 254.0 + 1e-6 * 127
      codes.zip(orig).foreach { case (c, x) =>
        val deq = c.toDouble / 127.0 * scale
        assert(
          math.abs(deq - x) <= tol + 1e-9,
          s"vec $id: |$deq - $x| > $tol"
        )
      }
    }
  }

  test("etl_scd2: per-user intervals chain exactly, one current row per user") {
    val rows = operators.Etl
      .etlScd2(spark, sf0001)
      .collect()
      .map(r =>
        (
          r.getAs[Long]("user_id"),
          r.getAs[java.sql.Timestamp]("valid_from"),
          Option(r.getAs[java.sql.Timestamp]("valid_to")),
          r.getAs[Boolean]("is_current"),
          r.getAs[Long]("event_id")
        )
      )
      .groupBy(_._1)
    rows.foreach { case (user, vs) =>
      val sorted = vs.sortBy(v => (v._2.getTime, v._5))
      assert(sorted.count(_._4) == 1, s"user $user: != 1 current row")
      assert(sorted.last._4 && sorted.last._3.isEmpty, s"user $user: last row not open")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3.contains(b._2), s"user $user: interval chain broken at ${a._5}")
        case _ => ()
      }
    }
  }

  test("etl_compact writes exactly the target number of data files") {
    operators.Scans.etlCompact(spark, sf0001).collect()
    val dir = new java.io.File(s"${sys.props("java.io.tmpdir")}/graft_io/documents_compact")
    val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == 2, s"expected 2 data files, got ${files.length}")
  }

  test("sink_codec writes zstd-compressed parquet data files") {
    operators.Scans.sinkCodec(spark, sf0001).collect()
    val dir = new java.io.File(s"${sys.props("java.io.tmpdir")}/graft_io/lineitem_zstd")
    val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty, "no parquet files written")
    assert(
      files.forall(_.getName.contains(".zstd.")),
      s"codec not zstd: ${files.map(_.getName).toSeq}"
    )
  }

  test("agg_countmin: never underestimates, overestimate within the ε bound") {
    val totalWords = Tables
      .documents(spark, sf001)
      .select(explode(split(col("text"), " ")).as("w"))
      .count()
    val rows = functions.Udfs
      .aggCountmin(spark, sf001)
      .collect()
      .map(r => (r.getAs[String]("w"), r.getAs[Long]("cnt"), r.getAs[Long]("est")))
    assert(rows.length == 20, s"expected 20 top terms, got ${rows.length}")
    // CMS guarantees: est ≥ true always; est ≤ true + (e/w)·N w.h.p.
    val eps = math.E / functions.Udfs.CountMin.Width
    rows.foreach { case (w, cnt, est) =>
      assert(est >= cnt, s"$w underestimated: $est < $cnt")
      assert(
        est <= cnt + (eps * totalWords).toLong + 1,
        s"$w overestimate beyond ε·N: est=$est true=$cnt N=$totalWords"
      )
    }
  }

  test("agg_heavy_hitters equals the exact top-20 from a full groupBy") {
    for (sf <- Seq(sf0001, sf001)) {
      val exact = Tables
        .documents(spark, sf)
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("w"))
        .limit(20)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)))
        .toSeq
      val got = functions.Udfs
        .aggHeavyHitters(spark, sf)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)))
        .toSeq
      assert(got == exact, s"$sf: heavy hitters diverged from exact top-20")
    }
  }

  test("etl_sample_hash: deterministic, stratum rates near 4/16, 2/16, 1/16") {
    val df = operators.Etl.etlSampleHash(spark, sf001)
    val again = operators.Etl.etlSampleHash(spark, sf001)
    assert(
      df.collect().map(_.getLong(0)).toSeq == again.collect().map(_.getLong(0)).toSeq,
      "sampling not deterministic"
    )
    val totals = Tables
      .orders(spark, sf001)
      .groupBy("o_orderstatus")
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val sampled = df
      .groupBy("o_orderstatus")
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    def rate(status: String): Double = sampled.getOrElse(status, 0L).toDouble / totals(status)
    // md5 is uniform; at these counts the binomial noise is < ±0.05
    assert(math.abs(rate("O") - 4.0 / 16) < 0.05, s"O rate ${rate("O")}")
    assert(math.abs(rate("F") - 2.0 / 16) < 0.05, s"F rate ${rate("F")}")
    assert(math.abs(rate("P") - 1.0 / 16) < 0.05, s"P rate ${rate("P")}")
  }
}
