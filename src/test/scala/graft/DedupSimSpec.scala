package graft

import org.apache.spark.sql.functions._

/** Quality checks for the approximate dedup/similarity operators that
  * have no SQL oracle (SURVEY.md §2.9): MinHash estimates vs exact
  * Jaccard, SimHash hamming bounds, LSH ANN recall. All inputs are the
  * deterministic graded corpus, so the assertions are exact and
  * stable. */
class DedupSimSpec extends SparkTestBase {

  /** Brute-force 3-gram Jaccard pairs computed independently in Scala. */
  private lazy val exactJaccard: Map[(Long, Long), Double] = {
    val docs = Tables
      .documents(spark, sf0001)
      .select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
      .filter(_._2.length >= 3)
    val sets = docs.map { case (id, ts) =>
      id -> ts.sliding(3).map(_.mkString(" ")).toSet
    }
    (for {
      (i, si) <- sets
      (j, sj) <- sets
      if i < j
      common = (si & sj).size
      if common > 0
    } yield (i, j) -> common.toDouble / (si.size + sj.size - common)).toMap
  }

  test("dedup_ngram_jaccard matches an independent brute-force computation") {
    val got = text.Dedup
      .dedupNgramJaccard(spark, sf0001)
      .collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")) -> r.getAs[Double]("jac"))
      .toMap
    val want = exactJaccard.filter(_._2 >= 0.1)
    assert(got.keySet == want.keySet, s"pair sets differ: got=${got.keySet.size} want=${want.keySet.size}")
    got.foreach { case (k, j) =>
      assert(math.abs(j - want(k)) < 1e-4, s"jaccard mismatch at $k: $j vs ${want(k)}")
    }
  }

  test("minhash candidates: estimates near exact jaccard, high-sim pairs recalled") {
    val cand = text.Dedup
      .dedupMinhashNear(spark, sf0001)
      .collect()
      .map(r =>
        (r.getAs[Long]("d1"), r.getAs[Long]("d2")) ->
          (r.getAs[Double]("est_jac"), r.getAs[Double]("jac"))
      )
      .toMap
    assert(cand.nonEmpty, "LSH produced no candidates")
    // 16 hashes -> binomial std ~0.125; 0.4 is a >3-sigma tolerance
    cand.foreach { case (k, (est, exact)) =>
      assert(math.abs(est - exact) <= 0.4, s"estimate too far at $k: est=$est exact=$exact")
    }
    // every very-similar pair must be caught by at least one band
    val mustFind = exactJaccard.filter(_._2 >= 0.9).keySet
    assert(
      mustFind.subsetOf(cand.keySet),
      s"missed near-dup pairs: ${mustFind -- cand.keySet}"
    )
  }

  test("simhash pairs: bounded hamming, includes the strongest text near-dups") {
    val got = text.Dedup
      .dedupSimhash(spark, sf0001)
      .collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Int]("hamming")))
    assert(got.nonEmpty, "simhash produced no pairs")
    got.foreach { case (d1, d2, h) =>
      assert(d1 < d2 && h >= 0 && h <= 3, s"bad pair ($d1,$d2,$h)")
    }
  }

  test("simhash64 expression reproduces the exploded pipeline bit-for-bit") {
    for (sf <- Seq(sf0001, sf001)) {
      val slow = text.Dedup
        .dedupSimhash(spark, sf)
        .collect()
        .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Int]("hamming")))
        .toSet
      // fallback off: a broken doGenCode must throw, not silently
      // run interpreted
      spark.conf.set("spark.sql.codegen.fallback", "false")
      val fast =
        try
          text.Dedup
            .dedupSimhashFast(spark, sf)
            .collect()
            .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Int]("hamming")))
            .toSet
        finally spark.conf.set("spark.sql.codegen.fallback", "true")
      assert(fast == slow, s"$sf: fused simhash diverged (${fast.size} vs ${slow.size} pairs)")
    }
  }

  test("sim_pairs_ann: subset of brute force with exact scores, recall ≥ 0.8") {
    for (sf <- Seq(sf0001, sf001)) {
      val brute = sim.Similarity
        .simCosinePairs(spark, sf)
        .collect()
        .map(r => (r.getAs[Long]("v1"), r.getAs[Long]("v2")) -> r.getAs[Double]("cos"))
        .toMap
      val ann = sim.Similarity
        .simPairsAnn(spark, sf)
        .collect()
        .map(r => (r.getAs[Long]("v1"), r.getAs[Long]("v2")) -> r.getAs[Double]("cos"))
        .toMap
      // no false positives: every ANN pair is a true pair, same exact score
      ann.foreach { case (k, c) =>
        assert(brute.contains(k), s"$sf: false positive $k")
        assert(math.abs(brute(k) - c) < 1e-9, s"$sf: score mismatch at $k")
      }
      val recall = ann.size.toDouble / brute.size
      assert(recall >= 0.8, s"$sf: recall $recall (${ann.size}/${brute.size})")
    }
  }

  test("dedup_embed_ann: subset of brute force with exact scores, recall ≥ 0.75") {
    for (sf <- Seq(sf0001, sf001)) {
      val brute = sim.Similarity
        .dedupEmbedCosine(spark, sf)
        .collect()
        .map(r => (r.getAs[Long]("v1"), r.getAs[Long]("v2")) -> r.getAs[Double]("cos"))
        .toMap
      val ann = sim.Similarity
        .dedupEmbedAnn(spark, sf)
        .collect()
        .map(r => (r.getAs[Long]("v1"), r.getAs[Long]("v2")) -> r.getAs[Double]("cos"))
        .toMap
      ann.foreach { case (k, c) =>
        assert(brute.contains(k), s"$sf: false positive $k")
        assert(math.abs(brute(k) - c) < 1e-9, s"$sf: score mismatch at $k")
      }
      val recall = ann.size.toDouble / brute.size
      assert(recall >= 0.75, s"$sf: recall $recall (${ann.size}/${brute.size})")
    }
  }

  test("lsh 8×4 banding prunes sharply on clustered data, full near-dup recall") {
    import spark.implicits._
    // 20 tight clusters of 25 vectors (base direction + 5% noise): the
    // true near-dup regime the wide-band operating point is built for.
    val rnd = new scala.util.Random(7)
    val rows = (0 until 20).flatMap { ci =>
      val base = Array.fill(64)(rnd.nextGaussian())
      (0 until 25).map { j =>
        val v = base.map(x => (x + rnd.nextGaussian() * 0.05).toFloat)
        (ci.toLong * 25 + j, v, ci.toString)
      }
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val bk = sim.Similarity.lshBucketsFor(df, 8, 4)
    val cand = bk
      .select(col("vec_id").as("v1"), col("t"), col("bkey"))
      .join(bk.select(col("vec_id").as("v2"), col("t"), col("bkey")), Seq("t", "bkey"))
      .filter(col("v1") < col("v2"))
      .select("v1", "v2")
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val total = 500L * 499 / 2
    // sharp pruning: way below the all-pairs space
    assert(
      cand.size < total / 5,
      s"pruning too weak: ${cand.size} of $total pairs are candidates"
    )
    // ≥99% recall of the 6000 same-cluster near-dup pairs (a copy that
    // straddles a hyperplane in all 4 tables can be missed — measured
    // 17/6000 here; that residual is what multi-probe would close)
    val sameCluster = (for {
      ci <- 0 until 20; i <- 0 until 25; j <- (i + 1) until 25
    } yield (ci.toLong * 25 + i, ci.toLong * 25 + j)).toSet
    val missed = sameCluster -- cand
    assert(
      missed.size <= sameCluster.size / 100,
      s"missed ${missed.size} of ${sameCluster.size} same-cluster pairs"
    )
  }

  test("multi-probe lsh recall ≥ single-probe recall vs exact top-10") {
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sf001)
    def resultMap(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect()
        .map(r => r.getAs[Long]("pid") -> r.getAs[Long]("vec_id"))
        .groupBy(_._1)
        .view
        .mapValues(_.map(_._2).toSet)
        .toMap
    val single = resultMap(sim.Similarity.simAnnLsh(spark, sf001))
    val multi = resultMap(sim.Similarity.simAnnMultiprobe(spark, sf001))
    def exactTop10(pid: Long): Set[Long] =
      emb
        .toDF("v1", "e1", "l1")
        .filter(col("v1") === pid)
        .crossJoin(emb.toDF("v2", "e2", "l2").filter(col("v2") =!= pid))
        .select(col("v2"), expr("cosine_sim(e1, e2)").as("c"))
        .orderBy(col("c").desc, col("v2"))
        .limit(10)
        .collect()
        .map(_.getLong(0))
        .toSet
    var recS, recM = 0
    for (pid <- 0L until 5L) {
      val exact = exactTop10(pid)
      recS += (single.getOrElse(pid, Set.empty) & exact).size
      recM += (multi.getOrElse(pid, Set.empty) & exact).size
    }
    info(s"exact-top10 hits over 5 probes: single=$recS multi=$recM (of 50)")
    assert(recM >= recS, s"multi-probe lost recall: $recM < $recS")
    assert(recM > 0, "multi-probe found no true neighbors")
  }

  test("ann-lsh returns true neighbors: overlap with exact top-10 per probe") {
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sf0001)
    val ann = sim.Similarity
      .simAnnLsh(spark, sf0001)
      .collect()
      .map(r => r.getAs[Long]("pid") -> r.getAs[Long]("vec_id"))
      .groupBy(_._1)
      .view
      .mapValues(_.map(_._2).toSet)
      .toMap
    assert(ann.nonEmpty, "ANN returned nothing")
    ann.foreach { case (pid, neighbors) =>
      val exact = emb
        .toDF("v1", "e1", "l1")
        .filter(col("v1") === pid)
        .crossJoin(emb.toDF("v2", "e2", "l2").filter(col("v2") =!= pid))
        .select(col("v2"), expr("cosine_sim(e1, e2)").as("c"))
        .orderBy(col("c").desc, col("v2"))
        .limit(10)
        .collect()
        .map(_.getLong(0))
        .toSet
      assert(
        (neighbors & exact).nonEmpty,
        s"probe $pid: no overlap between ANN $neighbors and exact $exact"
      )
    }
  }
}
