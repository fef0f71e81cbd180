package graft.sim

import graft.functions.GraftFunctions
import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** §2.9 Similarity search over the `embeddings` table (SURVEY.md,
  * PAPERS.md top-k motif).
  *
  * The exact paths (`sim_cosine_pairs`, `sim_topk_nn`) use the native
  * `cosine_sim` Catalyst expression (graft.functions.CosineSim) — a
  * fused, codegen'd f64 kernel. Brute force is the correctness
  * baseline and is quadratic; `sim_ann_lsh` is the scale path:
  * random-hyperplane LSH buckets make the candidate join linear in
  * bucket occupancy, the standard trade at 100 TB (recall measured in
  * SimilaritySpec).
  */
object Similarity {

  /** 4 LSH tables × 8 hyperplanes × 64 dims, from a fixed seed. */
  private lazy val planes: Seq[Seq[Float]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(32)(Seq.fill(64)((rnd.nextDouble() * 2 - 1).toFloat))
  }

  /** All-pairs cosine ≥ 0.35. */
  val simCosinePairs: Q = (spark, dir) => {
    GraftFunctions.register(spark)
    val a = Tables.embeddings(spark, dir).toDF("v1", "e1", "l1")
    val b = Tables.embeddings(spark, dir).toDF("v2", "e2", "l2")
    a.join(b, col("v1") < col("v2"))
      .withColumn("cosu", expr("cosine_sim(e1, e2)"))
      .filter(col("cosu") >= 0.35)
      .select(col("v1"), col("v2"), round(col("cosu"), 4).as("cos"))
      .orderBy("v1", "v2")
  }

  /** Within-label near-duplicate vectors (cosine ≥ 0.2): the
    * embedding-space dedup variant. The label equality keeps the join
    * partitioned — each label's pairs are computed co-located. */
  val dedupEmbedCosine: Q = (spark, dir) => {
    GraftFunctions.register(spark)
    val a = Tables.embeddings(spark, dir).toDF("v1", "e1", "label")
    val b = Tables.embeddings(spark, dir).toDF("v2", "e2", "label")
    a.join(b, Seq("label"))
      .filter(col("v1") < col("v2"))
      .withColumn("cosu", expr("cosine_sim(e1, e2)"))
      .filter(col("cosu") >= 0.2)
      .select(col("v1"), col("v2"), col("label"), round(col("cosu"), 4).as("cos"))
      .orderBy("v1", "v2")
  }

  /** Exact top-10 neighbors of probe vec_id=0 — orderBy+limit compiles
    * to TakeOrderedAndProject (streaming heap, no full sort). */
  val simTopkNn: Q = (spark, dir) => {
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val probe =
      broadcast(emb.filter(col("vec_id") === 0).select(col("embedding").as("pe")))
    emb
      .filter(col("vec_id") =!= 0)
      .crossJoin(probe)
      .select(col("vec_id"), expr("cosine_sim(embedding, pe)").as("cosu"))
      .orderBy(col("cosu").desc, col("vec_id"))
      .limit(10)
      .select(col("vec_id"), round(col("cosu"), 6).as("cos"))
  }

  /** ANN: random-hyperplane LSH (4 tables × 8-bit keys), probes are
    * vec_id < 5; candidates share a bucket in any table, ranked by
    * exact cosine, top-10 per probe. */
  val simAnnLsh: Q = (spark, dir) => {
    GraftFunctions.register(spark)
    val bucketed = Tables
      .embeddings(spark, dir)
      .withColumn("pl", typedlit(planes))
      .withColumn("t", explode(sequence(lit(0), lit(3))))
      .withColumn(
        "bkey",
        expr(
          "concat_ws('', transform(sequence(0, 7)," +
            " p -> IF(cosine_sim(embedding, pl[t*8+p]) >= 0, '1', '0')))"
        )
      )
      .select("vec_id", "embedding", "t", "bkey")
    val probes = bucketed
      .filter(col("vec_id") < 5)
      .select(col("vec_id").as("pid"), col("embedding").as("pe"), col("t"), col("bkey"))
    val cand = probes
      .join(bucketed, Seq("t", "bkey"))
      .filter(col("pid") =!= col("vec_id"))
      .groupBy("pid", "vec_id")
      .agg(max(expr("cosine_sim(pe, embedding)")).as("cosu"))
    import org.apache.spark.sql.expressions.Window
    cand
      .withColumn(
        "rn",
        row_number().over(
          Window.partitionBy("pid").orderBy(col("cosu").desc, col("vec_id"))
        )
      )
      .filter(col("rn") <= 10)
      .select(col("pid"), col("vec_id"), round(col("cosu"), 4).as("cos"), col("rn"))
      .orderBy("pid", "rn")
  }

  val queries: Map[String, Q] = Map(
    "sim_cosine_pairs" -> simCosinePairs,
    "dedup_embed_cosine" -> dedupEmbedCosine,
    "sim_topk_nn" -> simTopkNn,
    "sim_ann_lsh" -> simAnnLsh
  )

  private val normCte =
    """WITH n AS (
      |  SELECT vec_id, label, embedding,
      |   sqrt((SELECT sum(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))
      |         FROM (SELECT unnest(embedding) x) z)) AS nrm
      |  FROM embeddings)""".stripMargin

  val oracles: Map[String, String] = Map(
    "sim_cosine_pairs" ->
      s"""$normCte
         |SELECT v1, v2, round(cosu, 4) AS cos FROM (
         |  SELECT a.vec_id AS v1, b.vec_id AS v2,
         |   (SELECT sum(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
         |    FROM (SELECT unnest(a.embedding) x, unnest(b.embedding) y) z)
         |   / (a.nrm * b.nrm) AS cosu
         |  FROM n a JOIN n b ON a.vec_id < b.vec_id) t
         |WHERE cosu >= 0.35 ORDER BY v1, v2""".stripMargin,
    "dedup_embed_cosine" ->
      s"""$normCte
         |SELECT v1, v2, label, round(cosu, 4) AS cos FROM (
         |  SELECT a.vec_id AS v1, b.vec_id AS v2, a.label AS label,
         |   (SELECT sum(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
         |    FROM (SELECT unnest(a.embedding) x, unnest(b.embedding) y) z)
         |   / (a.nrm * b.nrm) AS cosu
         |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id) t
         |WHERE cosu >= 0.2 ORDER BY v1, v2""".stripMargin,
    "sim_topk_nn" ->
      s"""$normCte,
         |p AS (SELECT embedding AS pe, nrm AS pn FROM n WHERE vec_id = 0),
         |c AS (SELECT e.vec_id,
         |  (SELECT sum(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
         |   FROM (SELECT unnest(e.embedding) x, unnest(p.pe) y) z)
         |  / (e.nrm * p.pn) AS cosu
         | FROM n e, p WHERE e.vec_id <> 0)
         |SELECT vec_id, round(cosu, 6) AS cos FROM c
         |ORDER BY cosu DESC, vec_id LIMIT 10""".stripMargin
    // sim_ann_lsh: approximate + hash-seeded — rows-only; recall
    // asserted against brute force in SimilaritySpec.
  )
}
