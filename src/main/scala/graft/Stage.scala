package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-once / serve-many staging for derived index tables — the
  * round-8 "persist the index" half of the ANN/graph architecture.
  *
  * Several query families derive the SAME expensive intermediate from
  * a source table before doing their own (cheap) work: the near-dup
  * jaccard edge set feeds seven graph/cluster keys, and the PQ code
  * assignment feeds three IVF-PQ keys. Recomputing that intermediate
  * inside every query is correct but pays the dominant cost N times —
  * at 100 TB the shingle self-join or the code-assignment pass IS the
  * pipeline, and a production deployment materializes it once (an
  * index/silver table in the warehouse) and points every consumer at
  * the stored form. `table` is that contract in library form: the
  * first caller builds and writes parquet, every later caller — same
  * JVM or a fresh one — gets a plain parquet scan, with full Catalyst
  * pushdown/pruning into the stored table.
  *
  * Freshness is structural, not TTL-based: the staging path embeds a
  * fingerprint (mtime + length) of every SOURCE file the build reads,
  * so a changed input can never serve a stale index — it simply maps
  * to a new path and rebuilds. On a real cluster the equivalent key is
  * the source table's snapshot/commit id. Parquet round-trips longs,
  * doubles, and strings losslessly, so a staged intermediate is
  * bit-identical to the inline computation and every consumer remains
  * oracle-hash-checkable.
  *
  * Single-writer by assumption (build jobs are idempotent overwrites,
  * and concurrent IN-PROCESS callers serialize on the build lock);
  * cross-process races at worst rebuild the same content. The `force`
  * flag is the explicit REBUILD entry point (`sim_index_build`,
  * `graph_edges_stage`) — refresh-after-upstream-change as a
  * first-class operation rather than a cache side effect.
  */
object Stage {
  private val buildLock = new Object

  /** Staging root — tmpdir in this sandbox; a warehouse path in
    * production (same precedent as Scans' graft_io sinks). */
  def root: String = s"${sys.props("java.io.tmpdir")}/graft_stage"

  private def fingerprint(dir: String, inputs: Seq[String]): String = {
    val parts = inputs.sorted.map { n =>
      val f = new java.io.File(s"$dir/$n.parquet")
      s"$n:${f.lastModified}:${f.length}"
    }
    val h = scala.util.hashing.MurmurHash3.stringHash((dir +: parts).mkString("|"))
    (h.toLong & 0xffffffffL).toHexString
  }

  /** Path of the staged table for `name` derived from `inputs` under
    * `dir` — stable for unchanged inputs, new for changed ones. */
  def pathFor(dir: String, name: String, inputs: Seq[String]): String =
    s"$root/${name}_${fingerprint(dir, inputs)}"

  /** The source fingerprint alone — for derived CATALOG identifiers
    * (e.g. the stats_analyze table name) that need the same
    * changed-input-means-new-identity contract as staged paths. */
  def fp(dir: String, inputs: Seq[String]): String = fingerprint(dir, inputs)

  /** Read the staged table, building it first iff absent (or `force`).
    * `build` must be deterministic in its inputs — every consumer's
    * oracle recomputes the intermediate from source, so staged and
    * inline results must agree bit-for-bit (they do: the builds are
    * exact dataflows, no sampling or time dependence). */
  def table(spark: SparkSession, dir: String, name: String, inputs: Seq[String])(
      build: => DataFrame
  ): DataFrame = {
    val path = pathFor(dir, name, inputs)
    buildLock.synchronized {
      if (!new java.io.File(s"$path/_SUCCESS").exists())
        build.write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path)
  }

  /** Unconditional rebuild — the explicit index-refresh operation. */
  def rebuild(spark: SparkSession, dir: String, name: String, inputs: Seq[String])(
      build: => DataFrame
  ): DataFrame = {
    val path = pathFor(dir, name, inputs)
    buildLock.synchronized {
      build.write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path)
  }

  /** Housekeeping — the retention half of the staging contract.
    * Fingerprinted paths make freshness structural, but every source
    * change ORPHANS the previous fingerprint's directory: nothing will
    * ever read it again, and nothing else deletes it. `gc` removes
    * exactly those: staged directories whose name prefix matches a
    * live (dir, name, inputs) binding but whose fingerprint is no
    * longer the one those sources map to. Directories with prefixes
    * NOT in `live` are left untouched — a deployment that gc's with a
    * partial binding list must not eat siblings it doesn't know about
    * (on a real cluster this runs against the warehouse staging
    * prefix, keyed on table snapshot ids instead of mtimes). Returns
    * the deleted paths. */
  def gc(live: Seq[(String, String, Seq[String])]): Seq[String] =
    buildLock.synchronized {
      val keep = live.map { case (d, n, in) => pathFor(d, n, in) }.toSet
      val prefixes = live.map { case (_, n, _) => s"${n}_" }.distinct
      val rootDir = new java.io.File(root)
      val gone = Option(rootDir.listFiles()).getOrElse(Array.empty).toSeq
        .filter(_.isDirectory)
        .filter(f => prefixes.exists(f.getName.startsWith))
        .filterNot(f => keep.contains(f.getPath))
      gone.foreach { f =>
        def rm(x: java.io.File): Unit = {
          Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
          x.delete(): Unit
        }
        rm(f)
      }
      gone.map(_.getPath)
    }
}
