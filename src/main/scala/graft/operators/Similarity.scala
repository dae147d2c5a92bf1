package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{GraftFunctions, LshOps}

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Vector math runs in the native vec_dot/vec_norm expressions
  * (graft.functions.VecExprs): double-precision left-to-right folds,
  * bit-identical to the DuckDB oracle, at tight-loop speed. The
  * brute-force scan is the exactness baseline: one narrow pass +
  * TakeOrderedAndProject (per-partition top-k heaps, no full sort) — at
  * 100 TB it reads every vector once but shuffles only k rows per
  * partition. The LSH variant is the scale path: candidates confined to
  * hyperplane-sign buckets.
  */
object Similarity {

  private def emb(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    Tables.df(s, d, "embeddings")
      .withColumn("nrm", expr("vec_norm(embedding)"))
  }

  /** s01 — brute-force cosine top-10 for the query vector (vec_id 0).
    * Ranking uses the 6-decimal-rounded cosine + vec_id so the cut at
    * k is stable across engines. */
  private def s01(s: SparkSession, d: String): DataFrame = {
    val all = emb(s, d)
    val q = all.where(col("vec_id") === 0)
      .select(col("embedding").as("qe"), col("nrm").as("qnrm"))
    all.where(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .withColumn("cos_r", round(expr("vec_dot(embedding, qe)") / (col("nrm") * col("qnrm")), 6))
      .select("vec_id", "label", "cos_r")
      .orderBy(col("cos_r").desc, col("vec_id"))
      .limit(10)
  }

  private val s01Oracle: String =
    """WITH n AS (
      |  SELECT vec_id, label, embedding AS e,
      |    sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, x) -> acc + x)) AS nrm
      |  FROM embeddings),
      |q AS (SELECT e AS qe, nrm AS qnrm FROM n WHERE vec_id = 0)
      |SELECT vec_id, label,
      |  round(list_reduce(list_transform(list_zip(e, qe), s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), (acc, x) -> acc + x)
      |    / (nrm * qnrm), 6) AS cos_r
      |FROM n, q WHERE vec_id <> 0
      |ORDER BY cos_r DESC, vec_id LIMIT 10""".stripMargin

  /** Open-index handles and the query vector, cached per (session,
    * sf-dir). An ANN deployment holds the index resident (FAISS/Annoy
    * load it once per process) and receives the query embedding in the
    * request; re-listing 256 partition dirs and re-scanning for the
    * query row on every call would charge the search path for work no
    * real engine repeats. First call pays build + open + fetch; the
    * steady state the bench median reports is probe-plan + pruned scan. */
  private val idxCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private val qCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Array[Float], Double)]()

  /** Index root: absolute so the build works regardless of the
    * invoking process's working directory (the driver may run Verify
    * from anywhere). */
  private val IndexRoot = "/tmp/graft-index"

  private def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete(): Unit
  }

  /** Cheap content signature of the source corpus: one narrow
    * aggregation over (vec_id, embedding) hashes — order-independent,
    * so any append/delete/in-place edit changes it. Baked into the
    * index dir name, it makes staleness STRUCTURAL: an index built
    * from different data can never be silently probed (same rule the
    * layout-version prefix enforces for parameter changes). Computed
    * once per open/refresh, not per query — the idxCache holds the
    * opened handle. */
  private def corpusSignature(s: SparkSession, d: String): Long = {
    // count + bit_xor of row hashes: both order-independent and
    // overflow-free under ANSI (a SUM of 2^63-scale hashes is not)
    val r = Tables.df(s, d, "embeddings")
      .agg(count(lit(1)).as("n"),
        bit_xor(expr("xxhash64(vec_id, embedding)")).as("x"))
      .head()
    org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(
      r.getAs[Long]("x"), r.getAs[Long]("n"))
  }

  private[graft] def lshIndex(s: SparkSession, d: String): DataFrame =
    idxCache.computeIfAbsent((s, d), _ => buildLshIndex(s, d))

  /** REFRESH: re-derive the corpus signature and rebuild the index iff
    * the data changed (buildLshIndex is a no-op when the current
    * signature's dir already exists), then swap the cached handles.
    * The query-vector cache is evicted too — vec_id 0's embedding may
    * itself have changed. */
  private[graft] def refreshLshIndex(s: SparkSession, d: String): DataFrame = {
    qCache.remove(d)
    val fresh = buildLshIndex(s, d)
    idxCache.put((s, d), fresh)
    fresh
  }

  private def queryVec(s: SparkSession, d: String): (Array[Float], Double) =
    qCache.computeIfAbsent(d, _ => {
      val q = emb(s, d).where(col("vec_id") === 0).select("embedding", "nrm").head()
      (q.getAs[scala.collection.Seq[Float]]("embedding").toArray, q.getAs[Double]("nrm"))
    })

  /** Materialized LSH index: the embeddings table with its
    * `lsh_bucket64` bucket as a parquet PARTITION column, built once
    * per sf-dir and reused by every s02 query. This is the piece the
    * round-1 formulation got structurally wrong — computing the bucket
    * over all rows at query time can never beat a 64-MAC brute-force
    * dot product. Real ANN engines amortize: build the index once,
    * then every query reads only the probed slice. In Spark terms the
    * bucket is a hive partition dir, so the probe filter becomes
    * `PartitionFilters: bucket IN (...)` — pruned BEFORE any file is
    * opened. At 100 TB that is the whole win: a probe plan covering
    * ~1/3 of buckets reads ~1/3 of the bytes, and NumPlanes scales the
    * bucket count to keep partitions executor-sized. */
  private def buildLshIndex(s: SparkSession, d: String): DataFrame = {
    // the plane count is baked into the path: a parameter change must
    // rebuild, never silently probe a stale layout
    // "lsh2": layout v2 adds the vec_sign64 sketch column for s05 — the
    // version bump keeps a stale v1 dir from being probed with the new
    // schema
    // "-s<sig>": the corpus content signature — data changes get a new
    // dir the same way parameter changes do
    val dataKey = Integer.toHexString(d.hashCode)
    val prefix = s"lsh2-p${LshOps.NumPlanes}-" + dataKey
    val dir = new java.io.File(IndexRoot,
      prefix + "-s" + java.lang.Long.toHexString(corpusSignature(s, d)))
    // reap superseded layouts for THIS dataset — older layout versions
    // (lsh-p*, sig-less lsh2-p*) and stale signatures; in-flight .tmp
    // dirs belong to concurrent builders and are left alone
    val stale = raw"lsh2?-p\d+-$dataKey(-s[0-9a-f]+)?".r
    Option(new java.io.File(IndexRoot).listFiles()).foreach(_.foreach { f =>
      if (f.getName != dir.getName && stale.matches(f.getName)) rmTree(f)
    })
    if (!dir.exists()) {
      val tmp = new java.io.File(dir.getParent, dir.getName + ".tmp" + System.nanoTime())
      emb(s, d).withColumn("bucket", expr("lsh_bucket64(embedding)"))
        .withColumn("sig", expr("vec_sign64(embedding)"))
        .select(col("vec_id"), col("label"), col("embedding").as("e"), col("nrm"),
          col("sig"), col("bucket"))
        .repartition(col("bucket")) // one file per bucket dir
        .write.partitionBy("bucket").mode("overwrite").parquet(tmp.getAbsolutePath)
      // concurrent builder won the race; ours is redundant
      if (!tmp.renameTo(dir)) rmTree(tmp)
    }
    s.read.parquet(dir.getAbsolutePath)
  }

  /** s02 — LSH ANN over the materialized index (rows-only: hyperplanes
    * are an engine constant). The query vector (a 64-float parameter,
    * fetched by pushed-down `vec_id = 0`) is planned driver-side into a
    * margin-guided multi-probe set (LshOps.probePlan): the 96 of 256
    * buckets least likely to hide a neighbor are probed, the rest are
    * partition-pruned away, exact cosine re-ranks the survivors.
    * Budget 96 is calibrated: this corpus is near-random (max query
    * cosine 0.37), so recall 0.6-0.8 costs a ~35% scan — on a real
    * embedding corpus with tighter neighbors the same plan prunes far
    * harder. */
  /** Candidate-export paths are scoped PER SOURCE DATASET (r13 ADVICE):
    * two concurrent runs at different SFs previously raced on one fixed
    * path, and the oracle's result silently depended on which run wrote
    * last. Each query records the path it wrote into [[exportPaths]];
    * the oracle strings are defs and [[all]] is a def, so
    * `SparkEntry.oracleSql` — which Verify evaluates AFTER running the
    * queries — always names the export THIS run produced. */
  private[graft] val exportPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def exportPath(stage: String, d: String): String = {
    val p = s"$IndexRoot/$stage-${math.abs(d.hashCode.toLong)}"
    exportPaths.put(stage, p)
    p
  }
  private[graft] def oracleExportPath(stage: String): String =
    exportPaths.getOrDefault(stage,
      s"$IndexRoot/$stage-${math.abs("/root/testdata/sf0.01".hashCode.toLong)}")

  private[graft] def s02ExportPath(d: String) = exportPath("s02cand", d)

  /** s02's CANDIDATE stage (the engine-specific part): the probed
    * buckets' survivors off the partition-pruned index scan — factored
    * so PipelineSpec asserts the pruning on the stage that owns it. */
  private[graft] def s02CandidateFrame(s: SparkSession, d: String): DataFrame = {
    val idx = lshIndex(s, d)
    val (qe, _) = queryVec(s, d)
    val probes = LshOps.probePlan(qe, budget = 96)
    idx.where(col("bucket").isin(probes.map(_.toInt): _*) && col("vec_id") =!= 0)
      .select(col("vec_id"), col("bucket").cast("long").as("bucket"))
  }

  private def s02(s: SparkSession, d: String): DataFrame = {
    val (qe, qnrm) = queryVec(s, d)
    // ORACLE-CHECKED via the s10 export pattern, applied to the query
    // itself (r13): the probe plan and bucket assignment are
    // engine-specific by design, but everything AFTER candidate
    // generation is not — the probed survivors' ids export to a pinned
    // parquet path, and DuckDB recomputes the exact cosine re-rank +
    // top-k from the export and the raw embeddings. The hash match
    // proves the re-rank arithmetic and the cut at k end-to-end; the
    // probe plan's recall floor stays asserted in PipelineSpec/s10.
    val out = s02ExportPath(d)
    s02CandidateFrame(s, d).write.mode("overwrite").parquet(out)
    emb(s, d).join(s.read.parquet(out), "vec_id")
      .withColumn("qe", typedlit(qe.toSeq))
      .withColumn("cos_r", round(expr("vec_dot(embedding, qe)") / (col("nrm") * lit(qnrm)), 6))
      .select("vec_id", "label", "bucket", "cos_r")
      .orderBy(col("cos_r").desc, col("vec_id"))
      .limit(10)
  }

  private def s02Oracle: String =
    s"""WITH cand AS (
      |  SELECT vec_id, bucket
      |  FROM read_parquet('${oracleExportPath("s02cand")}/*.parquet')),
      |n AS (
      |  SELECT vec_id, label, embedding AS e,
      |    sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, x) -> acc + x)) AS nrm
      |  FROM embeddings),
      |q AS (SELECT e AS qe, nrm AS qnrm FROM n WHERE vec_id = 0)
      |SELECT n.vec_id, n.label, c.bucket,
      |  round(list_reduce(list_transform(list_zip(n.e, q.qe), s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), (acc, x) -> acc + x)
      |    / (n.nrm * q.qnrm), 6) AS cos_r
      |FROM n JOIN cand c USING (vec_id), q
      |ORDER BY cos_r DESC, vec_id LIMIT 10""".stripMargin

  /** IVF build parameters. nlist=16 keeps inverted lists executor-sized
    * at the test SFs; at 100 TB nlist scales with the data so each list
    * stays a few partitions. Spherical k-means (assign by cosine,
    * recompute by per-dimension mean) matches the query metric. */
  private val NList = 16
  private val NProbe = 5 // IvfCalib: recall 6-7/10 at ~31% scan on this corpus
  private val LloydIters = 3

  private val ivfCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (DataFrame, Array[(Int, Array[Double], Double)])]()

  private def dotD(a: Array[Float], b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** s03's index: a REAL coarse quantizer (Lloyd's k-means, not the
    * round-1 per-label proxy), trained distributively in DataFrames —
    * assignment is a broadcast crossJoin + partial-aggregated argmax
    * per vector, recomputation is posexplode + per-dimension avg; only
    * the nlist centroid rows ever reach the driver (they ARE the model
    * parameters). The final assignment is materialized partitioned by
    * cluster id, same build-once/prune-on-query shape as the LSH index. */
  private[graft] def ivfIndex(s: SparkSession, d: String): (DataFrame, Array[(Int, Array[Double], Double)]) =
    ivfCache.computeIfAbsent((s, d), _ => buildIvfIndex(s, d))

  /** Same REFRESH contract as refreshLshIndex, for the IVF layout.
    * Also evicts the composed IVF+PQ handle — it was built FROM this
    * index, so a fresh parent must invalidate the child. */
  private[graft] def refreshIvfIndex(s: SparkSession, d: String): (DataFrame, Array[(Int, Array[Double], Double)]) = {
    qCache.remove(d)
    ivfpqCache.remove((s, d))
    val fresh = buildIvfIndex(s, d)
    ivfCache.put((s, d), fresh)
    fresh
  }

  /** Nearest-centroid assignment of `(vec_id, …, e, nrm)` rows against
    * a centroid table — the quantizer's assignment step, factored out
    * of the build loop because it is ALSO the incremental-maintenance
    * path: a delta ingest batch joins the EXISTING quantizer through
    * this exact code (broadcast centroids, argmax over nlist cosines
    * per vector — never re-clustering the corpus), and its partitions
    * append to the cl= layout. IvfDeltaSpec pins that identical
    * vectors get identical assignments through both paths; centroid
    * DRIFT (delta distribution far from the quantizer) is the r9
    * refresh-policy candidate, detected by falling mean assignment
    * cosine, handled today by refreshIvfIndex's full rebuild. */
  private[graft] def assignToCentroids(data: DataFrame, centDf: DataFrame): DataFrame =
    data.crossJoin(broadcast(centDf))
      .withColumn("cos", expr("vec_dot(e, ce)") / (col("nrm") * col("cnrm")))
      .groupBy("vec_id")
      .agg(max(struct(col("cos"), col("cl"))).as("m"), first(col("e")).as("e"))
      .select(col("vec_id"), col("m.cl").as("cl"), col("e"))

  /** Centroids as a small broadcastable DataFrame (cl, ce, cnrm). */
  private[graft] def centroidsDf(s: SparkSession,
      cents: Array[(Int, Array[Double], Double)]): DataFrame = {
    import s.implicits._
    s.createDataset(cents.toSeq.map { case (cl, ce, cn) => (cl, ce.toSeq, cn) })
      .toDF("cl", "ce", "cnrm")
  }

  /** Quantization quality of `data` under a centroid set: one row of
    * (n, mean_best_cos) where best_cos is each vector's top-1
    * assignment cosine. The REFRESH-POLICY signal for incremental
    * ingest: when a delta batch's mean_best_cos falls well below the
    * index's own (the quantizer no longer represents the incoming
    * distribution), append stops being safe and refreshIvfIndex's full
    * rebuild is due — the same staleness philosophy as the
    * content-signature caches, but on DISTRIBUTION rather than
    * content. Cost: one broadcast-argmax pass over the batch. */
  private[graft] def assignmentQuality(data: DataFrame, centDf: DataFrame): DataFrame =
    data.crossJoin(broadcast(centDf))
      .withColumn("cos", expr("vec_dot(e, ce)") / (col("nrm") * col("cnrm")))
      .groupBy("vec_id").agg(max(col("cos")).as("best"))
      .agg(count(lit(1)).as("n"), avg(col("best")).as("mean_best_cos"))

  private def buildIvfIndex(s: SparkSession, d: String): (DataFrame, Array[(Int, Array[Double], Double)]) = {
    import s.implicits._
    // quantizer parameters AND the corpus content signature baked into
    // the path, same staleness rule as the LSH index; superseded
    // layouts for this dataset are reaped
    val dataKey = Integer.toHexString(d.hashCode)
    val prefix = s"ivf-k$NList-i$LloydIters-" + dataKey
    val root = new java.io.File(IndexRoot,
      prefix + "-s" + java.lang.Long.toHexString(corpusSignature(s, d)))
    val stale = raw"ivf-k\d+-i\d+-$dataKey(-s[0-9a-f]+)?".r
    Option(new java.io.File(IndexRoot).listFiles()).foreach(_.foreach { f =>
      if (f.getName != root.getName && stale.matches(f.getName)) rmTree(f)
    })
    if (!root.exists()) {
      val data = emb(s, d)
        .select(col("vec_id"), col("label"), col("embedding").as("e"), col("nrm"))
      // deterministic pseudo-random seeds: nlist vectors by hash order
      var cents: Array[(Int, Array[Double], Double)] = data
        .orderBy(expr("xxhash64(vec_id)")).limit(NList)
        .select("e", "nrm").collect()
        .zipWithIndex.map { case (r, i) =>
          (i, r.getAs[scala.collection.Seq[Float]]("e").toArray.map(_.toDouble),
            r.getAs[Double]("nrm"))
        }
      def assigned = assignToCentroids(data, centroidsDf(s, cents))
      for (_ <- 1 to LloydIters) {
        val recomputed = assigned
          .select(col("cl"), posexplode(col("e")).as(Seq("pos", "v")))
          .groupBy("cl", "pos").agg(avg(col("v")).as("cv"))
          .groupBy("cl")
          .agg(expr("transform(array_sort(collect_list(struct(pos, cv))), x -> x.cv)").as("ce"))
          .collect()
          .map { r =>
            val ce = r.getAs[scala.collection.Seq[Double]]("ce").toArray
            r.getAs[Int]("cl") -> ((ce, math.sqrt(ce.map(x => x * x).sum)))
          }.toMap
        // clusters that lost every member keep their previous centroid
        cents = cents.map { case prev @ (cl, _, _) =>
          recomputed.get(cl).map { case (ce, cn) => (cl, ce, cn) }.getOrElse(prev)
        }
      }
      val tmp = new java.io.File(root.getParent, root.getName + ".tmp" + System.nanoTime())
      data.join(assigned.select("vec_id", "cl"), "vec_id")
        .repartition(col("cl"))
        .write.partitionBy("cl").mode("overwrite")
        .parquet(new java.io.File(tmp, "index").getAbsolutePath)
      s.createDataset(cents.toSeq.map { case (cl, ce, cn) => (cl, ce.toSeq, cn) })
        .toDF("cl", "ce", "cnrm")
        .coalesce(1)
        .write.mode("overwrite").parquet(new java.io.File(tmp, "centroids").getAbsolutePath)
      if (!tmp.renameTo(root)) rmTree(tmp)
    }
    val cents = s.read.parquet(new java.io.File(root, "centroids").getAbsolutePath)
      .collect()
      .map(r => (r.getAs[Int]("cl"),
        r.getAs[scala.collection.Seq[Double]]("ce").toArray,
        r.getAs[Double]("cnrm")))
    (s.read.parquet(new java.io.File(root, "index").getAbsolutePath), cents)
  }

  /** s03 — IVF ANN over the k-means index (rows-only). The query ranks
    * the nlist centroids driver-side (nlist dot products — query
    * planning, not a scan), probes its nprobe nearest inverted lists
    * via partition pruning, exact cosine re-ranks. At 100 TB a probe
    * touches nprobe/nlist of the data. */
  private[graft] def s03ExportPath(d: String) = exportPath("s03cand", d)

  /** s03's CANDIDATE stage: the probed inverted lists' survivors off
    * the cluster-pruned index scan (spec asserts the pruning here). */
  private[graft] def s03CandidateFrame(s: SparkSession, d: String): DataFrame = {
    val (idx, cents) = ivfIndex(s, d)
    val (qe, qnrm) = queryVec(s, d)
    val probes = cents
      .map { case (cl, ce, cn) => (cl, dotD(qe, ce) / (qnrm * cn)) }
      .sortBy { case (cl, ccos) => (-ccos, cl) }
      .take(NProbe).map(_._1)
    idx.where(col("cl").isin(probes: _*) && col("vec_id") =!= 0)
      .select(col("vec_id"))
  }

  private def s03(s: SparkSession, d: String): DataFrame = {
    val (qe, qnrm) = queryVec(s, d)
    // ORACLE-CHECKED via the export pattern (see s02): the learned
    // quantizer + probe ranking are engine-specific; the exported
    // probed-list survivors + DuckDB's own exact cosine replay the
    // re-rank and the cut at k.
    val out = s03ExportPath(d)
    s03CandidateFrame(s, d).write.mode("overwrite").parquet(out)
    emb(s, d).join(s.read.parquet(out), "vec_id")
      .withColumn("qe", typedlit(qe.toSeq))
      .withColumn("cos_r", round(expr("vec_dot(embedding, qe)") / (col("nrm") * lit(qnrm)), 6))
      .select("vec_id", "label", "cos_r")
      .orderBy(col("cos_r").desc, col("vec_id"))
      .limit(10)
  }

  private def s03Oracle: String =
    s"""WITH cand AS (
      |  SELECT vec_id
      |  FROM read_parquet('${oracleExportPath("s03cand")}/*.parquet')),
      |n AS (
      |  SELECT vec_id, label, embedding AS e,
      |    sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, x) -> acc + x)) AS nrm
      |  FROM embeddings),
      |q AS (SELECT e AS qe, nrm AS qnrm FROM n WHERE vec_id = 0)
      |SELECT n.vec_id, n.label,
      |  round(list_reduce(list_transform(list_zip(n.e, q.qe), s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), (acc, x) -> acc + x)
      |    / (n.nrm * q.qnrm), 6) AS cos_r
      |FROM n JOIN cand c USING (vec_id), q
      |ORDER BY cos_r DESC, vec_id LIMIT 10""".stripMargin

  /** One (query, candidate) cosine pair entering the batch top-k. */
  final case class QCand(q_id: Long, vec_id: Long, cos_r: Double)

  /** Bounded top-k buffer per query — same O(K)-insert/merge shape as
    * TopK.TopKOrders, ranked by (cos_r desc, vec_id asc). */
  final class TopKByCos(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[QCand, TopK.Buf, Seq[(Long, Double)]] {
    private def before(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    override def zero: TopK.Buf = TopK.Buf(Nil)
    override def reduce(b: TopK.Buf, r: QCand): TopK.Buf = {
      val x = (r.cos_r, r.vec_id)
      if (b.items.size >= k && !before(x, b.items.last)) b
      else {
        val (pre, post) = b.items.span(before(_, x))
        TopK.Buf((pre ++ (x +: post)).take(k))
      }
    }
    override def merge(a: TopK.Buf, b: TopK.Buf): TopK.Buf = {
      val xs = a.items.toIndexedSeq
      val ys = b.items.toIndexedSeq
      val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
      var i = 0
      var j = 0
      while (out.size < k && (i < xs.size || j < ys.size)) {
        if (j >= ys.size || (i < xs.size && before(xs(i), ys(j)))) { out += xs(i); i += 1 }
        else { out += ys(j); j += 1 }
      }
      TopK.Buf(out.toSeq)
    }
    override def finish(b: TopK.Buf): Seq[(Long, Double)] =
      b.items.map { case (c, v) => (v, c) }
    override def bufferEncoder: org.apache.spark.sql.Encoder[TopK.Buf] =
      org.apache.spark.sql.Encoders.product[TopK.Buf]
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Long, Double)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
  }

  /** s04 — batch ANN: exact top-5 neighbors for EVERY query in a query
    * set (vec_ids 0–4), in one pass. The query set broadcasts; each
    * corpus partition computes its cosines and keeps a bounded top-5
    * buffer PER QUERY (typed Aggregator partial agg), so the shuffle
    * carries at most 5 rows per (query, partition) — a window-rank
    * formulation would shuffle every (query × corpus) pair to the
    * query's partition. This is the retrieval shape: index-build cost
    * zero, scan amortized across the whole query batch. */
  private def s04(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val all = emb(s, d)
    val qs = all.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"), col("nrm").as("qnrm"))
    all.where(col("vec_id") >= 5)
      .crossJoin(broadcast(qs))
      .withColumn("cos_r", round(expr("vec_dot(embedding, qe)") / (col("nrm") * col("qnrm")), 6))
      .select(col("q_id"), col("vec_id"), col("cos_r"))
      .as[QCand]
      .groupByKey(_.q_id)
      .agg(new TopKByCos(5).toColumn.name("top"))
      .flatMap { case (qid, items) =>
        items.zipWithIndex.map { case ((vid, cos), i) => (qid, i + 1, vid, cos) }
      }
      .toDF("q_id", "rank", "vec_id", "cos_r")
      .orderBy("q_id", "rank")
  }

  private val s04Oracle: String =
    """WITH n AS (
      |  SELECT vec_id, embedding AS e,
      |    sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, x) -> acc + x)) AS nrm
      |  FROM embeddings),
      |q AS (SELECT vec_id AS q_id, e AS qe, nrm AS qnrm FROM n WHERE vec_id < 5),
      |pairs AS (
      |  SELECT q.q_id, n.vec_id,
      |    round(list_reduce(list_transform(list_zip(n.e, q.qe), s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), (acc, x) -> acc + x)
      |      / (n.nrm * q.qnrm), 6) AS cos_r
      |  FROM n, q WHERE n.vec_id >= 5),
      |r AS (
      |  SELECT q_id, vec_id, cos_r,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id) AS rank
      |  FROM pairs)
      |SELECT q_id, rank, vec_id, cos_r FROM r WHERE rank <= 5
      |ORDER BY q_id, rank""".stripMargin

  /** s05 — sketch-scan + exact re-rank ANN (rows-only: the signature is
    * an engine constant). Stage 1 ranks EVERY row by Hamming distance
    * between its precomputed vec_sign64 sketch and the query's — but
    * reads only (vec_id, sig), 16 bytes a row against the 260-byte
    * vector, and the ranking is XOR+popcount in a TakeOrdered (no full
    * sort). Stage 2 broadcasts the 250-candidate shortlist back against
    * the index and re-ranks exactly. Complements s02/s03: those prune
    * WHICH FILES are read (partition pruning) and miss whatever the
    * probe plan skips; the sketch scan reads every row cheaply and
    * never misses a candidate the sketch ranks well — the right tool
    * when recall matters more than scan avoidance. At 100 TB stage 1
    * is a 16-byte-per-row columnar scan (~6% of the full-vector bytes),
    * stage 2 a broadcast hash semi-fetch of the shortlist. The
    * shortlist size scales with the corpus — max(250, n/40) — so the
    * recall floor calibrated at the test SFs survives corpus growth
    * instead of silently thinning to a fixed 250-of-n (SURVEY §9.3). */
  private[graft] def s05ExportPath(d: String) = exportPath("s05cand", d)

  /** s05's stage-1 Hamming SHORTLIST: 16 bytes/row off the index, the
    * full vector never read (spec asserts the narrow scan here). */
  private[graft] def s05ShortlistFrame(s: SparkSession, d: String): DataFrame = {
    val idx = lshIndex(s, d)
    val (qe, _) = queryVec(s, d)
    val qsig = graft.functions.SignOps.signOf(qe)
    val shortlistK = math.max(250L, Dedup.approxRowCount(idx) / 40L).toInt
    idx.where(col("vec_id") =!= 0)
      .select(col("vec_id"),
        expr(s"bit_count(sig ^ CAST($qsig AS BIGINT))").as("hamming"))
      .orderBy(col("hamming"), col("vec_id"))
      .limit(shortlistK)
  }

  private def s05(s: SparkSession, d: String): DataFrame = {
    val (qe, qnrm) = queryVec(s, d)
    // ORACLE-CHECKED via the export pattern (see s02): the sign sketch
    // + Hamming shortlist are engine-specific; the exported shortlist
    // (ids + hamming pass-through) + DuckDB's exact cosine replay the
    // re-rank and the cut at k.
    val out = s05ExportPath(d)
    s05ShortlistFrame(s, d).write.mode("overwrite").parquet(out)
    emb(s, d).join(broadcast(s.read.parquet(out)), "vec_id")
      .withColumn("qe", typedlit(qe.toSeq))
      .withColumn("cos_r", round(expr("vec_dot(embedding, qe)") / (col("nrm") * lit(qnrm)), 6))
      .select("vec_id", "label", "hamming", "cos_r")
      .orderBy(col("cos_r").desc, col("vec_id"))
      .limit(10)
  }

  private def s05Oracle: String =
    s"""WITH cand AS (
      |  SELECT vec_id, hamming
      |  FROM read_parquet('${oracleExportPath("s05cand")}/*.parquet')),
      |n AS (
      |  SELECT vec_id, label, embedding AS e,
      |    sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, x) -> acc + x)) AS nrm
      |  FROM embeddings),
      |q AS (SELECT e AS qe, nrm AS qnrm FROM n WHERE vec_id = 0)
      |SELECT n.vec_id, n.label, c.hamming,
      |  round(list_reduce(list_transform(list_zip(n.e, q.qe), s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), (acc, x) -> acc + x)
      |    / (n.nrm * q.qnrm), 6) AS cos_r
      |FROM n JOIN cand c USING (vec_id), q
      |ORDER BY cos_r DESC, vec_id LIMIT 10""".stripMargin

  /** s06 — filtered ANN: top-k under a metadata predicate (the
    * "filtered vector search" surface every production ANN engine
    * exposes — eval slices by language, dedup within a source, RAG
    * retrieval scoped to a tenant). The filter composes BEFORE the
    * ranking: predicate pushdown cuts the scan, then the same
    * narrow-scan + TakeOrdered shape as s01 ranks only survivors — at
    * 100 TB a selective filter prunes row groups via parquet stats
    * before any dot product runs. Exact by construction, so unlike
    * s02/s03/s05 it is oracle-checked, anchoring the filtered variants
    * the same way s01 anchors the unfiltered ones. */
  private def s06(s: SparkSession, d: String): DataFrame = {
    val all = emb(s, d)
    val q = all.where(col("vec_id") === 0)
      .select(col("embedding").as("qe"), col("nrm").as("qnrm"))
    all.where(col("vec_id") =!= 0 && col("label").isin(1, 3, 5) && pmod(col("vec_id"), lit(2)) === 1)
      .crossJoin(broadcast(q))
      .withColumn("cos_r", round(expr("vec_dot(embedding, qe)") / (col("nrm") * col("qnrm")), 6))
      .select("vec_id", "label", "cos_r")
      .orderBy(col("cos_r").desc, col("vec_id"))
      .limit(10)
  }

  private val s06Oracle: String =
    """WITH n AS (
      |  SELECT vec_id, label, embedding AS e,
      |    sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, x) -> acc + x)) AS nrm
      |  FROM embeddings),
      |q AS (SELECT e AS qe, nrm AS qnrm FROM n WHERE vec_id = 0)
      |SELECT vec_id, label,
      |  round(list_reduce(list_transform(list_zip(e, qe), s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), (acc, x) -> acc + x)
      |    / (nrm * qnrm), 6) AS cos_r
      |FROM n, q
      |WHERE vec_id <> 0 AND label IN (1, 3, 5) AND vec_id % 2 = 1
      |ORDER BY cos_r DESC, vec_id LIMIT 10""".stripMargin

  /** PQ codebook geometry: M subspaces × subDim dims, K centroids per
    * subspace. 16×4 over the 64-dim corpus gives 16 4-bit codes — an
    * 8-byte effective payload per row, same budget as s05's sign
    * sketch, but LEARNED from the data rather than random planes. */
  private val PqM = 16
  private val PqSubDim = 4
  private val PqK = 16
  private val PqIters = 2

  private val pqCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (DataFrame, Array[((Int, Int), Array[Double])])]()

  private[graft] def pqIndex(s: SparkSession, d: String): (DataFrame, Array[((Int, Int), Array[Double])]) =
    pqCache.computeIfAbsent((s, d), _ => buildPqIndex(s, d))

  /** Same REFRESH contract as refreshLshIndex/refreshIvfIndex; evicts
    * the composed IVF+PQ handle too (built from this codebook). */
  private[graft] def refreshPqIndex(s: SparkSession, d: String): (DataFrame, Array[((Int, Int), Array[Double])]) = {
    qCache.remove(d)
    ivfpqCache.remove((s, d))
    val fresh = buildPqIndex(s, d)
    pqCache.put((s, d), fresh)
    fresh
  }

  /** s07's index: a product-quantization codebook (per-subspace Lloyd's
    * k-means — the same distributed assign/recompute loop as IVF, run
    * on all 16 subspaces at once via one exploded sub-vector frame) and
    * the corpus encoded to 16 int codes per vector. Only the 16×16
    * sub-centroids (the model) reach the driver. Layout path carries
    * parameters + corpus signature; superseded layouts are reaped —
    * identical staleness rules to the LSH/IVF indexes. */
  private def buildPqIndex(s: SparkSession, d: String): (DataFrame, Array[((Int, Int), Array[Double])]) = {
    import s.implicits._
    val dataKey = Integer.toHexString(d.hashCode)
    val prefix = s"pq-m$PqM-k$PqK-i$PqIters-" + dataKey
    val root = new java.io.File(IndexRoot,
      prefix + "-s" + java.lang.Long.toHexString(corpusSignature(s, d)))
    val stale = raw"pq-m\d+-k\d+-i\d+-$dataKey(-s[0-9a-f]+)?".r
    Option(new java.io.File(IndexRoot).listFiles()).foreach(_.foreach { f =>
      if (f.getName != root.getName && stale.matches(f.getName)) rmTree(f)
    })
    if (!root.exists()) {
      val data = emb(s, d)
        .select(col("vec_id"), col("label"), col("embedding").as("e"), col("nrm"))
      val sub = data.select(col("vec_id"), explode(expr(
        s"transform(sequence(0, ${PqM - 1}), m -> struct(m AS m, slice(e, m * $PqSubDim + 1, $PqSubDim) AS sv))")).as("x"))
        .select(col("vec_id"), col("x.m").as("m"), col("x.sv").as("sv"))
      // deterministic seeds: per subspace, the K sub-vectors first in
      // row-hash order (one bounded window per subspace key)
      var cents: Array[((Int, Int), Array[Double])] = sub
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("m").orderBy(expr("xxhash64(vec_id, m)"), col("vec_id"))))
        .where(col("rn") <= PqK)
        .collect()
        .map { r =>
          ((r.getAs[Int]("m"), r.getAs[Int]("rn") - 1),
            r.getAs[scala.collection.Seq[Float]]("sv").toArray.map(_.toDouble))
        }
      def centDf = s.createDataset(cents.toSeq.map { case ((m, cl), ce) =>
        (m, cl, ce.toSeq, ce.map(x => x * x).sum)
      }).toDF("m", "cl", "ce", "cn2")
      // argmin_cl ‖sv − c‖² = argmin_cl (‖c‖² − 2·sv·c); ties → lower cl
      def assigned = sub.join(broadcast(centDf), "m")
        .withColumn("d2", col("cn2") - lit(2.0) * expr("vec_dot(sv, ce)"))
        .groupBy("vec_id", "m")
        .agg(min(struct(col("d2"), col("cl"))).as("best"), first(col("sv")).as("sv"))
        .select(col("vec_id"), col("m"), col("best.cl").as("cl"), col("sv"))
      for (_ <- 1 to PqIters) {
        val recomputed = assigned
          .select(col("m"), col("cl"), posexplode(col("sv")).as(Seq("pos", "v")))
          .groupBy("m", "cl", "pos").agg(avg(col("v")).as("cv"))
          .groupBy("m", "cl")
          .agg(expr("transform(array_sort(collect_list(struct(pos, cv))), x -> x.cv)").as("ce"))
          .collect()
          .map(r => (r.getAs[Int]("m"), r.getAs[Int]("cl")) ->
            r.getAs[scala.collection.Seq[Double]]("ce").toArray)
          .toMap
        // empty clusters keep their previous centroid
        cents = cents.map { case prev @ (key, _) =>
          recomputed.get(key).map(key -> _).getOrElse(prev)
        }
      }
      val codes = assigned.groupBy("vec_id")
        .agg(expr("transform(array_sort(collect_list(struct(m, cl))), x -> x.cl)").as("codes"))
      val tmp = new java.io.File(root.getParent, root.getName + ".tmp" + System.nanoTime())
      data.join(codes, "vec_id")
        .select("vec_id", "label", "e", "nrm", "codes")
        .write.mode("overwrite").parquet(new java.io.File(tmp, "index").getAbsolutePath)
      s.createDataset(cents.toSeq.map { case ((m, cl), ce) => (m, cl, ce.toSeq) })
        .toDF("m", "cl", "ce")
        .coalesce(1)
        .write.mode("overwrite").parquet(new java.io.File(tmp, "centroids").getAbsolutePath)
      if (!tmp.renameTo(root)) rmTree(tmp)
    }
    val cents = s.read.parquet(new java.io.File(root, "centroids").getAbsolutePath)
      .collect()
      .map(r => (r.getAs[Int]("m"), r.getAs[Int]("cl")) ->
        r.getAs[scala.collection.Seq[Double]]("ce").toArray)
    (s.read.parquet(new java.io.File(root, "index").getAbsolutePath), cents)
  }

  /** Shared export tail of the ADC-family flips (s07/s08/s11): stage-1
    * input codes and the query's lookup table land in scoped parquet
    * exports, and DuckDB replays the ENTIRE query from them — the ADC
    * sum (same left-to-right order as the native pq_adc), the
    * shortlist cut at max(200, n/40), the exact cosine re-rank from
    * the raw embeddings, and the cut at 10. The trained quantizer
    * stays engine-specific (it IS the export); everything downstream
    * is hash-checked. */
  private def exportAdcInputs(stage: String, d: String,
      cand: DataFrame, lut: Seq[Double]): (String, String) = {
    val s = cand.sparkSession
    import s.implicits._
    val codesOut = exportPath(s"${stage}codes", d)
    val lutOut = exportPath(s"${stage}lut", d)
    cand.write.mode("overwrite").parquet(codesOut)
    lut.zipWithIndex.map { case (v, i) => (i, v) }.toDF("i", "v")
      .coalesce(1).write.mode("overwrite").parquet(lutOut)
    (codesOut, lutOut)
  }

  /** The DuckDB replay for one ADC-family query: `k` is the PQ family
    * size (lut rows per subspace/dimension). */
  private def adcOracle(stage: String, k: Int): String =
    s"""WITH cand AS (
      |  SELECT vec_id, codes
      |  FROM read_parquet('${oracleExportPath(s"${stage}codes")}/*.parquet')),
      |lt AS (SELECT list(v ORDER BY i) AS l
      |       FROM read_parquet('${oracleExportPath(s"${stage}lut")}/*.parquet')),
      |n AS (
      |  SELECT vec_id, label, embedding AS e,
      |    sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, x) -> acc + x)) AS nrm
      |  FROM embeddings),
      |q AS (SELECT e AS qe, nrm AS qnrm FROM n WHERE vec_id = 0),
      |kk AS (SELECT GREATEST(200, COUNT(*) // 40) AS sk FROM n),
      |adc AS (
      |  SELECT c.vec_id,
      |    round(list_reduce(list_transform(c.codes, (cv, m) -> lt.l[(m - 1) * $k + cv + 1]), (a, x) -> a + x)
      |      / (n.nrm * q.qnrm), 6) AS approx_cos
      |  FROM cand c JOIN n ON c.vec_id = n.vec_id CROSS JOIN lt CROSS JOIN q),
      |sl AS (
      |  SELECT vec_id, approx_cos FROM adc
      |  QUALIFY row_number() OVER (ORDER BY approx_cos DESC, vec_id) <= (SELECT sk FROM kk))
      |SELECT n.vec_id, n.label, s.approx_cos,
      |  round(list_reduce(list_transform(list_zip(n.e, q.qe), z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), (acc, x) -> acc + x)
      |    / (n.nrm * q.qnrm), 6) AS cos_r
      |FROM sl s JOIN n ON s.vec_id = n.vec_id CROSS JOIN q
      |ORDER BY cos_r DESC, n.vec_id LIMIT 10""".stripMargin

  /** s07 — product-quantization ANN (ORACLE-CHECKED since r14 via the
    * ADC export pattern — [[adcOracle]]; the codebook is data-trained,
    * so it exports rather than replays). Query time builds the 16×16 lookup table of
    * query-subvector · sub-centroid dot products driver-side (256 MACs
    * of query planning), then stage 1 scores EVERY row with the native
    * pq_adc expression — 16 table lookups per row over a 16-int codes
    * column, no full-vector math — into a TakeOrdered shortlist sized
    * max(200, n/40); stage 2 re-ranks the shortlist exactly, broadcast,
    * like s05. This is the 100 TB ANN workhorse shape (IVF-less
    * ADC/FAISS-style): the scan reads codes + id (≈12 bytes/row vs 260
    * for the vector), compute is lookup-bound, and unlike the random
    * sign sketch the quantizer adapts to the corpus distribution.
    * PipelineSpec bounds recall@10 against s01's exact baseline. */
  private def s07(s: SparkSession, d: String): DataFrame = {
    val (idx, cents) = pqIndex(s, d)
    val byKey = cents.toMap
    val (qe, qnrm) = queryVec(s, d)
    val lut: Seq[Double] = for {
      m <- 0 until PqM
      cl <- 0 until PqK
    } yield byKey.get((m, cl)) match {
      case Some(ce) =>
        var acc = 0.0
        var j = 0
        while (j < PqSubDim) { acc += qe(m * PqSubDim + j) * ce(j); j += 1 }
        acc
      case None => Double.NegativeInfinity // never-assigned seed slot
    }
    exportAdcInputs("s07", d,
      idx.where(col("vec_id") =!= 0).select("vec_id", "codes"), lut)
    val shortlistK = math.max(200L, Dedup.approxRowCount(idx) / 40L).toInt
    val shortlist = idx.where(col("vec_id") =!= 0)
      .withColumn("lut", typedlit(lut))
      .withColumn("approx_cos", round(expr("pq_adc(codes, lut)") / (col("nrm") * lit(qnrm)), 6))
      .select("vec_id", "approx_cos")
      .orderBy(col("approx_cos").desc, col("vec_id"))
      .limit(shortlistK)
    idx.join(broadcast(shortlist), "vec_id")
      .withColumn("qe", typedlit(qe.toSeq))
      .withColumn("cos_r", round(expr("vec_dot(e, qe)") / (col("nrm") * lit(qnrm)), 6))
      .select("vec_id", "label", "approx_cos", "cos_r")
      .orderBy(col("cos_r").desc, col("vec_id"))
      .limit(10)
  }

  private def s07Oracle: String = adcOracle("s07", PqK)

  private val ivfpqCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String),
    (DataFrame, Array[(Int, Array[Double], Double)], Array[((Int, Int), Array[Double])])]()

  private[graft] def ivfpqIndex(s: SparkSession, d: String): (DataFrame, Array[(Int, Array[Double], Double)], Array[((Int, Int), Array[Double])]) =
    ivfpqCache.computeIfAbsent((s, d), _ => buildIvfPqIndex(s, d))

  /** Same REFRESH contract as the parent indexes: rebuild both parents
    * (their refreshers evict this cache too), then re-compose. After
    * an in-session corpus change s08 must never serve the stale
    * composed layout while s03/s07 serve fresh ones. */
  private[graft] def refreshIvfPqIndex(s: SparkSession, d: String): (DataFrame, Array[(Int, Array[Double], Double)], Array[((Int, Int), Array[Double])]) = {
    refreshIvfIndex(s, d)
    refreshPqIndex(s, d)
    val fresh = buildIvfPqIndex(s, d)
    ivfpqCache.put((s, d), fresh)
    fresh
  }

  /** s08's index: the IVF coarse quantizer's partitioned layout with
    * the PQ codes riding along as a payload column — built by joining
    * the two existing indexes, so the k-means work is shared, and
    * carrying both parents' parameters + the corpus signature in the
    * layout path (stale layouts reaped, same rules as every index). */
  private def buildIvfPqIndex(s: SparkSession, d: String): (DataFrame, Array[(Int, Array[Double], Double)], Array[((Int, Int), Array[Double])]) = {
    val (ivf, icents) = ivfIndex(s, d)
    val (pq, pcents) = pqIndex(s, d)
    val dataKey = Integer.toHexString(d.hashCode)
    val prefix = s"ivfpq-k$NList-m$PqM-$dataKey"
    val root = new java.io.File(IndexRoot,
      prefix + "-s" + java.lang.Long.toHexString(corpusSignature(s, d)))
    val stale = raw"ivfpq-k\d+-m\d+-$dataKey(-s[0-9a-f]+)?".r
    Option(new java.io.File(IndexRoot).listFiles()).foreach(_.foreach { f =>
      if (f.getName != root.getName && stale.matches(f.getName)) rmTree(f)
    })
    if (!root.exists()) {
      val tmp = new java.io.File(root.getParent, root.getName + ".tmp" + System.nanoTime())
      ivf.join(pq.select(col("vec_id"), col("codes")), "vec_id")
        .repartition(col("cl"))
        .write.partitionBy("cl").mode("overwrite").parquet(tmp.getAbsolutePath)
      if (!tmp.renameTo(root)) rmTree(tmp)
    }
    (s.read.parquet(root.getAbsolutePath), icents, pcents)
  }

  /** s08 — IVF+PQ composed ANN (rows-only): the production
    * billion-scale index shape (FAISS IVFPQ). The IVF stage prunes
    * WHICH partitions are read (nprobe of nlist inverted lists, via
    * partition filters); within the probed lists the PQ stage ranks by
    * the native pq_adc lookup-table scan reading codes instead of
    * vectors; exact re-rank fixes the top. Compounding the two
    * reductions: a probe touches nprobe/nlist of the FILES and reads
    * ~12 bytes/row of what it does touch — at 100 TB the scan cost is
    * (5/16) × (codes/vector bytes) ≈ 1.5% of brute force before the
    * re-rank. Recall floor spec'd against s01 like its parents. */
  private def s08(s: SparkSession, d: String): DataFrame = {
    val (idx, icents, pcents) = ivfpqIndex(s, d)
    val byKey = pcents.toMap
    val (qe, qnrm) = queryVec(s, d)
    val probes = icents
      .map { case (cl, ce, cn) => (cl, dotD(qe, ce) / (qnrm * cn)) }
      .sortBy { case (cl, ccos) => (-ccos, cl) }
      .take(NProbe).map(_._1)
    val lut: Seq[Double] = for {
      m <- 0 until PqM
      cl <- 0 until PqK
    } yield byKey.get((m, cl)) match {
      case Some(ce) =>
        var acc = 0.0
        var j = 0
        while (j < PqSubDim) { acc += qe(m * PqSubDim + j) * ce(j); j += 1 }
        acc
      case None => Double.NegativeInfinity
    }
    exportAdcInputs("s08", d,
      idx.where(col("cl").isin(probes: _*) && col("vec_id") =!= 0)
        .select("vec_id", "codes"), lut)
    val shortlistK = math.max(200L, Dedup.approxRowCount(idx) / 40L).toInt
    val shortlist = idx.where(col("cl").isin(probes: _*) && col("vec_id") =!= 0)
      .withColumn("lut", typedlit(lut))
      .withColumn("approx_cos", round(expr("pq_adc(codes, lut)") / (col("nrm") * lit(qnrm)), 6))
      .select("vec_id", "approx_cos")
      .orderBy(col("approx_cos").desc, col("vec_id"))
      .limit(shortlistK)
    idx.join(broadcast(shortlist), "vec_id")
      .withColumn("qe", typedlit(qe.toSeq))
      .withColumn("cos_r", round(expr("vec_dot(e, qe)") / (col("nrm") * lit(qnrm)), 6))
      .select("vec_id", "label", "approx_cos", "cos_r")
      .orderBy(col("cos_r").desc, col("vec_id"))
      .limit(10)
  }

  private def s08Oracle: String = adcOracle("s08", PqK)

  /** s09 — filtered IVF ANN: s06's metadata predicate composed INTO
    * s03's probe-pruned scan — the production "filtered vector
    * search" at index scale. Order matters twice: the probe list
    * prunes partitions first (nprobe/nlist of the data), then the
    * metadata predicate cuts the probed lists before any dot product
    * runs. The pre-filter strategy (vs post-filtering a top-k) is the
    * correct one when the predicate is selective — a post-filtered
    * top-10 of mostly-ineligible neighbors can return < k eligible
    * rows. ORACLE-CHECKED since r14 via the export pattern (the probe
    * plan is the only engine-specific part): the probed survivors'
    * ids export, and DuckDB applies the SAME deterministic metadata
    * predicate, exact cosine and cut at 10 from the raw embeddings.
    * Recall vs the exact filtered baseline (s06) stays bounded in
    * PipelineSpec. */
  private def s09(s: SparkSession, d: String): DataFrame = {
    val (idx, cents) = ivfIndex(s, d)
    val (qe, qnrm) = queryVec(s, d)
    val probes = cents
      .map { case (cl, ce, cn) => (cl, dotD(qe, ce) / (qnrm * cn)) }
      .sortBy { case (cl, ccos) => (-ccos, cl) }
      .take(NProbe).map(_._1)
    idx.where(col("cl").isin(probes: _*) && col("vec_id") =!= 0)
      .select("vec_id")
      .write.mode("overwrite").parquet(exportPath("s09cand", d))
    idx.where(col("cl").isin(probes: _*) && col("vec_id") =!= 0 &&
        col("label").isin(1, 3, 5) && pmod(col("vec_id"), lit(2)) === 1)
      .withColumn("qe", typedlit(qe.toSeq))
      .withColumn("cos_r", round(expr("vec_dot(e, qe)") / (col("nrm") * lit(qnrm)), 6))
      .select("vec_id", "label", "cos_r")
      .orderBy(col("cos_r").desc, col("vec_id"))
      .limit(10)
  }

  private def s09Oracle: String =
    s"""WITH cand AS (
      |  SELECT vec_id
      |  FROM read_parquet('${oracleExportPath("s09cand")}/*.parquet')),
      |n AS (
      |  SELECT vec_id, label, embedding AS e,
      |    sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, x) -> acc + x)) AS nrm
      |  FROM embeddings),
      |q AS (SELECT e AS qe, nrm AS qnrm FROM n WHERE vec_id = 0)
      |SELECT n.vec_id, n.label,
      |  round(list_reduce(list_transform(list_zip(n.e, q.qe), z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), (acc, x) -> acc + x)
      |    / (n.nrm * q.qnrm), 6) AS cos_r
      |FROM cand c JOIN n ON c.vec_id = n.vec_id CROSS JOIN q
      |WHERE n.label IN (1, 3, 5) AND n.vec_id % 2 = 1
      |ORDER BY cos_r DESC, n.vec_id LIMIT 10""".stripMargin

  /** s10 — in-engine ANN recall evaluation: every approximate index
    * family's top-10 joined against s01's brute-force ground truth,
    * recall@10 per method in ONE result table. This is the eval
    * harness an ANN deployment runs after every index rebuild —
    * previously only spec floors, now a first-class queryable op. Each
    * method reuses its resident index (the s0x machinery and caches);
    * the truth set is 10 ids, so every intersection is a broadcast
    * join against a 10-row side.
    *
    * ORACLE-CHECKED via the d19 export pattern: the approximate
    * methods' candidate sets are engine-specific by design, but the
    * recall ARITHMETIC and the ground truth are not — Spark exports
    * the per-method candidate ids to a pinned parquet path, and DuckDB
    * recomputes the truth set with its OWN brute-force cosine (the
    * s01 oracle) and replays the recall fractions from the exported
    * candidates. A hash match proves the eval harness (truth set, hit
    * counting, fraction) end-to-end; the per-method recall FLOORS stay
    * asserted in PipelineSpec. */
  private[graft] def s10ExportPath(d: String) = exportPath("s10cand", d)

  private def s10(s: SparkSession, d: String): DataFrame = {
    val methods: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "lsh" -> s02, "ivf" -> s03, "sketch_rerank" -> s05,
      "pq" -> s07, "ivfpq" -> s08, "sq8" -> s11)
    val out = s10ExportPath(d)
    methods.map { case (name, fn) =>
      fn(s, d).select(lit(name).as("method"), col("vec_id"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(out)
    val truth = s01(s, d).select(col("vec_id"), lit(1).as("__t"))
    s.read.parquet(out)
      .join(broadcast(truth), Seq("vec_id"), "left")
      .groupBy("method")
      .agg(count(col("__t")).as("n_hits"))
      .select(col("method"), lit(10).cast("int").as("k"), col("n_hits"),
        round(col("n_hits") / 10.0, 2).as("recall"))
      .orderBy("method")
  }

  private def s10Oracle: String =
    s"""WITH cand AS (
      |  SELECT method, vec_id
      |  FROM read_parquet('${oracleExportPath("s10cand")}/*.parquet')),
      |n AS (
      |  SELECT vec_id,
      |    sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, x) -> acc + x)) AS nrm,
      |    embedding AS e
      |  FROM embeddings),
      |q AS (SELECT e AS qe, nrm AS qnrm FROM n WHERE vec_id = 0),
      |truth AS (
      |  SELECT vec_id FROM (
      |    SELECT vec_id,
      |      round(list_reduce(list_transform(list_zip(e, qe), s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), (acc, x) -> acc + x)
      |        / (nrm * qnrm), 6) AS cos_r
      |    FROM n, q WHERE vec_id <> 0
      |    ORDER BY cos_r DESC, vec_id LIMIT 10))
      |SELECT c.method, CAST(10 AS INT) AS k,
      |  CAST(COUNT(t.vec_id) AS BIGINT) AS n_hits,
      |  ROUND(COUNT(t.vec_id) / 10.0, 2) AS recall
      |FROM cand c LEFT JOIN truth t USING (vec_id)
      |GROUP BY c.method ORDER BY c.method""".stripMargin

  private val sqCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (DataFrame, Array[Double], Array[Double])]()

  private[graft] def sq8Index(s: SparkSession, d: String): (DataFrame, Array[Double], Array[Double]) =
    sqCache.computeIfAbsent((s, d), _ => buildSq8Index(s, d))

  /** Same REFRESH contract as the other index families. */
  private[graft] def refreshSq8Index(s: SparkSession, d: String): (DataFrame, Array[Double], Array[Double]) = {
    qCache.remove(d)
    val fresh = buildSq8Index(s, d)
    sqCache.put((s, d), fresh)
    fresh
  }

  /** s11's index: SCALAR quantization (SQ8) — per-dimension min/max
    * over the corpus (the model: 2 × dim doubles, the smallest
    * quantizer of the family), each vector encoded to dim uint8 codes
    * by affine rounding into its dimension's range. Structurally SQ8
    * is the M = dim, K = 256, 1-D-subspace corner of the PQ family —
    * which is why query time reuses the SAME native `pq_adc`
    * expression with a per-dimension affine lookup table instead of
    * needing a new Catalyst expression. The per-dim stats pass is one
    * posexplode + 64-group aggregate; only those 64 (lo, hi) rows
    * reach the driver. Encode is a one-time build-job transform
    * (interpreted HOF, the zOrder nit — acceptable off the query
    * path; the scan the QUERY pays reads 1-byte-per-dim codes, id,
    * nrm). Layout path carries the corpus signature; superseded
    * layouts are reaped — identical staleness rules to LSH/IVF/PQ. */
  private def buildSq8Index(s: SparkSession, d: String): (DataFrame, Array[Double], Array[Double]) = {
    val dataKey = Integer.toHexString(d.hashCode)
    val prefix = s"sq8-" + dataKey
    val root = new java.io.File(IndexRoot,
      prefix + "-s" + java.lang.Long.toHexString(corpusSignature(s, d)))
    val stale = raw"sq8-$dataKey(-s[0-9a-f]+)?".r
    Option(new java.io.File(IndexRoot).listFiles()).foreach(_.foreach { f =>
      if (f.getName != root.getName && stale.matches(f.getName)) rmTree(f)
    })
    if (!root.exists()) {
      val data = emb(s, d)
        .select(col("vec_id"), col("label"), col("embedding").as("e"), col("nrm"))
      val stats = data.select(posexplode(col("e")).as(Seq("pos", "v")))
        .groupBy("pos")
        .agg(min(col("v").cast("double")).as("lo"), max(col("v").cast("double")).as("hi"))
        .collect()
        .map(r => (r.getAs[Int]("pos"), r.getAs[Double]("lo"), r.getAs[Double]("hi")))
        .sortBy(_._1)
      val mins = stats.map(_._2)
      val spans = stats.map(t => t._3 - t._2)
      val minsSql = mins.mkString("array(", ", ", ")")
      val spansSql = spans.mkString("array(", ", ", ")")
      // code_i = round((x_i − lo_i) · 255 / span_i), clamped; a
      // zero-span dimension (constant column) encodes to 0
      val codesExpr =
        s"""transform(e, (x, i) -> IF(element_at($spansSql, i + 1) > 0,
           |  CAST(LEAST(255.0, GREATEST(0.0,
           |    round((CAST(x AS DOUBLE) - element_at($minsSql, i + 1)) * 255.0
           |      / element_at($spansSql, i + 1)))) AS INT), 0))""".stripMargin
      val tmp = new java.io.File(root.getParent, root.getName + ".tmp" + System.nanoTime())
      data.withColumn("codes", expr(codesExpr))
        .select("vec_id", "label", "e", "nrm", "codes")
        .write.mode("overwrite").parquet(new java.io.File(tmp, "index").getAbsolutePath)
      val s2 = s
      import s2.implicits._
      Seq((mins.toSeq, spans.toSeq)).toDF("mins", "spans")
        .coalesce(1)
        .write.mode("overwrite").parquet(new java.io.File(tmp, "stats").getAbsolutePath)
      if (!tmp.renameTo(root)) rmTree(tmp)
    }
    val st = s.read.parquet(new java.io.File(root, "stats").getAbsolutePath).head()
    (s.read.parquet(new java.io.File(root, "index").getAbsolutePath),
      st.getAs[scala.collection.Seq[Double]]("mins").toArray,
      st.getAs[scala.collection.Seq[Double]]("spans").toArray)
  }

  /** s11 — scalar-quantization ANN (rows-only: the quantizer is
    * data-trained). dot(x̂, q) decomposes per dimension into
    * (lo_i + c·span_i/255)·q_i — a 256-entry affine table per
    * dimension, so stage 1 is the SAME native pq_adc lookup scan as
    * s07 (SQ8 = PQ with 1-D subspaces), reading only codes + id + nrm,
    * followed by the standard exact broadcast re-rank. SQ8 keeps far
    * more of the vector's information than PQ's 16 subspace codes —
    * the highest-fidelity cheap scan of the family (spec floor 0.8
    * vs s07's 0.5) — at 1 byte/dim storage. */
  private def s11(s: SparkSession, d: String): DataFrame = {
    val (idx, mins, spans) = sq8Index(s, d)
    val (qe, qnrm) = queryVec(s, d)
    val dim = mins.length
    val lut: Seq[Double] = for {
      i <- 0 until dim
      c <- 0 until 256
    } yield (mins(i) + c * spans(i) / 255.0) * qe(i)
    exportAdcInputs("s11", d,
      idx.where(col("vec_id") =!= 0).select("vec_id", "codes"), lut)
    val shortlistK = math.max(200L, Dedup.approxRowCount(idx) / 40L).toInt
    val shortlist = idx.where(col("vec_id") =!= 0)
      .withColumn("lut", typedlit(lut))
      .withColumn("approx_cos", round(expr("pq_adc(codes, lut)") / (col("nrm") * lit(qnrm)), 6))
      .select("vec_id", "approx_cos")
      .orderBy(col("approx_cos").desc, col("vec_id"))
      .limit(shortlistK)
    idx.join(broadcast(shortlist), "vec_id")
      .withColumn("qe", typedlit(qe.toSeq))
      .withColumn("cos_r", round(expr("vec_dot(e, qe)") / (col("nrm") * lit(qnrm)), 6))
      .select("vec_id", "label", "approx_cos", "cos_r")
      .orderBy(col("cos_r").desc, col("vec_id"))
      .limit(10)
  }

  // SQ8 is the (M = dim, K = 256) corner of the PQ family, so the
  // same replay applies with the 256-entry-per-dimension table.
  private def s11Oracle: String = adcOracle("s11", 256)

  /** s12 — CDC-MAINTAINED IVF assignments over a VERSIONED vector
    * table: the embedding corpus lives as a snapshot table (the thing
    * a production vector store actually is — re-embeddings arrive as
    * CoW merges, not directory rewrites), the coarse quantizer stays
    * FIXED (s03's build-once contract), and the assignment table is
    * brought to the head by re-assigning ONLY the rows the merge
    * touched — `readRowChanges` nets the delta, upserts re-assign
    * through the exact [[assignToCentroids]] path the builder used,
    * deletes drop. Maintenance cost ∝ the CDC batch, never the
    * corpus: the "keep the ANN index current against a feed" story at
    * 100 TB with zero full re-clusters and zero base rescans (drift
    * stays [[assignmentQuality]]'s rebuild trigger). Output: per-
    * centroid membership counts of the maintained table; rows-only
    * (learned quantizer — the s03 reasoning); PipelineSpec proves
    * maintained == full re-assign of the head EXACTLY. */
  private def s12(s: SparkSession, d: String): DataFrame = {
    import graft.sources.GraftCatalog
    val (_, cents) = ivfIndex(s, d)
    val centDf = centroidsDf(s, cents)
    val base = emb(s, d).select(col("vec_id"), col("embedding"))
    val root = s"/tmp/graft-index/snapvec_${math.abs(d.hashCode.toLong)}"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    fs.delete(p, true)
    GraftCatalog.commitSnapshot(
      base.repartitionByRange(4, col("vec_id")), root, append = false)
    val a1 = snapshotIvfAssign(base, centDf)
    // CDC batch: every 20th vector re-embedded (reversed — same norm,
    // different direction), plus new vectors under fresh ids
    val upd = base.where(col("vec_id") % 20 === 0)
      .withColumn("embedding", reverse(col("embedding")))
    val news = base.where(col("vec_id") % 40 === 1)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        reverse(col("embedding")).as("embedding"))
    val head = GraftCatalog.mergeSnapshot(s, root,
      upd.unionByName(news), "vec_id")
    val maintained = maintainIvfAssign(s, root, a1, centDf, 1L, head)
    // ORACLE-CHECKED since r14: the maintained assignment table
    // exports; DuckDB replays the head's expected key set relationally
    // (base ∪ the merge's fresh ids) and counts per centroid over a
    // LEFT join — a maintenance bug that drops a head row surfaces as
    // a NULL-centroid group, a phantom id as a count excess. The
    // quantizer itself stays the engine constant (the s03 reasoning);
    // maintained == full re-assign stays proven exactly in PipelineSpec.
    maintained.write.mode("overwrite").parquet(exportPath("s12asg", d))
    maintained.groupBy("cl").agg(count(lit(1)).as("n")).orderBy("cl")
  }

  private def s12Oracle: String =
    s"""WITH asg AS (
      |  SELECT vec_id, cl
      |  FROM read_parquet('${oracleExportPath("s12asg")}/*.parquet')),
      |hd AS (
      |  SELECT vec_id FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 1000000 FROM embeddings WHERE vec_id % 40 = 1)
      |SELECT a.cl, CAST(COUNT(*) AS BIGINT) AS n
      |FROM hd LEFT JOIN asg a ON hd.vec_id = a.vec_id
      |GROUP BY a.cl ORDER BY a.cl""".stripMargin

  /** Assign a (vec_id, embedding) frame against fixed centroids. */
  private[graft] def snapshotIvfAssign(rows: DataFrame,
      centDf: DataFrame): DataFrame =
    assignToCentroids(
      rows.select(col("vec_id"), col("embedding").as("e"),
        expr("vec_norm(embedding)").as("nrm")), centDf)
      .select("vec_id", "cl")

  /** Fold a snapshot table's net row changes (fromV, toV] into an
    * existing assignment table: touched keys leave, upserts re-assign
    * against the SAME centroids. Cost ∝ the delta. */
  private[graft] def maintainIvfAssign(s: SparkSession, root: String,
      assign: DataFrame, centDf: DataFrame, fromV: Long, toV: Long): DataFrame = {
    val delta = graft.sources.GraftCatalog
      .readRowChanges(s, root, fromV, toV, "vec_id")
    val re = snapshotIvfAssign(
      delta.where(col("_change") === "upsert").select("vec_id", "embedding"),
      centDf)
    assign.join(delta.select("vec_id").distinct(), Seq("vec_id"), "left_anti")
      .unionByName(re)
  }

  // def, not val: the export-pattern oracles (s02/s03/s05/s10)
  // interpolate the per-dataset export path recorded when the query
  // ran — SparkEntry.oracleSql must see the CURRENT value at dump time.
  def all: Seq[Q] = Seq(
    Q("s01_ann_brute", Some(s01Oracle), s01),
    Q("s02_ann_lsh", Some(s02Oracle), s02),
    Q("s03_ann_ivf", Some(s03Oracle), s03),
    Q("s04_ann_batch", Some(s04Oracle), s04),
    Q("s05_ann_rerank", Some(s05Oracle), s05),
    Q("s06_ann_filtered", Some(s06Oracle), s06),
    Q("s07_ann_pq", Some(s07Oracle), s07),
    Q("s08_ann_ivfpq", Some(s08Oracle), s08),
    Q("s09_ann_filtered_ivf", Some(s09Oracle), s09),
    Q("s10_ann_recall_eval", Some(s10Oracle), s10),
    Q("s11_ann_sq8", Some(s11Oracle), s11),
    Q("s12_snapshot_ivf_maintain", Some(s12Oracle), s12))
}
