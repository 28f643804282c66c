package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProductQuantizeSpec extends SparkSpec {

  private val Dim = 64

  /** Deterministic synthetic embeddings: base direction per cluster
    * plus a small per-vector perturbation, so near-neighbors exist by
    * construction (same shape as the driver's embeddings fixture).
    */
  private def embs(n: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val bases = Similarity.hyperplanes(10, Dim, 99L)
    (0L until n.toLong)
      .map { id =>
        val base = bases((id % 10).toInt)
        val pert = Similarity.hyperplanes(1, Dim, 7L + id)(0)
        (id, Array.tabulate(Dim)(j => (base(j) + 0.05 * pert(j)).toFloat))
      }
      .toDF("vec_id", "embedding")
  }

  test("codebooks: shape, determinism, and the 1/sqrt(m) norm scale") {
    val cb = ProductQuantize.codebooks(8, 16, 8, 11L)
    assert(cb.length == 8 && cb.forall(_.length == 16) && cb.forall(_.forall(_.length == 8)))
    val cb2 = ProductQuantize.codebooks(8, 16, 8, 11L)
    assert(cb.flatMap(_.flatMap(_.toSeq)).toSeq == cb2.flatMap(_.flatMap(_.toSeq)).toSeq)
    cb.foreach(_.foreach { c =>
      val norm = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(norm - 1.0 / math.sqrt(8.0)) < 1e-12)
    })
  }

  test("encode: codes fit 4 bits per subspace, recon_err >= 0, reruns byte-identical") {
    val e = embs(200)
    val out = ProductQuantize.encode(e, "vec_id", "embedding").collect()
    assert(out.length == 200)
    out.foreach { r =>
      val code = r.getLong(r.fieldIndex("pq_code"))
      assert(code >= 0L && code < (1L << 32), s"packed code out of 32-bit range: $code")
      assert(r.getDouble(r.fieldIndex("recon_err")) >= 0.0)
    }
    val again = ProductQuantize.encode(e, "vec_id", "embedding").collect()
    assert(out.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("finer codebook reconstructs better: mean recon_err(k=16) < mean recon_err(k=4)") {
    val e = embs(200)
    def meanErr(k: Int): Double =
      ProductQuantize
        .encode(e, "vec_id", "embedding", m = 8, k = k)
        .agg(avg("recon_err"))
        .head()
        .getDouble(0)
    assert(meanErr(16) < meanErr(4))
  }

  test("ivfPqTopK: rank contract, no self-neighbors, ADC recall tracks exact top-k") {
    val e = embs(300)
    val pred = col("vec_id") % 50 === 0
    val pq = ProductQuantize
      .ivfPqTopK(e, "vec_id", "embedding", pred, kNN = 5, nProbe = 8)
      .collect()
    val byQuery = pq.groupBy(_.getLong(0))
    assert(byQuery.nonEmpty)
    byQuery.foreach { case (q, rows) =>
      assert(rows.map(_.getInt(1)).sorted.sameElements(1 to rows.length))
      assert(rows.forall(_.getLong(2) != q))
    }
    val exact = Similarity
      .cosineTopK(e, "vec_id", "embedding", pred, k = 5)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(2)).toSet }
    // Recall floor: chance is 5/300 ≈ 0.017. The fixture's clusters
    // have intra-cluster spread (0.05 perturbation) BELOW the
    // untrained-codebook quantization error, so exact top-5 within a
    // ~30-vector cluster is near-tie territory ADC cannot fully
    // resolve — measured 0.23; floor at half that, still 7x chance.
    val overlaps = byQuery.toSeq.map { case (q, rows) =>
      val approx = rows.map(_.getLong(2)).toSet
      exact.get(q).map(ex => (approx intersect ex).size.toDouble / 5.0).getOrElse(0.0)
    }
    val recall = overlaps.sum / overlaps.size
    assert(recall >= 0.12, s"mean ADC recall@5 $recall below floor 0.12")
  }

  test("ivfPqTopKIndexed over a parquet-persisted buildIvfPqIndex == inline; geometry guarded") {
    val e = embs(300)
    val pred = col("vec_id") % 25 === 0
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r =>
          (r.getLong(r.fieldIndex("query_id")), r.getInt(r.fieldIndex("rank")),
            r.getLong(r.fieldIndex("neighbor_id"))))
        .toSet
    for (r <- Seq(1, 3)) {
      val inline =
        rows(ProductQuantize.ivfPqTopK(e, "vec_id", "embedding", pred, corpusReplicas = r))
      val path = java.nio.file.Files.createTempDirectory(s"graft-pqidx$r").toString
      ProductQuantize
        .buildIvfPqIndex(e, "vec_id", "embedding", corpusReplicas = r)
        .write
        .mode("overwrite")
        .parquet(path)
      val served = rows(
        ProductQuantize.ivfPqTopKIndexed(e, "vec_id", "embedding", pred,
          spark.read.parquet(path), multiAssigned = r > 1))
      assert(served == inline, s"persisted-index PQ serving must equal inline at R=$r")
      // dedup decision derives from the replica stamp on the cluster
      // column — omitting the flag on an R=3 index must still dedup
      val servedDefaultFlag = rows(
        ProductQuantize.ivfPqTopKIndexed(e, "vec_id", "embedding", pred,
          spark.read.parquet(path)))
      assert(servedDefaultFlag == inline, s"multiAssigned must derive from the index stamp at R=$r")
      val err = intercept[IllegalArgumentException] {
        ProductQuantize
          .ivfPqTopKIndexed(e, "vec_id", "embedding", pred,
            spark.read.parquet(path), pqSeed = 99L, multiAssigned = r > 1)
          .collect()
      }
      assert(err.getMessage.contains("geometry mismatch"))
    }
  }

  test("ivfPqTopK plan: queries broadcast, corpus join side carries codes not vectors") {
    val e = embs(300)
    val df = ProductQuantize.ivfPqTopK(e, "vec_id", "embedding", col("vec_id") % 50 === 0)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"query side not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), "IVF-PQ plan degenerated to a cartesian product")
  }
}
