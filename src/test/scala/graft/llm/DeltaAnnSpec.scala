package graft.llm

import org.apache.spark.sql.functions._

/** delta_ann_index ground truth, re-derived in plain Scala: each shard
  * vector's code per subspace must be the argmin of the quantized
  * sub-distance to the FROZEN corpus codebook (ties to the smallest
  * code) — an algorithmically independent check on the Spark argmin
  * expression chain. */
class DeltaAnnSpec extends graft.SparkSpec {

  test("shard codes are the exact frozen-codebook sub-distance argmin (sf0.001)") {
    val (cb, _) = Similarity.pqCorpusIndexStage(spark, sf)
    val split = Similarity.deltaVecSplitOf(spark, sf)
    assert(split > 0, "empty embeddings table would vacuously pass")
    // codebook → Map[dim -> Array(centroid component per slot)]
    val slots = cb.columns.count(_.matches("c\\d+"))
    val book: Map[Long, Array[Long]] = cb.collect().map { r =>
      // dim is the INT sequence() element type; c columns are LONG sums
      r.getAs[Number]("dim").longValue() ->
        (0 until slots).map(k =>
          r.getAs[Number](s"c$k").longValue()).toArray
    }.toMap
    // shard vectors, quantized exactly like quantComponents
    val shard = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") >= split)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    assert(shard.nonEmpty, "shard is empty — split rule broken?")
    val expected = shard.flatMap { case (id, emb) =>
      val q = emb.map(v => math.floor(v.toDouble * 1000).toLong)
      q.indices.groupBy(_ / 16).toSeq.flatMap { case (sub, dims) =>
        // sub-distance per slot over the dims the codebook carries
        // (inner join on dim: dims beyond the codebook drop out; a sub
        // with NO matched dim yields no row at all, like the join)
        val d2 = Array.fill(slots)(0L)
        var matched = 0
        for (i <- dims; c <- book.get(i + 1L)) { // dim is 1-based
          matched += 1
          for (k <- 0 until slots) {
            val diff = c(k) - q(i)
            d2(k) += diff * diff
          }
        }
        if (matched == 0) None
        else {
          val code = d2.zipWithIndex.minBy { case (d, k) => (d, k) }._2
          Some((id, sub.toLong, code.toLong))
        }
      }
    }.toSet
    val got = graft.SparkEntry.queries("delta_ann_index")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected,
      s"codes diverge: extra=${got -- expected} missing=${expected -- got}")
  }
}
