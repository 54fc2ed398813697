package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-hop transitivity for the label-propagation clustering — the
  * testdata's near-dup groups are triangles, so the chain case needs a
  * synthetic graph: a—b—c—d with no shortcut edges must collapse to one
  * cluster rooted at min(a). */
class ClusterSpec extends SparkSpec {
  lazy val s = spark
  import s.implicits._

  private def propagate(pairs: DataFrame): Map[Long, Long] = {
    // same loop as Dedup.clusters, over an arbitrary pair set
    val edges = pairs.select($"id1".as("a"), $"id2".as("b"))
      .unionByName(pairs.select($"id2".as("a"), $"id1".as("b")))
    var labels = edges.select($"a".as("id")).distinct()
      .select($"id", $"id".as("label"))
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 20) {
      val nbr = labels.as("l").join(edges.as("e"), col("l.id") === col("e.a"))
        .select(col("e.b").as("id"), col("l.label"))
      val next = labels.unionByName(nbr)
        .groupBy("id").agg(min($"label").as("label"))
      changed = next.as("n").join(labels.as("o"), col("n.id") === col("o.id"))
        .filter(col("n.label") =!= col("o.label")).count()
      labels = next
      rounds += 1
    }
    labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a 4-node chain collapses to one cluster (multi-hop propagation)") {
    val chain = Seq((10L, 20L), (20L, 30L), (30L, 40L)).toDF("id1", "id2")
    val got = propagate(chain)
    assert(got == Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 40L -> 10L))
  }

  test("disjoint components keep separate roots") {
    val g = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id1", "id2")
    val got = propagate(g)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }
}
