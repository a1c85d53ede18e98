package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("chain graph: pointer jumping converges in O(log L) rounds, not L") {
    // a 256-vertex chain is the worst case for plain propagation (256
    // rounds); with pointer jumping distances halve each round
    val edges = (0L until 255L).map(i => (i, i + 1)).toDF("src", "dst")
    val (labels, rounds) = ConnectedComponents.run(edges, "src", "dst")
    assert(labels.filter(col("component") =!= 0L).count() === 0)
    assert(labels.count() === 256)
    assert(rounds <= 12, s"pointer jumping should need ~log2(256)+c rounds, took $rounds")
  }

  test("disjoint cliques + bridges: exact component structure") {
    // clique A {0,1,2}, clique B {10,11,12}, bridge 2-10 merges them;
    // isolated pair {100,101}
    val edges = Seq(
      (0L, 1L), (1L, 2L), (0L, 2L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (2L, 10L),
      (100L, 101L)
    ).toDF("src", "dst")
    val (labels, _) = ConnectedComponents.run(edges, "src", "dst")
    val byId = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(0L, 1L, 2L, 10L, 11L, 12L).forall(byId(_) == 0L))
    assert(Seq(100L, 101L).forall(byId(_) == 100L))
    assert(byId.size === 8)
  }

  test("edge orientation is irrelevant (undirected semantics)") {
    val fwd = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val rev = Seq((2L, 1L), (3L, 2L)).toDF("src", "dst")
    val (a, _) = ConnectedComponents.run(fwd, "src", "dst")
    val (b, _) = ConnectedComponents.run(rev, "src", "dst")
    assert(a.orderBy("id").collect().toSeq === b.orderBy("id").collect().toSeq)
  }
}
