package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** Connected-components edge cases: chains (worst diameter for min-label
  * propagation), cycles, disjoint components, and the over-deletion
  * scenario clusters exist to fix.
  */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cc(edges: (Long, Long)*): Map[Long, Long] =
    Graph.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("chain a-b-c collapses to one component under min id") {
    val got = cc((1L, 2L), (2L, 3L))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("two disjoint components keep separate labels") {
    val got = cc((1L, 2L), (10L, 11L), (11L, 12L))
    assert(got === Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("cycle and reversed edge direction do not matter") {
    val got = cc((3L, 2L), (2L, 1L), (1L, 3L))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("long chain converges within the iteration budget") {
    // a 12-vertex path, edges listed high-to-low so labels must propagate
    // the full diameter
    val edges = (1L until 12L).map(i => (i + 1, i))
    val got = cc(edges: _*)
    assert(got.values.toSet === Set(1L))
    assert(got.size === 12)
  }

  test("self-loop is harmless") {
    val got = cc((5L, 5L), (5L, 6L))
    assert(got === Map(5L -> 5L, 6L -> 5L))
  }
}
