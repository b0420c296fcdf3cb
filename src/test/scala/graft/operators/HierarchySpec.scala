package graft.operators

import graft.SparkTestBase

class HierarchySpec extends SparkTestBase {

  private def edges(pairs: (Int, Int)*) = {
    val values = pairs.map { case (c, p) => s"($c, $p)" }.mkString(", ")
    spark.sql(s"SELECT * FROM VALUES $values AS t(child, parent)")
  }

  test("ancestorClosure emits one row per ancestor hop") {
    // chain 3 -> 2 -> 1 plus a side branch 4 -> 1
    val out = Hierarchy.ancestorClosure(edges(3 -> 2, 2 -> 1, 4 -> 1),
        "child", "parent")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    assert(out == Set((3, 2, 1), (2, 1, 1), (4, 1, 1), (3, 1, 2)))
  }

  test("rootOf finds terminal ancestors; parentless nodes self-root at depth 0") {
    val out = Hierarchy.rootOf(edges(3 -> 2, 2 -> 1, 5 -> 4), "child", "parent")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    assert(out == Set((1, 1, 0), (4, 4, 0), (2, 1, 1), (3, 1, 2), (5, 4, 1)))
  }

  test("a cycle fails loudly at the recursion level limit, not forever") {
    val key = "spark.sql.cteRecursionLevelLimit"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "8")
    try {
      val e = intercept[Exception] {
        Hierarchy.ancestorClosure(edges(1 -> 2, 2 -> 1), "child", "parent")
          .count()
      }
      assert(e.getMessage.toLowerCase.contains("recursion"),
        s"unexpected failure: ${e.getMessage}")
    } finally spark.conf.set(key, prev)
  }
}
