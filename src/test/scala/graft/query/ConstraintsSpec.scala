package graft.query

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

class ConstraintsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._
  import Constraints._

  test("planted violations: each check counts exactly its own") {
    val child = Seq(
      (Some(1L), 10.0, 1L),   // clean
      (Some(1L), 10.0, 1L),   // duplicate id -> 1 excess row for unique:id
      (None, 5.0, 2L),        // null fk (NOT an orphan), null for not_null
      (Some(99L), -1.0, 3L),  // orphan fk + below range
      (Some(2L), 1000.0, 4L)  // above range
    ).map { case (fk, v, id) => (fk, v, id) }
      .toDF("fk", "v", "id")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = audit(child, Seq(
      NotNull("fk"),
      InRange("v", 0.0, 100.0),
      Unique(Seq("id")),
      ForeignKey("fk", parent, "pk", "parent")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("not_null:fk") === 1L)
    assert(got("range:v[0.0,100.0]") === 2L)  // -1.0 and 1000.0; NULL exempt
    assert(got("unique:id") === 1L)           // one excess copy of id=1
    assert(got("fk:fk->parent.pk") === 1L)    // 99; NULL fk is legal
  }

  test("all-clean table reports zeros for every check (incl. empty frame)") {
    val child = Seq((1L, 1.0)).toDF("id", "v")
    val zeros = audit(child, Seq(NotNull("id"), InRange("v", 0.0, 2.0),
      Unique(Seq("id"))))
      .collect().map(_.getLong(1))
    assert(zeros.forall(_ === 0L))
    val empty = audit(child.filter($"id" < 0), Seq(NotNull("id")))
      .collect()
    assert(empty.length === 1 && empty.head.getLong(1) === 0L)
  }

  test("multi-column uniqueness counts excess over the tuple") {
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"))
      .toDF("k1", "k2")
    val got = audit(df, Seq(Unique(Seq("k1", "k2")))).head().getLong(1)
    assert(got === 1L)
  }
}
