package graft

import graft.functions.Audit
import org.scalatest.funsuite.AnyFunSuite

/** Referential-integrity audit semantics: orphans, childless parents,
  * NULL-key accounting (cross-engine parity is fk_audit's oracle). */
class AuditSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("fkAudit: counts orphans, childless parents, and NULL keys separately") {
    // children: 2 rows -> parent 1, 1 row -> parent 2, 2 rows -> missing 9
    // (one key), 1 row -> missing 8, 2 NULL keys. parents: 1, 2, 3 (3 childless).
    val child = Seq[java.lang.Long](1L, 1L, 2L, 9L, 9L, 8L, null, null).toDF("ck")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Audit.fkAudit(child, "ck", parent, "pk").collect().head
    val byName = r.schema.fieldNames.zipWithIndex.map { case (n, i) => n -> r.getLong(i) }.toMap
    assert(byName("n_child") === 8L)
    assert(byName("n_child_keys") === 4L) // 1, 2, 9, 8
    assert(byName("n_child_null") === 2L)
    assert(byName("n_orphan") === 3L) // 9, 9, 8 — NULLs are NOT orphans
    assert(byName("n_orphan_keys") === 2L)
    assert(byName("n_parent") === 3L)
    assert(byName("n_childless_parents") === 1L) // only 3
  }

  test("fkAudit: a clean reference audits to zeros") {
    val child = Seq(1L, 1L, 2L, 2L, 2L).toDF("ck")
    val parent = Seq(1L, 2L).toDF("pk")
    val r = Audit.fkAudit(child, "ck", parent, "pk").collect().head
    val byName = r.schema.fieldNames.zipWithIndex.map { case (n, i) => n -> r.getLong(i) }.toMap
    assert(byName("n_orphan") === 0L)
    assert(byName("n_orphan_keys") === 0L)
    assert(byName("n_child_null") === 0L)
    assert(byName("n_childless_parents") === 0L)
  }
}
