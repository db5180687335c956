package graft

import org.scalatest.funsuite.AnyFunSuite

/** The production session factory must pin the confs the operators (and
  * PlanSpec's gates) assume, and expose the graft_* SQL surface. */
class GraftSessionSpec extends AnyFunSuite with SparkSpec {

  test("GraftSession pins the scale confs and registers graft_* functions") {
    spark // materialize the shared local[4] test session first
    // Applied to the existing test session (getOrCreate returns it).
    val s = GraftSession.getOrCreate()
    assert(s.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(s.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(s.conf.get("spark.sql.session.timeZone") == "UTC")
    // The SQL kernel surface is callable after registration.
    val r = s.sql("SELECT size(graft_shingles('abcdef', 3)) AS n").collect()(0).getInt(0)
    assert(r == 4) // abc bcd cde def
  }
}
