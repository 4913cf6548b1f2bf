package graft

import graft.operators.Assoc

/** Association rules: hand-computed support/confidence/lift, direction
  * asymmetry, lift symmetry, and the Apriori support floor. */
class AssocSpec extends SparkTestBase {
  import spark.implicits._

  // 4 users: u1{x,y}, u2{x,y}, u3{x}, u4{y,z}
  private def ev = Seq(
    (1L, "x"), (1L, "y"), (1L, "x"), // duplicate event: baskets dedup
    (2L, "x"), (2L, "y"),
    (3L, "x"),
    (4L, "y"), (4L, "z"))
    .toDF("user_id", "event_type")

  private def rules = Assoc.assocRules(ev)
    .as[(String, String, Long, Long, Long, Long, Long, Long)]
    .collect().map(r => (r._1, r._2) -> r).toMap

  test("hand-computed measures; repeated events count once per basket") {
    // n_users=4; n_x=3, n_y=3, n_z=1; n_xy=2, n_yz=1
    val xy = rules(("x", "y"))
    assert((xy._3, xy._4, xy._5) == ((3L, 3L, 2L)))
    assert(xy._6 == 500000L, "supp = 2/4")
    assert(xy._7 == 666666L, "conf = 2/3")
    assert(xy._8 == 888888L, "lift = (2*4)/(3*3) ppm")
  }

  test("confidence is direction-asymmetric, lift is symmetric") {
    val yz = rules(("y", "z")); val zy = rules(("z", "y"))
    assert(yz._7 == 333333L, "P(z|y) = 1/3")
    assert(zy._7 == 1000000L, "P(y|z) = 1")
    assert(yz._8 == zy._8 && yz._8 == 1333333L,
      "lift = (1*4)/(3*1) both directions")
    // no x-z rule: they never co-occur
    assert(!rules.contains(("x", "z")) && !rules.contains(("z", "x")))
  }

  test("minUsers prunes rare pairs before the rule math") {
    val pruned = Assoc.assocRules(ev, minUsers = 2L)
      .as[(String, String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2)).toSet
    assert(pruned == Set(("x", "y"), ("y", "x")))
  }
}
