package graft

import org.apache.spark.sql.functions._

import graft.operators.Scrub

class ScrubSpec extends SparkTestBase {
  import spark.implicits._

  test("piiRedact removes every planted email/phone and counts them") {
    val df = Seq(
      (1L, "plain text with no pii at all"),
      (2L, "mail a@b.co and c.d+e@f-g.org please"),
      (3L, "call 555-123-4567 or 555-765-4321"),
      (4L, "mixed x@y.io and 111-222-3333 here"))
      .toDF("doc_id", "text")
    val out = Scrub.piiRedact(df, col("text"))
      .select("doc_id", "n_pii", "redacted")
      .as[(Long, Long, String)].collect()
      .map { case (id, n, t) => id -> ((n, t)) }.toMap
    assert(out(1L) == ((0L, "plain text with no pii at all")))
    assert(out(2L)._1 == 2L && out(2L)._2 == "mail <EMAIL> and <EMAIL> please")
    assert(out(3L)._1 == 2L && out(3L)._2 == "call <PHONE> or <PHONE>")
    assert(out(4L)._1 == 2L && out(4L)._2 == "mixed <EMAIL> and <PHONE> here")
  }

  test("n_pii equals the number of tags actually emitted on overlaps") {
    // the phone-shaped substring lives INSIDE the email match: one
    // replacement happens, so the audit must say 1, not 2
    val df = Seq((1L, "contact 555-123-4567@example.com now"))
      .toDF("doc_id", "text")
    val (n, t) = Scrub.piiRedact(df, col("text"))
      .select("n_pii", "redacted").as[(Long, String)].head()
    assert(t == "contact <EMAIL> now")
    assert(n == 1L, s"audit count must match the single replacement: $n")
  }

  test("phone word-boundary: digits embedded in longer runs don't match") {
    val df = Seq((1L, "id 9555-123-45678 is not a phone")).toDF("doc_id", "text")
    val (n, t) = Scrub.piiRedact(df, col("text"))
      .select("n_pii", "redacted").as[(Long, String)].head()
    assert(n == 0L && t.contains("9555-123-45678"))
  }

  test("decontaminate flags only docs sharing >= minShared shingles") {
    // benchmark doc: "alpha beta gamma delta" -> shingles
    // {alpha beta gamma, beta gamma delta}
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"), // shares 2 -> flagged
      (2L, "zz alpha beta gamma"),            // shares 1 -> clean
      (3L, "totally unrelated words here"))   // shares 0 -> clean
      .toDF("doc_id", "text")
    val out = Scrub.decontaminate(docs, bench, minShared = 2)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L))
  }

  test("decontaminate broadcasts the benchmark side") {
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val docs = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val df = Scrub.decontaminate(docs, bench)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "corpus-side shuffle of exploded shingles must not pay a join shuffle")
  }
}
