package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RobotsOpsSpec extends SparkSpec {
  import spark.implicits._

  private def verdicts(robotsBody: String,
                       paths: Seq[String]): Map[String, (Boolean, Option[String], Option[String])] = {
    val robots = Seq(("h1", robotsBody)).toDF("host", "robots")
    val req = paths.zipWithIndex
      .map { case (p, i) => (i.toLong, "h1", p) }
      .toDF("rid", "host", "path")
    RobotsOps.evaluate(robots, "host", "robots", req, "rid", "host", "path",
        agent = "graftbot")
      .collect().map(r => r.getString(2) -> ((r.getBoolean(3),
        Option(r.getString(4)), Option(r.getString(5))))).toMap
  }

  test("RFC semantics: longest match, Allow tie-break, empty Disallow") {
    val body =
      """# header comment
        |User-agent: *
        |Disallow: /a
        |Allow: /a/ok
        |Disallow:
        |Allow: /t
        |Disallow: /t
        |""".stripMargin
    val v = verdicts(body, Seq("/", "/a/x", "/a/ok/y", "/t/z", "/b"))
    assert(v("/") == ((true, None, None)))               // no match: allow
    assert(v("/a/x") == ((false, Some("disallow"), Some("/a"))))
    assert(v("/a/ok/y") == ((true, Some("allow"), Some("/a/ok")))) // longest
    assert(v("/t/z") == ((true, Some("allow"), Some("/t")))) // tie → allow
    assert(v("/b") == ((true, None, None)))              // empty Disallow: no-op
  }

  test("agent specificity: a graftbot group replaces the * rules") {
    val body =
      """User-agent: *
        |Disallow: /
        |
        |USER-AGENT: GraftBot
        |Disallow: /only
        |""".stripMargin
    val v = verdicts(body, Seq("/anything", "/only/x"))
    assert(v("/anything") == ((true, None, None)),
      "star rules must not apply when a specific group exists")
    assert(v("/only/x") == ((false, Some("disallow"), Some("/only"))))
  }

  test("consecutive UA lines share one group; trailing comments strip") {
    val body =
      """User-agent: otherbot
        |User-agent: *
        |Disallow: /x # keep out
        |""".stripMargin
    val v = verdicts(body, Seq("/x/1", "/y"))
    assert(v("/x/1") == ((false, Some("disallow"), Some("/x"))))
    assert(v("/y") == ((true, None, None)))
  }

  test("tab/CRLF whitespace strips (RFC WS is space or tab)") {
    val body = "User-agent: *\r\nDisallow:\t/private\r\n\tAllow: /private/ok\r\n"
    val v = verdicts(body, Seq("/private/x", "/private/ok/y"))
    assert(v("/private/x") == ((false, Some("disallow"), Some("/private"))))
    assert(v("/private/ok/y") == ((true, Some("allow"), Some("/private/ok"))))
  }

  test("a reqId reused across requests keeps per-(host,path) verdicts") {
    val robots = Seq(("a.com", "User-agent: *\nDisallow: /private\n"))
      .toDF("host", "robots")
    val req = Seq((1L, "a.com", "/private/x"), (1L, "b.com", "/ok"))
      .toDF("rid", "host", "path")
    val out = RobotsOps.evaluate(robots, "host", "robots",
        req, "rid", "host", "path", "graftbot")
      .collect().map(r => r.getString(1) -> r.getBoolean(3)).toMap
    assert(out == Map("a.com" -> false, "b.com" -> true),
      "one request's verdict must not fan onto the other")
  }

  test("missing robots host defaults to allowed") {
    val robots = Seq(("other", "User-agent: *\nDisallow: /")).toDF("host", "robots")
    val req = Seq((1L, "h1", "/p")).toDF("rid", "host", "path")
    val out = RobotsOps.evaluate(robots, "host", "robots",
        req, "rid", "host", "path", "graftbot").collect().head
    assert(out.getBoolean(3) && out.isNullAt(4))
    graft.CacheRegistry.releaseAll()
  }
}
