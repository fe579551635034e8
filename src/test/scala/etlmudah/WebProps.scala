package etlmudah.web

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkTestSession

/** ScalaCheck property for the robots.txt path gate: exact agreement
  * with a plain-Scala RFC 9309 reference resolver over random rule
  * sets and URL paths from a tiny segment alphabet (collisions,
  * shared prefixes, wildcard/anchor interactions, and LIKE-metachar
  * segments all arise by construction). */
object WebProps extends Properties("RobotsPathGate") {

  private lazy val spark = SparkTestSession.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(25)

  // segments include LIKE metacharacters on purpose: a literal % or _
  // in a rule pattern must not act as a wildcard after compilation
  private val seg: Gen[String] = Gen.oneOf("a", "b", "ab", "10%", "a_b")
  private val pathGen: Gen[String] =
    Gen.chooseNum(1, 3).flatMap(n =>
      Gen.listOfN(n, seg).map(_.mkString("/", "/", "")))
  private val patGen: Gen[String] = for {
    a <- pathGen
    mid <- Gen.oneOf("", "*")
    b <- Gen.oneOf("", "/a", "%")
    anch <- Gen.oneOf("", "$")
  } yield a + mid + b + anch
  private val hostGen: Gen[String] = Gen.oneOf("h1.com", "h2.com")
  private val ruleGen: Gen[(String, String, String)] = for {
    h <- hostGen
    d <- Gen.oneOf("allow", "disallow")
    p <- patGen
  } yield (h, d, p)
  private val rulesGen: Gen[List[(String, String, String)]] =
    Gen.chooseNum(0, 6).flatMap(n => Gen.listOfN(n, ruleGen))
  private val urlGen: Gen[(String, String)] = for {
    h <- hostGen
    p <- pathGen
    q <- Gen.oneOf("", "?x=1", "#f")
  } yield (h, s"https://$h$p$q")
  private val urlsGen: Gen[List[(String, String)]] =
    Gen.chooseNum(1, 10).flatMap(n => Gen.listOfN(n, urlGen))

  /** Reference resolver: regex compilation of the same pattern
    * dialect (leading-anchored, `*` any run, trailing `$` end-anchor,
    * everything else literal), longest-body-wins, allow wins ties,
    * default allow. */
  private def refAllowed(rules: Seq[(String, String, String)],
                         host: String, path: String): Boolean = {
    val matches = rules.filter(_._1 == host).flatMap { case (_, d, p) =>
      val anch = p.endsWith("$")
      val body = if (anch) p.dropRight(1) else p
      val rx = "^" +
        java.util.regex.Pattern.quote(body).replace("*", "\\E.*\\Q") +
        (if (anch) "$" else ".*")
      if (path.matches(rx))
        Some((body.length, if (d == "allow") 1 else 0))
      else None
    }
    if (matches.isEmpty) true else matches.max._2 == 1
  }

  property("gate equals the reference resolver on random rules and paths") =
    forAll(rulesGen, urlsGen) { (rules, urls) =>
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val ruleDf =
        (if (rules.isEmpty) List(("unused.zz", "disallow", "/never"))
         else rules).toDF("host", "directive", "path")
      val df = urls.zipWithIndex
        .map { case ((h, u), i) => (i.toLong, h, u) }
        .toDF("id", "host", "url")
      val got = Web.robotsPathGate(df, "url", "id", ruleDf)
        .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
      urls.zipWithIndex.forall { case ((h, u), i) =>
        val path = u.replaceFirst("^https://[^/?#]+", "")
          .replaceFirst("[?#].*$", "") match {
          case "" => "/"
          case p => p
        }
        got(i.toLong) == refAllowed(rules, h, path)
      }
    }
}
