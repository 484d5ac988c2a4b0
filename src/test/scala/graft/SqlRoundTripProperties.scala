package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.plans.GraftSqlLex

/** PROPERTY round-trip for the one shared SQL lexer (VERDICT r11 #5: three
  * quote/paren fix waves in one round — retire the CLASS, not instances).
  * The emitter `q` and the scanners `quotedLiteral`/`parsePropPairs`/
  * `balancedClose` are exercised as exact-inverse pairs over randomized
  * strings carrying every hazard that produced a fix wave: embedded
  * quotes (both `''` and `\'` spellings), backslashes, parens, commas,
  * newlines, SQL line/block comment openers, unicode. ≥1200 cases/run. */
object SqlRoundTripProperties extends Properties("graft.sqllex") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(400)

  /** Strings built from the hazard alphabet. */
  private val nasty: Gen[String] = for {
    n <- Gen.choose(0, 12)
    parts <- Gen.listOfN(n, Gen.oneOf(
      Gen.oneOf("'", "\\", "(", ")", ",", "=", "\n", " ", "--", "/*", "*/",
        "''", "\\'", "\\\\", "it's", "a > 0 AND (b < 'x')", "ü", "数据", "🙂"),
      Gen.alphaNumStr.map(_.take(4))))
  } yield parts.mkString

  property("q is the exact inverse of quotedLiteral, at any offset") =
    forAll(nasty, nasty) { (s, junk) =>
      // the first run of this property found the one true ambiguity: a
      // literal IMMEDIATELY followed by another quote ("''" + "'…") is
      // maximal-munched as '' doubling — exactly Spark's lexer behavior,
      // and every call site's grammar puts a separator (',' '=' ws)
      // between literals, so the precondition is encoded here
      val enc = "'" + GraftSqlLex.q(s) + "'"
      val (dec, next) = GraftSqlLex.quotedLiteral(enc + "," + junk, 0)
      dec == s && next == enc.length
    }

  property("prop-pair lists emitted as SHOW CREATE does parse back exactly") =
    forAll(Gen.mapOf(Gen.zip(Gen.identifier.map(_.take(8)), nasty))
        .map(_.take(6))) { props =>
      val body = props.toSeq.sortBy(_._1)
        .map { case (k, v) => s"'${GraftSqlLex.q(k)}' = '${GraftSqlLex.q(v)}'" }
        .mkString(",\n  ")
      GraftSqlLex.parsePropPairs(body) == props
    }

  /** Balanced bodies: nested paren groups, quoted hazards, line + block
    * comments carrying apostrophes — everything a CREATE column list can
    * legally contain between its outer parens. */
  private def segment(depth: Int): Gen[String] = {
    val plain = Gen.listOfN(4, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(4)), Gen.oneOf(" ", ",", " INT", " DECIMAL")))
      .map(_.mkString)
    val quoted = nasty.map(s => "'" + GraftSqlLex.q(s) + "'")
    val lineComment = nasty.map(s =>
      "-- " + s.replace("\n", " ") + "\n")
    val blockComment = nasty.map(s =>
      "/* " + s.replace("*/", " ") + " */")
    val nested =
      if (depth <= 0) plain
      else Gen.lzy(body(depth - 1)).map(b => "(" + b + ")")
    Gen.oneOf(plain, quoted, lineComment, blockComment, nested)
  }

  private def body(depth: Int): Gen[String] = for {
    n <- Gen.choose(0, 5)
    segs <- Gen.listOfN(n, segment(depth))
  } yield segs.mkString

  property("balancedClose finds the outer close through every hazard") =
    forAll(body(2), nasty) { (b, junk) =>
      // a body ending mid-line-comment would swallow the close — terminate
      val clean = if (b.lastIndexOf("--") > b.lastIndexOf("\n")) b + "\n" else b
      val s = "(" + clean + ")" + " tail (junk) " + junk
      GraftSqlLex.balancedClose(s, 0) == clean.length + 1
    }

  property("an unterminated quote/comment (or a comment hiding the close) is unbalanced") =
    forAll(Gen.alphaNumStr.map(_.take(12))) { b =>
      GraftSqlLex.balancedClose("(" + b + " '", 0) == -1 &&
        GraftSqlLex.balancedClose("(" + b + " /* x", 0) == -1 &&
        GraftSqlLex.balancedClose("(" + b + " -- )", 0) == -1
    }
}
