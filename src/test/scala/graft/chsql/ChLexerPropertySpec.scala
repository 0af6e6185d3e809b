package graft.chsql

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based pinning of the lexer layer's contracts. Two rounds of
  * review found edge cases exactly here (an unbalanced `"` or a bare
  * `”` swallowing every following `;`), so the invariants that make
  * those bugs impossible are asserted over generated input rather than
  * a handful of examples:
  *
  *  - totality: [[ChLexer.cleanScript]], [[ChLexer.tokenize]],
  *    [[ChLexer.statements]] and [[ChTypes.splitTopLevel]] never throw
  *    on ANY character soup (unbalanced quotes, stray smart quotes,
  *    truncated comments included);
  *  - no-swallow: a syntactically well-formed script of N statements —
  *    comments, smart quotes, `\G` terminators, literals carrying `;`,
  *    line- and block-comment markers inside — always splits back into
  *    exactly those N statements with comments stripped and quotes
  *    normalized;
  *  - join-inverse: type-argument lists rebuilt from balanced parts
  *    split back into the same parts.
  *
  * Fixed initial seed: failures reproduce; 500 cases per property.
  */
class ChLexerPropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(500)
      .withInitialSeed(Seed(0xC11C4L))
    val res = SCTest.check(params, p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private def normWs(s: String): String = s.split("\\s+").mkString(" ").trim

  // -------------------------------------------------------------- soup

  /** Character soup biased toward every character the lexer treats
    * specially, in ANY order — unbalanced by construction.
    */
  private val soupGen: Gen[String] = {
    val nasty = Gen.oneOf("'", "''", "\"", "`", "‘", "’", "“", "”", ";",
      ",", "--", "\n", "/*", "*/", "\\G", "(", ")", "[", "]", "=", " ",
      "ab", "7", "select", "from")
    Gen.chooseNum(0, 60).flatMap(n => Gen.listOfN(n, nasty).map(_.mkString))
  }

  test("lexer totality: no input crashes cleanScript/tokenize/" +
    "statements/splitTopLevel") {
    check("totality", Prop.forAll(soupGen) { s =>
      val cleaned = ChLexer.cleanScript(s)
      ChLexer.tokenize(cleaned)
      ChLexer.statements(s)
      ChTypes.splitTopLevel(s, ';')
      ChTypes.splitTopLevel(s, ',')
      true
    })
  }

  // ------------------------------------------- well-formed round trips

  /** A statement piece as (raw, cleaned) so the expected output of
    * cleanScript is constructed alongside the input.
    */
  private val pieceGen: Gen[(String, String)] = {
    val word = Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
    // literal innards the splitter must NOT react to
    val nastyBody = Gen.chooseNum(0, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "7", ";", "--", "/*", "*/", "\"",
        "\\G", " ", "\n")).map(_.mkString))
    Gen.oneOf(
      word.map(w => (w, w)),
      Gen.chooseNum(0, 999).map(n => (n.toString, n.toString)),
      // plain single-quoted literal, '' escape, adversarial body
      nastyBody.map { b =>
        val lit = "'" + b.replace("'", "''") + "'"
        (lit, lit)
      },
      // smart-quoted literal (slide style) normalizes to plain quotes
      word.map(w => (s"‘$w’", s"'$w'")),
      word.map(w => (s"’$w’", s"'$w'")),
      // interior plain quote must leave smart delimiters as '' or the
      // emitted literal closes early (found by this suite's first run)
      word.map(w => (s"‘$w'$w’", s"'$w''$w'")),
      // smart DOUBLE quotes normalize to identifier quotes
      word.map(w => (s"“$w”", "\"" + w + "\"")),
      word.map(w => (s"`$w`", s"`$w`")),
      // comments vanish
      word.map(w => (s"-- $w ;drop\n", "")),
      word.map(w => (s"/* $w ; \n select */", "")),
      // balanced nesting with commas stays intact
      word.map(w => (s"($w, $w)", s"($w, $w)")),
      word.map(w => (s"[$w, 1]", s"[$w, 1]")))
  }

  private val stmtGen: Gen[(String, String)] =
    Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, pieceGen)).map { ps =>
      (ps.map(_._1).mkString(" "), normWs(ps.map(_._2).mkString(" ")))
    }

  private val scriptGen: Gen[(List[(String, String)], String)] = for {
    stmts <- Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, stmtGen))
    seps <- Gen.listOfN(stmts.length, Gen.oneOf(";", ";\n", "\\G"))
  } yield (stmts, stmts.map(_._1).zip(seps)
    .map { case (s, t) => s + t }.mkString(" "))

  test("no statement is swallowed: scripts of well-formed statements " +
    "split back exactly, through comments, smart quotes and \\G") {
    check("no-swallow", Prop.forAll(scriptGen) { case (stmts, script) =>
      val got = ChTypes.splitTopLevel(ChLexer.cleanScript(script), ';')
        .map(normWs).filter(_.nonEmpty)
      val want = stmts.map(_._2).filter(_.nonEmpty)
      got == want
    })
  }

  test("cleanScript reaches a fixpoint in one pass on well-formed " +
    "scripts (idempotence — re-cleaning changes nothing)") {
    check("fixpoint", Prop.forAll(scriptGen) { case (_, script) =>
      val once = ChLexer.cleanScript(script)
      ChLexer.cleanScript(once) == once
    })
  }

  test("tokenize∘render is a token-level fixpoint: re-lexing a rendered " +
    "statement yields the same tokens (qualified names, literals, ops)") {
    check("render-fixpoint", Prop.forAll(stmtGen) { case (raw, _) =>
      val toks = ChLexer.tokenize(ChLexer.cleanScript(raw))
      val again = ChLexer.tokenize(ChLexer.render(toks))
      again.map(_.text) == toks.map(_.text) &&
        again.map(_.isString) == toks.map(_.isString)
    })
  }

  test("splitTopLevel is a join inverse on balanced comma lists " +
    "(nested parens, quoted commas)") {
    val partGen: Gen[String] = Gen.oneOf(
      Gen.alphaStr.map(_.take(6)).suchThat(_.nonEmpty),
      Gen.alphaStr.map(s => s"Nullable(${s.take(4)}x)"),
      Gen.alphaStr.map(s => s"Enum8('a' = 1, '${s.take(3)};x' = 2)"),
      Gen.const("Decimal(10, 2)"),
      Gen.const("'a, b'"),
      Gen.const("\"q,q\""))
    val listGen = Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, partGen))
    check("join-inverse", Prop.forAll(listGen) { parts =>
      ChTypes.splitTopLevel(parts.mkString(", "), ',') == parts
    })
  }
}
