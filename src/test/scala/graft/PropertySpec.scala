package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.Ottl
import graft.pipeline.{IcebergLikeTable, RandomFailure}

/** Property-based tests (scalacheck) over the pure string/hash kernels the
  * engine's correctness leans on. Example-based specs pin the documented
  * cases; these pin the CLASS of inputs — arbitrary unicode through the
  * manifest escape alphabet, arbitrary quote/paren nesting through the OTTL
  * splitters, the full string space through the Bernoulli hash — because
  * each of these kernels has already had one escape/edge bug in its history
  * (raw '\n' bricking manifest reads; quoted ';' corrupting statement
  * splits; glob metacharacter leakage).
  */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop, min: Int = 300): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(min), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  // --- IcebergLikeTable escape alphabet -------------------------------

  private lazy val iceberg: IcebergLikeTable = {
    val dir = java.nio.file.Files
      .createTempDirectory("prop_iceberg").toString
    new IcebergLikeTable(dir)
  }

  test("esc/unesc round-trips arbitrary unicode strings") {
    check("escape round-trip", Prop.forAll { (s: String) =>
      iceberg.unesc(iceberg.esc(s)) == s
    })
  }

  test("esc output never carries a raw newline or quote") {
    // the invariant the alphabet exists for: FieldRe ('.') must be able to
    // match every escaped field, and the JSON string atom must not close
    check("escape alphabet", Prop.forAll { (s: String) =>
      val e = iceberg.esc(s)
      !e.contains('\n') && !e.contains('\r') &&
        !e.replace("\\\\", "").replace("\\\"", "").contains('"')
    })
  }

  // --- OTTL splitters ---------------------------------------------------

  // a statement-ish fragment: plain runs, quoted runs (which may hide the
  // separator and unbalanced brackets), and balanced bracket groups (which
  // may hide the separator unquoted)
  private val plain: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '.', '=',
      '-', '_', '/', '%', '|'))).map(_.mkString)
  private def quoted(extra: Seq[Char]): Gen[String] = for {
    q <- Gen.oneOf('\'', '"')
    body <- Gen.listOf(Gen.oneOf(Gen.alphaNumChar,
      Gen.oneOf(extra :+ ' ')))
      .map(_.filterNot(c => c == '\'' || c == '"').mkString)
  } yield s"$q$body$q"
  private def group(sep: Char): Gen[String] = for {
    open <- Gen.oneOf("(" -> ")", "[" -> "]")
    body <- Gen.listOf(Gen.oneOf(Gen.alphaNumChar,
      Gen.oneOf(sep, ' ', '.'))).map(_.mkString)
  } yield s"${open._1}$body${open._2}"
  private def segment(sep: Char): Gen[String] =
    Gen.nonEmptyListOf(Gen.frequency(
      5 -> plain,
      2 -> quoted(Seq(sep, '(', ')', '[', ']', ',')),
      2 -> group(sep)))
      .map(_.mkString.trim).suchThat(_.nonEmpty)

  test("splitStatements inverts a ';' join for any quote/paren nesting") {
    check("splitStatements", Prop.forAll(
      Gen.nonEmptyListOf(segment(';'))) { stmts =>
      Ottl.splitStatements(stmts.mkString(";")) == stmts
    })
  }

  test("splitArgs inverts a ',' join for any quote/paren nesting") {
    check("splitArgs", Prop.forAll(
      Gen.nonEmptyListOf(segment(','))) { args =>
      Ottl.splitArgs(args.mkString(",")) == args
    })
  }

  test("globToRegex: a wildcard-free value matches exactly itself") {
    val noWild = Gen.asciiPrintableStr
      .map(_.filterNot(c => c == '*' || c == '?'))
    check("glob literal", Prop.forAll(noWild) { s =>
      s.matches(Ottl.globToRegex(s)) &&
        !(s + "x").matches(Ottl.globToRegex(s))
    })
  }

  test("globToRegex: trailing '*' matches any suffix, '?' exactly one char") {
    val noWild = Gen.asciiPrintableStr
      .map(_.filterNot(c => c == '*' || c == '?'))
    check("glob wildcards", Prop.forAll(noWild, noWild) { (pre, suf) =>
      (pre + suf).matches(Ottl.globToRegex(pre + "*")) &&
        (pre + "z").matches(Ottl.globToRegex(pre + "?")) &&
        !(pre + "zz").matches(Ottl.globToRegex(pre + "?"))
    })
  }

  // --- RandomFailure Bernoulli hash ------------------------------------

  test("hash60 stays in [0, 2^60) and draw in [0, 1) for any input") {
    check("hash60 range", Prop.forAll { (s: String) =>
      val h = RandomFailure.hash60(s)
      val d = RandomFailure(0.5).draw(s)
      h >= 0L && h < (1L << 60) && d >= 0.0 && d < 1.0
    })
  }

  test("failure_rate 0 never fails, 1 always fails, draws are deterministic") {
    check("bernoulli edges", Prop.forAll { (batch: String, attempt: Byte) =>
      val a = attempt & 0x7f
      RandomFailure(0.0).check(batch, a) // must not throw
      val one = scala.util.Try(RandomFailure(1.0).check(batch, a)).isFailure
      one && RandomFailure(0.5).draw(batch, a) == RandomFailure(0.5).draw(batch, a)
    })
  }
}
