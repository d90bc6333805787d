package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Dialect-difference corpus for the RE2→Java guard (round-10 VERDICT
  * item 2). Each rejected construct is one the two engines disagree on —
  * accepted silently before this guard, a reference-serialized plan (via
  * ProtoWire REGEXP_*) would have changed meaning or accepted what the
  * reference refuses. */
class Re2DialectSpec extends AnyFunSuite {

  private def ok(p: String): String = Re2Dialect.toJava(p)
  private def bad(p: String): String =
    intercept[IllegalArgumentException](Re2Dialect.toJava(p)).getMessage

  test("plain patterns pass through untouched") {
    assert(ok("red|blue") == "red|blue")
    assert(ok("[A-Z]+") == "[A-Z]+")
    assert(ok("([a-z]+) ([a-z]+)") == "([a-z]+) ([a-z]+)")
    assert(ok("a{2,3}b*c+?") == "a{2,3}b*c+?")
    assert(ok("\\d+\\.\\d*") == "\\d+\\.\\d*")
    assert(ok("\\w+@\\w+\\.[a-z]{2,}") == "\\w+@\\w+\\.[a-z]{2,}")
  }

  test("Java-only: backreferences rejected (RE2 refuses; \\1 is OCTAL in RE2)") {
    assert(bad("(a)\\1").contains("BACKREFERENCE"))
    assert(bad("(?<g>a)\\k<g>").contains("\\k"))
    assert(bad("\\0101").contains("octal"))
  }

  test("Java-only: lookaround, atomic, conditional, possessive rejected") {
    assert(bad("a(?=b)").contains("lookaround"))
    assert(bad("a(?!b)").contains("lookaround"))
    assert(bad("(?<=a)b").contains("lookaround"))
    assert(bad("(?<!a)b").contains("lookaround"))
    assert(bad("(?>ab)c").contains("atomic"))
    assert(bad("a*+").contains("possessive"))
    assert(bad("a++").contains("possessive"))
    assert(bad("a?+").contains("possessive"))
    assert(bad("a{2,3}+").contains("possessive"))
  }

  test("Java-only escapes and flags rejected") {
    for (e <- Seq("a\\Z", "\\Gab", "a\\R", "\\X", "\\h+", "\\H", "\\V", "\\e"))
      assert(bad(e).nonEmpty, s"expected reject: $e")
    assert(bad("(?x) a b").contains("extended"))
    assert(bad("(?u)ab").contains("Java-only"))
    assert(bad("(?U)a*b").contains("greediness"))
    assert(bad("(?d)a$").nonEmpty)
  }

  test("RE2-only with no Java equivalent rejected: \\C") {
    assert(bad("a\\Cb").contains("RE2-only"))
  }

  test("translate: (?P<name>...) named groups (Java syntax; names sanitized)") {
    assert(ok("(?P<word>[a-z]+)") == "(?<word>[a-z]+)")
    // underscore invalid in Java group names → renamed, semantics unchanged
    assert(ok("(?P<has_underscore>x)") == "(?<g1>x)")
    // Java-syntax named group accepted too (and distinct from lookbehind)
    assert(ok("(?<word>[a-z]+)") == "(?<word>[a-z]+)")
  }

  test("translate: POSIX classes inside character classes") {
    assert(ok("[[:alpha:]]+") == "[\\p{Alpha}]+")
    assert(ok("[[:^digit:]]") == "[\\P{Digit}]")
    assert(ok("[[:word:]]{3}") == "[\\w]{3}")
    assert(ok("[x[:space:]y]") == "[x\\p{Space}y]")
    assert(bad("[[:nosuch:]]").contains("unknown POSIX class"))
    assert(bad("[[.hyphen.]]").contains("collating"))
  }

  test("translate: literal [ and & inside classes (Java nests/intersects)") {
    assert(ok("[a[b]") == "[a\\[b]")
    assert(ok("[a&b]") == "[a\\&b]")
    // Java would read [a&&b] as intersection {}, RE2 as {a,&,b}
    assert(ok("[a&&b]") == "[a\\&\\&b]")
  }

  test("translate: unmatched { is literal in RE2, an error in Java") {
    assert(ok("a{z") == "a\\{z")
    assert(ok("{") == "\\{")
    assert(ok("a{2}") == "a{2}")
    assert(ok("a{2,}") == "a{2,}")
  }

  test("translate: \\v is vertical tab in RE2, a whitespace CLASS in Java") {
    assert(ok("a\\vb") == "a\\x{000B}b")
    // evaluate: RE2 \v must NOT match '\n'
    assert(!"a\nb".matches(".*" + ok("\\v") + ".*"))
    assert("a\u000bb".matches(".*" + ok("\\v") + ".*"))
  }

  test("translate: $ means end-of-TEXT in RE2 (Java: also before final newline)") {
    assert(ok("abc$") == "abc\\z")
    // the exact silent-delta case: Java 'abc$' finds a match in "abc\n"
    val m0 = java.util.regex.Pattern.compile("abc$").matcher("abc\n")
    assert(m0.find()) // untranslated Java semantics — the bug being guarded
    val m1 = java.util.regex.Pattern.compile(ok("abc$")).matcher("abc\n")
    assert(!m1.find()) // translated = RE2 semantics
    // with (?m), $ keeps its line-anchor reading in both dialects
    assert(ok("(?m)^ab$") == "(?m)^ab$")
    assert(ok("[$]") == "[$]") // $ literal inside a class untouched
  }

  test("translate: (?i) folds Unicode case in RE2 → Java needs (?iu)") {
    assert(ok("(?i)straße") == "(?iu)straße")
    assert(ok("(?i:x)y") == "(?iu:x)y")
    // É matches é under RE2 (?i); Java plain (?i) would miss it
    assert("É".matches(ok("(?i)é")))
    assert(ok("(?-i)x") == "(?-iu)x")
  }

  test("translate: bare . excludes only \\n in RE2 (Java also \\r, U+2028...)") {
    assert(ok("a.b") == "a[^\\n]b")
    // the silent-delta case: Java '.' refuses \r, RE2 '.' matches it
    assert(!java.util.regex.Pattern.compile("a.b").matcher("a\rb").find())
    assert(java.util.regex.Pattern.compile(ok("a.b")).matcher("a\rb").find())
    assert(java.util.regex.Pattern.compile(ok("a.b")).matcher("a b").find())
    assert(!java.util.regex.Pattern.compile(ok("a.b")).matcher("a\nb").find())
    // under (?s) both dialects match everything — untouched
    assert(ok("(?s)a.b") == "(?s)a.b")
    // '.' inside a class is a literal in both — untouched
    assert(ok("[.]") == "[.]")
    // escaped dot is a literal in both — untouched
    assert(ok("\\.") == "\\.")
  }

  test("translate: \\s is [\\t\\n\\f\\r ] in RE2 (Java \\s adds \\x0B)") {
    assert(ok("a\\sb") == "a[\\t\\n\\f\\r ]b")
    // in-class \s emits a NESTED class (union), never bare chars: bare
    // chars end in ' ' and a following -x would form the range ' '-'x'
    assert(ok("[\\s,]") == "[[\\t\\n\\f\\r ],]")
    assert(ok("\\S+") == "[^\\t\\n\\f\\r ]+")
    assert(ok("[\\S]") == "[[^\\t\\n\\f\\r ]]")
    // the silent-delta case: vertical tab is Java-\s but not RE2-\s
    assert("\u000B".matches("\\s"))
    assert(!"\u000B".matches(ok("\\s")))
    assert("\u000B".matches(ok("\\S")))
    assert("\u000B".matches(ok("[\\S]")))
    assert(" ".matches(ok("\\s")) && "\t".matches(ok("[\\s]")))
  }

  test("in-class [\\s-x]: dash stays LITERAL (RE2 semantics), no accidental range") {
    // RE2 reads [\s-x] as {whitespace, '-', 'x'}; a bare-chars expansion
    // ending in ' ' would let Java form the range ' '-'x' (letters, digits)
    val p = ok("[\\s-x]")
    assert(p == "[[\\t\\n\\f\\r ]-x]")
    assert("-".matches(p) && "x".matches(p) && " ".matches(p) && "\t".matches(p))
    assert(!"a".matches(p) && !"5".matches(p) && !"w".matches(p))
  }

  test("(?s) flag scope is POSITIONAL, not pattern-global") {
    // scoped (?s:...) must not disable the bare-dot rewrite outside it
    assert(ok("(?s:a.b)c.d") == "(?s:a.b)c[^\\n]d")
    assert(java.util.regex.Pattern.compile(ok("(?s:x*)a.b")).matcher("a\rb").find())
    // inline (?s) applies from that point to end of enclosing group only
    assert(ok("a.b(?s)c.d") == "a[^\\n]b(?s)c.d")
    assert(ok("(x(?s).y).z") == "(x(?s).y)[^\\n]z")
    // (?-s) turns it back off
    assert(ok("(?s).(?-s).") == "(?s).(?-s)[^\\n]")
  }

  test("(?m) flag scope is POSITIONAL for $ too") {
    assert(ok("(?m:a$)b$") == "(?m:a$)b\\z")
    assert(ok("a$(?m)b$") == "a\\z(?m)b$")
  }

  test("generated group names never collide with user names") {
    // a_b must NOT be renamed to g2 (taken); compile-check would reject
    assert(ok("(?P<g2>x)(?P<a_b>y)") == "(?<g2>x)(?<g3>y)")
    assert(ok("(?P<g1>x)(?P<a_b>y)(?P<c_d>z)") == "(?<g1>x)(?<g2>y)(?<g3>z)")
  }

  test("\\Q...\\E and \\x, \\p pass through; scripts get Java Is-prefix") {
    assert(ok("\\Qa+b\\E") == "\\Qa+b\\E")
    assert(ok("\\x41\\x{1F600}") == "\\x41\\x{1F600}")
    assert(ok("\\pL+") == "\\pL+")
    assert(ok("\\p{Lu}") == "\\p{Lu}")
    assert(ok("\\p{Greek}") == "\\p{IsGreek}")
    assert(ok("\\P{Greek}") == "\\P{IsGreek}")
    assert(ok("\\p{^Greek}") == "\\P{IsGreek}") // RE2 inside-negation
    assert("α".matches(ok("\\p{Greek}")))
  }

  test("guard sits on the Exprs boundary (and thus the ProtoWire wire path)") {
    val e = intercept[IllegalArgumentException] {
      Exprs.regexpPartialMatch(org.apache.spark.sql.functions.lit("x"), "(a)\\1")
    }
    assert(e.getMessage.contains("RE2-dialect guard"))
  }

  test("translated pattern always compiles (internal slips fail loudly)") {
    // pathological but RE2-valid inputs survive translation + compile
    for (p <- Seq("a|", "(|)", "x{0,0}", "[^\\n]*", "(?s).*", "[-a]", "[a-]"))
      ok(p)
    // leading ] needs escaping in RE2 — rejected, not guessed at
    assert(bad("[]a]").contains("start of a character class"))
  }
}
