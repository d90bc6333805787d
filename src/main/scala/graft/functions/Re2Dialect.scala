package graft.functions

/** RE2 → Java-regex dialect guard for the reference's regexp surface.
  *
  * The reference evaluates patterns with RE2 (`regexp_expressions.h:34-76`);
  * Spark evaluates with `java.util.regex`. Passing patterns through
  * unexamined has two failure modes:
  *  - a Java-ONLY construct (backreference, lookaround, possessive
  *    quantifier) silently works here although the reference would REJECT
  *    the pattern — worse, `\12` is a backreference in Java but an OCTAL
  *    CHARACTER in RE2, so the same bytes mean different things;
  *  - an RE2 construct Java lacks or reads differently ( `(?P<name>`,
  *    POSIX `[[:alpha:]]`, literal `[` inside a class, unmatched `{`,
  *    `\v`, end-of-text `$`, Unicode case folding under `(?i)` ) silently
  *    changes meaning.
  *
  * [[toJava]] therefore TRANSLATES every RE2 construct with an exact Java
  * equivalent and REJECTS (IllegalArgumentException) both RE2-only
  * constructs with no Java equivalent (`\C`) and Java-only constructs RE2
  * would refuse — instead of silently changing semantics. DuckDB's regexp
  * functions are RE2, so the q_expr_regexp oracle pins the translated
  * evaluation against genuine RE2 end to end.
  *
  * Translations (RE2 meaning preserved in Java):
  *  - `(?P<name>…)` → `(?<name>…)` (name sanitized to Java's [A-Za-z][A-Za-z0-9]*)
  *  - `[[:alpha:]]`-style POSIX classes (incl. `[[:^alpha:]]`) → `\p{…}`/`\P{…}`
  *  - literal `[` / bare `&` inside a character class → escaped (Java nests
  *    classes and intersects on `&&`; RE2 treats both as literals)
  *  - `{` not opening a valid `{n}`/`{n,}`/`{n,m}` repetition → `\{`
  *    (literal in RE2, an error in Java)
  *  - `\v` → `\x{000B}` (vertical tab in RE2; vertical-whitespace CLASS in Java)
  *  - `$` → `\z` where the `m` flag is positionally OFF (RE2 `$` = end of
  *    text; Java `$` also matches before a final newline)
  *  - bare `.` → `[^\n]` where the `s` flag is positionally OFF (RE2 `.`
  *    excludes only \n; Java `.` also excludes \r, U+0085, U+2028, U+2029).
  *    Flag scope is tracked through the walk — inline `(?s)` applies to the
  *    rest of its enclosing group, scoped `(?s:...)` only inside its group —
  *    so a scoped flag never leaks onto dots outside its scope.
  *  - `\s` → `[\t\n\f\r ]` and `\S` → `[^\t\n\f\r ]` (Java \s adds \x0B)
  *  - flag `i` → `iu` (RE2 case folding is Unicode; Java needs `u` for that)
  *
  * Rejected Java-only (RE2 refuses the pattern): `\1`-`\9` backrefs /
  * octal ambiguity, `\k<…>`, lookarounds `(?=` `(?!` `(?<=` `(?<!`,
  * atomic `(?>`, conditionals `(?(`, comments `(?#`, possessive
  * quantifiers `*+ ++ ?+ {n,m}+`, escapes `\Z \G \R \X \h \H \V \e`,
  * flags `x d u U` (`U` exists in both but swaps greediness only in RE2),
  * POSIX collation `[[.x.]]` / equivalence `[[=x=]]`.
  * Rejected RE2-only (no Java equivalent): `\C` (any byte).
  */
object Re2Dialect {

  def reject(msg: String): Nothing =
    throw new IllegalArgumentException(s"RE2-dialect guard: $msg")

  private val PosixClasses: Map[String, String] = Map(
    "alnum" -> "Alnum", "alpha" -> "Alpha", "ascii" -> "ASCII",
    "blank" -> "Blank", "cntrl" -> "Cntrl", "digit" -> "Digit",
    "graph" -> "Graph", "lower" -> "Lower", "print" -> "Print",
    "punct" -> "Punct", "space" -> "Space", "upper" -> "Upper",
    "xdigit" -> "XDigit")
  // RE2's [[:word:]] = [0-9A-Za-z_] = Java \w (default, non-unicode)
  private val PosixWord = "word"

  /** Translate an RE2 pattern to an exactly-equivalent Java pattern, or
    * throw with a clear dialect diagnostic. */
  def toJava(pattern: String): String = {
    val out = new StringBuilder
    val n = pattern.length
    var i = 0
    var inClass = false
    var classStart = -1
    // POSITIONAL flag state (RE2 semantics: an inline `(?s)` applies from
    // that point to the end of the ENCLOSING group; `(?s:...)` only inside
    // its own group). Pattern-global detection would let a scoped (?s:...)
    // anywhere disable the `.`→`[^\n]` rewrite for dots OUTSIDE the scope,
    // silently reverting them to the Java line-terminator delta.
    var sOn = false
    var mOn = false
    val flagStack = scala.collection.mutable.Stack.empty[(Boolean, Boolean)]
    // user-supplied group names that survive sanitization unchanged — a
    // generated gN substitute must never collide with one (Java rejects
    // duplicate names; RE2 accepted the original pattern)
    val usedNames = scala.collection.mutable.Set.empty[String]
    GroupNameAt.findAllMatchIn(pattern).foreach { m =>
      val nm = m.group(2)
      if (nm.matches("[A-Za-z][A-Za-z0-9]*")) usedNames += nm
    }
    var groupIdx = 0

    def peek(k: Int): Char = if (i + k < n) pattern.charAt(i + k) else '\u0000'

    while (i < n) {
      val c = pattern.charAt(i)
      if (inClass) {
        c match {
          case '\\' =>
            i = translateEscape(pattern, i, inClass = true, out)
          case '[' if peek(1) == ':' =>
            // POSIX class [[:name:]] / [[:^name:]]
            val close = pattern.indexOf(":]", i + 2)
            if (close < 0) reject(s"unterminated POSIX class at index $i in /$pattern/")
            val raw = pattern.substring(i + 2, close)
            val (neg, name) = if (raw.startsWith("^")) (true, raw.drop(1)) else (false, raw)
            val repl =
              if (name == PosixWord) if (neg) "\\W" else "\\w"
              else PosixClasses.get(name) match {
                case Some(j) => (if (neg) "\\P{" else "\\p{") + j + "}"
                case None => reject(s"unknown POSIX class [[:$raw:]] in /$pattern/")
              }
            out.append(repl)
            i = close + 2
          case '[' if peek(1) == '.' || peek(1) == '=' =>
            reject(s"POSIX collating/equivalence classes [[.x.]]/[[=x=]] are not supported " +
              s"by RE2 or Java (index $i in /$pattern/)")
          case '[' =>
            // literal [ in RE2; Java would open a NESTED class
            out.append("\\["); i += 1
          case '&' =>
            // literal & in RE2; Java && is class intersection
            out.append("\\&"); i += 1
          case ']' =>
            val leading = i == classStart + 1 ||
              (i == classStart + 2 && pattern.charAt(classStart + 1) == '^')
            if (leading)
              reject(s"']' at the start of a character class (index $i in /$pattern/): " +
                "RE2 requires it escaped as \\]")
            out.append(']'); inClass = false; i += 1
          case other =>
            out.append(other); i += 1
        }
      } else c match {
        case '\\' =>
          i = translateEscape(pattern, i, inClass = false, out)
        case '[' =>
          inClass = true; classStart = i; out.append('['); i += 1
        case '$' =>
          out.append(if (mOn) "$" else "\\z"); i += 1
        case '.' =>
          // RE2 `.` (no s flag) = any char but \n; Java `.` also excludes
          // \r, U+0085, U+2028, U+2029. Under (?s) both match everything.
          out.append(if (sOn) "." else "[^\\n]"); i += 1
        case '{' =>
          // valid repetition {n} {n,} {n,m}? else literal in RE2
          val m = RepetitionAt.findPrefixMatchOf(pattern.substring(i))
          m match {
            case Some(r) =>
              out.append(r.matched)
              i += r.matched.length
              checkPossessive(pattern, i)
            case None => out.append("\\{"); i += 1
          }
        case '*' | '+' | '?' =>
          // lazy '*?' / '+?' / '??' is fine in both dialects;
          // possessive '*+' / '++' / '?+' is Java-only (RE2: bad repetition)
          out.append(c); i += 1
          checkPossessive(pattern, i)
        case '(' if peek(1) == '?' =>
          // group with modifier
          val rest = pattern.substring(i)
          if (rest.startsWith("(?P<") || rest.startsWith("(?<") &&
              peek(3) != '=' && peek(3) != '!') {
            val nameStart = if (rest.startsWith("(?P<")) i + 4 else i + 3
            val gt = pattern.indexOf('>', nameStart)
            if (gt < 0) reject(s"unterminated group name at index $i in /$pattern/")
            val name = pattern.substring(nameStart, gt)
            if (!name.matches("[A-Za-z0-9_]+"))
              reject(s"invalid group name '$name' at index $i in /$pattern/")
            flagStack.push((sOn, mOn))
            groupIdx += 1
            val javaName =
              if (name.matches("[A-Za-z][A-Za-z0-9]*")) name
              else {
                // skip generated indices already taken by a user name
                // (e.g. `(?P<g2>x)(?P<a_b>y)` must not mint a second g2)
                while (usedNames.contains(s"g$groupIdx")) groupIdx += 1
                val fresh = s"g$groupIdx"
                usedNames += fresh
                fresh
              }
            out.append("(?<").append(javaName).append('>')
            i = gt + 1
          } else if (rest.startsWith("(?P=")) {
            reject(s"(?P=name) backreference at index $i is not supported by RE2 (or Java)")
          } else if (rest.startsWith("(?=") || rest.startsWith("(?!") ||
                     rest.startsWith("(?<=") || rest.startsWith("(?<!")) {
            reject(s"lookaround at index $i is Java-only; RE2 rejects it")
          } else if (rest.startsWith("(?>")) {
            reject(s"atomic group (?> at index $i is Java-only; RE2 rejects it")
          } else if (rest.startsWith("(?(")) {
            reject(s"conditional group (?( at index $i is Java-only; RE2 rejects it")
          } else if (rest.startsWith("(?#")) {
            reject(s"comment group (?# at index $i is supported by neither RE2 nor Java")
          } else {
            // flags group: (?flags) or (?flags:...) or (?-flags...)
            var j = i + 2
            val flags = new StringBuilder
            while (j < n && "ims-UuxdJ".indexOf(pattern.charAt(j)) >= 0) {
              flags.append(pattern.charAt(j)); j += 1
            }
            if (j >= n || (pattern.charAt(j) != ':' && pattern.charAt(j) != ')'))
              reject(s"unrecognized group modifier at index $i in /$pattern/")
            val f = flags.toString
            for (bad <- Seq('U', 'u', 'x', 'd', 'J'))
              if (f.indexOf(bad) >= 0) {
                val why = bad match {
                  case 'U' => "RE2 (?U) swaps greediness, Java (?U) changes character classes"
                  case 'u' => "(?u) is Java-only"
                  case 'x' => "(?x) extended mode is Java-only"
                  case _ => s"(?$bad) is Java-only"
                }
                reject(s"flag '$bad' at index $i: $why")
              }
            // scoped `(?flags:` opens a group — snapshot state first;
            // inline `(?flags)` mutates the enclosing group's state
            if (pattern.charAt(j) == ':') flagStack.push((sOn, mOn))
            var neg = false
            f.foreach {
              case '-' => neg = true
              case 's' => sOn = !neg
              case 'm' => mOn = !neg
              case _ => ()
            }
            // RE2 (?i) folds Unicode case; Java needs (?iu) for that
            val translated = f.replace("i", "iu")
            out.append("(?").append(translated).append(pattern.charAt(j))
            i = j + 1
          }
        case '(' =>
          flagStack.push((sOn, mOn)); out.append('('); i += 1
        case ')' =>
          if (flagStack.nonEmpty) {
            val (s0, m0) = flagStack.pop(); sOn = s0; mOn = m0
          }
          out.append(')'); i += 1
        case other =>
          out.append(other); i += 1
      }
    }
    if (inClass) reject(s"unterminated character class in /$pattern/")
    // compile-check the translation so an internal slip fails loudly here
    try java.util.regex.Pattern.compile(out.toString)
    catch {
      case e: java.util.regex.PatternSyntaxException =>
        reject(s"translated pattern /${out.toString}/ failed to compile: ${e.getMessage}")
    }
    out.toString
  }

  private val RepetitionAt = "^\\{[0-9]+(,[0-9]*)?\\}".r

  /** Named-group openers `(?P<name>` / `(?<name>` (not lookbehind). */
  private val GroupNameAt = "\\(\\?(P?)<([A-Za-z0-9_]+)>".r

  private def checkPossessive(pattern: String, idx: Int): Unit =
    if (idx < pattern.length && pattern.charAt(idx) == '+')
      reject(s"possessive quantifier at index ${idx - 1} is Java-only; RE2 rejects it")

  /** Translate the escape starting at `i` (pattern(i)=='\\') onto `out`;
    * returns the index after the escape. */
  private def translateEscape(pattern: String, i: Int, inClass: Boolean,
                              out: StringBuilder): Int = {
    val n = pattern.length
    if (i + 1 >= n) reject(s"trailing backslash in /$pattern/")
    pattern.charAt(i + 1) match {
      case d if d >= '1' && d <= '9' =>
        reject(s"\\$d at index $i: a BACKREFERENCE in Java but an OCTAL escape in RE2 " +
          "(and RE2 rejects backreferences) — write \\x{..} for the character, " +
          "or know that the reference cannot evaluate a backreference")
      case '0' =>
        reject(s"\\0 octal escape at index $i: RE2 reads \\123-style octal, Java reads " +
          "\\0nn — write \\x{..} instead")
      case 'k' =>
        reject(s"\\k named backreference at index $i is Java-only; RE2 rejects it")
      case 'C' =>
        reject(s"\\C (any byte) at index $i is RE2-only; Java cannot express it")
      case e @ ('Z' | 'G' | 'R' | 'X' | 'h' | 'H' | 'V' | 'e') =>
        reject(s"\\$e at index $i is Java-only; RE2 rejects it")
      case 'v' =>
        // vertical TAB in RE2; vertical-whitespace CLASS in Java
        out.append("\\x{000B}"); i + 2
      case 'x' =>
        if (i + 2 < n && pattern.charAt(i + 2) == '{') {
          val close = pattern.indexOf('}', i + 3)
          if (close < 0) reject(s"unterminated \\x{…} at index $i in /$pattern/")
          out.append(pattern.substring(i, close + 1)); close + 1
        } else {
          if (i + 3 >= n) reject(s"truncated \\xhh at index $i in /$pattern/")
          out.append(pattern.substring(i, i + 4)); i + 4
        }
      case p @ ('p' | 'P') =>
        if (i + 2 < n && pattern.charAt(i + 2) == '{') {
          val close = pattern.indexOf('}', i + 3)
          if (close < 0) reject(s"unterminated \\p{…} at index $i in /$pattern/")
          val raw = pattern.substring(i + 3, close)
          val (neg, name) = if (raw.startsWith("^")) (true, raw.drop(1)) else (false, raw)
          val letter = if ((p == 'P') != neg) 'P' else 'p' // double negation folds
          if (name.matches("[A-Z][a-z]?")) {
            // Unicode general category: same name both dialects
            out.append('\\').append(letter).append('{').append(name).append('}')
          } else if (name == "Any") {
            reject(s"\\p{Any} at index $i is RE2-only; write (?s:.) instead")
          } else {
            // RE2 script name → Java Is-prefixed script
            out.append('\\').append(letter).append("{Is").append(name).append('}')
          }
          close + 1
        } else {
          if (i + 2 >= n) reject(s"truncated \\p at index $i in /$pattern/")
          out.append(pattern.substring(i, i + 3)); i + 3 // \pL
        }
      case 'Q' =>
        val close = pattern.indexOf("\\E", i + 2)
        if (close < 0) { out.append(pattern.substring(i)); n }
        else { out.append(pattern.substring(i, close + 2)); close + 2 }
      case 's' =>
        // RE2 \s = [\t\n\f\r ]; Java \s ALSO includes \x0B (vertical tab).
        // In-class we emit a NESTED class (Java unions it into the outer
        // class) rather than bare chars: bare chars end in a space, and a
        // following '-x' (literal dash in RE2's [\s-x]) would silently form
        // the Java range ' '-'x' — letters and digits included.
        out.append("[\\t\\n\\f\\r ]"); i + 2
      case 'S' =>
        // Java nested [^…] inside a class unions with the complement —
        // exactly RE2's reading of \S as a member of the outer class
        out.append("[^\\t\\n\\f\\r ]"); i + 2
      case other =>
        // \A \z \b \B \w \W \d \D \n \r \t \f \a and punct escapes:
        // identical in both dialects (\s/\S handled above — Java adds \x0B)
        out.append('\\').append(other); i + 2
    }
  }
}
