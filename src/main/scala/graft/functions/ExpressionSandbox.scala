package graft.functions

import scala.util.matching.Regex

/** Safety validator for stored numeric SQL expressions — the
  * reference's user-extensibility surface (drift-correction equations,
  * compound `expression_sql`, guideline `sql_scalar` rules).
  *
  * Mirrors `continuous.numeric_sql_expression_is_safe`
  * (`inst/patches/patch_55.R:582-725` in YukonWRB/AquaCache): a regex
  * lexer over approved character classes, `$n` placeholders, an
  * approved function-word allowlist and forbidden DML/DDL words, then
  * a real parse check against the engine's SQL grammar (done by the
  * caller via `spark.sessionState.sqlParser.parseExpression`).
  */
object ExpressionSandbox {

  /** Function words the sandbox allows (numeric scalars only). */
  val AllowedFunctions: Set[String] = Set(
    "abs", "round", "floor", "ceil", "ceiling", "sqrt", "exp", "ln",
    "log", "log10", "power", "pow", "least", "greatest", "coalesce",
    "nullif", "sin", "cos", "tan", "sign"
  )

  private val ForbiddenWords: Set[String] = Set(
    "select", "insert", "update", "delete", "drop", "alter", "create",
    "grant", "revoke", "truncate", "copy", "execute", "call", "merge",
    "union", "from", "where", "join", "case", "cast", "table", "into",
    "semicolon"
  )

  // one token: placeholder | number | word | operator/paren/comma/space
  private val TokenRe: Regex =
    """\$\d+|\d+(?:\.\d+)?(?:[eE][-+]?\d+)?|[A-Za-z_][A-Za-z_0-9]*|[-+*/%(),^ ]""".r

  /** Column names the expression may reference (member aliases for
    * compounds; empty for correction equations which only see `$n`).
    */
  def validate(expression: String, allowedIdentifiers: Set[String] = Set.empty): Either[String, Unit] = {
    if (expression == null || expression.trim.isEmpty) return Left("empty expression")
    if (expression.contains(";")) return Left("';' not allowed")
    if (expression.contains("--") || expression.contains("/*"))
      return Left("comments not allowed")
    val consumed = TokenRe.findAllIn(expression).mkString
    if (consumed.length != expression.length)
      return Left(s"disallowed characters in: $expression")
    val words = TokenRe
      .findAllIn(expression)
      .filter(t => t.headOption.exists(c => c.isLetter || c == '_'))
      .map(_.toLowerCase)
      .toList
    words.find(ForbiddenWords.contains) match {
      case Some(w) => return Left(s"forbidden word: $w")
      case None    =>
    }
    val idents = allowedIdentifiers.map(_.toLowerCase)
    words.find(w => !AllowedFunctions.contains(w) && !idents.contains(w)) match {
      case Some(w) => Left(s"unknown identifier/function: $w")
      case None    => Right(())
    }
  }

  /** Substitute `$1`/`$2` placeholders with (already-safe) SQL
    * fragments after validation — used to splice correction equations
    * into the fold lambda.
    */
  def bindPlaceholders(expression: String, bindings: Map[Int, String]): String =
    bindings.foldLeft(expression) { case (e, (n, frag)) =>
      e.replace(s"$$$n", s"($frag)")
    }
}
