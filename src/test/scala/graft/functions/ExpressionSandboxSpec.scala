package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class ExpressionSandboxSpec extends AnyFunSuite {

  test("accepts sandboxed numeric expressions") {
    assert(ExpressionSandbox.validate("$1 + 0.001 * sqrt($2)").isRight)
    assert(ExpressionSandbox.validate("abs($1) - round($2 / 3600.0)").isRight)
    assert(
      ExpressionSandbox
        .validate("cond / (1 + 0.0191 * (temp - 25))", Set("cond", "temp"))
        .isRight
    )
    assert(ExpressionSandbox.validate("1.5e-3 * $1 % 7").isRight)
  }

  test("rejects DML/DDL words, semicolons, comments, unknown identifiers") {
    assert(ExpressionSandbox.validate("$1; DROP TABLE x").isLeft)
    assert(ExpressionSandbox.validate("(select 1)").isLeft)
    assert(ExpressionSandbox.validate("$1 -- sneaky").isLeft)
    assert(ExpressionSandbox.validate("$1 /* hmm */").isLeft)
    assert(ExpressionSandbox.validate("system('rm')").isLeft)
    assert(ExpressionSandbox.validate("cond + temp").isLeft) // no identifiers allowed
    assert(ExpressionSandbox.validate("").isLeft)
    assert(ExpressionSandbox.validate("$1 || 'x'").isLeft) // strings not allowed
  }

  test("bindPlaceholders substitutes parenthesized fragments") {
    assert(
      ExpressionSandbox.bindPlaceholders("$1 + $2 * $1", Map(1 -> "acc", 2 -> "el")) ==
        "(acc) + (el) * (acc)"
    )
  }
}
