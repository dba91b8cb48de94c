package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.pgwire.PgWireDriver

/** Pins the pgwire shim's placeholder scanner (ADVICE r5): a '?' is a
  * parameter ONLY outside every PostgreSQL lexical context — strings,
  * E-strings, line/block comments (nested), dollar-quotes. No live
  * server needed; this is pure lexing.
  */
class PgWireScanSpec extends AnyFunSuite {

  private def n(sql: String) = PgWireDriver.paramPositions(sql).length

  test("plain placeholders count") {
    assert(n("SELECT * FROM t WHERE a = ? AND b = ?") === 2)
  }

  test("'?' inside a single-quoted literal (with '' doubling) is data") {
    assert(n("SELECT 'a?b' , 'it''s ?' , ?") === 1)
  }

  test("'?' inside an E'' string with backslash escapes is data") {
    assert(n("SELECT E'\\'?' , ?") === 1)
    // e is part of an identifier here, NOT an E-string opener
    assert(n("SELECT tablE'?'") === 0)
  }

  test("'?' inside a -- line comment is data; after the newline counts") {
    assert(n("SELECT 1 -- is this a param? no\n , ?") === 1)
  }

  test("'?' inside a nested block comment is data") {
    assert(n("SELECT /* outer ? /* inner ? */ still ? */ ?") === 1)
  }

  test("'?' inside a dollar-quoted string is data, tagged or not") {
    assert(n("SELECT $$a ? b$$, ?") === 1)
    assert(n("SELECT $tag$ ? $notit$ ? $tag$, ?") === 1)
    // a lone '$' is a plain char, not an opener
    assert(n("SELECT price$ , ?") === 1)
  }

  test("digit-leading dollar tags are NOT quote openers (ADVICE r6): " +
    "PG tags must start with a letter or underscore") {
    // '$1$' is positional-parameter-style text, not a dollar quote — the
    // trailing '?' must still count
    assert(n("SELECT a $1$ b ?") === 1)
    assert(n("SELECT $1 + $2, ?") === 1)
    // underscore- and letter-leading tags still quote
    assert(n("SELECT $_t$ ? $_t$, ?") === 1)
    assert(n("SELECT $q1$ ? $q1$, ?") === 1) // digits allowed AFTER the first
  }

  test("unterminated constructs swallow the tail (server-equivalent)") {
    assert(n("SELECT '? unterminated ?") === 0)
    assert(n("SELECT /* open ?") === 0)
    assert(n("SELECT $q$ open ?") === 0)
  }
}
