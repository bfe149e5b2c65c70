package graft

import graft.operators.TextOps
import org.apache.spark.sql.Row

/** Detection-logic gate for tx_pii: the testdata corpus contains no PII
  * (the registered query's oracle pins the all-zero result), so the
  * pattern behavior is asserted here on synthetic literals.
  */
class PiiSpec extends SparkSpec {

  private def pii(rows: (Long, String)*): Map[Long, Row] = {
    import spark.implicits._
    TextOps.piiStats(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("emails, IPv4 addresses and digit runs are counted and redacted") {
    val out = pii(
      1L -> "contact alice@example.com or bob.smith+tag@mail.co today",
      2L -> "server 192.168.0.1 and 10.0.0.255 responded",
      3L -> "order 12345678 ref 9876543210",
      4L -> "no sensitive content here",
      5L -> "mix: a@b.io from 8.8.8.8 id 00000000")

    assert(out(1L).getLong(1) === 2) // n_emails
    assert(out(2L).getLong(2) === 2) // n_ipv4
    assert(out(3L).getLong(3) === 2) // n_digit_runs
    assert(out(4L).getBoolean(5) === false)
    assert(out(5L).getBoolean(5) === true)
    assert(out(5L).getLong(1) === 1 && out(5L).getLong(2) === 1 &&
      out(5L).getLong(3) === 1)
    // Redaction shrinks/normalizes length: "mix: <EMAIL> from <IP> id <NUM>"
    assert(out(5L).getLong(4) === "mix: <EMAIL> from <IP> id <NUM>".length)
    assert(out(4L).getLong(4) === "no sensitive content here".length)
  }

  test("IPv4 requires exactly four octets; short digit runs don't flag") {
    val out = pii(
      1L -> "versions 1.2.3 and 1.2.3.4.5 and phone 555-1234",
      2L -> "digits 123456 just below the run threshold")
    // 1.2.3 is not IPv4; 1.2.3.4.5 contains the 4-octet prefix 1.2.3.4
    assert(out(1L).getLong(2) === 1)
    assert(out(2L).getLong(3) === 0)
    assert(out(2L).getBoolean(5) === false)
  }
}
