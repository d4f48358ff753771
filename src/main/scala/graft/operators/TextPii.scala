package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection + redaction for a training-data curation pipeline:
  * count and mask emails, phone numbers, and IPv4 addresses in one
  * codegen'd pass over the corpus (no UDFs, no shuffle — per-row
  * `regexp_count` / chained `regexp_replace`, linear in corpus size,
  * so the operator scales to any number of executors with zero
  * coordination).
  *
  * Pattern dialect contract: every pattern below uses only syntax
  * whose matching semantics are IDENTICAL in Java regex (Spark) and
  * RE2 (DuckDB) — character classes, bounded/unbounded greedy
  * repetition, no backreferences, no lookaround — so the DuckDB
  * oracle reproduces counts and redacted text bit-exactly.
  *
  * Redaction order matters and is fixed: emails first (they contain
  * digits and dots that the other patterns must not see), then IPv4
  * (dotted digit runs), then phones (digit runs with separators; the
  * phone class excludes '.' so an already-masked IP cannot re-match).
  */
object TextPii {

  /** Local-part @ domain . tld — both dialects resolve the greedy
    * classes to the same leftmost-longest match here because the
    * class partition (local / '@' / domain / '.' tld) is unambiguous. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+\\.[A-Za-z]{2,}"

  /** Four 1-3 digit octets. (Deliberately permissive — 999.0.0.1
    * flags as PII; over-masking beats leaking.) */
  val ipv4Pattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Optional '+', then >= 8 chars of digits with (), -, space
    * separators, digit-bounded. No '.' in the class: IPs and masked
    * tokens cannot re-match. */
  val phonePattern = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"

  def countPii(text: Column): (Column, Column, Column) = (
    regexp_count(text, lit(emailPattern)),
    regexp_count(text, lit(ipv4Pattern)),
    regexp_count(text, lit(phonePattern)))

  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(emailPattern), lit("[EMAIL]")),
        lit(ipv4Pattern), lit("[IP]")),
      lit(phonePattern), lit("[PHONE]"))

  /** Per-document PII counts + redacted text. One scan, one project,
    * fully inside whole-stage codegen. */
  def scrub(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val (em, ip, ph) = countPii(t)
    docs
      .withColumn("n_emails", em)
      .withColumn("n_ips", ip)
      .withColumn("n_phones", ph)
      .withColumn("redacted", redact(t))
  }
}
