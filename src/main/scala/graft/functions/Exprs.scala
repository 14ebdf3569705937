package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar expression library — the reference's derived-column operators
  * (SURVEY.md §2.1 X1-X7) re-expressed as codegen-friendly Column
  * functions. No UDFs here: every helper composes
  * `org.apache.spark.sql.functions` so the whole pipeline stays inside
  * whole-stage codegen.
  */
object Exprs {

  /** X1/X2 — pandas `df[c].astype(str).apply(len)` (reference app.py:171).
    * pandas renders a missing value as the 3-char string "nan" before
    * taking the length; `coalesce(cast, "nan")` reproduces that exactly.
    */
  def lengthNanParity(c: Column): Column =
    length(coalesce(c.cast("string"), lit("nan"))).cast("long")

  /** X5 — `strftime("%Y-%m-%d %H:%M:%S")` (reference app.py:205). */
  def formatUploadTime(c: Column): Column =
    date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** X6 — `default=datetime.utcnow` column default (reference
    * models.py:14,31): fill a missing timestamp with a default. The
    * deterministic form takes the default as an argument; production
    * callers pass `current_timestamp()`.
    */
  def withDefaultTs(c: Column, default: Column): Column = coalesce(c, default)

  /** X7 — password hash pair (reference app.py:88,102 uses werkzeug
    * scrypt; interop is not required, only hash+verify semantics).
    * Salted SHA-256, hex-encoded.
    */
  def hashPassword(pw: Column, salt: Column): Column =
    sha2(concat(salt, lit(":"), pw), 256)

  def checkPassword(pw: Column, salt: Column, stored: Column): Column =
    hashPassword(pw, salt) === stored
}
