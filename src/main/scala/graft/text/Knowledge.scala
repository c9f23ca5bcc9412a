package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F13 domain-knowledge injection (reference
  * certa/models/ditto/knowledge.py:9-160, `ProductDKInjector`): rewrite
  * a serialized entry so the matcher sees normalized numbers, marked
  * identifiers, and entity-type tags — the preprocessing Ditto applies
  * before BERT tokenization.
  *
  * The reference recognizes entity spans with spaCy's `en_core_web_lg`
  * (an external 800 MB model — not shippable here, the same boundary as
  * the neural scorers, see [[graft.matcher.ExternalBatchScorer]]). This
  * operator keeps the reference's DETERMINISTIC rules exactly and
  * replaces the model-driven span recognizer with a documented
  * heuristic stand-in:
  *
  *  - numeric tokens normalize like the reference (knowledge.py:92-100):
  *    integral values print as integers ("007" → "7", "11.0" → "11"),
  *    other numbers to two decimals ("900.1" → "900.10"); rounding here
  *    is sign-aware round-half-up in exact integer arithmetic so a SQL
  *    oracle replays it bit-for-bit (the reference's `'%.2f' %` differs
  *    only on exact binary halves)
  *  - alphanumeric identifiers — length ≥ 7 containing a digit — are
  *    prefixed with an `ID` tag (knowledge.py:101-103: "Brand#17" →
  *    "ID Brand#17")
  *  - the entity marker (reference: spaCy spans labeled
  *    NORP/GPE/LOC/PERSON/PRODUCT → `PRODUCT`, knowledge.py:79-82)
  *    becomes a heuristic: ALL-CAPS tokens of length ≥ 4 (catalog
  *    category vocabulary — "ECONOMY", "PROMO"; ≥ 4 keeps the Ditto
  *    serialization markers COL/VAL unmarked). A spaCy-backed
  *    recognizer drops in by replacing [[entityMarker]].
  *
  * Everything is a scan-local `transform` fold over whitespace tokens —
  * built-in expressions only (higher-order functions evaluate
  * interpreted but sit in one projection over the scan), no UDF, no
  * shuffle, linear at any corpus size.
  */
object Knowledge {

  /** Two-decimal rendering with sign-aware round-half-up in integer
    * arithmetic: n = floor(|v|·100 + 0.5), printed as ±(n/100).(n%100).
    * Exact-integer string assembly — identical in any engine.
    */
  private def twoDecimals(v: Column): Column = {
    val n = floor(abs(v) * 100 + lit(0.5)).cast("long")
    concat(
      when(v < 0, lit("-")).otherwise(lit("")),
      (n / 100).cast("long").cast("string"),
      lit("."),
      lpad(pmod(n, lit(100L)).cast("string"), 2, "0"))
  }

  /** Heuristic entity recognizer: the marker prepended to a token, or
    * the empty string. Stand-in for the reference's spaCy span labels.
    */
  def entityMarker(t: Column): Column =
    when(t.rlike("^[A-Z]{4,}$"), lit("PRODUCT ")).otherwise(lit(""))

  /** One token through the injector rules (marker ⊕ normalized body). */
  private def injectToken(t: Column): Column = {
    val isInt = t.rlike("^-?[0-9]{1,18}$")
    val isFloat = t.rlike("^-?[0-9]*\\.[0-9]+$")
    val v = t.cast("double")
    val body =
      when(isInt, v.cast("long").cast("string"))
        .when(isFloat,
          when(v === floor(v), v.cast("long").cast("string"))
            .otherwise(twoDecimals(v)))
        .when(length(t) >= 7 && t.rlike("[0-9]"), concat(lit("ID "), t))
        .otherwise(t)
    concat(entityMarker(t), body)
  }

  /** Inject domain knowledge into a whitespace-tokenized text column
    * (typically a [[TextAnalysis.dittoSerialize]] output).
    */
  def injectKnowledge(text: Column): Column =
    array_join(
      transform(split(text, " "), t => injectToken(t)), " ")
}
