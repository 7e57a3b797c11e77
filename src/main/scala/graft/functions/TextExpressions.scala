package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for [[NfcNormalize]] — a real (static-forwarded) method
  * the generated Java can call directly. The is-normalized probe runs
  * first: on the overwhelmingly-ASCII corpus of a crawl pipeline it
  * answers without allocating, so the common row costs one scan and no
  * copy; only rows that actually carry decomposed sequences pay for the
  * normalize + re-encode. */
object NfcKernel {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** Unicode NFC normalization (UAX #15) as a codegen scalar expression —
  * the canonicalization step text dedup needs BEFORE any fingerprint:
  * "café" arrives from real crawls both composed (U+00E9) and decomposed
  * (e + U+0301), byte-distinct but canonically equal, so an md5 over raw
  * bytes splits one page into two fingerprints. Spark ships no Unicode
  * normalizer among its built-ins; this wraps the JDK's (`java.text
  * .Normalizer`, the same UAX #15 algorithm DuckDB's `nfc_normalize`
  * implements via utf8proc, so the oracle reproduces it exactly).
  *
  * Codegen is a single static call into [[NfcKernel]] — the expression
  * stays inside WholeStageCodegen spans, and the kernel's fast path makes
  * already-normalized (e.g. pure-ASCII) rows allocation-free.
  * Reference capability anchor: the reference normalizes content before
  * hashing at the application layer (`src/VectorTable.php:303-310`
  * canonicalizes before storage); here it is an engine expression. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcKernel.nfc(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcKernel.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
