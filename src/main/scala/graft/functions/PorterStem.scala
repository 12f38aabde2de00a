package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The Porter stemmer — M.F. Porter, "An algorithm for suffix
  * stripping", Program 14(3):130-137, 1980. A faithful port of the
  * author's published reference structure (the five condition/rule
  * steps over the measure m of consonant-vowel runs), NOT a
  * dictionary stemmer: it is pure, deterministic and locale-free,
  * which is what lets an index and its queries agree forever.
  *
  * Contract: input is expected lowercase; a token containing anything
  * outside [a-z], or shorter than 3 chars, passes through UNCHANGED
  * (numbers, codes and already-normalized ids survive an English
  * analyzer unharmed). */
object Porter {

  def stem(word: String): String = {
    val n = word.length
    if (n <= 2) return word
    var i = 0
    while (i < n) {
      val c = word.charAt(i)
      if (c < 'a' || c > 'z') return word
      i += 1
    }
    val st = new Stemmer(word.toCharArray)
    st.run()
    new String(st.b, 0, st.k + 1)
  }

  /** UTF8String face for the codegen call site. */
  def stemUtf8(s: UTF8String): UTF8String =
    UTF8String.fromString(stem(s.toString))

  private final class Stemmer(val b: Array[Char]) {
    var k: Int = b.length - 1
    private var j: Int = 0

    private def cons(i: Int): Boolean = b(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y' => if (i == 0) true else !cons(i - 1)
      case _ => true
    }

    /** m(): the number of consonant-vowel sequences in [0, j]. */
    private def m(): Int = {
      var n = 0
      var i = 0
      while (i <= j && cons(i)) i += 1
      if (i > j) return n
      i += 1
      while (true) {
        while (i <= j && !cons(i)) i += 1
        if (i > j) return n
        i += 1
        n += 1
        while (i <= j && cons(i)) i += 1
        if (i > j) return n
        i += 1
      }
      n
    }

    private def vowelInStem(): Boolean =
      (0 to j).exists(i => !cons(i))

    private def doubleC(i: Int): Boolean =
      i >= 1 && b(i) == b(i - 1) && cons(i)

    /** cvc(i): consonant - vowel - consonant ending at i, where the
      * final consonant is not w, x or y (restores an e: cav(e),
      * lov(e), hop(e) — but not snow, box, tray). */
    private def cvc(i: Int): Boolean = {
      if (i < 2 || !cons(i) || cons(i - 1) || !cons(i - 2)) return false
      val ch = b(i)
      ch != 'w' && ch != 'x' && ch != 'y'
    }

    private def ends(s: String): Boolean = {
      val l = s.length
      val o = k - l + 1
      if (o < 0) return false
      var i = 0
      while (i < l) {
        if (b(o + i) != s.charAt(i)) return false
        i += 1
      }
      j = k - l
      true
    }

    private def setTo(s: String): Unit = {
      val l = s.length
      var i = 0
      while (i < l) { b(j + 1 + i) = s.charAt(i); i += 1 }
      k = j + l
    }

    private def r(s: String): Unit = if (m() > 0) setTo(s)

    /** Step 1: plurals and -ed / -ing. */
    private def step1(): Unit = {
      if (b(k) == 's') {
        if (ends("sses")) k -= 2
        else if (ends("ies")) setTo("i")
        else if (b(k - 1) != 's') k -= 1
      }
      if (ends("eed")) { if (m() > 0) k -= 1 }
      else if ((ends("ed") || ends("ing")) && vowelInStem()) {
        k = j
        if (ends("at")) setTo("ate")
        else if (ends("bl")) setTo("ble")
        else if (ends("iz")) setTo("ize")
        else if (doubleC(k)) {
          k -= 1
          val ch = b(k)
          if (ch == 'l' || ch == 's' || ch == 'z') k += 1
        } else if (m() == 1 && cvc(k)) setTo("e")
      }
    }

    /** Step 2: y → i when there is a vowel in the stem. */
    private def step2(): Unit =
      if (ends("y") && vowelInStem()) b(k) = 'i'

    /** Step 3: double suffixes → single (m > 0). */
    private def step3(): Unit = {
      if (k == 0) return
      b(k - 1) match {
        case 'a' =>
          if (ends("ational")) r("ate")
          else if (ends("tional")) r("tion")
        case 'c' =>
          if (ends("enci")) r("ence")
          else if (ends("anci")) r("ance")
        case 'e' =>
          if (ends("izer")) r("ize")
        case 'l' =>
          if (ends("bli")) r("ble")
          else if (ends("alli")) r("al")
          else if (ends("entli")) r("ent")
          else if (ends("eli")) r("e")
          else if (ends("ousli")) r("ous")
        case 'o' =>
          if (ends("ization")) r("ize")
          else if (ends("ation")) r("ate")
          else if (ends("ator")) r("ate")
        case 's' =>
          if (ends("alism")) r("al")
          else if (ends("iveness")) r("ive")
          else if (ends("fulness")) r("ful")
          else if (ends("ousness")) r("ous")
        case 't' =>
          if (ends("aliti")) r("al")
          else if (ends("iviti")) r("ive")
          else if (ends("biliti")) r("ble")
        case 'g' =>
          if (ends("logi")) r("log")
        case _ => ()
      }
    }

    /** Step 4: -ic-, -full, -ness etc. (m > 0). */
    private def step4(): Unit = b(k) match {
      case 'e' =>
        if (ends("icate")) r("ic")
        else if (ends("ative")) r("")
        else if (ends("alize")) r("al")
      case 'i' =>
        if (ends("iciti")) r("ic")
      case 'l' =>
        if (ends("ical")) r("ic")
        else if (ends("ful")) r("")
      case 's' =>
        if (ends("ness")) r("")
      case _ => ()
    }

    /** Step 5: -ant, -ence etc. (m > 1). */
    private def step5(): Unit = {
      if (k == 0) return
      val matched = b(k - 1) match {
        case 'a' => ends("al")
        case 'c' => ends("ance") || ends("ence")
        case 'e' => ends("er")
        case 'i' => ends("ic")
        case 'l' => ends("able") || ends("ible")
        case 'n' =>
          ends("ant") || ends("ement") || ends("ment") || ends("ent")
        case 'o' =>
          (ends("ion") && j >= 0 && (b(j) == 's' || b(j) == 't')) ||
            ends("ou")
        case 's' => ends("ism")
        case 't' => ends("ate") || ends("iti")
        case 'u' => ends("ous")
        case 'v' => ends("ive")
        case 'z' => ends("ize")
        case _ => false
      }
      if (matched && m() > 1) k = j
    }

    /** Step 6: final -e and -ll tidy-up (m > 1). */
    private def step6(): Unit = {
      j = k
      if (b(k) == 'e') {
        val a = m()
        if (a > 1 || (a == 1 && !cvc(k - 1))) k -= 1
      }
      if (b(k) == 'l' && doubleC(k) && m() > 1) k -= 1
    }

    def run(): Unit = {
      step1(); step2(); step3(); step4(); step5(); step6()
    }
  }
}

/** `graft_porter(token)` → the Porter stem of an already-lowercased
  * token — the stemming leg of the `simple_en_porter` analyzer
  * ([[graft.operators.TextIndex]]). One static call inside
  * whole-stage codegen; NULL in → NULL out. */
case class PorterStemExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING, got ${t.simpleString}")
    }

  override def prettyName: String = "graft_porter"

  override protected def nullSafeEval(s: Any): Any =
    Porter.stemUtf8(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Porter.stemUtf8($c)")

  override protected def withNewChildInternal(c: Expression)
  : PorterStemExpr = copy(c)
}
