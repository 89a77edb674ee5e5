package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass Cavnar–Trenkle scorer: given a text column and a
  * LITERAL array of language profiles (each an array of 2-codepoint
  * bigram strings), returns the index of the profile sharing the most
  * DISTINCT text bigrams — ties to the lowest index.
  *
  * Semantically identical to the declarative chain
  * `array_min(array(struct(-size(array_intersect(array_distinct(
  *   transform(sequence(...), i -> substr(text, i, 2))), profile_i)),
  *   i)))` the t05 gate previously evaluated, but where that form
  * materializes ~L two-char UTF8Strings, a distinct hash and five
  * interpreted array_intersects PER ROW, this walks the text's
  * codepoints once: each new bigram packs into one Long, a hash lookup
  * bumps the counters of the profiles containing it, and the argmax
  * falls out at the end — the language-ID hot path at corpus scale.
  *
  * The profile side folds to a Long-keyed index ONCE per plan (the
  * expression requires a foldable right child — profiles are plan
  * literals by design, the trained-model-as-literal idiom). Bigrams
  * are consecutive CODEPOINTS, matching `substr`'s character
  * semantics; texts shorter than two codepoints score 0 everywhere
  * and return index 0 (= the sorted-first profile, the declarative
  * form's tie rule). Null text → null.
  */
case class BigramBestProfile(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(ArrayType(StringType, _), _))
        if right.foldable => TypeCheckResult.TypeCheckSuccess
      case (StringType, ArrayType(ArrayType(StringType, _), _)) =>
        TypeCheckResult.TypeCheckFailure(
          "bigram_best_profile requires a LITERAL profiles argument " +
            "(the trained model enters the plan as a literal)")
      case _ => TypeCheckResult.TypeCheckFailure(
        "bigram_best_profile requires (string, array<array<string>>), " +
          s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  /** bigram(Long) → indices of the profiles containing it; built once
    * per plan from the literal. */
  @transient private lazy val (index, nProfiles):
      (java.util.HashMap[java.lang.Long, Array[Int]], Int) = {
    val profs = right.eval(null).asInstanceOf[ArrayData]
    val n = profs.numElements()
    val tmp = new java.util.HashMap[java.lang.Long, java.util.ArrayList[Int]]()
    var p = 0
    while (p < n) {
      val arr = profs.getArray(p)
      var j = 0
      while (j < arr.numElements()) {
        val s = arr.getUTF8String(j).toString
        // guard BEFORE codePointAt: an empty or 1-codepoint entry must
        // fail with the descriptive message, not a raw
        // StringIndexOutOfBoundsException from the probe itself
        require(s.nonEmpty, "profile bigram '' is not exactly 2 codepoints")
        val c1 = s.codePointAt(0)
        val adv = Character.charCount(c1)
        require(s.length > adv && s.length == adv + Character.charCount(
          s.codePointAt(adv)),
          s"profile bigram '$s' is not exactly 2 codepoints")
        val key = java.lang.Long.valueOf((c1.toLong << 32) | s.codePointAt(adv))
        var lst = tmp.get(key)
        if (lst == null) { lst = new java.util.ArrayList[Int](); tmp.put(key, lst) }
        if (lst.isEmpty || lst.get(lst.size - 1) != p) lst.add(p)
        j += 1
      }
      p += 1
    }
    val out = new java.util.HashMap[java.lang.Long, Array[Int]](tmp.size * 2)
    tmp.forEach((k, v) => out.put(k, v.stream.mapToInt(_.intValue).toArray))
    (out, n)
  }

  /** The per-row kernel — public so generated code can call it. */
  def bestProfile(text: UTF8String): Int = {
    val s = text.toString
    val counts = new Array[Int](nProfiles)
    val seen = new java.util.HashSet[java.lang.Long]()
    var i = 0
    var prev = -1
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (prev >= 0) {
        val key = java.lang.Long.valueOf((prev.toLong << 32) | cp)
        if (seen.add(key)) {
          val hit = index.get(key)
          if (hit != null) {
            var h = 0
            while (h < hit.length) { counts(hit(h)) += 1; h += 1 }
          }
        }
      }
      prev = cp
      i += Character.charCount(cp)
    }
    var best = 0
    var bestC = if (nProfiles > 0) counts(0) else 0
    var k = 1
    while (k < nProfiles) {
      if (counts(k) > bestC) { best = k; bestC = counts(k) }
      k += 1
    }
    best
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    bestProfile(a.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bigramScorer", this,
      classOf[BigramBestProfile].getName)
    // the right child is a plan literal — its generated code is a cheap
    // constant reference; the kernel call goes through the referenced
    // expression object so the Long-keyed profile index is built once
    nullSafeCodeGen(ctx, ev, (tcode, _) =>
      s"${ev.value} = $ref.bestProfile($tcode);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BigramBestProfile =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bigram_best_profile"
}
