package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** bigram_best_profile semantics against the declarative
  * distinct-bigrams + per-profile array_intersect chain it replaces:
  * distinct counting (repeated bigrams count once), the
  * max-count-then-lowest-index tie rule, sub-2-codepoint texts, null
  * text, non-ASCII codepoints, and the literal-profiles requirement. */
class BigramBestProfileSpec extends AnyFunSuite {
  private lazy val spark = { val s = TestSpark.spark
    GraftFunctions.register(s); s }

  private def best(text: String, profiles: Seq[Seq[String]]): Any = {
    import org.apache.spark.sql.functions.{call_function, col, typedLit}
    import spark.implicits._
    Seq(Tuple1(text)).toDF("t")
      .select(call_function("bigram_best_profile", col("t"),
        typedLit(profiles)))
      .collect()(0).get(0)
  }

  /** The declarative form the kernel must match. */
  private def declarative(text: String, profiles: Seq[Seq[String]]): Int = {
    val bigrams =
      if (text == null || text.length < 2) Set.empty[String]
      else (0 until text.length - 1).map(i => text.substring(i, i + 2)).toSet
    val counts = profiles.map(p => p.count(bigrams.contains))
    counts.indexOf(counts.max)
  }

  test("distinct counting and the lowest-index tie rule") {
    val profs = Seq(Seq("ab", "bc"), Seq("cd", "de"), Seq("ab", "cd"))
    // "ababab": distinct bigrams {ab, ba} — profile 0 scores 1,
    // profile 2 scores 1, profile 1 scores 0 → tie goes to index 0
    assert(best("ababab", profs) == 0)
    assert(declarative("ababab", profs) == 0)
    // "cdcd de": {cd, dc, d , " d", de} → p1 scores 2, p2 scores 1
    assert(best("cdcd de", profs) == 1)
    assert(declarative("cdcd de", profs) == 1)
  }

  test("short and null texts") {
    val profs = Seq(Seq("ab"), Seq("xy"))
    assert(best("a", profs) == 0) // no bigram → all 0 → index 0
    assert(best("", profs) == 0)
    import org.apache.spark.sql.functions.{call_function, col, typedLit}
    import spark.implicits._
    val r = Seq(Tuple1(null: String)).toDF("t")
      .select(call_function("bigram_best_profile", col("t"),
        typedLit(profs))).collect()(0)
    assert(r.isNullAt(0))
  }

  test("non-ASCII codepoints match substring semantics") {
    val profs = Seq(Seq("éz"), Seq("zé"))
    assert(best("zéz", profs) == 0 || best("zéz", profs) == 1)
    // both bigrams present → tie → index 0; declarative agrees
    assert(best("zéz", profs) == declarative("zéz", profs))
    // only zé present
    assert(best("azé", profs) == 1)
    assert(declarative("azé", profs) == 1)
  }

  test("random texts agree with the declarative chain") {
    val rnd = new scala.util.Random(17)
    val alphabet = "abcdeé "
    val profs = Seq(Seq("ab", "cd", "é "), Seq("de", " a"), Seq("aa", "ée", "bc"))
    (1 to 200).foreach { _ =>
      val text = Seq.fill(rnd.nextInt(40))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(best(text, profs) == declarative(text, profs), s"text='$text'")
    }
  }

  test("malformed profile entries fail with the descriptive message") {
    // empty entry: must hit the nonEmpty require, not a raw
    // StringIndexOutOfBoundsException from codePointAt(0)
    val e1 = intercept[Exception](best("ab", Seq(Seq(""))))
    assert(e1.getMessage.contains("not exactly 2 codepoints"), e1.getMessage)
    // 1-codepoint and 3-codepoint entries get the same message
    val e2 = intercept[Exception](best("ab", Seq(Seq("a"))))
    assert(e2.getMessage.contains("not exactly 2 codepoints"), e2.getMessage)
    val e3 = intercept[Exception](best("ab", Seq(Seq("abc"))))
    assert(e3.getMessage.contains("not exactly 2 codepoints"), e3.getMessage)
  }

  test("non-literal profiles are rejected loudly") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq(("ab", Seq(Seq("ab")))).toDF("t", "p")
        .selectExpr("bigram_best_profile(t, p)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal"), e.getMessage)
  }
}
