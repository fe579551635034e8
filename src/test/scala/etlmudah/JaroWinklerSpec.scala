package etlmudah.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinklerFn.sim(UTF8String.fromString(a), UTF8String.fromString(b))

  test("kernel matches DuckDB jaro_winkler_similarity on probed fixtures") {
    // every expected value below was read off DuckDB 1.x on this host —
    // these fixtures ARE the cross-engine contract the q219 oracle rides
    val fixtures = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),   // classic Winkler pair
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("abcdef", "abzzzz", 0.5555555555555555),   // jaro <= 0.7: NO boost
      ("prefixmatch", "prefixxxxxx", 0.6969696969696969), // ditto at 0.697
      ("xy", "xz", 0.6666666666666666),
      ("ab", "ba", 0.0),                          // window 0: no matches
      ("", "abc", 0.0), ("", "", 0.0),            // empty => 0, even both
      ("a", "a", 1.0), ("aaaa", "aaaa", 1.0),
      ("CRATE", "TRACE", 0.7333333333333334),     // boost-eligible, prefix 0
      ("abcdxx", "abcdyyzz", 0.8333333333333334), // full 4-char prefix boost
      ("abcdef", "bcadef", 0.9444444444444445),   // ODD mismatch count: t=3/2=1
      ("hello world", "hello wrold", 0.9818181818181818))
    fixtures.foreach { case (a, b, expected) =>
      assert(jw(a, b) == expected, s"sim('$a','$b') = ${jw(a, b)}")
      assert(jw(b, a) == expected, s"symmetry broke on ('$a','$b')")
    }
  }

  test("graft_jaro_winkler resolves in SQL, codegen path agrees with eval, null-safe") {
    import spark.implicits._
    val df = Seq(("MARTHA", "MARHTA"), ("CRATE", "TRACE"), (null, "x"))
      .toDF("a", "b")
    val out = df.select(call_function("graft_jaro_winkler",
      col("a"), col("b")).as("s")).collect()
    assert(out(0).getDouble(0) == 0.9611111111111111)
    assert(out(1).getDouble(0) == 0.7333333333333334)
    assert(out(2).isNullAt(0), "null input must yield null")
  }

  test("graft_jaro_winkler accepts an untyped NULL literal (NullType)") {
    // DuckDB: jaro_winkler_similarity(NULL, x) IS NULL — a bare NULL
    // literal must resolve (NullType child) and evaluate to NULL, not
    // fail analysis
    val out = spark.sql(
      "SELECT graft_jaro_winkler(NULL, 'x') AS a, " +
        "graft_jaro_winkler('x', NULL) AS b, " +
        "graft_jaro_winkler(NULL, NULL) AS c").collect()(0)
    assert(out.isNullAt(0) && out.isNullAt(1) && out.isNullAt(2))
  }

  test("fuzzyLinkPairs: blocked pairs above threshold; oversized blocks dropped whole") {
    import spark.implicits._
    val ents = Seq((1L, "small bolt"), (2L, "small bolz"), (3L, "small ring"),
      (4L, "large bolt"), (5L, "blue sky")).toDF("id", "name")
    val out = etlmudah.joins.Joins.fuzzyLinkPairs(ents, "id", "name", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    // only within-block (first token) candidates can pair: (4,"large...")
    // never meets (1,"small bolt") despite high character overlap
    assert(out.map(p => (p._1, p._2)).toSet == Set((1L, 2L)),
      s"got ${out.toSeq}")
    assert(out.head._3 >= 0.9)
    // cap = 2 drops the 3-entity "small" block entirely, keeping nothing
    // "large"/"blue" blocks are singletons (no pairs), so dropping the
    // 3-entity "small" block leaves nothing at all
    val capped = etlmudah.joins.Joins.fuzzyLinkPairs(ents, "id", "name",
      0.0, maxBlockSize = 2L).collect()
    assert(capped.isEmpty,
      s"capped run must drop the oversized block whole: ${capped.toSeq}")
  }

  test("editLinkPairs: blocked Levenshtein with length-bound prune; threshold exact") {
    import spark.implicits._
    val ents = Seq((1L, "small bolt"), (2L, "small bolz"),
      (3L, "small bort"), (4L, "small ring"), (5L, "large bolt"),
      (6L, "small boltzzz")).toDF("id", "name")
    val out = etlmudah.joins.Joins.editLinkPairs(ents, "id", "name", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    // within-block only; dist("small bolt","small bolz")=1,
    // ("small bolt","small bort")=1, ("small bolz","small bort")=2... wait
    // bolz -> bort: z->t and l->r = 2; ring is 3+ away from all;
    // "small boltzzz" is length-pruned (len diff 3 > 2) against bolt
    assert(out.map(p => (p._1, p._2)).toSet ==
      Set((1L, 2L), (1L, 3L), (2L, 3L)), s"got ${out.toSeq}")
    assert(out.forall(p => p._3 >= 1 && p._3 <= 2))
    // the distances themselves
    val m = out.map(p => (p._1, p._2) -> p._3).toMap
    assert(m((1L, 2L)) == 1L && m((1L, 3L)) == 1L && m((2L, 3L)) == 2L)
  }
}
