package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract itself: Map literals silently drop
  * duplicate keys, so a copy-pasted query id would erase an existing
  * entry without any compile error. */
class ContractSpec extends AnyFunSuite {

  test("every oracle has a query; ids are well-formed and collision-free") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without queries: ${o -- q}")
    assert(q.forall(_.matches("^q\\d+_[a-z0-9_]+$")), q.filterNot(_.matches("^q\\d+_[a-z0-9_]+$")))
    val nums = q.toSeq.map(_.takeWhile(_ != '_'))
    assert(nums.distinct.size == q.size, "duplicate q-number prefixes (a Map key collision ate one)")
  }

  test("GraftExtensions: every native function resolves and evaluates in SQL") {
    val spark = SparkTestSession.spark
    val probes = Seq(
      "SELECT graft_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F))",
      "SELECT graft_jaro_winkler('martha', 'marhta')",
      "SELECT graft_bmp_stats(CAST(NULL AS BINARY))",
      "SELECT graft_bmp_stats(graft_fake_bmp24(1L, 2L, 2L)).n_px",
      "SELECT graft_bmp_ahash(graft_fake_bmp24(1L, 2L, 2L)).h0",
      "SELECT graft_bpe_fold(array('a','b','c'), array('a'), array('b'))",
      "SELECT graft_wav_stats(graft_fake_wav16(1L, 1L, 8000L, 4L)).rms",
      "SELECT graft_bloom_agg(CAST(id AS BIGINT)) FROM range(10)",
      "SELECT graft_cms(CAST(id AS STRING), 4, 16) FROM range(10)",
      "SELECT graft_viterbi('abx', array('ab'), array(10L))",
      "SELECT graft_gram(array(CAST(id AS DOUBLE), 1.0D), 2, 1024) " +
        "FROM range(10)",
      "SELECT graft_nfc('cafe\u0301')",
      "SELECT graft_fold_accents('caf\u00e9')",
      "SELECT graft_topk(CAST(id AS DOUBLE), CAST(id AS STRING), 3) " +
        "FROM range(10)",
      "SELECT graft_bmp_stats(graft_bmp_resize(" +
        "graft_fake_bmp24(1L, 4L, 4L), 2)).n_px",
      "SELECT graft_wav_features(" +
        "graft_fake_wav16(1L, 1L, 8000L, 4L), 8000).n_zero_cross")
    probes.foreach { p =>
      val rows = spark.sql(p).collect()
      assert(rows.nonEmpty, p)
    }
  }

  test("oracle SQL strings are non-empty and reference a harness table") {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    // pure-computation oracles by DESIGN touch no table (q146-style
    // driver-side results checked against literal SQL arithmetic) —
    // each exemption must be deliberate, so the list is explicit
    val tableFree = Set("q214_banding_design")
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, name)
      assert(tableFree(name) || tables.exists(sql.contains),
        s"$name references no harness table")
    }
  }
}
