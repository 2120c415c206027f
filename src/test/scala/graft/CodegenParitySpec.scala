package graft

import org.scalatest.funsuite.AnyFunSuite

/** Interpreted-vs-codegen parity for the custom Catalyst expressions
  * (GeoExpressions / GeoKernels / TextStatsExpressions /
  * VectorExpressions). The oracle gate only ever exercises the
  * whole-stage-codegen path; production clusters DO hit the interpreted
  * fallback (generated method over 64KB, codegen compile failure,
  * expressions nested in non-codegen operators), and a divergent
  * `eval` would silently change answers exactly there. The kernels are
  * shared statics by design ("they cannot drift") — this spec pins the
  * design: every kernel-heavy query family must produce byte-identical
  * rows with codegen disabled entirely.
  */
class CodegenParitySpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  private val names = Seq(
    "text_quality", "text_repetition", "text_langid", "text_fingerprint",
    "dedup_simhash", "sim_cosine_topk", "geo_envelope_filter",
    "geo_hilbert_index", "mm_phash_dedup", "q16_scalar_funcs")

  test("custom-expression queries return identical rows with whole-stage " +
      "codegen AND the codegen factory disabled (interpreted eval path)") {
    val keyOf = (r: org.apache.spark.sql.Row) => r.toSeq.map {
      case a: Array[_] => a.toSeq
      case x => x
    }.toList
    val codegen = names.map(n =>
      n -> SparkEntry.queries(n)(spark, sf).collect().map(keyOf).toSet).toMap
    val saved = Seq("spark.sql.codegen.wholeStage", "spark.sql.codegen.factoryMode")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      names.foreach { n =>
        val interpreted = SparkEntry.queries(n)(spark, sf)
          .collect().map(keyOf).toSet
        assert(interpreted == codegen(n),
          s"$n: interpreted eval diverged from the codegen path " +
            s"(${interpreted.size} vs ${codegen(n).size} rows)")
      }
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
