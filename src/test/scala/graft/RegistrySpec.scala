package graft

/** Registry-wide guards: every registered query must execute, and every
  * oracle-checked query must be deterministic (total ORDER BY unless it
  * returns a single aggregate row). Cheap insurance against a future
  * entry silently breaking the driver's t2 gate.
  */
class RegistrySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Queries whose whole output is one (or a few) aggregate rows with no
    * possible order ambiguity. */
  private val singleRow = Set(
    "q46_approx_distinct", "q48_sampling", "q54_exact_dedup_stats",
    "q72_try_cast_numeric", "q74_natural_key_dedup", "q16_bloom_prune",
    "q83_multimodal_decode", "q86_ivf_kmeans", "q110_ann_quantized")

  test("every registered query executes and yields a schema") {
    val failures = QueryRegistry.all.flatMap { q =>
      try {
        val df = q.run(spark, dir)
        assert(df.schema.fields.nonEmpty)
        df.count() // force full execution
        None
      } catch {
        case e: Throwable => Some(q.name -> e.getMessage.take(200))
      }
    }
    assert(failures.isEmpty, s"queries failed at sf0.001:\n${failures.mkString("\n")}")
  }

  test("every oracle has a total ORDER BY or is a single-row aggregate") {
    val missing = QueryRegistry.all
      .filter(q => q.oracle.isDefined && !singleRow.contains(q.name))
      .filterNot(_.oracle.get.toUpperCase.contains("ORDER BY"))
      .map(_.name)
    assert(missing.isEmpty, s"oracles without ORDER BY: $missing")
  }

  test("query names are unique and well-formed") {
    val names = QueryRegistry.all.map(_.name)
    assert(names.distinct.size === names.size)
    assert(names.forall(_.matches("q\\d+_[a-z0-9_]+")))
  }
}
