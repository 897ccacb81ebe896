package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: every declared query has an oracle, names
  * never drift, and the flagship entry produces rows at the smoke scale.
  */
class SparkEntrySpec extends AnyFunSuite with SparkSpec {

  test("every query has an oracle and every oracle has a query") {
    // the carve-out for non-SQL-expressible ops is EMPTY since r26:
    // media_prep (the last rows-only row) now returns the decoded-plane
    // datasheet and is hash-gated by a symbolic oracle — every declared
    // query must carry one
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("no duplicate query names across operator packs") {
    val packs = Seq(
      graft.ops.CtbOps, graft.ops.Relational, graft.ops.ExtraRelational,
      graft.ops.PipelineOps, graft.ops.TemporalOps, graft.ops.MiningOps,
      graft.ops.AnalyticsOps, graft.ops.CorpusOps, graft.ops.ScaleOps,
      graft.ops.StatsOps, graft.ops.TextOps, graft.ops.VectorOps,
      graft.ops.UdfQueries, graft.ops.ArchiveOps)
    val all = packs.flatMap(_.queries.keys)
    val dups = all.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dups.isEmpty, s"duplicate query names: $dups")
    assert(all.size == SparkEntry.queries.size)
  }

  test("entry flagship query returns rows at the smoke scale") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
